"""Connected-components correctness: the distributed large-star /
small-star alternation must match a reference union-find on every input
we can throw at it — crafted chain/star/cycle graphs, hypothesis-random
graphs, and the fixture's real near-dup pair set."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from eprints_to_hyku_data_tool_spark.functions.graph import (
    cluster_dedupe,
    connected_components,
)
from eprints_to_hyku_data_tool_spark.plans.registry import REGISTRY, _load_all
from eprints_to_hyku_data_tool_spark.sources.tables import load_table

_load_all()


def union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: every node -> min of its component
    comp: dict[int, list[int]] = {}
    for x in parent:
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for root, members in comp.items() for x in members}


def spark_components(spark, pairs: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_chain_star_cycle_shapes(spark):
    # a 12-node path (worst case for label propagation), a star, a
    # cycle, and two singleton edges — all in one edge list
    path = [(i, i + 1) for i in range(100, 112)]
    star = [(200, x) for x in range(201, 208)]
    cycle = [(300, 301), (301, 302), (302, 300)]
    extra = [(400, 401), (500, 501)]
    pairs = path + star + cycle + extra
    assert spark_components(spark, pairs) == union_find(pairs)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_matches_union_find_on_random_graphs(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    assert spark_components(spark, edges) == union_find(edges)


def test_cluster_dedupe_on_fixture_neardups(spark, sf_dir):
    """Cluster dedup over the real MinHash near-dup pairs: exactly one
    survivor (the component min) per cluster, all other members dropped,
    non-members untouched."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = REGISTRY["q60_minhash_lsh"].fn(spark, sf_dir).select("id_a", "id_b")
    ref = union_find([(r["id_a"], r["id_b"]) for r in pairs.collect()])
    out = {r["doc_id"]: r["is_dropped"] for r in cluster_dedupe(docs, pairs).collect()}
    for doc, comp in ref.items():
        assert out[doc] == (comp != doc), (doc, comp)
    members = set(ref)
    assert not any(dropped for d, dropped in out.items() if d not in members)
