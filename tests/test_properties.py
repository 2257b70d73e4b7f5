"""Property-based spot checks (SURVEY.md §5 item 5): algebraic laws of the
engine's operators on hypothesis-generated micro-tables, plus fixture-level
invariants that must hold at any scale factor."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from eprints_to_hyku_data_tool_spark.plans.registry import REGISTRY, _load_all
from eprints_to_hyku_data_tool_spark.sources.tables import load_table

_load_all()

# One tiny strategy budget: each example spins Spark jobs, so keep counts
# low — these are algebra checks, not fuzzing.
SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=1,
    max_size=30,
)


@SETTINGS
@given(rows=rows_strategy)
def test_dedupe_idempotent(spark, rows):
    """dedupe(dedupe(x)) == dedupe(x) for keep-first dedupe."""
    df = spark.createDataFrame(rows, "k int, v int")

    def dedupe(d):
        from pyspark.sql.window import Window

        w = Window.partitionBy("k").orderBy("v")
        return d.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") == 1
        ).drop("rn")

    once = sorted(map(tuple, dedupe(df).collect()))
    twice = sorted(map(tuple, dedupe(dedupe(df)).collect()))
    assert once == twice
    assert len(once) == len({k for k, _ in rows})


@SETTINGS
@given(rows=rows_strategy)
def test_union_except_roundtrip(spark, rows):
    """(a union b) except b ⊆ a, and a.subtract(a) is empty (distinct set
    algebra)."""
    df = spark.createDataFrame(rows, "k int, v int")
    a = df.filter(F.col("v") >= 0)
    b = df.filter(F.col("v") < 0)
    back = a.unionByName(b).subtract(b)
    a_set = set(map(tuple, a.collect()))
    assert set(map(tuple, back.collect())) <= a_set
    assert a.subtract(a).count() == 0


@SETTINGS
@given(rows=rows_strategy)
def test_explode_collect_roundtrip(spark, rows):
    """explode ∘ (sorted collect_list) preserves the multiset per key."""
    df = spark.createDataFrame(rows, "k int, v int")
    folded = df.groupBy("k").agg(F.sort_array(F.collect_list("v")).alias("vs"))
    unfolded = folded.select("k", F.explode("vs").alias("v"))
    assert sorted(map(tuple, unfolded.collect())) == sorted(rows)


def test_jaccard_pipelines_agree(spark, sf_dir):
    """The distributed MinHash-LSH pipeline and the brute-force form return
    the identical pair set (miss probability <= 2e-14 at these params).
    The brute force is test-only (it collects the corpus — demoted from
    the registry in r3); it stays here as the independent witness."""
    from eprints_to_hyku_data_tool_spark.plans.q_north import q60_neardup_jaccard

    brute = {
        (r["id_a"], r["id_b"])
        for r in q60_neardup_jaccard(spark, sf_dir).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in REGISTRY["z11660_minhash_lsh"].fn(spark, sf_dir).collect()
    }
    assert brute == lsh and len(brute) > 0

    # x17 is the EXACT distributed replacement (prefix-filtered inverted
    # index): it must agree pair-for-pair including the verified sizes.
    brute_full = {
        (r["id_a"], r["id_b"], r["inter_size"], r["union_size"])
        for r in q60_neardup_jaccard(spark, sf_dir).collect()
    }
    x17 = {
        (r["id_a"], r["id_b"], r["inter_size"], r["union_size"])
        for r in REGISTRY["z12786_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    assert brute_full == x17


def test_cluster_dedupe_is_transitive_closure_of_pairs(spark, sf_dir):
    """x16's drop set must be exactly 'every node that is not its
    component minimum' over the exact pair graph, and a SUPERSET of the
    greedy policy's reachable-from-lower rule on each edge."""
    pairs = {
        (r["id_a"], r["id_b"])
        for r in REGISTRY["z12786_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    # reference union-find on the driver (fixture-sized)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {
        (n, find(n)) for n in list(parent)
    }
    got = {
        (r["doc_id"], r["canonical_id"])
        for r in REGISTRY["q12785_cluster_dedupe"].fn(spark, sf_dir).collect()
        if r["is_dropped"] == 1 or r["canonical_id"] != r["doc_id"]
    }
    # every non-root member maps to its component min
    assert {(n, c) for n, c in expected if n != c} == got


def test_simhash_conv_bits_match_substring_reference(spark, sf_dir):
    """z10660_simhash extracts signature bits via conv'd hex chunks + shifts
    (fast path); the reference formulation — and the DuckDB oracle — uses
    substr(md5, j, 1) IN ('8'..'f'). Both must produce identical +-1
    contributions for every (doc, shingle, bit)."""
    from eprints_to_hyku_data_tool_spark.plans.q_north import (
        SIMHASH_BITS,
        doc_shingles,
    )

    docs = doc_shingles(load_table(spark, sf_dir, "documents").limit(50))
    feats = docs.select(
        "doc_id", F.explode_outer("sh").alias("s")
    ).filter(F.col("s").isNotNull())
    md5c = F.md5("s")
    hexhigh = ["8", "9", "a", "b", "c", "d", "e", "f"]
    ref = feats.select(
        "s",
        *[
            F.when(F.substring(md5c, j, 1).isin(hexhigh), 1)
            .otherwise(-1)
            .alias(f"b{j}")
            for j in range(1, SIMHASH_BITS + 1)
        ],
    )
    chunks = [
        F.conv(F.substring(md5c, 1 + 8 * k, 8), 16, 10).cast("long")
        for k in range(SIMHASH_BITS // 8)
    ]
    fast = feats.select(
        "s",
        *[
            (
                F.shiftright(
                    chunks[(j - 1) // 8], 4 * (7 - ((j - 1) % 8)) + 3
                ).bitwiseAND(F.lit(1))
                * 2
                - 1
            ).alias(f"b{j}")
            for j in range(1, SIMHASH_BITS + 1)
        ],
    )
    a = sorted(map(tuple, ref.collect()))
    b = sorted(map(tuple, fast.collect()))
    assert a == b and len(a) > 0


def test_exact_dedupe_is_lossless_partition(spark, sf_dir):
    """Q59 keeps exactly one representative per text_key and the copy
    counts re-add to the corpus size."""
    out = REGISTRY["z11659_exact_dedupe"].fn(spark, sf_dir)
    total = out.agg(F.sum("n_copies")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "documents").count()


def test_soundex_and_xxhash_available(spark, sf_dir):
    """Q45/Q51 Spark-only functions (no DuckDB oracle): smoke their
    behavior — soundex blocking keys and xxhash64 determinism."""
    cust = load_table(spark, sf_dir, "customer").limit(100)
    out = cust.select(
        F.soundex("c_name").alias("sx"), F.xxhash64("c_name").alias("xx")
    )
    again = cust.select(
        F.soundex("c_name").alias("sx"), F.xxhash64("c_name").alias("xx")
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_ivf_recall_vs_exact(spark, sf_dir):
    """ivf_topk_approx (nprobe=10/16, sample-trained quantizer) must
    keep recall@5 >= 0.8 against the exact q61 top-k (measured 0.85 at
    sf0.01; the fixture's embeddings are near-uniform, a worst case for
    IVF). The registered z139185_ivf_topk emits this same comparison as a
    driver-checkable verdict; this test checks the raw pair sets."""
    from eprints_to_hyku_data_tool_spark.plans.q_north import ivf_topk_approx

    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in REGISTRY["z11661_topk_similarity"].fn(spark, sf_dir).collect()
    }
    ivf = {
        (r["probe_id"], r["neighbor_id"])
        for r in ivf_topk_approx(spark, sf_dir).collect()
    }
    assert len(exact & ivf) / len(exact) >= 0.8


def test_ivf_dedupe_subset_and_recall(spark, sf_dir):
    """ivf_dedupe_approx only emits exact-verified pairs, so its drop
    set must be a strict SUBSET of exact q67's; the multi-assignment (3
    nearest cells) must keep drop recall >= 0.8 even on this
    near-uniform fixture (IVF's worst case; measured 0.92). The
    registered q86 emits the same two properties as driver verdicts."""
    from eprints_to_hyku_data_tool_spark.plans.q_north import (
        ivf_dedupe_approx,
    )

    exact = {
        r["vec_id"]
        for r in REGISTRY["z1311667_embedding_dedupe"].fn(spark, sf_dir).collect()
        if r["is_dropped"]
    }
    ivf = {
        r["vec_id"]
        for r in ivf_dedupe_approx(spark, sf_dir).collect()
        if r["is_dropped"]
    }
    assert ivf <= exact, f"false drops: {sorted(ivf - exact)[:10]}"
    assert len(ivf) / len(exact) >= 0.8, (len(ivf), len(exact))


def test_hll_is_partition_invariant_and_bounded(spark, sf_dir):
    """Q22's 100 TB primitive: HLL++ register merge is commutative and
    associative, so approx_count_distinct must return the IDENTICAL
    estimate under any partitioning (4 vs 32 partitions) and stay within
    the configured rsd of exact."""
    li = load_table(spark, sf_dir, "lineitem")
    a = (
        li.repartition(4)
        .agg(F.approx_count_distinct("l_partkey", 0.02).alias("n"))
        .collect()[0]["n"]
    )
    b = (
        li.repartition(32)
        .agg(F.approx_count_distinct("l_partkey", 0.02).alias("n"))
        .collect()[0]["n"]
    )
    exact = li.select("l_partkey").distinct().count()
    assert a == b
    assert abs(a - exact) / exact < 0.05


def test_percentile_approx_within_tolerance(spark, sf_dir):
    """Q27's 100 TB variant: percentile_approx vs exact percentile within
    1% relative error at accuracy=10000."""
    orders = load_table(spark, sf_dir, "orders")
    row = orders.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01


def test_cluster_dedupe_uses_verified_pairs_at_sf01(spark):
    """Regression guard (r3): x16 must build its graph from exact-VERIFIED
    pairs, not prefix-join candidates. At sf0.1 the candidate set is
    ~170x the true pair set, so an unverified graph over-merges clusters
    — invisible at the sf0.01 oracle scale, so this check pins sf0.1."""
    sf = "/root/testdata/sf0.1"
    pairs = {
        (r["id_a"], r["id_b"])
        for r in REGISTRY["z12786_ngram_jaccard"].fn(spark, sf).collect()
    }
    members = {n for p in pairs for n in p}
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_dropped = {n for n in members if find(n) != n}
    got_dropped = {
        r["doc_id"]
        for r in REGISTRY["q12785_cluster_dedupe"].fn(spark, sf).collect()
        if r["is_dropped"] == 1
    }
    assert got_dropped == want_dropped and len(want_dropped) > 0


def test_global_cumsum_matches_single_partition_window(spark):
    """with_global_cumsum (two-phase distributed) must equal the naive
    single-partition exclusive running sum for any data distribution,
    including duplicates in the value column and skewed key ranges."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from eprints_to_hyku_data_tool_spark.functions.ordering import (
        with_global_cumsum,
    )

    rows = [(i, (i * 7919) % 13) for i in range(501)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    got = {
        r["k"]: r["c"]
        for r in with_global_cumsum(df, [F.col("k")], "v", "c").collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["k"]: r["c"]
        for r in df.withColumn(
            "c", F.coalesce(F.sum("v").over(w), F.lit(0))
        ).collect()
    }
    assert got == want


def test_global_cumsum_carry_across_arrow_batches_and_nulls(spark):
    """r15 kernel rewrite (local cumsum as one mapInArrow sweep instead
    of a per-__pid window): the scalar carry must flow across Arrow
    batch boundaries within a partition, NULL values must contribute 0
    without nulling the running sum (the old F.sum-over-window
    semantics), and the result must stay exact under
    spark.sql.exchange.reuse=false — the double-boundary-sampling
    hazard the persist() pin exists for, now with an opaque Python
    node in the pinned subplan."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from eprints_to_hyku_data_tool_spark.functions import ordering

    old_batch = spark.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch", "10000"
    )
    old_reuse = spark.conf.get("spark.sql.exchange.reuse", "true")
    # 64-row batches force many batches per partition (carry exercised);
    # reuse=false forces each consumer branch to stand alone.
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        rows = [
            (i, None if i % 11 == 0 else (i * 7919) % 13)
            for i in range(2001)
        ]
        df = spark.createDataFrame(rows, "k long, v long").repartition(5)
        got = {
            r["k"]: r["c"]
            for r in ordering.with_global_cumsum(
                df, [F.col("k")], "v", "c"
            ).collect()
        }
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
        want = {
            r["k"]: r["c"]
            for r in df.withColumn(
                "c", F.coalesce(F.sum("v").over(w), F.lit(0))
            ).collect()
        }
        assert got == want
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old_batch
        )
        spark.conf.set("spark.sql.exchange.reuse", old_reuse)
        ordering.release_pins()


def test_int8_quantize_reconstruction_bound(spark, sf_dir):
    """SQ8 invariants: q in [-127, 127], and per-element reconstruction
    error <= amax/254 + micro-unit rounding slack (the absmax scheme's
    theoretical bound)."""
    from eprints_to_hyku_data_tool_spark.plans.q_embed import (
        z139173_int8_quantize,
    )

    for r in z139173_int8_quantize(spark, sf_dir).collect():
        assert r["q_min"] >= -127 and r["q_max"] <= 127, r["vec_id"]
        n_dims = len(r["q_vec"])
        # recon_err_e6 sums per-element |err| in 1e-6 units
        worst_total = n_dims * (r["amax"] / 254 + 1e-6) * 1e6
        assert r["recon_err_e6"] <= worst_total, (
            r["vec_id"], r["recon_err_e6"], worst_total)


def test_rplsh_pairs_are_subset_of_exact_with_perfect_precision(spark, sf_dir):
    """Every RP-LSH pair must be a TRUE pair (cos >= tau; the verify step
    guarantees precision = 1.0 by construction), and candidate recall on
    the fixture must be non-trivial (sign-LSH with 16x8 bands — 128
    planes — finds a reasonable share of the exact tau=0.4 pairs)."""
    from eprints_to_hyku_data_tool_spark.plans.q_embed import (
        z13974_rplsh_neardup,
    )
    from eprints_to_hyku_data_tool_spark.plans.q_joins import (
        z13918_similarity_join,
    )

    lsh = {
        (r["id_a"], r["id_b"])
        for r in z13974_rplsh_neardup(spark, sf_dir).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in z13918_similarity_join(spark, sf_dir).collect()
    }
    assert lsh <= exact, sorted(lsh - exact)[:5]
    assert len(lsh) > 0
    recall = len(lsh) / max(len(exact), 1)
    assert recall >= 0.2, recall


# --------------------------------------------------------------------------
# Engine-independent invariants of the portable-hash kernels (DuckDB only —
# the same SQL text both engines run; no Spark in the loop, so these can
# afford more hypothesis examples than the cluster-backed tests above).
# --------------------------------------------------------------------------
@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=0, max_value=65535),
    st.integers(min_value=0, max_value=65535),
)
def test_morton_key_bijective(x, y):
    """y57's interleave must be invertible: de-interleaving the SQL-computed
    z-value recovers (x, y) exactly — the property that makes z-cell
    min/max envelopes valid pruning bounds."""
    import duckdb

    from eprints_to_hyku_data_tool_spark.plans.q_analytics import _morton_duck

    z = duckdb.sql(
        f"SELECT {_morton_duck(f'CAST({x} AS BIGINT)', f'CAST({y} AS BIGINT)')} AS z"
    ).fetchone()[0]
    # (the registered oracle computes the same expression over BIGINT
    # columns; the CASTs here only lift the test's INT32 literals)
    dx = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    dy = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (dx, dy) == (x, y)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000_000),
        min_size=1,
        max_size=300,
    )
)
def test_cms_never_underestimates(keys):
    """y50's structural guarantee on arbitrary key multisets: for EVERY
    key, min-over-hash-rows of its bucket counts >= its true count
    (hash collisions only ever inflate)."""
    import collections

    import duckdb

    from eprints_to_hyku_data_tool_spark.plans.q_aggs import (
        _CMS_P,
        _CMS_SEEDS,
        _CMS_W,
    )

    exact = collections.Counter(keys)
    sketch: dict[tuple[int, int], int] = collections.defaultdict(int)
    for k in keys:
        for h, a, b in _CMS_SEEDS:
            sketch[(h, ((a * k + b) % _CMS_P) % _CMS_W)] += 1
    # cross-check one cell against the SQL arithmetic
    k0 = keys[0]
    h0, a0, b0 = _CMS_SEEDS[0]
    sql_bucket = duckdb.sql(
        f"SELECT ((CAST({a0} AS BIGINT) * {k0} + {b0}) % {_CMS_P}) % {_CMS_W}"
    ).fetchone()[0]
    assert sql_bucket == ((a0 * k0 + b0) % _CMS_P) % _CMS_W
    for k, n in exact.items():
        est = min(
            sketch[(h, ((a * k + b) % _CMS_P) % _CMS_W)]
            for h, a, b in _CMS_SEEDS
        )
        assert est >= n


@settings(max_examples=25, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=100_000), max_size=100),
    st.lists(
        st.integers(min_value=0, max_value=100_000),
        min_size=1,
        max_size=200,
    ),
)
def test_bloom_prefilter_no_false_negatives(dim_keys, fact_keys):
    """y51's structural guarantee on arbitrary key sets: the bloom bucket
    test never rejects a key that IS in the dim set, so
    prefilter+exact-verify == plain semi-join."""
    from eprints_to_hyku_data_tool_spark.plans.q_joins import (
        _BLOOM_M,
        _BLOOM_P,
        _BLOOM_SEEDS,
    )

    bits = {
        (h, ((a * k + b) % _BLOOM_P) % _BLOOM_M)
        for k in dim_keys
        for h, a, b in _BLOOM_SEEDS
    }
    survivors = [
        k
        for k in fact_keys
        if all(
            (h, ((a * k + b) % _BLOOM_P) % _BLOOM_M) in bits
            for h, a, b in _BLOOM_SEEDS
        )
    ]
    want = [k for k in fact_keys if k in dim_keys]
    # exact verify on the survivors recovers exactly the semi-join
    assert [k for k in survivors if k in dim_keys] == want


def test_corr_matrix_bounds_and_partition_invariance(spark, sf_dir):
    """x50's exact-moment correlations must lie in [-1, 1] and be
    bit-IDENTICAL under different shuffle partitioning (the whole point
    of exact integer moments — float covariance would drift with
    summation order)."""
    from eprints_to_hyku_data_tool_spark.plans.q_r4 import z128250_corr_matrix

    rows = {r["pair"]: r["corr"] for r in z128250_corr_matrix(spark, sf_dir).collect()}
    assert len(rows) == 6 and all(-1.0 <= v <= 1.0 for v in rows.values()), rows
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        rows2 = {
            r["pair"]: r["corr"]
            for r in z128250_corr_matrix(spark, sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert rows == rows2, "corr changed under repartitioning"


def test_entropy_and_gini_ranges(spark, sf_dir):
    """x53 entropy in [0, log2(alphabet)]; x56 gini in [0, 1)."""
    from eprints_to_hyku_data_tool_spark.plans.q_r4 import (
        z128253_char_entropy,
        z128256_length_gini,
    )
    import math

    for r in z128253_char_entropy(spark, sf_dir).collect():
        assert 0.0 <= r["entropy_bits"] <= math.log2(max(r["distinct_chars"], 2)) + 1e-6, r
    for r in z128256_length_gini(spark, sf_dir).collect():
        assert 0.0 <= r["gini"] < 1.0, r


def test_mad_outlier_counts_bounded(spark, sf_dir):
    """x47: outliers must be a minority under the 3*MAD rule on any
    unimodal-ish data, and med/mad must be actual data values (lower
    median contract)."""
    from eprints_to_hyku_data_tool_spark.plans.q_r4 import z128247_mad_outliers

    rows = z128247_mad_outliers(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_outliers"] < r["n"] / 2, r
        assert r["mad"] >= 0.0, r


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n=st.integers(min_value=1, max_value=5000),
    nbins=st.integers(min_value=1, max_value=64),
)
def test_ntile_bucket_property(spark, n, nbins):
    """ntile_bucket (functions/ordering.py) must equal the SQL-standard
    ntile for ANY (n, nbins) — the defining property: buckets are
    contiguous, sizes differ by at most 1, and the first n mod B
    buckets take the extra row (ADVICE r5: the old floor shortcut
    violated this whenever B did not divide n)."""
    from eprints_to_hyku_data_tool_spark.functions.ordering import (
        ntile_bucket,
    )

    rows = (
        spark.range(1, n + 1)
        .select(
            F.col("id").cast("int").alias("pos"),
            ntile_bucket(
                F.col("id").cast("int"), F.lit(n).cast("long"), nbins
            ).alias("bucket"),
        )
        .collect()
    )
    got = {r["pos"]: r["bucket"] for r in rows}

    # Independent reference built from ntile's DEFINITION, not the
    # implementation's arithmetic: emit bucket sizes (first n mod B
    # buckets get ceil(n/B), the rest floor(n/B)) and assign rows to
    # buckets in order.
    q, r = divmod(n, nbins)
    ref = {}
    pos = 1
    for b in range(min(nbins, n) if q == 0 else nbins):
        size = (q + 1) if b < r else q
        for _ in range(size):
            ref[pos] = b
            pos += 1
    assert pos == n + 1  # every row assigned exactly once
    sizes = {}
    for b in ref.values():
        sizes[b] = sizes.get(b, 0) + 1
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sorted(sizes) == list(range(len(sizes)))

    assert got == ref


def test_bucket_verifier_blocking_matches_bruteforce():
    """The q74 bucket kernel's block loop must emit exactly the pairs a
    brute-force all-pairs scan finds, across every block-boundary case —
    fixture buckets are far smaller than _VERIFY_BLOCK, so the
    multi-block paths (i0 == j0 triangle, i0 < j0 rectangle, ragged last
    block) only execute here. Ids arrive unsorted to exercise the
    id-order/index-order invariant."""
    import numpy as np
    import pandas as pd

    from eprints_to_hyku_data_tool_spark.functions.skew import (
        make_group_runner,
    )
    from eprints_to_hyku_data_tool_spark.plans.q_embed import (
        _bucket_verifier,
    )

    rng = np.random.default_rng(74)
    n, d, tau = 23, 8, 0.4
    vq = rng.integers(-(10**6), 10**6, size=(n, d), dtype=np.int64)
    # plant some near-duplicates so tau-survivors exist
    vq[7] = vq[3] + rng.integers(-1000, 1000, size=d)
    vq[19] = vq[11]
    ids = rng.permutation(np.arange(100, 100 + n)).astype(np.int64)
    pdf = pd.DataFrame({"vec_id": ids, "vq": list(vq)})

    nrm = np.sqrt((vq * vq).sum(axis=1).astype(np.float64))
    expect = set()
    for i in range(n):
        for j in range(n):
            if ids[i] >= ids[j]:
                continue
            cos = float(vq[i] @ vq[j]) / (nrm[i] * nrm[j])
            if cos >= tau:
                expect.add((int(ids[i]), int(ids[j]), cos))
    assert expect, "fixture must produce at least one surviving pair"

    for block in (1, 2, 4, 7, 23, 64):
        out = make_group_runner(_bucket_verifier(block, tau))(pdf)
        got = {
            (int(a), int(b), float(c))
            for a, b, c in zip(out["id_a"], out["id_b"], out["cos"])
        }
        assert got == expect, f"block={block}"

    # degenerate buckets
    assert len(make_group_runner(_bucket_verifier(4, tau))(pdf.iloc[:1])) == 0
    assert len(make_group_runner(_bucket_verifier(4, tau))(pdf.iloc[:0])) == 0


def test_bucket_verifier_cross_group_semantics():
    """Salt-aware kernel contract (round-9 hot-bucket split): a frame
    carrying the salted group key with lo != hi is a CROSS group — only
    different-salt pairs may be emitted (equal-salt pairs belong to
    their diagonal group, and double-emitting them would survive the
    downstream distinct() with the SAME cos, silently inflating nothing
    but masking a partitioning bug; emitting them here AND there must
    instead be caught by this test). lo == hi and legacy salt-free
    frames keep all-pairs semantics."""
    import numpy as np
    import pandas as pd

    from eprints_to_hyku_data_tool_spark.functions.skew import (
        make_group_runner,
    )
    from eprints_to_hyku_data_tool_spark.plans.q_embed import (
        _bucket_verifier,
    )

    rng = np.random.default_rng(9)
    n, d, tau = 17, 8, 0.4
    base = rng.integers(10**5, 10**6, size=d, dtype=np.int64)
    vq = np.stack(
        [base + rng.integers(-500, 500, size=d) for _ in range(n)]
    )  # all-near-dup: every pair passes tau
    ids = np.arange(200, 200 + n, dtype=np.int64)
    salts = (ids % 3).astype(np.int64)
    all_pairs = {
        (int(ids[i]), int(ids[j])) for i in range(n) for j in range(i + 1, n)
    }
    cross_pairs = {
        (int(ids[i]), int(ids[j]))
        for i in range(n)
        for j in range(i + 1, n)
        if salts[i] != salts[j]
    }
    assert cross_pairs and cross_pairs != all_pairs

    def run(pdf, block=4):
        out = make_group_runner(_bucket_verifier(block, tau))(pdf)
        return {(int(a), int(b)) for a, b in zip(out["id_a"], out["id_b"])}

    mk = lambda lo, hi: pd.DataFrame(  # noqa: E731
        {
            "band": 0,
            "sig": 7,
            "lo": lo,
            "hi": hi,
            "salt": salts,
            "vec_id": ids,
            "vq": list(vq),
        }
    )
    for block in (1, 3, 16, 64):
        assert run(mk(0, 2), block) == cross_pairs, f"block={block}"
        assert run(mk(1, 1), block) == all_pairs, f"block={block}"
    # legacy unsalted frame: all-pairs
    assert (
        run(pd.DataFrame({"vec_id": ids, "vq": list(vq)})) == all_pairs
    )
    # cross group where one side is empty (all rows one salt): no pairs
    one = mk(0, 2)[salts == 0]
    assert run(one) == set()


def test_rplsh_salted_split_matches_unsalted(spark):
    """End-to-end hot-bucket split: a degenerate corpus where 40 of 56
    vectors are IDENTICAL (every band bucket for that signature holds
    all 40 — the single-worker skew cliff the round-8 verdict named)
    must produce, under a tiny hot threshold that forces k >= 5 salted
    sub-buckets and a tiny verify block, EXACTLY the pair set of the
    unsalted plan. Also pins the replication invariants: lo <= hi,
    cold buckets stay single-group, and the salted group count for the
    hot signature is k(k+1)/2."""
    import numpy as np

    from eprints_to_hyku_data_tool_spark.plans.q_embed import (
        _rp_signatures,
        _salted_bucket_verify,
        _salted_groups,
    )

    rng = np.random.default_rng(74)
    hot_vec = rng.uniform(-0.5, 0.5, size=64)
    rows = [
        (i, [float(x) for x in hot_vec]) for i in range(40)
    ] + [
        (100 + i, [float(x) for x in rng.uniform(-0.5, 0.5, size=64)])
        for i in range(16)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    sigs = _rp_signatures(emb)

    unsalted = set(
        map(tuple, _salted_bucket_verify(sigs, 2048, 0.4, 10**9).collect())
    )
    salted = set(
        map(tuple, _salted_bucket_verify(sigs, 5, 0.4, 8).collect())
    )
    # the 40 identical vectors give C(40,2) = 780 cos=1.0 pairs at least
    assert len(unsalted) >= 780
    assert salted == unsalted

    groups = _salted_groups(sigs, 8).toPandas()
    assert (groups["lo"] <= groups["hi"]).all()
    # every hot (band, sig) bucket (>= 40 rows -> k = 5) must expose
    # exactly k(k+1)/2 = 15 distinct salt-pair groups; cold buckets one
    sizes = groups.groupby(["band", "sig"])["vec_id"].nunique()
    gcounts = (
        groups[["band", "sig", "lo", "hi"]]
        .drop_duplicates()
        .groupby(["band", "sig"])
        .size()
    )
    import math

    for key, n_bucket in sizes.items():
        k = math.ceil(n_bucket / 8) if n_bucket > 8 else 1
        assert gcounts[key] == k * (k + 1) // 2, (key, n_bucket)


def test_quantized_cosine_stays_inside_tau_margin():
    """q74 reports cosine over MICRO-QUANTIZED vectors; the fixtures
    guarantee no pair within 1e-4 of tau, so membership matches the
    raw-double cosine iff quantization perturbs cos by far less. Bound
    check on random unit-scale vectors: |cos_q - cos_raw| < 3e-6."""
    import numpy as np

    rng = np.random.default_rng(8)
    v = rng.uniform(-0.6, 0.6, size=(200, 64))
    vq = np.floor(v * 1e6 + 0.5)
    nr = np.linalg.norm(v, axis=1)
    nq = np.sqrt((vq * vq).sum(axis=1))
    cr = (v @ v.T) / np.outer(nr, nr)
    cq = (vq @ vq.T) / np.outer(nq, nq)
    assert np.abs(cr - cq).max() < 3e-6


def test_rplsh_spark_path_invariant_to_verify_block(spark, sf_dir, monkeypatch):
    """End-to-end Spark check that the bucket kernel's block loop is
    invariant: q74 with a pathological 2-row verify block (every real
    bucket spans many blocks, exercising triangle/rectangle/ragged
    paths through the full Arrow round-trip) must emit exactly the
    default-config result."""
    from eprints_to_hyku_data_tool_spark.plans import q_embed

    base = set(
        map(tuple, q_embed.z13974_rplsh_neardup(spark, sf_dir).collect())
    )
    monkeypatch.setattr(q_embed, "_VERIFY_BLOCK", 2)
    tiny = set(
        map(tuple, q_embed.z13974_rplsh_neardup(spark, sf_dir).collect())
    )
    assert base == tiny and len(base) > 0


def test_cell_verifier_cross_group_semantics():
    """Float mirror of test_bucket_verifier_cross_group_semantics for
    the IVF cell kernel (round-9: the hot-group salting generalized to
    functions/skew.py::salted_pair_groups and retrofitted onto the IVF
    cells, which had the identical grouped-map residency cliff): a
    (lo != hi) frame is a CROSS group — only different-salt pairs; the
    diagonal and legacy salt-free frames keep all-pairs; blocking never
    changes the emitted set (row-blocked matmul of a once-normalized
    matrix computes the identical IEEE dot per pair)."""
    import numpy as np
    import pandas as pd

    from eprints_to_hyku_data_tool_spark.functions.skew import (
        make_group_runner,
    )
    from eprints_to_hyku_data_tool_spark.plans.q_north import _cell_verifier

    rng = np.random.default_rng(186)
    n, d, tau = 17, 8, 0.4
    base = rng.uniform(0.1, 1.0, size=d)
    m = np.stack(
        [base + rng.uniform(-0.01, 0.01, size=d) for _ in range(n)]
    )  # all-near-dup: every pair passes tau
    ids = np.arange(300, 300 + n, dtype=np.int64)
    salts = (ids % 3).astype(np.int64)
    all_pairs = {
        (int(ids[i]), int(ids[j])) for i in range(n) for j in range(i + 1, n)
    }
    cross_pairs = {
        (int(ids[i]), int(ids[j]))
        for i in range(n)
        for j in range(i + 1, n)
        if salts[i] != salts[j]
    }
    assert cross_pairs and cross_pairs != all_pairs

    def run(pdf, block=4):
        out = make_group_runner(_cell_verifier(block, tau))(pdf)
        return {(int(a), int(b)) for a, b in zip(out["id_a"], out["id_b"])}

    mk = lambda lo, hi: pd.DataFrame(  # noqa: E731
        {
            "cell": 3,
            "lo": lo,
            "hi": hi,
            "salt": salts,
            "vec_id": ids,
            "embedding": list(m),
        }
    )
    for block in (1, 3, 16, 64):
        assert run(mk(0, 2), block) == cross_pairs, f"block={block}"
        assert run(mk(1, 1), block) == all_pairs, f"block={block}"
    assert (
        run(pd.DataFrame({"vec_id": ids, "embedding": list(m)})) == all_pairs
    )
    # degenerate frames
    assert len(make_group_runner(_cell_verifier(4, tau))(mk(0, 2).iloc[:1])) == 0
    assert len(make_group_runner(_cell_verifier(4, tau))(mk(0, 2).iloc[:0])) == 0


def test_ivf_salted_split_matches_unsalted(spark):
    """End-to-end hot-CELL split: a degenerate assignment where one cell
    holds 40 near-identical vectors (the clustered-corpus case IVF is
    FOR — multi-assignment routinely concentrates a corpus's dominant
    cluster into one cell) must produce, under a tiny hot threshold
    forcing k = 5 sub-cells and a tiny verify block, EXACTLY the pair
    set of the unsalted plan; cold cells stay single-group and the hot
    cell exposes k(k+1)/2 salt-pair groups."""
    import math

    import numpy as np

    from eprints_to_hyku_data_tool_spark.functions.skew import (
        salted_pair_groups,
    )
    from eprints_to_hyku_data_tool_spark.plans.q_north import _ivf_cell_pairs

    rng = np.random.default_rng(69)
    hot_vec = rng.uniform(0.1, 1.0, size=16)
    rows = [
        (i, [float(x) for x in hot_vec + rng.uniform(-0.01, 0.01, 16)], 7)
        for i in range(40)
    ] + [
        (100 + i, [float(x) for x in rng.uniform(-1.0, 1.0, size=16)], i % 4)
        for i in range(16)
    ]
    assigned = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cell int"
    )

    unsalted = set(
        map(tuple, _ivf_cell_pairs(assigned, 0.4, 2048, 10**9).collect())
    )
    salted = set(map(tuple, _ivf_cell_pairs(assigned, 0.4, 5, 8).collect()))
    # the 40 near-identical vectors in cell 7 give C(40,2) = 780 pairs
    assert len(unsalted) >= 780
    assert salted == unsalted

    groups = salted_pair_groups(assigned, ("cell",), "vec_id", 8).toPandas()
    assert (groups["lo"] <= groups["hi"]).all()
    sizes = groups.groupby("cell")["vec_id"].nunique()
    gcounts = (
        groups[["cell", "lo", "hi"]].drop_duplicates().groupby("cell").size()
    )
    for cell, n_cell in sizes.items():
        k = math.ceil(n_cell / 8) if n_cell > 8 else 1
        assert gcounts[cell] == k * (k + 1) // 2, (cell, n_cell)


def test_derive_banding_schedule():
    """Size-driven RP-LSH banding (VERDICT r9 item 5): every fixture
    corpus keeps the measured 16x8 anchor; past it, bits grow +1 per
    doubling and bands ride the [16,26,41] << 2*(e//3) ladder — so the
    random-collision floor b/2^s strictly FALLS with corpus size (the
    fixed-config 6.85% plateau was the r9 refutation), while band count
    grows within 3% of the recall-preserving (1/p1)^e = 1.585^e curve."""
    from eprints_to_hyku_data_tool_spark.plans.q_embed import (
        derive_banding,
    )

    for n in (1, 100, 500, 2000, 2048):
        assert derive_banding(n) == (16, 8), n
    assert derive_banding(2049) == (26, 9)
    assert derive_banding(4096) == (26, 9)
    assert derive_banding(6000) == (41, 10)  # the 3x tier
    assert derive_banding(20000) == (104, 12)  # the 10x tier
    assert derive_banding(2048 * 8) == (64, 11)  # every 3rd step: x4

    prev_floor = 1.0
    prev_bands = None
    for e in range(0, 8):
        bands, bits = derive_banding(2048 * (1 << e))
        floor = bands / 2.0**bits
        assert floor < prev_floor or e == 0, (e, floor)
        if prev_bands is not None:
            growth = bands / prev_bands
            assert abs(growth - 1.585) / 1.585 < 0.04, (e, growth)
        prev_floor, prev_bands = floor, bands

    # Past e=7 the schedule needs more planes than the shared 8192 cap
    # (the oracle's range(0, 8192) enumeration error()s there too) and
    # _plane_weights would repeat at 131^2 — the Python side must fail
    # loudly at the SAME boundary, not silently derive duplicate planes
    # (code review r10).
    import pytest

    assert derive_banding(2048 * (1 << 7)) == (416, 15)  # 6240 <= cap
    with pytest.raises(ValueError, match="8192-plane cap"):
        derive_banding(2048 * (1 << 7) + 1)


def test_plane_family_block_extension():
    """Planes 0..130 must be bit-identical to the round-8 linear family
    (fixture signatures and every recorded artifact depend on it), and
    the block-quadratic extension must produce pairwise-distinct,
    roughly sign-balanced planes out to the 10x tier's 1248."""
    import numpy as np

    from eprints_to_hyku_data_tool_spark.plans.q_embed import (
        _plane_weights,
    )

    for p in range(131):
        legacy = [
            ((p * 73 + d * 151 + p * d * 53) % 131) - 65 for d in range(64)
        ]
        assert _plane_weights(p) == legacy, p

    planes = np.array([_plane_weights(p) for p in range(1248)])
    assert len({tuple(w) for w in planes.tolist()}) == 1248
    # no plane may be a pure affine shift of another mod 131 (the
    # failure mode the quadratic block term exists to prevent): the
    # d-difference sequence must differ for every pair in a sample
    diffs = np.diff(planes, axis=1) % 131
    assert len({tuple(r) for r in diffs.tolist()}) == 1248
    # sign balance: extension-block planes (p >= 131) must straddle
    # zero comfortably. The legacy range keeps its two known quirks
    # (p=54: stride 0 -> constant weights; p=96: stride -1 -> a
    # non-positive ramp) — they are part of the measured 16x8 family
    # and must NOT be "fixed" (fixture signatures depend on them).
    pos_frac = (planes[131:] > 0).mean(axis=1)
    assert (pos_frac > 0.25).all() and (pos_frac < 0.75).all()


def test_rplsh_derived_config_parity_above_anchor(spark, tmp_path):
    """End-to-end cross-engine parity in the DERIVED-banding regime: a
    synthetic corpus of 2500 > 2048 vectors makes both engines derive
    26x9 (e=1) — the Spark plan via derive_banding(count), the oracle
    via its params CTE — and their near-dup pair sets must still match
    exactly. This is the test that the formula (not just the 16x8
    literals) is shared."""
    import numpy as np

    import __spark_entry__ as entry_mod
    from eprints_to_hyku_data_tool_spark.plans.q_embed import (
        derive_banding,
    )

    assert derive_banding(2500) == (26, 9)
    rng = np.random.default_rng(10)
    base = rng.uniform(-0.5, 0.5, size=(50, 64))
    rows = []
    for i in range(2500):
        # 50 clusters of 50 near-identical vectors: plenty of true
        # near-dups for the pair set to be non-trivial
        v = base[i % 50] + rng.uniform(-0.005, 0.005, size=64)
        rows.append((i, [float(x) for x in v], i % 3))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out_dir = str(tmp_path / "embeddings.parquet")
    emb.coalesce(4).write.parquet(out_dir)

    import duckdb

    con = duckdb.connect()  # own catalog: never clobber the duck fixture
    con.execute(
        f"CREATE OR REPLACE VIEW embeddings AS "
        f"SELECT * FROM '{out_dir}/*.parquet'"
    )
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    sdf = qs["z13974_rplsh_neardup"](spark, str(tmp_path))
    from .parity import assert_parity

    assert_parity(sdf, osql["z13974_rplsh_neardup"], con, "z874-derived")
    assert sdf.count() > 0


def test_derive_banding_sql_formula_agrees_with_python():
    """The z874 oracle's params CTE and derive_banding() must agree at
    EVERY corpus size, not just the fixture and the one tested derived
    point — run the exact SQL fragment from the registered oracle
    against synthetic counts and compare. Guards both ladders drifting
    apart in a future retune."""
    import duckdb
    import pytest

    import __spark_entry__ as entry_mod
    from eprints_to_hyku_data_tool_spark.plans.q_embed import (
        derive_banding,
    )

    sql = entry_mod.oracle_sql()["z13974_rplsh_neardup"]
    # lift the params CTE verbatim out of the registered oracle
    start = sql.index("params AS (")
    depth = 0
    for i in range(start + len("params AS "), len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                params_cte = sql[start : i + 1]
                break
    con = duckdb.connect()

    def sql_params(n):
        # a COUNT(*)-equals-n stand-in without materializing n rows
        cte = params_cte.replace(
            "(SELECT COUNT(*) FROM embeddings)", str(n)
        )
        return con.execute(
            f"WITH {cte} SELECT bits, bands FROM params"
        ).fetchone()

    for n in (1, 2, 500, 2000, 2048, 2049, 4096, 6000, 20000,
              2048 * 128):
        bits, bands = sql_params(n)
        assert (int(bands), int(bits)) == derive_banding(n), n
    # past the shared 8192-plane cap (e >= 8, i.e. n > 2048 * 2^7) BOTH
    # engines must FAIL LOUDLY at the same boundary, never silently
    # truncate or duplicate the banding (no-silent-caps rule; the
    # Python-side mirror is code review r10)
    for n in (10**6, 10**9):
        with pytest.raises(ValueError, match="8192-plane cap"):
            derive_banding(n)
        with pytest.raises(Exception, match="plane count exceeds"):
            sql_params(n)


def test_consolidated_verify_invariant_under_group_count(spark):
    """The coarse verify's pair set must be invariant to n_groups — in
    particular n_groups=1 forces EVERY bucket (hot-salted cross and
    diagonal runs included) into one multi-run frame, the run-splitting
    path fixture-scale gid hashing barely exercises; n_groups=7 gives
    mixed frames. Both must equal the effectively-per-bucket plan AND
    the unsalted plan."""
    import numpy as np

    from eprints_to_hyku_data_tool_spark.plans.q_embed import (
        _rp_signatures,
        _salted_bucket_verify,
    )

    rng = np.random.default_rng(74)
    hot_vec = rng.uniform(-0.5, 0.5, size=64)
    rows = [(i, [float(x) for x in hot_vec]) for i in range(40)] + [
        (100 + i, [float(x) for x in rng.uniform(-0.5, 0.5, size=64)])
        for i in range(16)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sigs = _rp_signatures(emb)

    def run(hot_rows, n_groups):
        return set(
            map(
                tuple,
                _salted_bucket_verify(
                    sigs, 5, 0.4, hot_rows, n_groups
                ).collect(),
            )
        )

    unsalted_many = run(10**9, 4096)
    assert len(unsalted_many) >= 780
    assert run(10**9, 1) == unsalted_many
    assert run(8, 1) == unsalted_many
    assert run(8, 7) == unsalted_many
    assert run(8, 4096) == unsalted_many


def test_derive_simhash_blocking_schedule():
    """Size-driven SimHash blocking (round 11): at the 8192-doc anchor
    the C(5,4) keep-masks are EXACTLY the legacy single-block keys
    (fixture artifacts depend on those buckets); past it B grows +1 per
    doubling, every B's blocks partition the 32 signature bits, every
    keep-mask keeps exactly B-4 whole blocks, and the B = 12 cap raises
    loudly (no silent caps — past it the honest fix is a wider
    signature, not more blocks)."""
    import pytest

    from eprints_to_hyku_data_tool_spark.plans.q_north import (
        SIMHASH_ANCHOR,
        SIMHASH_MAX_E,
        _simhash_block_masks,
        derive_simhash_blocking,
    )

    legacy = _simhash_block_masks(5)
    for n in (1, 100, 5000, 8192):
        assert sorted(derive_simhash_blocking(n)) == sorted(legacy), n
    # B = 5 + e, C(B, 4) masks per tier; key bits strictly grow
    from math import comb

    prev_key_bits = 0
    for e in range(0, SIMHASH_MAX_E + 1):
        n = SIMHASH_ANCHOR << e
        keeps = derive_simhash_blocking(n)
        b = 5 + e
        assert len(keeps) == comb(b, 4), (e, len(keeps))
        masks = _simhash_block_masks(b)
        # blocks partition the 32 bits
        assert sum(masks) == (1 << 32) - 1
        acc = 0
        for m in masks:
            assert acc & m == 0
            acc |= m
        # every keep-mask is a union of exactly b-4 whole blocks
        for k in keeps:
            parts = [m for m in masks if k & m]
            assert len(parts) == b - 4 and sum(parts) == k, (e, k)
        key_bits = min(bin(k).count("1") for k in keeps)
        # floor-split block sizes make the MIN key width plateau between
        # some adjacent tiers (B=8 and B=9 both floor at 16) — require
        # non-decreasing, and overall growth is asserted after the loop
        assert key_bits >= prev_key_bits, (e, key_bits)
        prev_key_bits = key_bits
    assert prev_key_bits >= 20  # B = 12 keeps >= 20 of the 32 bits
    with pytest.raises(ValueError, match="widen the signature"):
        derive_simhash_blocking((SIMHASH_ANCHOR << SIMHASH_MAX_E) + 1)


# --------------------------------------------------------------------------
# Ledger-table format: model-based op-sequence property
# --------------------------------------------------------------------------
_ledger_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=0,
    max_size=15,
)

_ledger_op = st.one_of(
    st.tuples(st.just("append"), _ledger_rows),
    st.tuples(
        st.just("merge"),
        st.dictionaries(
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=-100, max_value=100),
            max_size=8,
        ),
    ),
    st.tuples(st.just("delete"), st.integers(min_value=2, max_value=5)),
    st.tuples(st.just("compact"), st.just(None)),
    st.tuples(st.just("optimize"), st.just(None)),
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(init=_ledger_rows, ops=st.lists(_ledger_op, max_size=4))
def test_ledger_op_sequences_match_model(spark, tmp_path_factory, init, ops):
    """Model-based check of the ledger table format: any sequence of
    append / merge / delete_where / compact / optimize_zorder commits
    must keep the latest snapshot equal to a plain in-memory multiset
    model, every version must stay readable (time travel), and
    expire+vacuum at the end must not change the latest snapshot.
    Layout ops (compact/optimize) must be row-identical no-ops in the
    model."""
    from eprints_to_hyku_data_tool_spark.sources import ledger

    t = str(tmp_path_factory.mktemp("ledgerprop") / "t")
    schema = "k int, v int"
    ledger.create(spark, t, spark.createDataFrame(init, schema), key="k")
    model = list(init)
    snapshots = [sorted(model)]

    def check():
        got = sorted(
            (r.k, r.v) for r in ledger.read(spark, t).collect()
        )
        assert got == sorted(model)

    check()
    for op, arg in ops:
        if op == "append":
            ledger.append(spark, t, spark.createDataFrame(arg, schema))
            model.extend(arg)
        elif op == "merge":
            src = spark.createDataFrame(list(arg.items()), schema)
            ledger.merge(spark, t, src)
            keys = set(arg)
            model[:] = [r for r in model if r[0] not in keys]
            model.extend(arg.items())
        elif op == "delete":
            ledger.delete_where(spark, t, f"k % {arg} = 0")
            model[:] = [r for r in model if r[0] % arg != 0]
        elif op == "compact":
            ledger.compact(spark, t, max_rows=10)
        elif op == "optimize":
            ledger.optimize_zorder(spark, t, ["v"], target_rows=10)
        check()
        snapshots.append(sorted(model))

    # Time travel: every committed version still reads as its own state.
    for v, want in enumerate(snapshots):
        got = sorted(
            (r.k, r.v)
            for r in ledger.read(spark, t, version=v).collect()
        )
        assert got == want, f"version {v}"

    # History cleanup must not disturb the latest snapshot.
    ledger.expire_history(t, keep_last=1)
    ledger.vacuum(t, group_retention_s=0)
    check()


def test_ordering_rejects_reserved_and_nonintegral(spark):
    """code-review r13: ordering helpers must reject inputs that clash
    with their internal columns (silent overwrite) and a non-integral
    cumsum value column (partition-layout-dependent truncation)."""
    import pytest
    from pyspark.sql import functions as F

    from eprints_to_hyku_data_tool_spark.functions.ordering import (
        with_global_cumsum,
        with_global_position,
    )

    clash = spark.createDataFrame([(1, 2)], "k long, __pid long")
    with pytest.raises(ValueError, match="__pid"):
        with_global_position(clash, [F.col("k")])
    dbl = spark.createDataFrame([(1, 0.5)], "k long, v double")
    with pytest.raises(ValueError, match="integral"):
        with_global_cumsum(dbl, [F.col("k")], "v")


def test_global_position_mid_ranks_under_reuse_off(spark):
    """r15 kernel rewrite (local ranks from monotonically_increasing_id
    instead of a per-__pid rank window): positions must stay an exact
    permutation of 1..n under spark.sql.exchange.reuse=false — the
    double-evaluation hazard the persist() pin exists for, now with a
    NONDETERMINISTIC id expression in the pinned projection (the pin's
    cache canonicalization is what keeps both consumers reading the
    same materialized ids)."""
    from pyspark.sql import functions as F

    from eprints_to_hyku_data_tool_spark.functions import ordering

    old = spark.conf.get("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        df = spark.range(0, 5000).withColumn(
            "k", (F.col("id") * 2654435761) % 1000003
        )
        out = ordering.with_global_position(df, [F.col("k"), F.col("id")])
        rows = out.collect()
        assert sorted(r["position"] for r in rows) == list(range(1, 5001))
        by_key = sorted(rows, key=lambda r: (r["k"], r["id"]))
        assert [r["position"] for r in by_key] == list(range(1, 5001))
    finally:
        spark.conf.set("spark.sql.exchange.reuse", old)
        ordering.release_pins()


def test_global_position_overflow_guard_fires(spark, monkeypatch):
    """The per-range-partition row_number 2^31 guard raises with a
    remedy instead of wrapping; pinned by shrinking the limit so a
    fixture-size partition trips it."""
    import pytest
    from pyspark.sql import functions as F

    from eprints_to_hyku_data_tool_spark.functions import ordering

    monkeypatch.setattr(ordering, "_MAX_PARTITION_ROWS", 3)
    df = spark.createDataFrame([(i,) for i in range(50)], "k long").coalesce(1)
    out = ordering.with_global_position(df, [F.col("k")])
    with pytest.raises(Exception, match="finer range split"):
        out.collect()


def test_ordering_pin_lifecycle_release(spark):
    """The persist() pin's probed lifecycle (code-review r15, second
    pass): the CacheManager holds a STRONG reference, so a pin survives
    Python GC of every frame that created it — a long-lived session
    accumulates one cached sort per kernel call — and the explicit
    batch-boundary release_pins() is what frees it (auto-release on GC
    would re-open the reuse=false double-sampling hazard on a pending
    derived plan). Pins the leak, the release, its idempotence, and
    correctness of a fresh call after release."""
    import gc

    from pyspark.sql import functions as F

    from eprints_to_hyku_data_tool_spark.functions import ordering

    ordering.release_pins()  # clean slate (earlier tests may have pinned)
    jsc = spark.sparkContext._jsc.sc()
    base_cached = jsc.getPersistentRDDs().size()

    df = spark.range(0, 1000).withColumn("k", F.col("id") % 3)
    out = ordering.with_global_position(df, [F.col("id")])
    rows = out.collect()
    assert [
        r["position"] for r in sorted(rows, key=lambda r: r["id"])
    ] == list(range(1, 1001))

    del df, out, rows
    gc.collect()
    assert jsc.getPersistentRDDs().size() > base_cached, (
        "pin should SURVIVE Python GC (CacheManager strong ref) — if "
        "this starts failing, Spark's cache lifecycle changed and the "
        "ordering docstring/release contract must be re-derived"
    )
    assert ordering.release_pins() >= 1
    assert ordering.release_pins() == 0  # idempotent; registry drained
    assert jsc.getPersistentRDDs().size() == base_cached

    out2 = ordering.with_global_position(
        spark.range(0, 100).select(F.col("id")), [F.col("id")]
    )
    assert sorted(r["position"] for r in out2.collect()) == list(
        range(1, 101)
    )
    ordering.release_pins()


def test_similarity_chunked_size_driven_equals_explicit(spark, sf_dir):
    """Default (size-driven) n_chunks must produce exactly the explicit
    fixed-chunk pair set — the chunk count is a layout knob, never a
    semantic one (code-review r13 made the default size-driven)."""
    from eprints_to_hyku_data_tool_spark.functions.vectors import (
        similarity_pairs_chunked,
    )
    from eprints_to_hyku_data_tool_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    auto = set(
        map(tuple, similarity_pairs_chunked(emb, 0.2, spark).collect())
    )
    fixed = set(
        map(
            tuple,
            similarity_pairs_chunked(emb, 0.2, spark, n_chunks=3).collect(),
        )
    )
    assert auto == fixed and len(auto) > 0


def test_similarity_chunked_rejects_duplicate_vec_ids(spark, sf_dir):
    """code-review r15: duplicate vec_ids all hash to one chunk, where the
    diagonal group's ids < ids orientation filter silently DROPPED their
    pairs from the "exact" result. The kernel must raise instead."""
    import pytest

    from eprints_to_hyku_data_tool_spark.functions.vectors import (
        similarity_pairs_chunked,
    )
    from eprints_to_hyku_data_tool_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    dirty = emb.union(emb.limit(1))  # one re-ingested row
    with pytest.raises(Exception, match="duplicate vec_id"):
        similarity_pairs_chunked(dirty, 0.2, spark, n_chunks=3).collect()


def test_similarity_chunked_fanout_is_in_plan(spark, sf_dir):
    """code-review r15: the chunk-pair membership used to be a
    driver-built O(C^3) Python list broadcast to every executor — at the
    size-driven C for 1e8 rows, days of driver CPU before any Spark
    work. The fan-out must live in the plan (explode over a sequence),
    leaving NO local-relation scan or broadcast exchange."""
    import contextlib
    import io as _io

    from eprints_to_hyku_data_tool_spark.functions.vectors import (
        similarity_pairs_chunked,
    )
    from eprints_to_hyku_data_tool_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    out = similarity_pairs_chunked(emb, 0.2, spark, n_chunks=4)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastExchange" not in plan, plan
    assert "LocalTableScan" not in plan, plan
    assert "Generate" in plan, plan  # the explode fan-out


def test_global_position_correct_without_exchange_reuse(spark, sf_dir):
    """code-review r15: the offsets aggregate and the final join both
    embedded the repartitionByRange subtree, so correct positions relied
    on Catalyst REUSING that exchange — with spark.sql.exchange.reuse
    disabled (a real debugging/AQE-workaround knob) each side could run
    its own RangePartitioner sampling and join offsets against the wrong
    partition populations, silently. The ranked subplan is now pinned
    once (lazy checkpoint); positions must be exact either way."""
    from pyspark.sql import functions as F

    from eprints_to_hyku_data_tool_spark.functions.ordering import (
        with_global_cumsum,
        with_global_position,
    )
    from eprints_to_hyku_data_tool_spark.sources.tables import load_table

    prev = spark.conf.get("spark.sql.exchange.reuse", "true")
    try:
        spark.conf.set("spark.sql.exchange.reuse", "false")
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_quantity"
        ).limit(20000)
        pos = with_global_position(
            li, [F.col("l_orderkey"), F.col("l_linenumber")]
        )
        rows = pos.select("l_orderkey", "l_linenumber", "position").collect()
        want = sorted(
            ((r["l_orderkey"], r["l_linenumber"]) for r in rows)
        )
        got = [
            (r["l_orderkey"], r["l_linenumber"])
            for r in sorted(rows, key=lambda r: r["position"])
        ]
        assert got == want
        assert sorted(r["position"] for r in rows) == list(
            range(1, len(rows) + 1)
        )

        # cumsum needs UNIQUE order keys (documented precondition; the
        # fixture's (l_orderkey, l_linenumber) is not unique), so use a
        # deterministic synthetic series spread over many partitions.
        syn = (
            spark.range(0, 20000)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % 7).cast("long").alias("v"),
            )
            .repartition(13)
        )
        cum = with_global_cumsum(syn, [F.col("k")], "v")
        crows = cum.collect()
        running = 0
        want_cum = {}
        for r in sorted(crows, key=lambda r: r["k"]):
            want_cum[r["k"]] = running
            running += r["v"]
        assert all(want_cum[r["k"]] == r["cumsum"] for r in crows)
    finally:
        spark.conf.set("spark.sql.exchange.reuse", prev)
