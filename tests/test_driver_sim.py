"""Driver-contract simulation: the grading driver imports
``__spark_entry__`` from an ARBITRARY working directory with only
``sys.path.insert(0, repo)`` — nothing guarantees the executors' python
workers can import this package. A module-level function handed to
``applyInPandas``/``mapInPandas`` is cloudpickled BY REFERENCE
(module + qualname) and explodes on the worker with
ModuleNotFoundError, while a closure ships by value and works anywhere.

Round 8 hit exactly this: the RP-LSH bucket-verify kernel was defined
at module level and passed repo-cwd pytest while failing the non-repo
driver sim. This test runs the sim in a subprocess from a temp cwd so
the failure class stays caught: the flagship entry() plus every
registered query whose module uses applyInPandas/mapInPandas executes
end-to-end at sf0.001. Representatives are selected per QUERY (any
applyInPandas/mapInPandas/pandas_udf in the fn's own source), with a
per-module fallback for helper-hosted kernels — not per-module-first-name,
which could shadow the at-risk kernels behind pure-Catalyst siblings.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SIM = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, __REPO__)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    import inspect

    import __spark_entry__ as e

    assert len(e.entry(spark).collect()) > 0

    from eprints_to_hyku_data_tool_spark.plans.registry import (
        REGISTRY,
        _load_all,
    )

    _load_all()
    # Every query that hands python callables to executors (grouped-map /
    # map-iter / scalar-arrow UDFs) must execute end-to-end. Representatives
    # are chosen by each query fn's OWN source, not its module's: a module's
    # first sorted name can be a pure-Catalyst query that never exercises
    # the pickling path (the round-8 advice gap — q237 shadowed the q74
    # kernel). Modules whose markers live only in shared helpers (e.g. the
    # multimodal decoders) fall back to running all their registered
    # queries, so helper-level kernels stay covered too.
    MARKERS = ("applyInPandas", "mapInPandas", "pandas_udf")
    to_run = {}
    fallback_mods = set()
    for name, spec in sorted(REGISTRY.items()):
        msrc = inspect.getsource(sys.modules[spec.fn.__module__])
        if not any(m in msrc for m in MARKERS):
            continue
        try:
            fsrc = inspect.getsource(spec.fn)
        except (OSError, TypeError):
            fsrc = ""
        if any(m in fsrc for m in MARKERS):
            to_run[name] = spec
        else:
            fallback_mods.add(spec.fn.__module__)
    covered_mods = {s.fn.__module__ for s in to_run.values()}
    for name, spec in sorted(REGISTRY.items()):
        if spec.fn.__module__ in fallback_mods - covered_mods:
            to_run[name] = spec
    assert len(to_run) >= 11, sorted(to_run)
    for name, spec in sorted(to_run.items()):
        df = spec.fn(spark, "/root/testdata/sf0.001")
        if df.isStreaming:
            continue
        df.write.format("noop").mode("overwrite").save()
        print("driver-sim ok:", name, flush=True)
    spark.stop()
    print("DRIVER_SIM_PASS")
    """
).replace("__REPO__", repr(_REPO))


_SALTED_SIM = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, __REPO__)
    import numpy as np
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    # The salted sub-bucket kernels only activate past the hot-group
    # thresholds (_HOT_BUCKET_ROWS / _IVF_HOT_CELL_ROWS), which fixture
    # corpora never reach — so the general sim above never ships the
    # salted wrapper closures. Force them with the tiny-threshold
    # fixtures the property tests use, from this foreign cwd, and pin
    # the pair-set equality too (a pickling break OR a wrapper that
    # loses the salt rule would both fail here).
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
    assert len(unsalted) >= 780 and salted == unsalted
    print("driver-sim ok: forced-hot ivf cells", flush=True)

    from eprints_to_hyku_data_tool_spark.plans.q_embed import (
        _salted_bucket_verify,
    )

    base = rng.integers(10**5, 10**6, size=8)
    sigs_rows = [
        (
            i,
            [int(x) for x in base + rng.integers(-500, 500, size=8)],
            int(b),
            3,
        )
        for i in range(30)
        for b in range(2)
    ]
    sigs = spark.createDataFrame(
        sigs_rows, "vec_id long, vq array<long>, band int, sig long"
    )
    plain = set(
        map(tuple, _salted_bucket_verify(sigs, 2048, 0.4, 10**9).collect())
    )
    split = set(map(tuple, _salted_bucket_verify(sigs, 5, 0.4, 8).collect()))
    assert len(plain) > 0 and split == plain
    print("driver-sim ok: forced-hot rplsh buckets", flush=True)
    spark.stop()
    print("DRIVER_SIM_SALTED_PASS")
    """
).replace("__REPO__", repr(_REPO))


def test_forced_hot_salted_kernels_run_from_foreign_cwd(tmp_path):
    """VERDICT r9 item 6: the salted grouped-map kernels (wrapper +
    pair_keep closures) must survive cloudpickle from a non-repo cwd,
    and their forced-hot pair sets must equal the unsalted plan's."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "-c", _SALTED_SIM],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0 and "DRIVER_SIM_SALTED_PASS" in proc.stdout, (
        proc.stdout[-2000:] + "\n--- stderr ---\n" + proc.stderr[-3000:]
    )


def test_entry_and_udf_queries_run_from_foreign_cwd(tmp_path):
    env = dict(os.environ)
    # The sim must rely on sys.path.insert alone, like the driver does.
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "-c", _SIM],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0 and "DRIVER_SIM_PASS" in proc.stdout, (
        proc.stdout[-2000:] + "\n--- stderr ---\n" + proc.stderr[-3000:]
    )


_LEDGER_SIM = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, __REPO__)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    from eprints_to_hyku_data_tool_spark.sources import ledger
    from eprints_to_hyku_data_tool_spark.sources.ledger_stream import (
        register_ledger_source, LedgerDataSource,
    )

    t = "TABLE_DIR"
    ledger.create(
        spark,
        t,
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        key="k",
    )
    ledger.append(
        spark, t, spark.createDataFrame([(3, "c")], "k long, v string")
    )

    if "NEGATIVE" in sys.argv:
        # Register WITHOUT the by-value pickling: the class ships to the
        # python workers by module reference, which they cannot import
        # from this foreign cwd — the read must FAIL (this arm proves
        # the sim detects the regression the positive arm guards).
        spark.dataSource.register(LedgerDataSource)
        try:
            spark.read.format("ledger").load(t).collect()
        except Exception:
            print("LEDGER_SIM_NEGATIVE_FAILED_AS_EXPECTED")
            spark.stop()
            sys.exit(0)
        print("LEDGER_SIM_NEGATIVE_UNEXPECTED_PASS")
        sys.exit(1)

    register_ledger_source(spark)
    # Batch read through the Python DataSource.
    rows = sorted(
        (r["k"], r["v"])
        for r in spark.read.format("ledger").load(t).collect()
    )
    assert rows == [(1, "a"), (2, "b"), (3, "c")], rows
    print("ledger-sim ok: batch read", flush=True)

    # Streaming read: replay history, then one live micro-batch.
    q = (
        spark.readStream.format("ledger")
        .option("startingVersion", 0)
        .load(t)
        .writeStream.format("memory")
        .queryName("ledger_sim")
        .option(
            "checkpointLocation", t + "_ckpt"
        )
        .start()
    )
    q.processAllAvailable()
    ledger.append(
        spark, t, spark.createDataFrame([(4, "d")], "k long, v string")
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r["k"], r["v"]) for r in spark.sql("SELECT * FROM ledger_sim").collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")], got
    print("ledger-sim ok: stream replay + live batch", flush=True)
    spark.stop()
    print("LEDGER_SIM_PASS")
    """
).replace("__REPO__", repr(_REPO))


def test_ledger_datasource_runs_from_foreign_cwd(tmp_path):
    """VERDICT r12 item 4: the format('ledger') Python DataSource is
    pickled into python workers — repo-cwd tests mask by-reference
    pickling regressions (the r8 lesson), so this rep registers the
    source from a NON-repo cwd with no PYTHONPATH and runs one batch
    read plus a replay + live micro-batch of the stream."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    sim = _LEDGER_SIM.replace("TABLE_DIR", str(tmp_path / "tbl"))
    proc = subprocess.run(
        [sys.executable, "-c", sim],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0 and "LEDGER_SIM_PASS" in proc.stdout, (
        proc.stdout[-2000:] + "\n--- stderr ---\n" + proc.stderr[-3000:]
    )


def test_ledger_datasource_sim_detects_pickling_regression(tmp_path):
    """The rep is only worth having if it FAILS when by-value pickling
    regresses: registering the class without register_ledger_source's
    by-value registration must break the foreign-cwd read."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    sim = _LEDGER_SIM.replace("TABLE_DIR", str(tmp_path / "tbl"))
    proc = subprocess.run(
        [sys.executable, "-c", sim, "NEGATIVE"],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0 and (
        "LEDGER_SIM_NEGATIVE_FAILED_AS_EXPECTED" in proc.stdout
    ), proc.stdout[-2000:] + "\n--- stderr ---\n" + proc.stderr[-3000:]


def test_entry_module_loads_by_file_location(tmp_path):
    """code-review r14: a driver that loads __spark_entry__.py via
    importlib.util.spec_from_file_location from an arbitrary cwd has no
    reason to have the repo root on sys.path — the module must
    bootstrap its own package import (bench.py already did; the entry
    module did not). Run in a subprocess with a foreign cwd and a
    sys.path scrubbed of the repo root."""
    import subprocess
    import sys

    code = (
        "import importlib.util, sys\n"
        "sys.path = [p for p in sys.path if 'repo' not in p]\n"
        "spec = importlib.util.spec_from_file_location("
        "'__spark_entry__', '/root/repo/__spark_entry__.py')\n"
        "mod = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(mod)\n"
        "qs = mod.queries(); osql = mod.oracle_sql()\n"
        "assert len(qs) == len(osql) > 0\n"
        "print('FILE-LOCATION-LOAD-OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "FILE-LOCATION-LOAD-OK" in proc.stdout
