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
end-to-end at sf0.001.
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
    sys.path.insert(0, {repo!r})
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
    # Every module that hands python callables to executors (grouped-map /
    # map-iter UDFs) gets one representative query executed end-to-end.
    seen_modules = set()
    for name, spec in sorted(REGISTRY.items()):
        mod = sys.modules[spec.fn.__module__]
        src = inspect.getsource(mod)
        if "applyInPandas" not in src and "mapInPandas" not in src:
            continue
        if spec.fn.__module__ in seen_modules:
            continue
        df = spec.fn(spark, "/root/testdata/sf0.001")
        if df.isStreaming:
            continue
        df.write.format("noop").mode("overwrite").save()
        seen_modules.add(spec.fn.__module__)
        print("driver-sim ok:", name, flush=True)
    spark.stop()
    print("DRIVER_SIM_PASS")
    """
).format(repo=_REPO)


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
