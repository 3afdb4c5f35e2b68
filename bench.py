"""Benchmark harness (driver contract).

Runs every query declared in ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints exactly ONE JSON line:

    {"metric": "total_wall", "value": <sum-sec>, "unit": "sec",
     "queries": {"<name>": <sec>, ...}, "sf": <sf>, "repeat": N}

Execution is forced with the `noop` sink (full plan runs, nothing is
collected to the driver) so timings measure the whole pipeline, not just
the first partition of a collect. Warm-up: one trivial count to amortize
session/JVM start-up out of the per-query numbers.

Noise control (round-4 verdict): this host is a microVM with visible CPU
steal — a single pass can be contaminated several-fold by contention that
has nothing to do with the engine (BASELINE.md measures min-of-runs for
exactly this reason). The harness therefore runs ``--repeat N`` full
passes (default 3, env ``SPARK_GRAFT_BENCH_REPEAT``) and reports the
per-query MINIMUM across passes; passes are interleaved (whole suite per
pass, not N back-to-back runs of one query) so a multi-minute steal burst
cannot contaminate every sample of any query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--repeat",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")),
        help="full suite passes; per-query min is reported (default 3)",
    )
    args = parser.parse_args()
    repeat = max(1, args.repeat)

    from vector_search_test_spark.session import get_session

    import __spark_entry__ as entrymod

    spark = get_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footer reads + MLlib class-loading/codegen out
    # of the timed path (first KMeans.fit in a JVM costs ~8 s of one-time
    # class loading; steady-state fit at this SF is ~2 s)
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    warm = spark.createDataFrame(
        [([float(i), float(i % 3)],) for i in range(16)], "embedding array<float>"
    ).select(array_to_vector("embedding").alias("features"))
    KMeans(k=2, seed=1, maxIter=2).fit(warm)

    timings: dict[str, float] = {}
    for _ in range(repeat):
        for name, fn in entrymod.queries().items():
            if timings.get(name) == -1.0:
                continue  # errored in an earlier pass; don't re-raise N times
            t0 = time.perf_counter()
            try:
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                elapsed = round(time.perf_counter() - t0, 4)
                prev = timings.get(name)
                timings[name] = elapsed if prev is None else min(prev, elapsed)
            except Exception:
                traceback.print_exc(file=sys.stderr)
                timings[name] = -1.0
            # isolate queries: drop cached intermediates an operator pinned
            # (cross-query cache pressure skews timings)
            spark.catalog.clearCache()
        # between passes, forget process-lifetime memos (IVF builds,
        # cluster pipeline, staging copies): min-of-N must time the
        # pipeline each pass, like BASELINE.md's min over fresh processes
        # — clearCache() touches neither localCheckpoints nor dict memos
        entrymod.reset_memos()

    total = round(sum(v for v in timings.values() if v >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
                "repeat": repeat,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
