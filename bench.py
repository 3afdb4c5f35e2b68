"""Benchmark harness (driver contract).

Runs every query declared in ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints exactly ONE JSON line:

    {"metric": "total_wall", "value": <sum-sec>, "unit": "sec",
     "sf": <sf>, "repeat": N, "scored50": <sum-sec over the first 50
     entries — the driver-scored set BASELINE.md compares>,
     "queries": {"<name>": <sec>, ...}, ...}

Artifact-size discipline (VERDICT r6 #1): with 75+ entries the old
single line outgrew the driver's stdout tail-capture window and the
recorded BENCH_r06.json came back `parsed: null` — the head of the
line (total_wall + the first per-query numbers) was simply cut off.
The printed line is therefore kept SHORT and totals-FIRST: scalars
lead, the per-query dict is restricted to the scored-50 entries at
2-decimal precision with compact separators, and if even that would
exceed the capture budget the dict is dropped from stdout entirely.
The FULL per-query detail (all entries, 4-decimal, per-pass minima)
is always written to the ``BENCH.local.json`` sidecar next to this
file, so nothing is lost — only the stdout line is bounded.

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

Stage split (VERDICT r8 next-#1): multi-stage probe entries record
their eager build stages in ``__spark_entry__.STAGE_TIMES``; the
harness subtracts them from the wall total and reports the lazy
search-side remainder per stage-reporting entry (sidecar ``stages``
field + a compact stdout scalar for ivfpq_bigscale). The build side
(fan-out + encode + partitioned parquet WRITE) carries fs timing
jitter that is environment noise; the search side is the trend line.

Regression tripwire (VERDICT r8 next-#2): scored-50 rotations have made
round-over-round TOTALS incomparable twice — the real signal is
per-entry. Before overwriting the sidecar the harness diffs the fresh
per-query minima against the COMMITTED previous ``BENCH.local.json``
and prints a ``regressed`` field: entries slower by BOTH >25% and
>0.5 s. Expected empty; a non-empty list is the per-entry regression
the totals can hide.
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
    parser.add_argument(
        "--only",
        nargs="+",
        default=None,
        metavar="ENTRY",
        help="time only these entries (diagnostic runs, e.g. chasing a "
        "regression tripwire); the sidecar is NOT overwritten and the "
        "tripwire still diffs against it, so a focused re-run can "
        "confirm or clear a flagged entry without re-pinning anything",
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

    # previous committed sidecar (pre-overwrite) feeds the tripwire
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH.local.json"
    )
    prev_q: dict[str, float] = {}
    try:
        with open(sidecar) as f:
            prev_q = json.load(f).get("queries", {})
    except (OSError, ValueError):
        pass

    timings: dict[str, float] = {}
    stages: dict[str, dict[str, float]] = {}
    # per-pass totals (VERDICT r10 next-#5): the sidecar records what each
    # full pass cost, not just the per-entry minima — so drift claims
    # ("driver saw 98 s, builder saw 85 s") are evidence-backed by the
    # pass-to-pass spread instead of narrated
    passes: list[float] = []
    only = set(args.only) if args.only else None
    if only:
        unknown = only - set(entrymod.queries())
        if unknown:
            print(f"unknown entries: {sorted(unknown)}", file=sys.stderr)
            return 1
    # entries actually timed per pass (ADVICE r11): an errored entry is
    # excluded from later passes, so pass totals after a failure cover a
    # smaller set — the count makes each pass self-describing instead of
    # silently incomparable
    pass_counts: list[int] = []
    for _ in range(repeat):
        pass_total = 0.0
        pass_n = 0
        for name, fn in entrymod.queries().items():
            if only is not None and name not in only:
                continue
            if timings.get(name) == -1.0:
                continue  # errored in an earlier pass; don't re-raise N times
            getattr(entrymod, "STAGE_TIMES", {}).pop(name, None)
            t0 = time.perf_counter()
            try:
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                elapsed = round(time.perf_counter() - t0, 4)
                pass_total += elapsed
                pass_n += 1
                prev = timings.get(name)
                if prev is None or elapsed < prev:
                    timings[name] = elapsed
                    # stage split for the pass that set the min: the
                    # search side is the wall total minus the eager
                    # build stages the entry recorded
                    st = getattr(entrymod, "STAGE_TIMES", {}).get(name)
                    if st:
                        stages[name] = dict(st)
                        stages[name]["search"] = round(
                            elapsed - sum(st.values()), 4
                        )
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
        passes.append(round(pass_total, 4))
        pass_counts.append(pass_n)

    total = round(sum(v for v in timings.values() if v >= 0), 4)
    scored_names = list(timings)[:50]  # driver scores the first 50 entries
    scored50 = round(
        sum(timings[n] for n in scored_names if timings[n] >= 0), 4
    )
    # tripwire: per-entry regression vs the committed previous sidecar
    # (>25% AND >0.5 s slower — below that is microVM steal noise)
    regressed = sorted(
        n
        for n, v in timings.items()
        if v >= 0
        and prev_q.get(n, -1.0) >= 0
        and v > prev_q[n] * 1.25
        and v - prev_q[n] > 0.5
    )
    if only is None:
        with open(sidecar, "w") as f:
            json.dump(
                {
                    "metric": "total_wall",
                    "value": total,
                    "unit": "sec",
                    "sf": _sf_from_dir(SF_DIR),
                    "repeat": repeat,
                    "scored50": scored50,
                    "n_entries": len(timings),
                    "passes": passes,
                    "pass_counts": pass_counts,
                    "regressed": {
                        n: {"prev": prev_q[n], "now": timings[n]}
                        for n in regressed
                    },
                    "stages": stages,
                    "queries": timings,
                },
                f,
                indent=1,
            )
            f.write("\n")

    # stdout line: totals FIRST, scored-50 per-query at 2dp, compact
    # separators; hard byte budget so driver tail-capture can never
    # truncate it mid-JSON again (full detail lives in the sidecar)
    head = {
        "metric": "total_wall",
        "value": total,
        "unit": "sec",
        "sf": _sf_from_dir(SF_DIR),
        "repeat": repeat,
        "scored50": scored50,
        "n_entries": len(timings),
        # per-pass wall totals: the run-to-run spread IS the box-drift
        # evidence (VERDICT r10 next-#5); pass_counts says how many
        # entries each pass timed (ADVICE r11 — unequal counts mean an
        # entry errored mid-run and the pass totals are incomparable)
        "passes": passes,
        "pass_counts": pass_counts,
        # compressed-path trend line: ivfpq_bigscale's SEARCH side
        # (build/write jitter split out — VERDICT r8 next-#1)
        "ivfpq_big_search": stages.get("ivfpq_bigscale", {}).get("search"),
        # per-entry regressions vs previous committed sidecar (names
        # capped for the stdout byte budget; detail in the sidecar)
        "regressed": regressed[:8],
        "detail": "BENCH.local.json",
    }
    if only is not None:
        # diagnostic runs have no sidecar — surface the stage splits here
        # and mark the run as PARTIAL (ADVICE r11: total/scored50 cover
        # only the filtered subset; the field makes that unmistakable)
        head["only"] = sorted(only)
        head["stages"] = stages
    line_with_q = json.dumps(
        {
            **head,
            "queries": {
                n: (round(timings[n], 2) if timings[n] >= 0 else -1.0)
                for n in scored_names
            },
        },
        separators=(",", ":"),
    )
    print(line_with_q if len(line_with_q) <= 1900
          else json.dumps(head, separators=(",", ":")))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
