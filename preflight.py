#!/usr/bin/env python
"""Driver simulation pre-flight: the exact check the driver applies,
under the driver's session, BEFORE the driver applies it.

The pytest suite runs on a tuned session (local[32], 32 shuffle
partitions, nanosAsLong where needed); the driver uses a VANILLA
SparkSession — ANSI on, 200 shuffle partitions, default everything.
Divergences that only appear under the driver's session (summation
order over different partition counts, timestamp schema handling,
oracle result-type canonicalization) are exactly the ones that have
produced red driver rows in past rounds. This script replays the
driver's compare over the first-50 registry window on a vanilla
session so those surface locally first.

Usage:
    python preflight.py            # first 50 (the driver window)
    python preflight.py --all     # every oracle-backed query
    python preflight.py name ...  # just the named queries

Exit code 0 iff every compared query matches. One JSON summary line on
stdout (tagged PREFLIGHT_JSON) for checking into PROGRESS notes.
"""

from __future__ import annotations

import json
import sys
import time


def main(argv: list[str]) -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from tests.oracle_utils import compare_query

    sf_dir = "/root/testdata/sf0.01"
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    if argv and argv[0] == "--all":
        # every registry entry: oracle-backed queries get the full
        # compare, rows-only ones the driver's weaker run-and-count
        names = list(qs)
    elif argv:
        names = argv
    else:
        names = [n for n in list(qs)[:50] if n in oracles]

    # Vanilla session: NO config overrides — this must match what the
    # driver builds (master differs, but defaults like ANSI mode and
    # spark.sql.shuffle.partitions=200 are what matter).
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    failures: dict[str, str] = {}
    t0 = time.time()
    for name in names:
        t = time.time()
        try:
            if name not in oracles:
                # rows-only by design (no SQL oracle) — mirror the
                # driver's weaker check: the query must run and yield
                # a stable row count ≥ 0
                n = qs[name](spark, sf_dir).count()
                ok, msg = True, f"rows-only: {n} rows"
            else:
                ok, msg = compare_query(spark, sf_dir, qs[name], oracles[name])
        except Exception as exc:  # noqa: BLE001 — report, keep going
            ok, msg = False, f"exception: {exc}"
        status = "ok" if ok else "FAIL"
        print(f"  {status:4s} {name} ({time.time() - t:.1f}s)", file=sys.stderr)
        if not ok:
            failures[name] = msg
            print(f"       {msg}", file=sys.stderr)

    summary = {
        "preflight": "driver-sim",
        "checked": len(names),
        "failed": sorted(failures),
        "wall_s": round(time.time() - t0, 1),
    }
    print("PREFLIGHT_JSON " + json.dumps(summary))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
