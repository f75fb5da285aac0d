"""Round-17 optimization tooling: capture plans and time queries in
isolation (outside the full-suite neighborhood, per the bench
methodology note that registry order moves state-cleanup tax between
queries).

Usage:
  python tools_r17.py explain <out_dir> <query> [<query> ...]
  python tools_r17.py time <runs> <query> [<query> ...]

Both use $SPARK_GRAFT_SF_DIR (default sf0.1) and the same get_spark
session the bench uses.
"""
from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    from mape_calculation_and_anonymization_spark.session import get_spark

    spark = get_spark(app_name="tools_r17")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _cleanup(spark):
    spark.catalog.clearCache()
    for tbl in spark.catalog.listTables():
        if tbl.isTemporary and tbl.name.startswith("mem_"):
            spark.catalog.dropTempView(tbl.name)
    gc.collect()


def cmd_explain(out_dir: str, names: list[str]) -> None:
    import __spark_entry__ as entrymod

    spark = _spark()
    os.makedirs(out_dir, exist_ok=True)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan.splitlines())} lines, "
              f"{n_ex} Exchange, -> {path}")
        _cleanup(spark)


def cmd_time(runs: int, names: list[str]) -> None:
    import __spark_entry__ as entrymod

    spark = _spark()
    qs = entrymod.queries()
    # session warmup mirroring bench.py
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy(F.col("id") % 7).count().collect()
    from mape_calculation_and_anonymization_spark.fixtures import load_table

    for t in ("events", "documents", "lineitem", "orders", "embeddings"):
        load_table(spark, SF_DIR, t).count()
    out = {}
    for name in names:
        fn = qs[name]
        # one untimed warm pass (codegen/fixtures)
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        _cleanup(spark)
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            _cleanup(spark)
        out[name] = {
            "median": round(statistics.median(samples), 3),
            "samples": [round(s, 3) for s in samples],
        }
        print(name, json.dumps(out[name]))
    print("RESULT " + json.dumps({k: v["median"] for k, v in out.items()}))


if __name__ == "__main__":
    if sys.argv[1] == "explain":
        cmd_explain(sys.argv[2], sys.argv[3:])
    elif sys.argv[1] == "time":
        cmd_time(int(sys.argv[2]), sys.argv[3:])
    else:
        raise SystemExit(f"unknown mode {sys.argv[1]!r}")
