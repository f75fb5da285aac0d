"""Partitioned-layout guarantees: partition pruning reaches the scan
(PartitionFilters, only the selected directory's files read) and
dynamic partition overwrite rewrites only the partitions present in
the incoming frame — the idempotent-daily-job semantics for a
date-partitioned 100 TB table."""

import pytest
from pyspark.sql import functions as F

from mape_calculation_and_anonymization_spark.fixtures import load_events
from mape_calculation_and_anonymization_spark.sources.sinks import (
    read_latest_partition,
    write_partitioned_parquet,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def dated_events(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("parts") / "events_by_date")
    events = load_events(spark, SF_DIR).withColumn(
        "event_date", F.to_date("ts")
    )
    write_partitioned_parquet(events, path, ["event_date"])
    return path, events


def test_latest_partition_pruned(spark, dated_events):
    path, events = dated_events
    latest = read_latest_partition(spark, path, "event_date")
    max_date = events.agg(F.max("event_date")).first()[0]
    got = latest.select("event_date").distinct().collect()
    assert [r["event_date"] for r in got] == [max_date]
    assert latest.count() == events.filter(
        F.col("event_date") == max_date
    ).count()
    plan = latest._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the pruning must be non-empty (the filter landed on the partition
    # column, not in a post-scan Filter)
    assert "PartitionFilters: []" not in plan


def test_dynamic_overwrite_touches_only_present_partitions(
    spark, dated_events, tmp_path
):
    _, events = dated_events
    path = str(tmp_path / "dyn")
    write_partitioned_parquet(events, path, ["event_date"])

    dates = sorted(
        r["event_date"]
        for r in events.select("event_date").distinct().collect()
    )
    target = dates[0]
    before_other = (
        spark.read.parquet(path)
        .filter(F.col("event_date") != target)
        .count()
    )

    # rewrite ONE partition with a perturbed copy
    one_day = events.filter(F.col("event_date") == target).withColumn(
        "value", F.col("value") * 2.0
    )
    write_partitioned_parquet(
        one_day, path, ["event_date"], mode="overwrite", dynamic=True
    )

    after = spark.read.parquet(path)
    # untouched partitions survived the overwrite
    assert after.filter(F.col("event_date") != target).count() == before_other
    # the target partition holds the new rows
    doubled = after.filter(F.col("event_date") == target)
    orig = events.filter(F.col("event_date") == target)
    assert doubled.count() == orig.count()
    assert (
        pytest.approx(doubled.agg(F.sum("value")).first()[0], rel=1e-9)
        == 2.0 * orig.agg(F.sum("value")).first()[0]
    )


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from mape_calculation_and_anonymization_spark.sources.sinks import compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(10_000).withColumn("k", F.col("id") % 7)
    df.repartition(16).write.parquet(path)
    import glob

    assert len(glob.glob(f"{path}/part-*.parquet")) == 16
    compact_parquet(spark, path, target_partitions=2)
    assert len(glob.glob(f"{path}/part-*.parquet")) <= 2
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("id")).first()[0] == sum(range(10_000))


def test_read_parquet_merged_schema_evolution(spark, tmp_path):
    from mape_calculation_and_anonymization_spark.sources.readers import (
        read_parquet_merged,
    )

    base = str(tmp_path / "evolving")
    spark.range(5).select(F.col("id")).write.parquet(f"{base}/drop=v1")
    spark.range(5, 10).select(
        F.col("id"), (F.col("id") * 2).alias("extra")
    ).write.parquet(f"{base}/drop=v2")
    merged = read_parquet_merged(spark, base)
    assert set(merged.columns) == {"id", "extra", "drop"}
    rows = {r["id"]: r["extra"] for r in merged.collect()}
    assert len(rows) == 10
    assert rows[0] is None and rows[7] == 14


def test_zvalue_interleaves_bits(spark):
    from mape_calculation_and_anonymization_spark.operators.layout import zvalue

    df = spark.createDataFrame(
        [(1, 0), (0, 1), (3, 0), (0, 3), (3, 3)], ["x", "y"]
    )
    got = [
        r["z"]
        for r in df.select(zvalue(["x", "y"], bits=2).alias("z"))
        .orderBy("x", "y")
        .collect()
    ]
    # x at even bit positions, y at odd: (0,1)->2, (0,3)->10, (1,0)->1,
    # (3,0)->5, (3,3)->15
    assert got == [2, 10, 1, 5, 15]

    import pytest

    with pytest.raises(ValueError):
        zvalue(["x", "y"], bits=32)  # 64 bits > signed long


def test_zorder_write_tightens_rowgroup_spans(spark, tmp_path):
    import pyarrow.parquet as pq

    from mape_calculation_and_anonymization_spark.operators.layout import (
        zorder_write,
    )

    df = (
        spark.range(40_000)
        .select(
            (F.col("id") % 199).alias("a"),
            ((F.col("id") * 7919) % 211).alias("b"),
            F.col("id").alias("payload"),
        )
    )
    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    df.repartition(8).write.parquet(plain)
    zorder_write(df, zed, cols=["a", "b"], bits=8, n_files=8)

    def avg_span(path, col):
        import glob

        spans, idx = [], None
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            if idx is None:
                names = [md.schema.column(i).name for i in range(len(md.schema))]
                idx = names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                spans.append(st.max - st.min)
        return sum(spans) / len(spans)

    # The round-robin layout leaves every file spanning ~the full
    # domain of both columns; the Z layout must tighten both. The
    # bound is 0.75, not the bit-prefix ideal (0.25/0.5 for 8 files):
    # repartitionByRange splits on z-QUANTILES, which don't align
    # with Morton bit boundaries, so each file straddles two prefix
    # blocks in the worst case — still a strict span win on every
    # participating column, which is the property skipping needs.
    assert avg_span(zed, "a") < avg_span(plain, "a") * 0.75
    assert avg_span(zed, "b") < avg_span(plain, "b") * 0.75
    # content preserved
    assert (
        spark.read.parquet(zed).agg(F.sum("payload")).first()[0]
        == sum(range(40_000))
    )


def test_versioned_write_read_time_travel(spark, tmp_path):
    import pytest

    from mape_calculation_and_anonymization_spark.sources.sinks import (
        read_versioned,
        write_versioned,
    )

    path = str(tmp_path / "vt")
    assert write_versioned(spark.range(5), path) == 0
    assert write_versioned(spark.range(8), path) == 1
    assert read_versioned(spark, path).count() == 8  # current
    assert read_versioned(spark, path, version=0).count() == 5
    with pytest.raises(ValueError):
        read_versioned(spark, path, version=2)


def test_quantile_rank_column_uniform_buckets(spark):
    import numpy as np

    from mape_calculation_and_anonymization_spark.operators.layout import (
        quantile_rank_column,
    )

    # heavily skewed doubles: exp-distributed deterministic values
    df = spark.range(20_000).select(
        (F.exp(F.col("id") % 11) + F.col("id") / 1000.0).alias("x")
    )
    bits = 4
    out = df.select(quantile_rank_column(df, "x", bits=bits).alias("b"))
    counts = {
        r["b"]: r["n"] for r in out.groupBy("b").agg(F.count("*").alias("n")).collect()
    }
    # every bucket in-domain
    assert all(0 <= b < (1 << bits) for b in counts)
    # equal-population within sketch error: no bucket > 3x the ideal
    ideal = 20_000 / (1 << bits)
    assert max(counts.values()) < 3 * ideal
    # monotone: larger x never gets a smaller bucket
    rows = sorted(
        df.select("x", quantile_rank_column(df, "x", bits=bits).alias("b")).collect(),
        key=lambda r: r["x"],
    )
    bs = [r["b"] for r in rows]
    assert bs == sorted(bs)


def test_zorder_write_auto_on_doubles(spark, tmp_path):
    from mape_calculation_and_anonymization_spark.operators.layout import (
        zorder_write_auto,
    )

    df = spark.range(10_000).select(
        (F.col("id") % 977 * 1.37).alias("x"),
        ((F.col("id") * 7919) % 983 / 3.0).alias("y"),
        F.col("id").alias("payload"),
    )
    path = str(tmp_path / "zauto")
    zorder_write_auto(df, path, cols=["x", "y"], bits=4, n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert set(back.columns) == {"x", "y", "payload"}  # helper cols dropped
    assert back.agg(F.sum("payload")).first()[0] == sum(range(10_000))


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from mape_calculation_and_anonymization_spark.plans.audit import physical_plan
    from mape_calculation_and_anonymization_spark.sources.readers import read_orc
    from mape_calculation_and_anonymization_spark.sources.sinks import write_orc_zstd

    path = str(tmp_path / "t.orc")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 1.5).alias("v")
    )
    write_orc_zstd(df, path)
    back = read_orc(spark, path)
    assert back.count() == 1000
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]
    # predicate must reach the ORC scan (same pushdown story as parquet)
    plan = physical_plan(back.filter(F.col("k") == 3).select("id"))
    assert "PushedFilters" in plan and "k" in plan.split("PushedFilters")[1][:80]


def test_zvalue_saturates_out_of_range(spark):
    """Out-of-range inputs clamp to the domain edges (monotone
    saturation) instead of aliasing mod 2^bits — id 257 must NOT sort
    next to id 1 under bits=8 (the silent-scatter failure the clamp
    prevents)."""
    from mape_calculation_and_anonymization_spark.operators.layout import zvalue

    rows = [(1,), (255,), (257,), (100000,), (-5,)]
    df = spark.createDataFrame(rows, ["x"])
    got = {
        r["x"]: r["z"]
        for r in df.select("x", zvalue(["x"], bits=8).alias("z")).collect()
    }
    assert got[1] == 1
    assert got[255] == 255
    assert got[257] == 255       # saturates at the top, not 257 % 256 == 1
    assert got[100000] == 255    # same top bucket
    assert got[-5] == 0          # negative clamps to the bottom
