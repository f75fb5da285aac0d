"""Derivations from the driver's synthetic testdata into the
reference's input shapes (FIXTURES.md "Mapping onto driver-generated
testdata").

The reference consumed Athena CSV exports that were stripped from its
snapshot (reference/.MISSING_LARGE_BLOBS), so correctness checks run
on reference-shaped tables derived deterministically from
``/root/testdata/sf*/events.parquet``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Zone universe of the synthetic events table (event_type values).
EVENT_ZONES = ["click", "error", "purchase", "signup", "view"]


def events_to_schema_a(events: DataFrame) -> DataFrame:
    """Schema A (`raw_ops`): plain metric family derived from events.

    proxy_date=to_date(ts), hour=hour(ts), zone=event_type,
    settlement=value, forecast=value*1.05, backcast=value*0.97.
    """
    return events.select(
        F.to_date("ts").alias("proxy_date"),
        F.hour("ts").alias("hour"),
        F.col("event_type").alias("zone"),
        (F.col("value") * F.lit(1.05)).alias("forecast"),
        (F.col("value") * F.lit(0.97)).alias("backcast"),
        F.col("value").alias("settlement"),
    )


def events_to_schema_b(events: DataFrame) -> DataFrame:
    """Schema B (`raw_jp`): gross/net metric families derived from
    events — exercises the multi-family mapping probe."""
    return events.select(
        F.to_date("ts").alias("proxy_date"),
        F.hour("ts").alias("hour"),
        F.col("event_type").alias("zone"),
        (F.col("value") * F.lit(1.05)).alias("forecast_gross"),
        (F.col("value") * F.lit(0.97)).alias("backcast_gross"),
        F.col("value").alias("usage_final_gross"),
        (F.col("value") * F.lit(1.02)).alias("forecast_net"),
        (F.col("value") * F.lit(0.99)).alias("backcast_net"),
        (F.col("value") * F.lit(0.95)).alias("usage_final_net"),
    )


def events_batch_schema(spark: SparkSession, sf_dir: str):
    """Probe the events table's schema via a batch read (streaming file
    sources require an explicit schema; probing the batch reader keeps
    the stream adaptive to however the testdata stores ``ts`` —
    TIMESTAMP(NANOS)-as-long vs native TIMESTAMP micros)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet").schema


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the ``ts`` column to a timestamp regardless of storage:
    parquet TIMESTAMP(NANOS) surfaces as ``bigint`` (under
    ``spark.sql.legacy.parquet.nanosAsLong``) and needs nanos→micros
    division; native timestamp/timestamp_ntz passes through untouched.
    Shared by the batch reader AND the streaming reader so the two
    paths can never diverge again (round-3 regression: the stream
    hard-coded the div-1000 path and collapsed micros-stored 2024 data
    onto 1970-01-20)."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # Watermarks (streaming) require TIMESTAMP, not TIMESTAMP_NTZ;
        # under the engine's fixed UTC session timezone the cast is
        # value-preserving, and hour()/to_date() extractions are
        # wall-clock-invariant under the NTZ→LTZ round-trip regardless.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table. The driver's parquet has stored ``ts`` as
    TIMESTAMP(NANOS) (rejected by Spark's vectorized reader → read
    nanos-as-long, then divide) in some generations and as TIMESTAMP
    micros in others; ``normalize_event_ts`` adapts to either."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return normalize_event_ts(df)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read any testdata table, normalizing nano-timestamp columns the
    same way (orders.o_orderdate, lineitem.l_shipdate are also NANOS)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if name == "events":
        return load_events(spark, sf_dir)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    nano_cols = {
        "orders": ["o_orderdate"],
        "lineitem": ["l_shipdate"],
    }.get(name, [])
    for c in nano_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


# The same derivation as ANSI SQL, reused by every oracle that needs a
# Schema-A input (DuckDB runs this against its pre-registered `events`
# view).
SCHEMA_A_SQL = """
    SELECT CAST(ts AS DATE) AS proxy_date,
           EXTRACT(hour FROM ts) AS hour,
           event_type AS zone,
           value * 1.05 AS forecast,
           value * 0.97 AS backcast,
           value AS settlement
    FROM events
"""
