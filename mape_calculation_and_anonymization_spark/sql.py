"""SQL front end: register the engine's tables as temp views and run
raw ANSI SQL against them.

The DataFrame registry queries and this SQL surface compile to the
SAME Catalyst logical plans — there is no separate SQL executor, so a
user of the reference who prefers SQL gets identical semantics,
optimizations (pushdown, pruning, join planning, AQE), and results.
Equivalence is pinned by tests/test_relational.py: a TPC-H query run
through spark.sql over these views must hash-match the DataFrame
formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mape_calculation_and_anonymization_spark.fixtures import load_table

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every testdata table under its bare name as a temp
    view (through the engine reader, so timestamp-nanos handling is
    applied). Idempotent — re-registration replaces the view."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return list(TABLES)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-call SQL entry point: ensure views exist, run the query.
    Lazy like any DataFrame — nothing executes until an action."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
