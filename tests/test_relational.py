"""Relational-breadth operators: semi/anti complement invariants,
outer-join distribution conservation, sketch-aggregate tolerance
(the rows-only `approx_stats_events` query's semantic pin)."""

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from mape_calculation_and_anonymization_spark.fixtures import load_events, load_table

SF_DIR = "/root/testdata/sf0.01"


def test_semi_plus_anti_partition_orders(spark):
    """left_semi and left_anti on the same predicate partition the left
    side exactly."""
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    cond = (lineitem.l_orderkey == orders.o_orderkey) & (
        lineitem.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    n_semi = orders.join(lineitem, cond, "left_semi").count()
    n_anti = orders.join(lineitem, cond, "left_anti").count()
    assert n_semi + n_anti == orders.count()
    assert n_semi > 0 and n_anti > 0


def test_outer_distribution_conserves_customers(spark):
    """Q13-style distribution must account for every customer,
    including the zero-order bucket an inner join would drop."""
    dist = entrymod._q_outer_join_order_distribution(spark, SF_DIR)
    rows = {r["c_count"]: r["custdist"] for r in dist.collect()}
    n_customers = load_table(spark, SF_DIR, "customer").count()
    assert sum(rows.values()) == n_customers


def test_anti_join_nonempty(spark):
    idle = entrymod._q_anti_join_idle_customers(spark, SF_DIR)
    assert idle.agg(F.sum("n_customers")).collect()[0][0] > 0


def test_range_join_bands_cover_all_orders(spark):
    bands = entrymod._q_range_join_price_bands(spark, SF_DIR)
    total = bands.agg(F.sum("n_orders")).collect()[0][0]
    assert total == load_table(spark, SF_DIR, "orders").count()


def test_approx_stats_within_tolerance(spark):
    """The query emits exact values plus BOOLEAN bound checks (HLL++
    within 3·rsd, approx median between the 0.48/0.52 quantiles); the
    exact columns must agree with an independent aggregation and every
    bound flag must be TRUE."""
    approx = {
        r["event_type"]: r
        for r in entrymod._q_approx_stats_events(spark, SF_DIR).collect()
    }
    events = load_events(spark, SF_DIR)
    exact = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert a["exact_users"] == e["n_users"]
        assert abs(a["exact_p50"] - e["p50"]) < 1e-6
        assert a["hll_within_rsd"] is True
        assert a["p50_within_rank_tol"] is True
