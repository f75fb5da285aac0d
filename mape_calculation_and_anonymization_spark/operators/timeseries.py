"""Time-series regularization operators.

The reference's domain is hourly energy-market series; its pipelines
assume every (date, hour, zone) slot exists. Real feeds drop hours.
This module adds the standard remedies as pure DataFrame programs:

  * dense hourly spine generation per key (``sequence`` + explode —
    the spine is derived per key inside the engine, no driver loop)
  * gap detection (left join spine ← observations)
  * forward fill (``last(..., ignorenulls=True)`` over a key-ordered
    window — partitioned by series key, so the fill parallelizes
    across series and never needs a global sort)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fill_hourly_gaps(
    hourly: DataFrame,
    key_col: str = "zone",
    ts_col: str = "hour_ts",
    value_col: str = "settlement",
) -> DataFrame:
    """Densify an hourly series per key and forward-fill gaps.

    Input: one row per observed (key, hour) with ``value_col``.
    Output: one row per (key, hour) over each key's [min, max] hour
    span, with ``value_col`` forward-filled from the last observation
    and ``was_gap`` marking synthesized rows. Leading gaps (before a
    key's first observation) cannot exist by construction since the
    spine starts at the key's own min.

    Scale shape: the spine explode is per-key (span/hour rows each),
    the join is on (key, hour) — co-partitioned with the fill window's
    partitioning, so Catalyst reuses one shuffle for join + window —
    and the fill never sorts globally.
    """
    span = hourly.groupBy(key_col).agg(
        F.min(ts_col).alias("_min_ts"), F.max(ts_col).alias("_max_ts")
    )
    spine = span.select(
        key_col,
        F.explode(
            F.sequence("_min_ts", "_max_ts", F.expr("INTERVAL 1 HOUR"))
        ).alias(ts_col),
    )
    joined = spine.join(hourly, on=[key_col, ts_col], how="left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key_col,
        ts_col,
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        F.col(value_col).isNull().alias("was_gap"),
    )


def forecast_accuracy(
    df: DataFrame,
    key_cols: list[str],
    forecast_col: str = "forecast",
    actual_col: str = "actual",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Forecast-accuracy suite per key: the metrics a forecasting team
    publishes NEXT TO the reference's WAPE (operators/mape.py keeps the
    reference's sum-then-divide WAPE; this extends the scorecard):

      * mae     — mean absolute error
      * rmse    — root mean squared error (penalizes large misses)
      * smape   — symmetric MAPE, ``mean(2|f−a| / (|f|+|a|))`` with the
                  0/0 slot defined as 0 (both-zero = perfect forecast,
                  the same convention as the reference's F1 filter)
      * wape    — ``Σ|f−a| / Σ|a|`` (the reference's headline metric,
                  here per key for cross-checking)
      * bias    — mean signed error (systematic over/under-forecast)
      * mase    — MAE scaled by the naive lag-1 forecast's MAE
                  (Hyndman & Koehler, "Another look at measures of
                  forecast accuracy", IJF 2006): < 1 beats persistence.
                  Requires ``order_cols`` (the series order within each
                  key); omitted → mase column is omitted.

    One hash aggregate over the series; MASE adds a lag window
    partitioned by key (parallel across series, no global sort).
    Every expression stays inside whole-stage codegen.
    """
    f, a = F.col(forecast_col), F.col(actual_col)
    err = f - a
    ae = F.abs(err)
    denom = F.abs(f) + F.abs(a)
    smape_term = F.when(denom == 0, F.lit(0.0)).otherwise(2.0 * ae / denom)

    work = df
    aggs = [
        F.avg(ae).alias("mae"),
        F.sqrt(F.avg(err * err)).alias("rmse"),
        F.avg(smape_term).alias("smape"),
        F.try_divide(F.sum(ae), F.sum(F.abs(a))).alias("wape"),
        F.avg(err).alias("bias"),
    ]
    if order_cols:
        w = Window.partitionBy(*key_cols).orderBy(*order_cols)
        work = work.withColumn("_naive", F.lag(actual_col).over(w))
        naive_ae = F.when(
            F.col("_naive").isNotNull(), F.abs(a - F.col("_naive"))
        )
        aggs.append(
            F.try_divide(F.avg(ae), F.avg(naive_ae)).alias("mase")
        )
    return work.groupBy(*key_cols).agg(*aggs)
