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
