"""MAPE (volume-weighted APE) pipeline, Spark-first.

Re-expresses the reference's two-stage aggregation
(reference/main.py:38-144) as ONE lazy DataFrame DAG:

    scan → select → groupBy(date,hour[,zone]) Σ     (shuffle 1)
         → abs-error columns (codegen'd projections)
         → groupBy(date[,zone]) Σ                    (shuffle 2)
         → WAPE ratio + cleanup filters
         → [zone pivot]                              (shuffle 3, zone only)

Crucial preserved semantic (reference/main.py:61,96,101-102): the
"MAPE" is a volume-weighted APE — absolute errors are summed
meters→hour, then hours→day, and only THEN divided by the summed
|settlement|. It is never the mean of per-row percentage errors.

Divergences consciously mapped (SURVEY.md §2.12):
  Q3  pandas ``x/0 → ±inf`` then replace+dropna; Spark ``x/0 → NULL``
      then ``na.drop`` — identical surviving row sets, cheaper plan.
  Q5  pandas pivot emits ``{value}_{zone}`` value-major; Spark pivot
      emits ``{zone}_{value}`` — we rename + reorder to pandas' layout.

Scale notes: both aggregations are partial+final hash aggregates
around a single exchange each (whole-stage codegen; map-side combine
collapses per-meter rows before the shuffle). No UDFs anywhere on
this path; no collects except the zone-universe lookup for the pivot
(dimension-sized by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Metric families, verbatim layout from reference/main.py:7-11:
# [forecast-like, backcast-like, settlement-like,
#  forecast_abs_err, backcast_abs_err, settlement_abs,
#  forecast_mape, backcast_mape]
COLUMN_MAPPINGS: list[list[str]] = [
    [
        "forecast", "backcast", "settlement",
        "forecast_abs_error", "backcast_abs_error", "settlement_abs",
        "forecast_mape", "backcast_mape",
    ],
    [
        "forecast_gross", "backcast_gross", "usage_final_gross",
        "forecast_gross_abs_error", "backcast_gross_abs_error", "usage_final_gross_abs",
        "forecast_gross_mape", "backcast_gross_mape",
    ],
    [
        "forecast_net", "backcast_net", "usage_final_net",
        "forecast_net_abs_error", "backcast_net_abs_error", "usage_final_net_abs",
        "forecast_net_mape", "backcast_net_mape",
    ],
]


def _present_mapping_cols(columns: list[str]) -> list[str]:
    """P1 — driver-side column probe (reference/main.py:41-45):
    mapping-major order, filtered to the columns that exist."""
    return [col for mapping in COLUMN_MAPPINGS for col in mapping if col in columns]


def hourly_aggregation(raw: DataFrame, zone: bool = False, sort: bool = True) -> DataFrame:
    """Stage 1 (reference/main.py:38-71): cast keys, sum every present
    metric column to (proxy_date, hour[, zone]) grain, derive absolute
    error columns for each complete (f, b, s) family, order by keys.

    One shuffle; the per-meter fan-in happens map-side (partial agg).

    ``sort=False`` skips the final orderBy (reference/main.py:69) —
    pass it whenever the hourly table is an intermediate feeding
    :func:`daily_mape_aggregation`, otherwise the sort costs a full
    range-partitioning exchange between the two aggregations that the
    optimizer does not remove. The sort only affects presentation
    order, never values.
    """
    cols_hourly = _present_mapping_cols(raw.columns)
    if not cols_hourly:
        raise ValueError(
            "No columns found in the dataframe, make sure to define mappings correctly"
        )

    keys = ["proxy_date", "hour", "zone"] if zone else ["proxy_date", "hour"]

    df = raw.withColumn("proxy_date", F.to_date("proxy_date")).withColumn(
        "hour", F.col("hour").cast("int")
    )
    df = df.groupBy(*keys).agg(*[F.sum(c).alias(c) for c in cols_hourly])

    # X1 — abs-error derivation (reference/main.py:63-68). One
    # withColumns call (a single projection node) instead of a
    # withColumn chain — keeps the analyzed plan shallow.
    abs_errors: dict[str, F.Column] = {}
    for mapping in COLUMN_MAPPINGS:
        f, b, s, f_abs_e, b_abs_e, s_abs_e, _f_m, _b_m = mapping
        if all(c in df.columns for c in (f, b, s)):
            abs_errors[f_abs_e] = F.abs(F.col(f) - F.col(s))
            abs_errors[b_abs_e] = F.abs(F.col(b) - F.col(s))
            abs_errors[s_abs_e] = F.abs(F.col(s))
    if abs_errors:
        df = df.withColumns(abs_errors)
    return df.orderBy(*keys) if sort else df


def daily_mape_aggregation(
    df_hourly: DataFrame, zone: bool = False, zones: list[str] | None = None
) -> DataFrame:
    """Stage 2 (reference/main.py:74-144): re-aggregate hours→day,
    derive WAPE ratios, drop inf/NaN rows, drop both-zero
    forecast/backcast pairs, reorder mape columns, optionally pivot
    zones wide.

    ``zones``: explicit pivot universe; if omitted it is collected
    from the data (one tiny distinct job — zone is a dimension).
    """
    cols_daily = _present_mapping_cols(df_hourly.columns)
    if not cols_daily:
        raise ValueError(
            "No columns found in the dataframe, make sure to define mappings correctly"
        )

    if zone:
        attributes = ["proxy_date", "zone"]
        mape_insert_position = 2
    else:
        attributes = ["proxy_date"]
        mape_insert_position = 1

    df = df_hourly.groupBy(*attributes).agg(
        *[F.sum(c).alias(c) for c in cols_daily]
    )

    # X2 + F2 + F3 + P2 fused into ONE projection over the aggregate's
    # output attributes. Stacking these as separate withColumn/select
    # layers makes Catalyst's CollapseProject substitute ever-deeper
    # expression trees (measured: 36s of optimizer time at sf0.1 for
    # the two-family schema); a single shallow projection optimizes in
    # milliseconds and produces the same rows.
    #
    #   * mape = try_divide(abs_err, settlement_abs): NULL on ÷0 under
    #     any ANSI setting, where pandas produced ±inf → both get the
    #     row dropped (Q3, reference/main.py:101-106).
    #   * sums are ±inf/NaN-normalized to NULL (F2). A NaN/inf sum also
    #     poisons its mape, but the row is already dropped via the sum
    #     column itself, so the mape needs no extra guard — keeps every
    #     expression one attribute deep.
    #   * output order applies P2 (mape block at position 1 portfolio /
    #     2 zonal, reference/main.py:116-126) directly.
    mape_exprs: dict[str, F.Column] = {}
    for mapping in COLUMN_MAPPINGS:
        _f, _b, _s, f_abs_e, b_abs_e, s_abs_e, f_m, b_m = mapping
        if all(c in df.columns for c in (s_abs_e, f_abs_e, b_abs_e)):
            mape_exprs[f_m] = F.try_divide(F.col(f_abs_e), F.col(s_abs_e))
            mape_exprs[b_m] = F.try_divide(F.col(b_abs_e), F.col(s_abs_e))

    def _normalized(c: str) -> F.Column:
        return (
            F.when(
                F.isnan(F.col(c)) | F.col(c).isin(float("inf"), float("-inf")),
                None,
            )
            .otherwise(F.col(c))
            .alias(c)
        )

    mape_names = list(mape_exprs)
    other_names = list(attributes) + cols_daily
    new_order = (
        other_names[:mape_insert_position]
        + mape_names
        + other_names[mape_insert_position:]
    )
    df = df.select(
        *[
            mape_exprs[c].alias(c)
            if c in mape_exprs
            else (_normalized(c) if c in cols_daily else F.col(c))
            for c in new_order
        ]
    )
    df = df.na.drop("any")

    # F1 — drop rows where paired (forecast*, backcast*) are both 0.0
    # (reference/main.py:108-114; Q2: substring pairing also pairs the
    # abs-error columns, which is part of the spec).
    forecast_cols = [c for c in cols_daily if "forecast" in c]
    backcast_cols = [c for c in cols_daily if "backcast" in c]
    zero_pair_conds = [
        ~((F.col(f_col) == 0.0) & (F.col(b_col) == 0.0))
        for f_col, b_col in zip(forecast_cols, backcast_cols)
        if f_col in df.columns and b_col in df.columns
    ]
    if zero_pair_conds:
        cond = zero_pair_conds[0]
        for c in zero_pair_conds[1:]:
            cond = cond & c
        df = df.filter(cond)

    if not zone:
        return df

    # R1 — zonal pivot (reference/main.py:129-141). pandas flattens the
    # MultiIndex to "{value}_{zone}" value-major with zones sorted
    # inside each value (Q5); Spark's pivot emits "{zone}_{value}"
    # zone-major, so rename + reorder to the pandas layout.
    cols_pivot_order = [
        c for c in df.columns for mapping in COLUMN_MAPPINGS if c in mapping
    ]
    if zones is None:
        zones = [r[0] for r in df.select("zone").distinct().collect()]
    zones = sorted(str(z) for z in zones)

    wide = (
        df.groupBy("proxy_date")
        .pivot("zone", zones)
        .agg(*[F.first(c).alias(c) for c in cols_pivot_order])
    )
    ordered = []
    for v in cols_pivot_order:
        for z in zones:
            # single-agg pivot names columns just "{zone}"
            src = z if len(cols_pivot_order) == 1 else f"{z}_{v}"
            ordered.append(F.col(f"`{src}`").alias(f"{v}_{z}"))
    return wide.select("proxy_date", *ordered).orderBy("proxy_date")


class MapeCalculation:
    """API-compatible facade over the functional pipeline, mirroring
    the reference class (reference/main.py:5-153) for drop-in use:

        calc = MapeCalculation(raw_df)
        hourly = calc.hourly_aggregation()
        daily = calc.daily_mape_aggregation(hourly)
        calc.save_to_excelspreadsheet('client', daily_portfolio=daily)
    """

    column_mappings = COLUMN_MAPPINGS

    def __init__(self, raw: DataFrame):
        self.raw = raw
        self.zone = False

    def hourly_aggregation(self, zone: bool = False) -> DataFrame:
        return hourly_aggregation(self.raw, zone=zone)

    def daily_mape_aggregation(
        self, df_hourly: DataFrame, zone: bool = False, zones: list[str] | None = None
    ) -> DataFrame:
        return daily_mape_aggregation(df_hourly, zone=zone, zones=zones)

    def save_to_excelspreadsheet(self, client_name: str, **kwargs: DataFrame) -> str:
        from mape_calculation_and_anonymization_spark.sources.sinks import (
            write_excel_workbook,
        )

        return write_excel_workbook(f"./output/{client_name}_performance.xlsx", **kwargs)
