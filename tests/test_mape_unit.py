"""Hand-computed semantics tests for the MAPE (WAPE) pipeline.

These pin the behaviors SURVEY.md §2.12 calls out as part of the spec:
sum-then-divide order of operations, inf/NaN row drops (Q3), the
both-zero pair filter incl. abs-error pairing (Q2), mape column
placement (P2), and pandas-compatible pivot naming (Q5).
"""

import pytest
from pyspark.sql import Row

from mape_calculation_and_anonymization_spark.operators.mape import (
    MapeCalculation,
    daily_mape_aggregation,
    hourly_aggregation,
)


def _raw(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                proxy_date=r[0], hour=r[1], zone=r[2],
                forecast=float(r[3]), backcast=float(r[4]), settlement=float(r[5]),
            )
            for r in rows
        ]
    )


def test_wape_is_sum_then_divide(spark):
    # two meters in the same hour: per-row APEs would average differently
    # than the volume-weighted ratio. |(10+30)-(20+20)|? No: errors are
    # summed AFTER the hourly grain collapse, so the hour nets to
    # forecast=40, settlement=40 → abs err 0. A per-row mean of APEs
    # would give (|10-20|/20 + |30-20|/20)/2 = 0.5.
    df = _raw(
        spark,
        [
            ("2024-01-01", "0", "A", 10, 5, 20),
            ("2024-01-01", "0", "A", 30, 5, 20),
            ("2024-01-01", "1", "A", 15, 5, 10),
        ],
    )
    hourly = hourly_aggregation(df)
    h = {(str(r["proxy_date"]), r["hour"]): r for r in hourly.collect()}
    assert h[("2024-01-01", 0)]["forecast_abs_error"] == 0.0
    assert h[("2024-01-01", 1)]["forecast_abs_error"] == 5.0

    daily = daily_mape_aggregation(hourly).collect()
    assert len(daily) == 1
    d = daily[0]
    # daily: f_abs = 0 + 5, s_abs = 40 + 10
    assert d["forecast_mape"] == pytest.approx(5.0 / 50.0)
    # invariant from FIXTURES.md golden anchors
    assert d["forecast_mape"] == pytest.approx(
        d["forecast_abs_error"] / d["settlement_abs"]
    )
    # P2: mape columns sit at position 1 for portfolio output
    cols = daily_mape_aggregation(hourly).columns
    assert cols[:3] == ["proxy_date", "forecast_mape", "backcast_mape"]


def test_divide_by_zero_day_dropped(spark):
    # settlement sums to 0 for the whole day → pandas inf → dropped (Q3)
    df = _raw(
        spark,
        [
            ("2024-01-01", "0", "A", 10, 5, 0),
            ("2024-01-02", "0", "A", 10, 5, 20),
        ],
    )
    daily = daily_mape_aggregation(hourly_aggregation(df))
    dates = [str(r["proxy_date"]) for r in daily.collect()]
    assert dates == ["2024-01-02"]


def test_both_zero_pair_filter(spark):
    # forecast=backcast=0 rows are removed, even with settlement volume;
    # and the (f_abs_error, b_abs_error) pair is filtered too (Q2):
    # forecast=backcast=settlement → both abs errors 0 → row dropped.
    df = _raw(
        spark,
        [
            ("2024-01-01", "0", "A", 0, 0, 20),
            ("2024-01-02", "0", "A", 10, 5, 20),
            ("2024-01-03", "0", "A", 20, 20, 20),
        ],
    )
    daily = daily_mape_aggregation(hourly_aggregation(df))
    dates = [str(r["proxy_date"]) for r in daily.collect()]
    assert dates == ["2024-01-02"]


def test_zone_pivot_pandas_naming(spark):
    df = _raw(
        spark,
        [
            ("2024-01-01", "0", "B", 10, 5, 20),
            ("2024-01-01", "0", "A", 30, 25, 20),
        ],
    )
    hourly = hourly_aggregation(df, zone=True)
    wide = daily_mape_aggregation(hourly, zone=True)
    # Q5: {value}_{zone}, value-major, zones sorted inside each value
    assert wide.columns[:5] == [
        "proxy_date",
        "forecast_mape_A",
        "forecast_mape_B",
        "backcast_mape_A",
        "backcast_mape_B",
    ]
    row = wide.collect()[0]
    assert row["forecast_A"] == 30.0
    assert row["forecast_B"] == 10.0
    assert row["forecast_mape_B"] == pytest.approx(10.0 / 20.0)


def test_missing_family_skipped_and_empty_raises(spark):
    # only the plain family present → gross/net silently skipped;
    # a frame with no mapped columns raises (reference/main.py:47-50)
    df = spark.createDataFrame([Row(proxy_date="2024-01-01", hour="0", x=1.0)])
    with pytest.raises(ValueError):
        hourly_aggregation(df)


def test_class_facade(spark):
    df = _raw(spark, [("2024-01-01", "0", "A", 10, 5, 20)])
    calc = MapeCalculation(df)
    hourly = calc.hourly_aggregation()
    daily = calc.daily_mape_aggregation(hourly)
    assert daily.count() == 1
