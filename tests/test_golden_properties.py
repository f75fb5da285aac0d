"""Golden-anchor regression (FIXTURES.md numeric anchors) and
property tests (SURVEY.md §5.2): WAPE invariance under row order and
partitioning, anonymization idempotence, perturbation linearity."""

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mape_calculation_and_anonymization_spark.operators.anonymize import perturb_values
from mape_calculation_and_anonymization_spark.operators.mape import (
    daily_mape_aggregation,
    hourly_aggregation,
)


def test_golden_anchor_2024_05_29(spark):
    """Reconstruct a 2-hour input whose daily sums equal the
    FIXTURES.md golden row for 2024-05-29 (daily_portfolio_mape_ops):
    forecast 998.39, backcast 961.22, settlement 1009.29,
    f_abs 199.34, b_abs 82.81, settlement_abs 1011.01 — which forces
    forecast_mape = 199.34/1011.01 = 0.19716916746619718 exactly.

    A negative settlement hour makes Σ|s| > |Σs|, as in the real data.
    """
    s0, s1 = -0.86, 1010.15          # Σs = 1009.29, Σ|s| = 1011.01
    f0, f1 = s0 + 94.22, s1 - 105.12  # Σf = 998.39, Σ|f-s| = 199.34
    b0, b1 = s0 + 17.37, s1 - 65.44   # Σb = 961.22, Σ|b-s| = 82.81
    df = spark.createDataFrame(
        [
            Row(proxy_date="2024-05-29", hour="0", zone="Z",
                forecast=f0, backcast=b0, settlement=s0),
            Row(proxy_date="2024-05-29", hour="1", zone="Z",
                forecast=f1, backcast=b1, settlement=s1),
        ]
    )
    out = daily_mape_aggregation(hourly_aggregation(df, sort=False)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["forecast"] == pytest.approx(998.39, abs=1e-9)
    assert r["backcast"] == pytest.approx(961.22, abs=1e-9)
    assert r["settlement"] == pytest.approx(1009.29, abs=1e-9)
    assert r["forecast_abs_error"] == pytest.approx(199.34, abs=1e-9)
    assert r["backcast_abs_error"] == pytest.approx(82.81, abs=1e-9)
    assert r["settlement_abs"] == pytest.approx(1011.01, abs=1e-9)
    # the FIXTURES.md invariant, to full double precision
    assert r["forecast_mape"] == pytest.approx(0.19716916746619718, abs=1e-12)
    assert r["backcast_mape"] == pytest.approx(82.81 / 1011.01, abs=1e-12)


def _random_raw(spark, n=500, seed=11, partitions=None):
    rng = random.Random(seed)
    rows = [
        (
            f"2024-03-{1 + rng.randrange(5):02d}",
            str(rng.randrange(24)),
            rng.choice(["A", "B"]),
            round(rng.uniform(0, 100), 2),
            round(rng.uniform(0, 100), 2),
            round(rng.uniform(-5, 100), 2),
        )
        for _ in range(n)
    ]
    df = spark.createDataFrame(
        rows, ["proxy_date", "hour", "zone", "forecast", "backcast", "settlement"]
    )
    return df.repartition(partitions) if partitions else df


def _daily_map(df):
    return {
        str(r["proxy_date"]): (
            round(r["forecast_mape"], 9),
            round(r["backcast_mape"], 9),
            round(r["forecast"], 6),
        )
        for r in daily_mape_aggregation(hourly_aggregation(df, sort=False)).collect()
    }


def test_wape_invariant_under_partitioning_and_order(spark):
    base = _daily_map(_random_raw(spark))
    repart = _daily_map(_random_raw(spark, partitions=13))
    shuffled = _daily_map(
        _random_raw(spark).orderBy(F.rand(seed=5))
    )
    assert base == repart == shuffled
    assert len(base) == 5


def test_label_anonymization_idempotent_mapping(spark):
    from mape_calculation_and_anonymization_spark.functions.labels import (
        anonymize_label_column,
    )

    labels = ["Beta", "Alpha", "Gamma"]
    df = spark.createDataFrame([(x,) for x in labels] * 3, ["customer"])
    out1 = df.select(
        anonymize_label_column("customer", labels).alias("a")
    ).collect()
    out2 = df.select(
        anonymize_label_column("customer", sorted(labels)).alias("a")
    ).collect()
    assert [r["a"] for r in out1] == [r["a"] for r in out2]
    # sorted-order indices: Alpha→1, Beta→2, Gamma→3
    assert out1[0]["a"] == "ANON_CLIENT 2"


def test_uid_pseudonyms_stable_across_partitionings(spark, tmp_path):
    from mape_calculation_and_anonymization_spark.operators.keys import (
        uid_anonymization,
    )

    df = spark.createDataFrame([(str(i), i) for i in range(100)], ["uid", "v"])
    a = {
        r["v"]: r["uid"]
        for r in uid_anonymization("uid", df, str(tmp_path / "k1")).collect()
    }
    b = {
        r["v"]: r["uid"]
        for r in uid_anonymization(
            "uid", df.repartition(17), str(tmp_path / "k2")
        ).collect()
    }
    assert a == b


def test_perturbation_linearity(spark):
    df = spark.createDataFrame([Row(Amount=float(x)) for x in (0, 1, -3, 2.5)])
    out = [r["Amount"] for r in perturb_values(df).orderBy("Amount").collect()]
    expect = sorted(x * 1.0125 for x in (0, 1, -3, 2.5))
    assert out == pytest.approx(expect)
    # applying to a doubled input doubles the output (linearity)
    df2 = spark.createDataFrame([Row(Amount=2.0 * x) for x in (1.0, 2.5)])
    out2 = sorted(r["Amount"] for r in perturb_values(df2).collect())
    assert out2 == pytest.approx([2 * x * 1.0125 for x in (1.0, 2.5)])
