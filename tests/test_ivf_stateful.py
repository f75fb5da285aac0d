"""IVF ANN recall vs brute force; stateful streaming WAPE vs batch."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mape_calculation_and_anonymization_spark.operators.ivf import (
    build_ivf_index,
    ivf_top_k,
)
from mape_calculation_and_anonymization_spark.operators.similarity import (
    brute_force_top_k,
)
from mape_calculation_and_anonymization_spark.streaming.stateful import (
    running_zone_wape,
)
from mape_calculation_and_anonymization_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
)

SF = "/root/testdata/sf0.001"


def _vectors(n=120, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    return [(i, [float(x) for x in vecs[i]]) for i in range(n)]


def test_ivf_full_probe_equals_brute_force(spark):
    rows = _vectors()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = df.filter(F.col("vec_id") < 8)
    assigned, centroids = build_ivf_index(df, n_clusters=6)
    # nprobe = k → exact: must equal brute force
    ivf_all = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_top_k(assigned, centroids, queries, k=3, nprobe=6).collect()
    }
    bf = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_top_k(df, queries, k=3).collect()
    }
    assert ivf_all == bf


def test_ivf_partial_probe_recall(spark):
    rows = _vectors()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = df.filter(F.col("vec_id") < 20)
    assigned, centroids = build_ivf_index(df, n_clusters=8)
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_top_k(assigned, centroids, queries, k=1, nprobe=3).collect()
        if r["rank"] == 1
    }
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_top_k(df, queries, k=1).collect()
        if r["rank"] == 1
    }
    # partial probe: top-1 recall should be decent even on random data
    assert len(got & bf) >= int(0.6 * len(bf))


def test_stateful_running_wape_equals_batch(spark):
    out = run_stream_to_memory(
        running_zone_wape(read_events_stream(spark, SF)), output_mode="update"
    )
    # with AvailableNow the final update per zone covers all events
    final = {}
    for r in out.collect():
        prev = final.get(r["zone"])
        if prev is None or r["n_events"] > prev["n_events"]:
            final[r["zone"]] = r
    from mape_calculation_and_anonymization_spark.fixtures import load_events

    batch = {
        r["zone"]: r
        for r in load_events(spark, SF)
        .groupBy(F.col("event_type").alias("zone"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.abs(F.col("value") * 1.05 - F.col("value"))).alias("f_abs"),
            F.sum(F.abs(F.col("value"))).alias("s_abs"),
        )
        .collect()
    }
    assert set(final) == set(batch)
    for z in batch:
        assert final[z]["n_events"] == batch[z]["n"]
        assert final[z]["forecast_abs_error"] == pytest.approx(batch[z]["f_abs"])
        assert final[z]["forecast_wape"] == pytest.approx(
            batch[z]["f_abs"] / batch[z]["s_abs"]
        )


def test_transform_with_state_user_activity(spark):
    """transformWithStateInPandas per-user totals == batch aggregate.
    Skips where the protobuf wheel (pyspark's state-server protocol)
    is absent — the operator raises a clear ImportError there, which
    the second assert pins."""
    import pytest

    from mape_calculation_and_anonymization_spark.streaming.stateful import (
        user_activity_totals,
    )

    try:
        import google.protobuf  # noqa: F401
        has_protobuf = True
    except ImportError:
        has_protobuf = False

    if not has_protobuf:
        with pytest.raises(ImportError, match="protobuf"):
            user_activity_totals(read_events_stream(spark, SF))
        pytest.skip("protobuf not installed; gate behavior verified")

    from pyspark.sql import functions as F

    from mape_calculation_and_anonymization_spark.fixtures import load_events

    out = run_stream_to_memory(
        user_activity_totals(read_events_stream(spark, SF)),
        output_mode="update",
    )
    final = {
        r["user_id"]: (r["n_events"], r["n_distinct_types"])
        for r in out.orderBy("n_events").collect()
    }  # last update per user wins in the dict
    batch = {
        r["user_id"]: (r["n"], r["d"])
        for r in load_events(spark, SF)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_type").alias("d"),
        )
        .collect()
    }
    assert final == batch
