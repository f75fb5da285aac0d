"""Round-16-ready query/oracle pairs, parity-tested NOW.

The round-15 evidence chain froze the registry at 187 entries
(ROUND_PROCEDURE.md, registry-freeze rule), so these pairs are built
and verified in r15 but debut in r16's window with a 2-line
registration each. The check here is the DRIVER'S compare
(oracle_utils.compare_query — rows, schema, value hash) at sf0.001;
registration day should be mechanical.
"""

from pyspark.sql import functions as F

import __spark_entry__ as e
from tests.oracle_utils import compare_query

SF = "/root/testdata/sf0.001"


def test_hybrid_search_rrf_parity(spark):
    ok, msg = compare_query(
        spark, SF, e._q_hybrid_search_rrf, e._HYBRID_RRF_ORACLE
    )
    assert ok, msg


def test_hybrid_search_rrf_shape(spark):
    """Every query emits a fused top-10, ranks are contiguous from 1,
    and a doc present in BOTH legs at rank 1 dominates any
    single-leg doc (2/(60+1) > 1/(60+1) ≥ any single reciprocal)."""
    rows = e._q_hybrid_search_rrf(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert by_q  # non-degenerate
    for q, rs in by_q.items():
        ranks = sorted(r["fused_rank"] for r in rs)
        assert ranks == list(range(1, len(ranks) + 1)), (q, ranks)
        scores = [r["rrf_score"] for r in sorted(rs, key=lambda r: r["fused_rank"])]
        assert scores == sorted(scores, reverse=True)


def test_rrf_fuse_both_lists_dominate(spark):
    """Operator contract: a doc at rank 1 in BOTH lists outscores a
    doc at rank 1 in only one list; absent-from-one-list docs get
    exactly the single reciprocal; id breaks score ties."""
    from mape_calculation_and_anonymization_spark.operators.fusion import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], ["query_id", "doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(1, 10, 1), (1, 12, 1)], ["query_id", "doc_id", "rank"]
    )
    out = {
        r["doc_id"]: (r["rrf_score"], r["fused_rank"])
        for r in rrf_fuse(a, b, k=10).collect()
    }
    assert out[10][1] == 1  # in both lists at rank 1 → wins
    # scores are rounded to 6 decimals in the projection
    assert abs(out[10][0] - 2 / 61) < 1e-6
    assert abs(out[12][0] - 1 / 61) < 1e-6
    assert abs(out[11][0] - 1 / 62) < 1e-6
    # 12 (1/61) beats 11 (1/62); ties would fall back to id asc
    assert out[12][1] == 2 and out[11][1] == 3


def test_jaccard_top_k_self_excluded_and_ranked(spark):
    from mape_calculation_and_anonymization_spark.operators.fusion import (
        jaccard_top_k,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma epsilon"),
            (2, "zeta eta theta iota"),
            (3, "alpha beta gamma delta extra"),
        ],
        ["doc_id", "text"],
    )
    q = docs.filter(F.col("doc_id") == 0)
    got = {
        r["doc_id"]: r["rank"]
        for r in jaccard_top_k(q, docs, n=3, k=10).collect()
    }
    assert 0 not in got  # self excluded
    assert got[3] == 1 and got[1] == 2  # 3 shares 2 grams, 1 shares 1
    assert 2 not in got  # no shared shingle → no candidate row


def test_semantic_dedup_incremental_parity(spark):
    ok, msg = compare_query(
        spark,
        SF,
        e._q_semantic_dedup_incremental,
        e._semantic_dedup_incremental_oracle(SF),
    )
    assert ok, msg


def test_semantic_dedup_incremental_fates(spark):
    """The three planted drop fates land exactly: every ×1.01 twin
    dropped against its kept standing original (frozen-standing rule),
    every ×1.02 twin dropped (its ×1.01 sibling precedes it in-drop),
    every negated copy kept (cosine −1 to its original)."""
    rows = e._q_semantic_dedup_incremental(spark, SF).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["vec_id"] // 1_000_000, []).append(r["kept"])
    assert set(by_bucket) == {1, 2, 3}
    assert not any(by_bucket[1]) and len(by_bucket[1]) > 0
    assert not any(by_bucket[2]) and len(by_bucket[2]) > 0
    assert all(by_bucket[3]) and len(by_bucket[3]) > 0


def test_semantic_dedup_incremental_empty_standing_equals_full(spark):
    """With an empty standing corpus the incremental rule degenerates
    to semantic_dedup of the drop exactly."""
    from mape_calculation_and_anonymization_spark.fixtures import load_table
    from mape_calculation_and_anonymization_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_incremental,
    )

    _, centroids = e._ivf_index_cached(spark, SF, n_clusters=48)
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    twins = emb.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(1.01)).alias(
            "embedding"
        ),
    )
    drop = emb.unionByName(twins)
    empty = spark.createDataFrame([], drop.schema).withColumn(
        "kept", F.lit(True)
    )
    inc = {
        r["vec_id"]: (r["cluster"], r["centroid_sim"], r["kept"])
        for r in semantic_dedup_incremental(
            empty, drop, centroids, threshold=0.98
        ).collect()
    }
    full = {
        r["vec_id"]: (r["cluster"], r["centroid_sim"], r["kept"])
        for r in semantic_dedup(drop, centroids, threshold=0.98).collect()
    }
    assert inc == full and len(inc) > 0


def test_leakage_safe_split_parity(spark):
    ok, msg = compare_query(
        spark, SF, e._q_leakage_safe_split, e._leakage_split_oracle()
    )
    assert ok, msg


def test_leakage_safe_split_guarantee(spark):
    """THE property: zero verified near-dup pairs straddle a split
    boundary (every planted twin lands with its original), while the
    doc-keyed split demonstrably leaks on the same corpus — the
    failure mode this operator exists to close. Proportions stay
    near 80/10/10 at cluster granularity."""
    import os

    from mape_calculation_and_anonymization_spark.operators.sampling import (
        hash_split,
    )

    split = {
        r["doc_id"]: r["split"]
        for r in e._q_leakage_safe_split(spark, SF).collect()
    }
    pairs = spark.read.parquet(
        os.path.join(e._jaccard_index(spark, SF), "pairs")
    ).collect()
    assert pairs  # the planted twins guarantee a non-empty pair set
    straddling = [
        (p["id_a"], p["id_b"])
        for p in pairs
        if split[p["id_a"]] != split[p["id_b"]]
    ]
    assert straddling == []
    # the naive doc-keyed split DOES leak on this corpus
    corpus = spark.createDataFrame(
        [(i,) for i in split], ["doc_id"]
    ).withColumn(
        "split",
        hash_split("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}),
    )
    naive = {r["doc_id"]: r["split"] for r in corpus.collect()}
    naive_straddling = [
        p for p in pairs if naive[p["id_a"]] != naive[p["id_b"]]
    ]
    assert naive_straddling  # the mode being closed is real here
    # proportions: cluster-granular, so looser than the doc split
    from collections import Counter

    frac = Counter(split.values())
    n = len(split)
    assert 0.7 <= frac["train"] / n <= 0.9
    assert 0.04 <= frac["val"] / n <= 0.16
    assert 0.04 <= frac["test"] / n <= 0.16
