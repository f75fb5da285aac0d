"""Round-17-ready query/oracle pairs, parity-tested NOW.

The round-16 evidence chain froze the registry at 189 entries
(ROUND_PROCEDURE.md, registry-freeze rule), so these pairs are built
and verified in r16 but debut in r17's window with a 2-line
registration each. The check here is the DRIVER'S compare
(oracle_utils.compare_query — rows, schema, value hash) at sf0.001;
registration day should be mechanical.
"""

from pyspark.sql import functions as F

import __spark_entry__ as e
from tests.oracle_utils import compare_query

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# rerank_fused_topk — exact-rescore rerank over the hybrid shortlist
# ---------------------------------------------------------------------------


def test_rerank_fused_topk_parity(spark):
    ok, msg = compare_query(
        spark, SF, e._q_rerank_fused_topk, e._RERANK_FUSED_ORACLE
    )
    assert ok, msg


def test_rerank_fused_topk_shape(spark):
    """Every query emits a rerank top-5 with contiguous ranks from 1,
    scores descending in rank order, and the displayed blend equal to
    0.5·cosine + 0.5·jaccard of the displayed features (to rounding)."""
    rows = e._q_rerank_fused_topk(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert by_q  # non-degenerate
    for q, rs in by_q.items():
        ranks = sorted(r["rerank"] for r in rs)
        assert ranks == list(range(1, len(ranks) + 1)), (q, ranks)
        ordered = sorted(rs, key=lambda r: r["rerank"])
        scores = [r["rerank_score"] for r in ordered]
        assert scores == sorted(scores, reverse=True)
        for r in rs:
            blend = 0.5 * r["cosine_sim"] + 0.5 * r["jaccard_sim"]
            # displayed columns round independently of the ranking
            # score; allow the displayed-vs-recombined rounding slack
            assert abs(r["rerank_score"] - blend) < 2e-6, r


def test_r17_ready_plan_shapes(spark):
    """Exchange budgets for all four r17-ready queries, so a refactor
    before registration day can't silently regress them: the rerank
    adds only broadcasts plus one answer-sized rank-window exchange
    over the registered hybrid's plan (its BNLJ is the ANN leg's
    intentional dimension-broadcast shape); the keep-best scorecard
    is the single-exchange hash aggregate; the text scorecard holds
    at two; the incremental split at four (union-map join, profile
    agg, profile join-back, final projection partitioning)."""
    from mape_calculation_and_anonymization_spark.plans.report import audit_query

    budgets = {
        "rerank": (e._q_rerank_fused_topk, 7),
        "leak_inc": (e._q_leakage_split_incremental, 4),
        "kb_card": (e._q_dedup_keep_best_scorecard, 1),
        "txt_card": (e._q_text_scorecard, 2),
    }
    for name, (fn, budget) in budgets.items():
        row = audit_query(fn(spark, SF))
        assert not row["cartesian"], name
        assert row["exchanges"] <= budget, (name, row)


def test_rescore_completes_missing_feature(spark):
    """Operator contract: a candidate surfaced by only one leg (so
    RRF saw one reciprocal) still gets BOTH exact features from the
    rerank — that's the stage's whole point — and the blend ranking
    can overturn the fused order."""
    from mape_calculation_and_anonymization_spark.operators.fusion import (
        rescore_top_k,
    )

    cand = spark.createDataFrame(
        [(1, 10), (1, 11)], ["query_id", "doc_id"]
    )
    texts = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (10, "alpha beta gamma delta"),  # lexical twin of the query
            (11, "zeta eta theta iota"),  # lexically disjoint
        ],
        ["doc_id", "text"],
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (10, [0.0, 1.0]),  # orthogonal to the query
            (11, [1.0, 0.0]),  # cosine twin of the query
        ],
        ["vec_id", "embedding"],
    )
    out = {
        r["doc_id"]: r
        for r in rescore_top_k(cand, texts, emb, k=2).collect()
    }
    assert out[10]["cosine_sim"] == 0.0 and out[10]["jaccard_sim"] == 1.0
    assert out[11]["cosine_sim"] == 1.0 and out[11]["jaccard_sim"] == 0.0
    # equal blends (0.5 each): doc_id breaks the tie
    assert out[10]["rerank"] == 1 and out[11]["rerank"] == 2


# ---------------------------------------------------------------------------
# text_scorecard — fusion of text_token_stats + text_quality +
# text_repetition
# ---------------------------------------------------------------------------


def test_text_scorecard_parity(spark):
    ok, msg = compare_query(
        spark, SF, e._q_text_scorecard, e._TEXT_SCORECARD_ORACLE
    )
    assert ok, msg


def test_text_scorecard_equals_parents(spark):
    """Fusion correctness against the three REGISTERED parents on the
    same corpus: every scorecard column equals the corresponding
    parent column row-for-row."""
    card = {r["doc_id"]: r for r in e._q_text_scorecard(spark, SF).collect()}
    tok = {r["doc_id"]: r for r in e._q_text_token_stats(spark, SF).collect()}
    qual = {r["doc_id"]: r for r in e._q_text_quality(spark, SF).collect()}
    rep = {r["doc_id"]: r for r in e._q_text_repetition(spark, SF).collect()}
    assert set(card) == set(tok) == set(qual) == set(rep)
    for d, r in card.items():
        assert (r["n_tokens"], r["n_bpeish"]) == (
            tok[d]["n_tokens"],
            tok[d]["n_bpeish"],
        )
        assert (
            r["punct_ratio"],
            r["stopword_ratio"],
            r["mean_token_len"],
            r["quality"],
        ) == (
            qual[d]["punct_ratio"],
            qual[d]["stopword_ratio"],
            qual[d]["mean_token_len"],
            qual[d]["quality"],
        )
        assert (r["rep3"], r["keep"]) == (rep[d]["rep3"], rep[d]["keep"])


def test_text_scorecard_two_scans(spark):
    """The fusion's plan claim: documents scanned exactly twice (the
    metric projection + the gram explode) where the three parents
    together scan it four times. load_table surfaces the fixture as
    a Scan ExistingRDD node (the nanosAsLong workaround), so count
    document-schema scans, not parquet paths."""
    import re

    from mape_calculation_and_anonymization_spark.plans.audit import physical_plan

    plan = physical_plan(e._q_text_scorecard(spark, SF))
    doc_scans = re.findall(r"Scan ExistingRDD\[doc_id#\d+L?,text#", plan)
    assert len(doc_scans) == 2, plan
    assert "CartesianProduct" not in plan


def test_repetition_stats_join_to_default_unchanged(spark):
    """The join_to seam must be invisible to existing callers: with
    the default None the output frame is identical (columns and
    rows) to the pre-seam contract."""
    from mape_calculation_and_anonymization_spark.operators.text import (
        ngram_repetition_stats,
    )

    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "x y"), (3, None)], ["doc_id", "text"]
    )
    out = ngram_repetition_stats(df, "doc_id", "text", 3)
    assert out.columns == ["doc_id", "rep3"]
    rows = {r["doc_id"]: r["rep3"] for r in out.collect()}
    # "a b c a b c": grams [abc,bca,cab,abc] → 1 - 3/4
    assert abs(rows[1] - 0.25) < 1e-9
    assert rows[2] == 0.0 and rows[3] == 0.0


# ---------------------------------------------------------------------------
# dedup_keep_best_scorecard — fusion of dedup_keep_best + _gated
# ---------------------------------------------------------------------------


def test_keep_best_scorecard_parity(spark):
    ok, msg = compare_query(
        spark,
        SF,
        e._q_dedup_keep_best_scorecard,
        e._keep_best_scorecard_oracle(),
    )
    assert ok, msg


def test_keep_best_scorecard_equals_parents(spark):
    """Fusion correctness against the REGISTERED parents on the same
    corpus: the scorecard's ungated columns equal dedup_keep_best's
    rows, its gated columns equal dedup_keep_best_gated's — including
    the whole-cluster-drop NULLs."""
    fused = {
        r["cluster"]: r
        for r in e._q_dedup_keep_best_scorecard(spark, SF).collect()
    }
    best = {
        r["cluster"]: r for r in e._q_dedup_keep_best(spark, SF).collect()
    }
    gated = {
        r["cluster"]: r
        for r in e._q_dedup_keep_best_gated(spark, SF).collect()
    }
    assert set(fused) == set(best) == set(gated)
    for c, r in fused.items():
        assert r["kept_id"] == best[c]["kept_id"]
        assert r["kept_quality"] == best[c]["quality"]
        assert r["n_members"] == best[c]["n_members"]
        assert r["kept_id_gated"] == gated[c]["kept_id"]
        assert r["kept_quality_gated"] == gated[c]["kept_quality"]
        assert r["n_pass"] == gated[c]["n_pass"]


def test_scorecard_operator_no_window(spark):
    """The fusion's plan claim: ONE shuffle exchange (the groupBy), no
    Window operator at all — each parent pays an exchange + sort."""
    from mape_calculation_and_anonymization_spark.plans.audit import physical_plan

    df = e._q_dedup_keep_best_scorecard(spark, SF)
    plan = physical_plan(df)
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_scorecard_gated_null_and_tie_semantics(spark):
    """Hand frame: NULL passed == FAIL; all-fail cluster drops whole
    (gated NULLs) while the ungated pick survives; quality tie breaks
    on the smaller id in BOTH decisions."""
    from mape_calculation_and_anonymization_spark.operators.dedup import (
        cluster_representatives_scorecard,
    )

    rows = [
        # cluster 1: all fail the gate (one NULL = FAIL)
        (1, 11, 0.9, None),
        (1, 12, 0.8, False),
        # cluster 2: tie on quality, both pass → id 21 wins both
        (2, 22, 0.7, True),
        (2, 21, 0.7, True),
        # cluster 3: best quality fails, runner-up passes
        (3, 31, 0.95, False),
        (3, 32, 0.60, True),
    ]
    df = spark.createDataFrame(
        rows, "cluster INT, doc_id INT, quality DOUBLE, passed BOOLEAN"
    )
    out = {
        r["cluster"]: r
        for r in cluster_representatives_scorecard(df).collect()
    }
    assert out[1]["kept_id"] == 11 and out[1]["kept_id_gated"] is None
    assert out[1]["kept_quality_gated"] is None and out[1]["n_pass"] == 0
    assert out[2]["kept_id"] == 21 and out[2]["kept_id_gated"] == 21
    assert out[3]["kept_id"] == 31 and out[3]["kept_id_gated"] == 32
    assert out[3]["kept_quality"] == 0.95
    assert out[3]["kept_quality_gated"] == 0.60


# ---------------------------------------------------------------------------
# leakage_split_incremental — frozen-standing split re-assignment
# ---------------------------------------------------------------------------


def test_leakage_split_incremental_parity(spark):
    ok, msg = compare_query(
        spark,
        SF,
        e._q_leakage_split_incremental,
        e._leakage_split_incremental_oracle(),
    )
    assert ok, msg


def test_incremental_split_rules(spark):
    """Operator contract on a hand frame exercising all four fates:
    standing docs keep their split even when their cluster id changed
    (frozen), new docs inherit the min-id standing member's split,
    all-new clusters take the md5-band rule, and only a cluster whose
    STANDING members straddle a boundary is leak-flagged."""
    from mape_calculation_and_anonymization_spark.operators.sampling import (
        hash_split,
        leakage_safe_split_incremental,
    )

    fr = {"train": 0.5, "test": 0.5}
    standing = spark.createDataFrame(
        [(1, "train"), (2, "test"), (3, "train")], ["doc_id", "split"]
    )
    new = spark.createDataFrame([(10,), (11,), (12,)], ["doc_id"])
    # cluster 1 = merged {1 (train), 2 (test), 10}: a standing
    # straddle — frozen splits stay, 10 takes anchor split(1), all
    # five rows of the cluster flag. 11 joins 3's cluster (inherit).
    # 12 is absent from the map: all-new singleton, band rule.
    cmap = spark.createDataFrame(
        [(1, 1), (2, 1), (10, 1), (3, 3), (11, 3)], ["doc_id", "cluster"]
    )
    out = {
        r["doc_id"]: r
        for r in leakage_safe_split_incremental(
            standing, new, cmap, fr
        ).collect()
    }
    assert len(out) == 6
    # frozen
    assert out[1]["split"] == "train" and out[2]["split"] == "test"
    assert out[3]["split"] == "train"
    # anchor inherit (min standing id 1 → train), conflict flags all
    assert out[10]["split"] == "train"
    for d in (1, 2, 10):
        assert out[d]["leak_flag"] is True, d
        assert out[d]["cluster"] == 1
    # clean inherit, no flag
    assert out[11]["split"] == "train" and out[11]["leak_flag"] is False
    # all-new singleton: the parent's band rule on its own id
    expected = spark.createDataFrame([(12,)], ["doc_id"]).select(
        hash_split(F.col("doc_id"), fr).alias("s")
    ).collect()[0]["s"]
    assert out[12]["split"] == expected
    assert out[12]["cluster"] == 12 and out[12]["leak_flag"] is False
    assert out[12]["is_new"] is True and out[1]["is_new"] is False


def test_incremental_split_empty_standing_degenerates(spark):
    """On an empty standing ledger the incremental operator must
    equal leakage_safe_split exactly (same corpus, same map) — the
    frozen-standing contract's degeneracy pin, mirroring
    semantic_dedup_incremental's."""
    from mape_calculation_and_anonymization_spark.operators.sampling import (
        leakage_safe_split,
        leakage_safe_split_incremental,
    )

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    cmap = docs.select(
        "doc_id", (F.col("doc_id") - F.pmod("doc_id", F.lit(7))).alias("cluster")
    )
    standing = spark.createDataFrame([], "doc_id LONG, split STRING")
    inc = {
        r["doc_id"]: (r["cluster"], r["split"])
        for r in leakage_safe_split_incremental(
            standing, docs, cmap, fr
        ).collect()
    }
    batch = {
        r["doc_id"]: (r["cluster"], r["split"])
        for r in leakage_safe_split(docs, cmap, fr).collect()
    }
    assert inc == batch


def test_incremental_split_day2_stability(spark):
    """Chaining: running the operator again with day-1's output as
    standing and an EMPTY drop reproduces day-1's assignment exactly
    (idempotence of the frozen contract)."""
    from mape_calculation_and_anonymization_spark.operators.sampling import (
        leakage_safe_split_incremental,
    )

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    day1 = e._q_leakage_split_incremental(spark, SF)
    standing2 = day1.select("doc_id", "split")
    cmap2 = day1.select("doc_id", "cluster")
    empty = spark.createDataFrame([], "doc_id LONG")
    day2 = leakage_safe_split_incremental(standing2, empty, cmap2, fr)
    d1 = {(r["doc_id"], r["split"]) for r in day1.collect()}
    d2 = {(r["doc_id"], r["split"]) for r in day2.collect()}
    assert d1 == d2
