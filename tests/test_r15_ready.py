"""Round-15-ready query/oracle pairs, parity-tested NOW.

The round-14 evidence chain froze the registry at 181 entries
(ROUND_PROCEDURE.md, registry-freeze rule), so these pairs are built
and verified in r14 but debut in r15's window with a 2-line
registration each. The check here is the DRIVER'S compare
(oracle_utils.compare_query — rows, schema, value hash) at sf0.001;
registration day should be mechanical.
"""

import __spark_entry__ as e
from tests.oracle_utils import compare_query

SF = "/root/testdata/sf0.001"


def test_exactsubstr_cut_parity(spark):
    ok, msg = compare_query(
        spark, SF, e._q_exactsubstr_cut, e._EXACTSUBSTR_CUT_ORACLE
    )
    assert ok, msg


def test_exactsubstr_cut_conservation(spark):
    """Per-doc conservation + answer sanity at sf0.001: removed +
    clean == original token count, and the planted dup density of the
    testdata yields at least one cut document."""
    rows = e._q_exactsubstr_cut(spark, SF).collect()
    docs = {
        r["doc_id"]: len(r["text"].strip().lower().split())
        for r in e.load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
        if r["text"] is not None
    }
    assert len(rows) == len(docs)
    assert any(r["action"] == "cut" for r in rows)
    for r in rows:
        # re.split-vs-str.split parity only diverges on empty text,
        # which this fixture does not contain
        assert r["tokens_removed"] + r["n_tokens_clean"] == docs[r["doc_id"]]


def test_semantic_dedup_gated_parity(spark):
    ok, msg = compare_query(
        spark,
        SF,
        e._q_semantic_dedup_gated,
        e._semantic_dedup_gated_oracle(SF),
    )
    assert ok, msg


def test_semantic_dedup_gated_keep_semantics(spark):
    """Pipeline-level pins at sf0.001: every gate-passing original
    survives (its known-bad twin can never dominate it), every twin
    drops, and originals failing their own gates drop with their twin
    (whole-group drop) — so kept == the passing originals exactly."""
    rows = {r["vec_id"]: r for r in e._q_semantic_dedup_gated(spark, SF).collect()}
    originals = {v: r for v, r in rows.items() if v < 1_000_000}
    twins = {v: r for v, r in rows.items() if v >= 1_000_000}
    assert originals and twins
    assert not any(r["kept"] for r in twins.values())
    for v, r in originals.items():
        assert r["kept"] == r["passed"], v
    assert any(r["kept"] for r in originals.values())
    assert any(not r["passed"] for r in originals.values()), (
        "fixture should contain at least one gate-failing doc or the "
        "whole-group-drop branch is untested"
    )


def test_minhash_incremental_parity(spark):
    ok, msg = compare_query(
        spark,
        SF,
        e._q_minhash_incremental,
        e._minhash_incremental_oracle(SF),
    )
    assert ok, msg


def test_minhash_incremental_answer_shape(spark):
    """Every planted twin pairs with its original as new_standing
    (jaccard well above 0.6 for multi-gram docs), and the answer is
    exactly the registered full-pipeline query's pairs restricted to
    twin-touching ones."""
    rows = e._q_minhash_incremental(spark, SF).collect()
    assert rows
    got = {(r["id_a"], r["id_b"]): r["pair_type"] for r in rows}
    full = {
        (r["id_a"], r["id_b"])
        for r in e._q_dedup_minhash_pairs(spark, SF).collect()
        if r["id_a"] >= 1_000_000 or r["id_b"] >= 1_000_000
    }
    assert set(got) == full
    for (ia, ib), t in got.items():
        assert t == (
            "new_new" if ia >= 1_000_000 and ib >= 1_000_000
            else "new_standing"
        )
