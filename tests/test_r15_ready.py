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
