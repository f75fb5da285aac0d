"""preflight --changed's static dependency fingerprints
(preflight_deps.py, VERDICT r8 stretch item 6): the selection is only
trustworthy if an edit to a dependency MOVES the fingerprints of
exactly the queries that could be affected — these tests pin both
directions (sensitivity and isolation) by briefly appending a comment
to a real source file and recomputing (restored in ``finally``; the
appended probe is a no-op even if a crash leaked it)."""

import os

from preflight_deps import query_fingerprints

SF_DIR = "/root/testdata/sf0.01"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _with_probe(relpath, probe="\n# preflight-deps probe\n"):
    path = os.path.join(REPO, relpath)
    src = open(path).read()

    class _Ctx:
        def __enter__(self):
            with open(path, "w") as fh:
                fh.write(src + probe)

        def __exit__(self, *exc):
            with open(path, "w") as fh:
                fh.write(src)

    return _Ctx()


def test_fingerprints_are_stable_and_cover_registry():
    import __spark_entry__ as entrymod

    a = query_fingerprints(SF_DIR)
    b = query_fingerprints(SF_DIR)
    assert a == b
    assert set(a) == set(entrymod.queries())


def test_package_module_edit_flags_its_family_only():
    """operators/graph.py feeds the graph family directly and the ANN
    family transitively (similarity/ivf/pq import chains) — and must
    NOT flag unrelated relational queries."""
    base = query_fingerprints(SF_DIR)
    with _with_probe(
        "mape_calculation_and_anonymization_spark/operators/graph.py"
    ):
        edited = query_fingerprints(SF_DIR)
    changed = {n for n in base if base[n] != edited[n]}
    assert {"triangle_count", "pagerank_influencers", "dedup_clusters"} <= changed
    for untouched in ("q1_pricing_summary", "mape_daily_portfolio",
                      "stream_distinct_users", "text_quality"):
        assert untouched not in changed, untouched


def test_entry_helper_edit_flags_transitive_consumers():
    """Appending to the ENTRY file moves every query's fingerprint
    (module-level constants/imports are shared); more usefully, a
    streaming-module edit flags the stream family but not TPC-H."""
    base = query_fingerprints(SF_DIR)
    with _with_probe(
        "mape_calculation_and_anonymization_spark/streaming/windows.py"
    ):
        edited = query_fingerprints(SF_DIR)
    changed = {n for n in base if base[n] != edited[n]}
    assert {"stream_distinct_users", "stream_dedup_fingerprints",
            "stream_outer_join"} <= changed
    assert "q1_pricing_summary" not in changed
    assert "dedup_exact_groups" not in changed
