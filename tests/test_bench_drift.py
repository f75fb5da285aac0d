"""Bench-history drift discrimination (VERDICT r13 item 2).

Pins the LOGIC of bench.drift_report — pure functions, no Spark. The
real report over live timings is informational output (BENCH_DRIFT.json
+ a stderr line per sf0.1 bench run), never a pytest gate: failing CI
on ambient machine load would be flaky by construction.
"""

import json

import bench


def _history(n_runs, queries, jitter=None):
    """Synthetic history: n_runs records over the given base timings,
    with optional per-run multiplicative jitter (deterministic)."""
    recs = []
    for i in range(n_runs):
        mult = jitter[i] if jitter else 1.0
        recs.append(
            {
                "ts": 1000 + i,
                "commit": f"c{i}",
                "sf": 0.1,
                "runs": 3,
                "total": sum(queries.values()) * mult,
                "queries": {q: v * mult for q, v in queries.items()},
            }
        )
    return recs


BASE = {
    "q_fast": 0.3,
    "q_mid": 1.0,
    "q_slow": 3.0,
    "q_heavy": 5.0,
    "q_tiny": 0.05,
}


def test_uniform_load_shift_flags_nothing():
    """A hot machine scales every query by the same ratio — the
    session-ratio normalization must absorb it completely, even at
    1.5× (well past the ±15% band)."""
    hist = _history(6, BASE, jitter=[1.0, 0.95, 1.05, 1.0, 0.9, 1.1])
    current = {q: v * 1.5 for q, v in BASE.items()}
    rep = bench.drift_report(current, hist)
    assert rep["flags"] == []
    assert 1.4 <= rep["session_ratio"] <= 1.6
    assert rep["n_compared"] == len(BASE)


def test_single_query_regression_flagged_exactly():
    """One query jumping 2× against flat siblings is the regression
    signature — exactly that query is flagged, with the load
    component (1.1× uniform) factored out first."""
    hist = _history(6, BASE, jitter=[1.0, 0.95, 1.05, 1.0, 0.9, 1.1])
    current = {q: v * 1.1 for q, v in BASE.items()}
    current["q_slow"] = BASE["q_slow"] * 2.2  # 2× beyond the load shift
    rep = bench.drift_report(current, hist)
    assert [f["query"] for f in rep["flags"]] == ["q_slow"]
    f = rep["flags"][0]
    assert f["normalized_ratio"] > 1.8
    assert f["n_history"] == 6


def test_tiny_absolute_excursions_not_flagged():
    """A 0.05 s query tripling is scheduler noise, not a regression —
    the absolute floor keeps it out even though its ratio is large."""
    hist = _history(6, BASE)
    current = dict(BASE)
    current["q_tiny"] = 0.14  # ~3× but +0.09s absolute
    rep = bench.drift_report(current, hist)
    assert rep["flags"] == []


def test_insufficient_history_reported_not_flagged():
    """A query with fewer than min_history samples (a fresh debut) is
    reported separately, never judged."""
    hist = _history(2, BASE)
    current = dict(BASE, q_new=9.9)
    rep = bench.drift_report(current, hist)
    assert rep["n_compared"] == 0
    assert set(rep["insufficient_history"]) == set(current)
    hist = _history(4, BASE)
    rep = bench.drift_report(current, hist)
    assert rep["insufficient_history"] == ["q_new"]
    assert rep["n_compared"] == len(BASE)


def test_variance_aware_iqr_gate():
    """A query whose own history is NOISY needs a larger excursion to
    flag: 1.4× on a stable query flags, the same 1.4× on a query whose
    history IQR spans that range does not."""
    hist = []
    # q_a rock-stable at 2.0; q_b swings 0.6..1.6 across runs; three
    # flat siblings anchor the session-load estimate
    for i, b in enumerate([0.6, 1.6, 0.8, 1.4, 1.0, 1.2]):
        hist.append(
            {
                "ts": i,
                "commit": f"c{i}",
                "sf": 0.1,
                "runs": 3,
                "total": 0,
                "queries": {
                    "q_a": 2.0, "q_b": b,
                    "s1": 1.0, "s2": 1.0, "s3": 1.0,
                },
            }
        )
    rep = bench.drift_report(
        {"q_a": 2.8, "q_b": 1.5, "s1": 1.0, "s2": 1.0, "s3": 1.0}, hist
    )
    # q_a: 1.4x on zero-IQR history -> flagged; q_b: 1.36x vs its
    # median but well inside 2x its own 0.6s IQR -> absorbed
    assert [f["query"] for f in rep["flags"]] == ["q_a"]


def test_uniform_regression_surfaces_session_alert():
    """ADVICE r14: a suite-wide regression is absorbed into
    session_ratio by design, so the report must at least SURFACE an
    out-of-band session_ratio as suspicious. History band ±10% →
    a uniform 1.5× run alerts (no per-query flags), a 1.05× run
    stays quiet."""
    hist = _history(6, BASE, jitter=[1.0, 0.95, 1.05, 1.0, 0.9, 1.1])
    rep = bench.drift_report({q: v * 1.5 for q, v in BASE.items()}, hist)
    assert rep["flags"] == []
    assert rep["session_ratio_alert"] is True
    assert rep["session_band"] is not None
    rep = bench.drift_report({q: v * 1.05 for q, v in BASE.items()}, hist)
    assert rep["session_ratio_alert"] is False


def test_session_band_robust_to_loaded_history_outlier():
    """ADVICE r15: the first-cut band was the all-time max total
    spread, so ONE loaded past run (2× here) permanently blunted the
    uniform-regression alert — threshold 2.2×, silently passing a
    uniform 1.4× code regression. The quiet-subset band (records with
    own load ratio ≤1.15) must alert on 1.4× regardless of the
    outlier, and must not widen when the registry grows (ratios are
    per-query-normalized, not total-based)."""
    hist = _history(
        7, BASE, jitter=[1.0, 0.95, 1.05, 1.0, 0.9, 2.0, 1.1]
    )
    # registry growth between records must not inflate the band: give
    # the newest record an extra query (bigger total, same load)
    hist[-1]["queries"]["q_new"] = 4.0
    hist[-1]["total"] += 4.0
    rep = bench.drift_report({q: v * 1.4 for q, v in BASE.items()}, hist)
    assert rep["session_ratio_alert"] is True, rep
    assert rep["session_band"] <= 1.15
    # quiet run still quiet
    rep = bench.drift_report({q: v * 1.05 for q, v in BASE.items()}, hist)
    assert rep["session_ratio_alert"] is False


def test_session_band_recenters_on_bimodal_history():
    """When loaded runs are the MAJORITY, per-query medians re-center
    on the loaded mode — the band self-normalizes (loaded records sit
    at ratio 1.0, the old quiet runs below) and stays defined rather
    than exploding; a current run matching the dominant mode is quiet."""
    hist = _history(6, BASE, jitter=[1.0, 1.0, 1.45, 1.45, 1.45, 1.45])
    rep = bench.drift_report(
        {q: v * 1.45 for q, v in BASE.items()}, hist
    )
    assert rep["session_band"] is not None
    assert rep["session_ratio_alert"] is False


def test_history_reset_drops_pre_shape_change_records():
    """HISTORY_RESETS (round 16): a query whose implementation shape
    intentionally changed compares only against post-change records —
    without the reset, a deep old-shape history pins the median for
    dozens of refreshes and the flag cries wolf on a baseline the
    query can never return to (the x5 r14-upgrade case)."""
    # the x5 geometry: the new shape is a MINORITY of a deep history
    # (10 old-shape + 3 new-shape records), so Q3 still sits in the
    # old-shape mode and the IQR gate cannot absorb the excursion
    hist = _history(13, BASE)
    for i, rec in enumerate(hist):
        if i >= 10:  # shape changed at ts 1010
            rec["queries"]["q_slow"] = 9.0
    cur = dict(BASE, q_slow=9.2)
    # without a reset: 9.2 vs the old-shape median 3.0 → flagged
    rep = bench.drift_report(cur, hist, resets={})
    assert [f["query"] for f in rep["flags"]] == ["q_slow"]
    # with the reset: 9.2 vs the new-shape median 9.0 → quiet
    rep = bench.drift_report(cur, hist, resets={"q_slow": 1010})
    assert rep["flags"] == []
    # and a genuine post-change regression still flags
    rep = bench.drift_report(
        dict(BASE, q_slow=15.0), hist, resets={"q_slow": 1010}
    )
    assert [f["query"] for f in rep["flags"]] == ["q_slow"]


def test_iqr_gate_meaningful_at_min_history():
    """ADVICE r14: at min_history=3 the old max-min IQR made the
    variance gate span the whole sample range; interpolated quartiles
    let a clear 1.6× single-query excursion flag even on a 3-deep,
    mildly-jittered history."""
    hist = _history(3, BASE, jitter=[0.95, 1.0, 1.05])
    current = dict(BASE)
    current["q_slow"] = BASE["q_slow"] * 1.6
    rep = bench.drift_report(current, hist)
    assert [f["query"] for f in rep["flags"]] == ["q_slow"]


def test_history_file_format_and_order():
    """The committed BENCH_HISTORY.jsonl parses line-by-line, is
    chronologically ordered, and every record carries the fields the
    report consumes (sf pinned to the BENCH_LOCAL artifact's 0.1)."""
    recs = bench.load_history()
    assert len(recs) >= 30  # seeded from the git history of BENCH_LOCAL
    assert all(
        {"ts", "commit", "sf", "total", "queries"} <= set(r) for r in recs
    )
    assert all(abs(r["sf"] - 0.1) < 1e-9 for r in recs)
    assert [r["ts"] for r in recs] == sorted(r["ts"] for r in recs)
    # and the file is valid JSONL byte-for-byte
    with open(bench.HISTORY_PATH) as fh:
        for line in fh:
            json.loads(line)


def test_check_stress_envelope_logic():
    """Pure envelope check: inside passes, outside names the operator,
    a missing operator is itself a violation (silent drop-out must
    not read as a pass)."""
    env = {"op_a": 4.0, "op_b": 16.0}
    ok = {"op_a": {"ratio": 3.9}, "op_b": {"ratio": 15.0}}
    assert bench.check_stress_envelope(ok, env) == []
    bad = {"op_a": {"ratio": 4.5}, "op_b": {"ratio": 15.0}}
    v = bench.check_stress_envelope(bad, env)
    assert len(v) == 1 and v[0].startswith("op_a:")
    v = bench.check_stress_envelope({"op_a": {"ratio": 1.0}}, env)
    assert len(v) == 1 and "missing" in v[0]


def test_stress_corpus_deterministic_and_dup_dense(spark):
    """stress_corpus is a pure function of (sf_dir, factor): two
    builds are row-identical; ids are disjoint across replicas; every
    replica perturbs the text (no exact collapse) while replicating
    every interior shingle."""
    sf_dir = "/root/testdata/sf0.001"
    a = bench.stress_corpus(spark, sf_dir, 3)
    b = bench.stress_corpus(spark, sf_dir, 3)
    rows_a = sorted(
        (r["doc_id"], r["text"]) for r in a.collect()
    )
    rows_b = sorted(
        (r["doc_id"], r["text"]) for r in b.collect()
    )
    assert rows_a == rows_b
    base_n = bench.stress_corpus(spark, sf_dir, 1).count()
    assert len(rows_a) == 3 * base_n
    ids = [d for d, _ in rows_a]
    assert len(set(ids)) == len(ids)  # disjoint ids across replicas
    texts = [t for _, t in rows_a if t is not None]
    assert len(set(texts)) == len(texts)  # perturbed, no exact dups
