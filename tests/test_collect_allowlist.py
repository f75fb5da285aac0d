"""Driver-collect audit: the engine's 100-TB posture claims nothing
ever collects a fact-proportional frame to the driver (VERDICT r7
"collect surface is dimension-sized by contract"). This test freezes
that audit as code: every ``.collect()`` / ``.toPandas()`` /
``.first()`` / ``.take(`` / ``.toLocalIterator(`` call site in the
package and the entry file must appear in the allowlist below, each
with its boundedness argument. Adding a driver action anywhere else
fails this test until the new site is audited and listed — the
reviewer-in-the-loop a fact-table collect should have to get past.

Counts are per (file, pattern): line numbers drift with edits, but a
NEW call site changes a count and names the file, which is enough to
find and audit it.
"""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "mape_calculation_and_anonymization_spark")

PATTERNS = {
    "collect": re.compile(r"\.collect\(\)"),
    "toPandas": re.compile(r"\.toPandas\(\)"),
    "first": re.compile(r"\.first\(\)"),
    "take": re.compile(r"\.take\("),
    "toLocalIterator": re.compile(r"\.toLocalIterator\("),
}

# (relpath, pattern) -> (count, boundedness argument)
ALLOWLIST = {
    # label/zone universes: distinct over a low-cardinality dimension
    # column; the collected list sizes the anonymization mapping
    ("functions/labels.py", "collect"): (
        1,
        "distinct label universe (dimension-sized by contract)",
    ),
    ("operators/mape.py", "collect"): (
        1,
        "distinct zone universe for the pivot column set (zones are a "
        "small fixed dimension)",
    ),
    # PQ: codebook training sample and the query batch, both explicitly
    # guarded (max_queries raises on a corpus-sized query frame)
    ("operators/pq.py", "collect"): (
        2,
        "bounded training sample + max_queries-guarded query batch "
        "(pq.py:45-56 raises on corpus-sized input)",
    ),
    # BPE: vocab fold (max_words-guarded) and the per-iteration argmax
    ("operators/bpe.py", "collect"): (
        1,
        "max_words-guarded word-frequency vocab (the HF/SentencePiece "
        "driver-side merge-loop shape)",
    ),
    ("operators/bpe.py", "first"): (
        1,
        "ONE best-pair row per merge iteration (answer-sized scalar)",
    ),
    # scalar probes: signature width, max timestamp/partition, stats
    ("operators/dedup.py", "first"): (
        1,
        "signature length probe — one scalar row",
    ),
    ("operators/layout.py", "first"): (
        1,
        "single aggregate scalar for layout sizing",
    ),
    ("operators/joins.py", "first"): (
        1,
        "skew decision reads ONE aggregated key-stats row",
    ),
    ("operators/similarity.py", "first"): (
        1,
        "embedding dimensionality probe — one scalar row",
    ),
    ("sources/sinks.py", "first"): (
        1,
        "MAX(partition) scalar for latest-partition discovery",
    ),
    ("sources/sinks.py", "collect"): (
        1,
        "affected-file list for targeted delete: file paths of a "
        "broadcast-semi-join probe, O(affected files) not O(rows)",
    ),
    ("sources/sinks.py", "toPandas"): (
        1,
        "Excel workbook sheets are post-aggregation report frames "
        "(the reference's xlsx surface is driver-side by nature)",
    ),
    ("__spark_entry__.py", "toPandas"): (
        1,
        "daily MAPE report frame (days x zones, dimension-sized) "
        "feeding the Excel sink query",
    ),
    ("__spark_entry__.py", "first"): (
        1,
        "MAX(ts) scalar for the sentinel stream fixture",
    ),
}


def _strip_comments(text: str) -> str:
    """Drop comments without being fooled by '#' inside string
    literals (a line like ``x = "#"; df.collect()`` must still
    surface its collect site). A minimal quote-state scan beats
    line.split('#') for an audit whose job is to be hard to evade."""
    out_lines = []
    for line in text.splitlines():
        quote = None
        for i, ch in enumerate(line):
            if quote:
                if ch == quote and line[i - 1] != "\\":
                    quote = None
            elif ch in "'\"":
                quote = ch
            elif ch == "#":
                line = line[:i]
                break
        out_lines.append(line)
    return "\n".join(out_lines)


def _scan():
    found = {}
    targets = [os.path.join(REPO, "__spark_entry__.py")]
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        targets += [os.path.join(root, f) for f in files if f.endswith(".py")]
    for path in targets:
        rel = os.path.relpath(path, REPO)
        rel = rel.removeprefix("mape_calculation_and_anonymization_spark" + os.sep)
        body = _strip_comments(open(path).read())
        for pname, rx in PATTERNS.items():
            n = len(rx.findall(body))
            if n:
                found[(rel, pname)] = n
    return found


def test_every_driver_collect_site_is_audited():
    found = _scan()
    expected = {k: v[0] for k, v in ALLOWLIST.items()}
    new_sites = {k: v for k, v in found.items() if k not in expected}
    assert not new_sites, (
        f"unaudited driver-collect sites {new_sites} — verify each is "
        "dimension-sized/guarded, then add it to ALLOWLIST with its "
        "boundedness argument"
    )
    grown = {
        k: (expected[k], found[k]) for k in found if found[k] > expected[k]
    }
    assert not grown, (
        f"driver-collect sites grew {grown} (allowed, found) — audit "
        "the new call and bump the allowlist count"
    )


def test_no_row_at_a_time_python_udfs():
    """The hot-path posture claim "no row-at-a-time Python UDF exists
    in the repo" (every Python escape hatch is Arrow-batched:
    pandas_udf / applyInPandas / mapInPandas), frozen as a source
    audit. ``udf(`` outside a ``pandas_udf`` spelling is the
    per-row-pickle path that is ~10-100x slower than Arrow batches —
    new code wanting Python must take the vectorized route."""
    rx = re.compile(r"(?<!pandas_)\budf\s*\(")
    offenders = []
    targets = [os.path.join(REPO, "__spark_entry__.py")]
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        targets += [os.path.join(root, f) for f in files if f.endswith(".py")]
    for path in targets:
        body = _strip_comments(open(path).read())
        for i, line in enumerate(body.splitlines(), 1):
            if rx.search(line):
                offenders.append(f"{os.path.relpath(path, REPO)}:{i}")
    assert not offenders, (
        f"row-at-a-time Python UDF call sites: {offenders} — use a "
        "pandas_udf / applyInPandas / mapInPandas Arrow batch instead"
    )


def test_allowlist_carries_no_dead_entries():
    """Shrinking is progress — but the allowlist must shrink with it,
    or the stale entry would mask a future re-introduction."""
    found = _scan()
    dead = [k for k in ALLOWLIST if found.get(k, 0) == 0]
    missing = {
        k: (ALLOWLIST[k][0], found.get(k, 0))
        for k in ALLOWLIST
        if 0 < found.get(k, 0) < ALLOWLIST[k][0]
    }
    assert not dead, f"allowlist entries with no remaining call site: {dead}"
    assert not missing, (
        f"call sites shrank {missing} (allowed, found) — lower the counts"
    )
