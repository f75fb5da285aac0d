"""Local re-implementation of the driver's Spark-vs-DuckDB compare:
row count + column set + order-insensitive value comparison. Used by
tests so oracle mismatches surface before the driver runs."""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / +0.0 and ulp noise surviving upstream rounding
        return round(v, 6) + 0.0
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    return v


def rows_to_canonical(columns, rows):
    """Sort columns by name, normalize cells, sort rows → comparable list."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(canon, key=lambda t: tuple((x is None, str(x)) for x in t))


# DuckDB result types Spark can never emit: the driver's value hash is
# type-sensitive, so an oracle producing one of these diverges even when
# the values are byte-identical (round-4 q12: SUM(CASE...) -> HUGEINT vs
# Spark bigint). Cast to BIGINT/DOUBLE in the oracle SQL instead.
_UNHASHABLE_DUCK_TYPES = {
    "HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT",
}


def compare_query(spark, sf_dir: str, query_fn, sql: str):
    """Returns (ok, message). Mirrors the driver's check semantics."""
    sdf = query_fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_types = [str(t) for t in rel.types]
    bad = [f"{c}:{t}" for c, t in zip(d_cols, d_types)
           if any(u in t.upper() for u in _UNHASHABLE_DUCK_TYPES)]
    if bad:
        return False, (
            f"oracle emits Spark-unrepresentable type(s) {bad} — the driver's "
            "type-sensitive hash will mismatch even on equal values; "
            "CAST(... AS BIGINT/DOUBLE) in the oracle SQL"
        )
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"

    s_canon = rows_to_canonical(s_cols, s_rows)
    d_canon = rows_to_canonical(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_canon, d_canon)):
        if a != b:
            return False, f"value mismatch at canonical row {i}:\n spark={a}\n duck ={b}"
    return True, f"ok ({len(s_rows)} rows, {len(s_cols)} cols)"
