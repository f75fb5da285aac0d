"""Data-layout operators: multi-dimensional clustering (Z-order).

Parquet data skipping works off per-row-group min/max statistics; a
table sorted on one column skips beautifully for that column and not
at all for any other. Z-ordering interleaves the bits of several
columns into one sort key, so a single sort tightens the min/max
spans of ALL participating columns at once — the standard lake-layout
technique (Delta OPTIMIZE ZORDER BY, Iceberg sort orders) for tables
queried along several independent dimensions.

Everything here is column expressions + one range repartition — the
sort is the only shuffle, and it is exactly the shuffle the layout
exists to pay once at write time so that every later scan skips.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into one Z
    (Morton) key. Columns should already be non-negative integers in
    ``[0, 2^bits)`` — bucketize upstream for unbounded/real-valued
    dimensions (:func:`quantile_rank_column` /
    :func:`zorder_write_auto`).

    Out-of-range values SATURATE at the domain edges
    (``[0, 2^bits - 1]``) instead of silently keeping only the low
    bits: mod-2^bits truncation would alias id ``257`` next to ``1``
    and scatter the layout (data-skipping quality silently degrades);
    saturation stays monotone, so an over-range tail merely collapses
    into the top bucket while every in-range value still sorts
    exactly.

    Unrolled shift/or expression tree: ``bits × n_cols`` ops, all
    inside whole-stage codegen — no UDF.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if n == 0:
        raise ValueError("zvalue needs at least one column")
    if bits * n > 63:
        raise ValueError(f"{bits} bits x {n} cols exceeds a signed long")
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(cs):
        clamped = F.least(
            F.greatest(c.cast("long"), F.lit(0).cast("long")),
            F.lit(top).cast("long"),
        )
        for b in range(bits):
            bit = F.shiftright(clamped, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write ``df`` Z-ordered on ``cols``: range-partition by the
    Z key (so each output file owns a contiguous Z range), sort within
    partitions, drop the key. Later scans filtering on ANY of ``cols``
    skip row groups via the tightened min/max spans.
    """
    keyed = df.withColumn("_z", zvalue(cols, bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("compression", "snappy")
        .parquet(path)
    )


def quantile_rank_column(
    df: DataFrame, col: str, bits: int = 8, rel_err: float = 0.001
) -> Column:
    """Map an arbitrary numeric column onto the bounded integer domain
    ``[0, 2^bits)`` by approximate-quantile bucketing — the standard
    prep that makes :func:`zvalue` applicable to real-valued or skewed
    dimensions (equal-POPULATION buckets, so the Morton key spreads
    rows evenly no matter the distribution).

    The quantile probe is one approx_percentile aggregate (a mergeable
    sketch — one pass, map-side combinable); the returned expression
    is a pure projection against the broadcast cut list."""
    n_buckets = 1 << bits
    cuts = (
        df.agg(
            F.percentile_approx(
                col,
                [i / n_buckets for i in range(1, n_buckets)],
                int(1.0 / rel_err),
            )
        ).first()[0]
    )
    # A row's bucket is the highest cut it exceeds, so the HIGHEST cut
    # must be the outermost when(): fold ascending, each new when()
    # wraps (and shadows) the chain built so far. One flat codegen
    # expression, ≤ n_buckets-1 comparisons per row.
    expr = F.lit(0)
    for i in range(len(cuts)):
        expr = F.when(F.col(col) > F.lit(cuts[i]), i + 1).otherwise(expr)
    return expr.cast("long")


def zorder_write_auto(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Z-order write for ARBITRARY numeric columns: each dimension is
    quantile-bucketed onto [0, 2^bits) first (one sketch aggregate per
    column), then written via :func:`zorder_write`'s range shuffle on
    the interleaved key."""
    bucketed = df
    tmp_cols = []
    for c in cols:
        bc = f"_zb_{c}"
        bucketed = bucketed.withColumn(bc, quantile_rank_column(df, c, bits))
        tmp_cols.append(bc)
    keyed = bucketed.withColumn("_z", zvalue(tmp_cols, bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *tmp_cols)
        .write.mode("overwrite")
        .option("compression", "snappy")
        .parquet(path)
    )
