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
    (Morton) key. Columns must already be non-negative integers of
    bounded range — clamp/bucketize upstream (the usual recipe maps
    each dimension to its quantile rank first).

    Unrolled shift/or expression tree: ``bits × n_cols`` ops, all
    inside whole-stage codegen — no UDF.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if n == 0:
        raise ValueError("zvalue needs at least one column")
    if bits * n > 63:
        raise ValueError(f"{bits} bits x {n} cols exceeds a signed long")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
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
