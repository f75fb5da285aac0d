"""Distribution-drift monitors for lake ingest.

A 100-TB training-data lake lands drops continuously; schema-drift is
caught by column profiling (``profile_orders`` /
``profile_orders_approx``), but a drop whose schema is fine can still
carry a silently shifted VALUE distribution (an upstream unit change,
a truncated feed, a new client mix). The standard per-drop check is
the **population stability index** (PSI, the credit-scoring industry's
drift metric; see e.g. Yurdakul, "Statistical properties of population
stability index", 2018):

    PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)

over a common binning of the reference window (yesterday / the
training snapshot) and the current window (today's drop), with the
conventional reading ``<0.1`` stable, ``0.1–0.2`` moderate shift,
``>0.2`` actionable drift.

Design choices, all made for engine portability (the DuckDB oracle
re-derives the exact numbers) and scale:

* **Fixed-width binning** (:func:`privacy.band` floor semantics), not
  reference quantiles: quantile edges would need a per-release sort or
  sketch and make the oracle depend on percentile tie-breaking;
  fixed-width edges are a pure per-row expression, identical in every
  engine, and the width is a contract the monitor publishes.
* **Additive smoothing** ``p_i = (n_i + s) / (N + s·B)`` with ``s=0.5``
  (Jeffreys) over the union of bins observed in EITHER window, so a
  bin that is empty on one side contributes a finite, defined term
  instead of ±∞ — the conventional guard for PSI's ln(0) blow-up.

Scale shape: one map-side-combinable hash aggregate per window (the
two windows are usually different partition ranges of the same table,
so both are partition-pruned scans), a full-outer join on the
ANSWER-SIZED (group, bin) frame, and a second answer-sized aggregate
back to one row per group. No row-level joins, no windows over global
orderings, no driver collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mape_calculation_and_anonymization_spark.operators.privacy import band


def population_stability(
    ref: DataFrame,
    cur: DataFrame,
    group_cols: list[str],
    value_col: str,
    bin_width: float,
    smoothing: float = 0.5,
    threshold: float = 0.2,
) -> DataFrame:
    """PSI of ``value_col`` between a reference and a current frame,
    one row per ``group_cols`` tuple: ``n_ref``/``n_cur`` (window row
    counts), ``n_bins`` (union-of-windows bin count), ``psi`` (rounded
    to 6), and ``drift_flag`` (``psi > threshold``). Rows with a NULL
    value are excluded from both windows (they are the profiler's
    ``n_nulls`` concern, not a distribution bin)."""

    def hist(df: DataFrame, n_name: str) -> DataFrame:
        return (
            df.filter(F.col(value_col).isNotNull())
            .groupBy(*group_cols, band(value_col, bin_width).alias("_bin"))
            .agg(F.count(F.lit(1)).alias(n_name))
        )

    joined = hist(ref, "_n_ref").join(
        hist(cur, "_n_cur"), [*group_cols, "_bin"], "full_outer"
    ).select(
        *group_cols,
        "_bin",
        F.coalesce("_n_ref", F.lit(0)).alias("_n_ref"),
        F.coalesce("_n_cur", F.lit(0)).alias("_n_cur"),
    )
    s = float(smoothing)
    grp = joined.groupBy(*group_cols).agg(
        F.sum("_n_ref").alias("n_ref"),
        F.sum("_n_cur").alias("n_cur"),
        F.count(F.lit(1)).alias("n_bins"),
        F.collect_list(F.struct("_n_ref", "_n_cur")).alias("_cells"),
    )
    # the per-bin term needs the group totals, so it is evaluated as a
    # higher-order AGGREGATE over the answer-sized bin cells (a group
    # has at most range/width bins — this is a fold over a tiny array,
    # not a second shuffle)
    p = (
        "(CAST(c._n_ref AS DOUBLE) + {s}) / (CAST(n_ref AS DOUBLE) + {s} * n_bins)"
    ).format(s=s)
    q = (
        "(CAST(c._n_cur AS DOUBLE) + {s}) / (CAST(n_cur AS DOUBLE) + {s} * n_bins)"
    ).format(s=s)
    # array_sort gives the fold a deterministic order run-to-run (the
    # sum is mathematically order-free; floats aren't, and 6-decimal
    # rounding should not depend on collect_list's arrival order)
    psi = F.expr(
        f"aggregate(array_sort(_cells), CAST(0.0 AS DOUBLE),"
        f" (acc, c) -> acc + (({p}) - ({q})) * ln(({p}) / ({q})))"
    )
    return grp.select(
        *group_cols,
        "n_ref",
        "n_cur",
        "n_bins",
        F.round(psi, 6).alias("psi"),
        (F.round(psi, 6) > F.lit(float(threshold))).alias("drift_flag"),
    )
