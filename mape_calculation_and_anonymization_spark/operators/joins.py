"""Join operators beyond the reference's single left-equi join:
as-of joins (Spark has no native operator) and skew-safe salted
joins/aggregations for hot keys at scale.

As-of join strategy: Spark lacks ASOF JOIN, so it is composed from
built-ins — union the right ("quotes") stream into the left ("trades")
stream with a marker, then one `last(value, ignorenulls=True)` window
per key ordered by (ts, marker) forward-fills the most recent right
value onto each left row. Cost: ONE shuffle on the key + a per-key
sort — same asymptotics as a sort-merge join, no point-in-time
cross-join blowup.

Salting strategy: a hot key floods one reducer in a shuffle join. The
salted join replicates the (small-ish) build side `salt` ways and
splinters the probe side's hot keys across `salt` sub-keys, restoring
parallelism at the cost of `salt`× the build side — the classic
pre-AQE remedy, kept available because AQE's skew handling only
applies to sort-merge joins on statistics it can see.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    allow_unpartitioned: bool = False,
    tolerance: str | None = None,
) -> DataFrame:
    """Enrich each left row with the most recent right row at-or-before
    (``backward``) or the earliest at-or-after (``forward``) its ``on``
    timestamp, optionally matching ``by`` keys exactly.

    Equivalent to pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
    (with allow_exact_matches=True). Implemented as union + windowed
    forward-fill: one shuffle on ``by``.

    ``tolerance`` (an INTERVAL string, e.g. ``"1 hour"``) mirrors
    pandas merge_asof's: a match further than the tolerance from the
    left timestamp is rejected — its right columns come back NULL.
    The matched right timestamp rides along through the fill, so the
    gap test is a pure projection afterwards.

    ``by`` may only be empty with ``allow_unpartitioned=True``: an
    unpartitioned window collapses the whole frame onto ONE task —
    fine for dimension-sized rate tables, a scale-killer on facts.

    Left and right must not share non-key column names (pandas
    suffixes; here the union would silently NULL the shared column,
    so it is an error — rename before joining).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = by or []
    if not by and not allow_unpartitioned:
        raise ValueError(
            "asof_join with by=[] runs the whole frame through a single "
            "unpartitioned window; pass by keys, or acknowledge with "
            "allow_unpartitioned=True for dimension-sized inputs"
        )
    right_cols = right_cols or [
        c for c in right.columns if c != on and c not in by
    ]
    clashes = [c for c in right_cols if c in left.columns]
    if clashes:
        raise ValueError(
            f"asof_join: column(s) {clashes} exist on both sides; the "
            "union-based fill would overwrite the left values with NULLs. "
            "Rename one side (e.g. right.withColumnRenamed) first."
        )

    fill_cols = list(right_cols)
    if tolerance is not None:
        fill_cols.append("_r_on")

    l_marked = left.withColumn("_is_left", F.lit(1))
    for c in right_cols:
        l_marked = l_marked.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    if tolerance is not None:
        l_marked = l_marked.withColumn(
            "_r_on", F.lit(None).cast(right.schema[on].dataType)
        )
    r_marked = right.select(
        *by, F.col(on), *right_cols
    ).withColumn("_is_left", F.lit(0))
    if tolerance is not None:
        r_marked = r_marked.withColumn("_r_on", F.col(on))
    for c in left.columns:
        if c not in by and c != on:
            r_marked = r_marked.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l_marked.select(
        *by, on, "_is_left", *fill_cols,
        *[c for c in left.columns if c not in by and c != on],
    ).unionByName(
        r_marked.select(
            *by, on, "_is_left", *fill_cols,
            *[c for c in left.columns if c not in by and c != on],
        )
    )

    # Right rows order BEFORE left rows at the same timestamp so an
    # exact-timestamp match is visible to the left row (backward);
    # mirror for forward.
    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        fill = {c: F.last(F.col(c), ignorenulls=True).over(w) for c in fill_cols}
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        fill = {c: F.last(F.col(c), ignorenulls=True).over(w) for c in fill_cols}

    filled = unioned.withColumns(fill)
    out = filled.filter(F.col("_is_left") == 1).drop("_is_left")
    if tolerance is not None:
        gap_ok = (
            F.col(on) - F.col("_r_on") <= F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else F.col("_r_on") - F.col(on) <= F.expr(f"INTERVAL {tolerance}")
        )
        out = out.withColumns(
            {
                c: F.when(gap_ok, F.col(c)).otherwise(
                    F.lit(None).cast(right.schema[c].dataType)
                )
                for c in right_cols
            }
        ).drop("_r_on")
    return out


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi join with the probe side's keys splintered across ``salt``
    sub-keys and the build side replicated ``salt`` ways — hot probe
    keys no longer collapse onto one reducer.

    Row-identical to ``probe.join(build, on, how)`` for inner/left.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left")
    p = probe.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
    b = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = p.join(b, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    salt: int = 8,
) -> DataFrame:
    """Two-phase SUM aggregation with an explicit salt stage.

    NOTE: for plain algebraic aggregates Spark's partial aggregation
    already collapses hot keys map-side, so this exists for the cases
    where partial agg is defeated (high-cardinality intermediate
    states, e.g. collect_list/distinct-agg pipelines) — and as the
    documented pattern. Results are identical to a direct groupBy.
    """
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
    return phase1.groupBy(*keys).agg(*[F.sum(c).alias(c) for c in sum_cols])


def key_skew_stats(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """Heavy-hitter diagnostics for a join/aggregation key: the
    ``top_k`` most frequent keys with their row share and the ratio of
    each key's count to the mean per-key count — the number that tells
    you whether a plain shuffle join is safe or needs salting/AQE skew
    handling. One hash aggregate + a broadcast 1-row global stats
    frame; the top-k plans as TakeOrderedAndProject."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.avg("n_rows").alias("_mean"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            key_col,
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("row_share"),
            F.round(F.col("n_rows") / F.col("_mean"), 4).alias("skew_ratio"),
        )
        .orderBy(F.col("n_rows").desc(), key_col)
        .limit(top_k)
    )


def choose_salt(
    probe: DataFrame,
    on: str,
    skew_threshold: float = 4.0,
    max_salt: int = 16,
) -> int:
    """Decide a salt factor for a probe-side join key: returns 1 (no
    salting needed) when the max-key/mean-key count ratio is below
    ``skew_threshold``, otherwise a salt ≈ the observed ratio capped
    at ``max_salt``.

    The probe is a full per-key count — deliberately NOT a sample:
    key-hash sampling keeps or drops a key WHOLESALE, so a single hot
    key evades a 5% sample 95% of the time, and row-level sampling
    would need a row identity the frame may not have. The count is
    one scan with map-side partial aggregation, so only
    key-cardinality records shuffle — negligible next to the join
    being planned, deterministic, and exact. Two driver scalars
    (max, mean) come back — never row data.
    """
    row = (
        probe.groupBy(on)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"), F.avg("n").alias("mean"))
        .first()
    )
    if row is None or row["mx"] is None or not row["mean"]:
        return 1
    ratio = row["mx"] / row["mean"]
    if ratio < skew_threshold:
        return 1
    return min(max_salt, int(ratio))


def auto_salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    how: str = "inner",
    skew_threshold: float = 4.0,
    max_salt: int = 16,
) -> DataFrame:
    """Skew-adaptive equi join: measure probe-key skew with an exact
    per-key count probe (see :func:`choose_salt` for why it is
    deliberately NOT sampled), then run either the plain join or the
    salted join — row-identical either way (pinned by tests), the
    only difference is where the hot keys' rows land. Complements AQE
    skew handling: AQE can only split post-shuffle partitions of a
    sort-merge join; salting also covers the shuffled-hash path and
    keeps the decision explicit and logged.

    Only ``inner`` and ``left`` are supported — the same contract as
    :func:`salted_join` (the build side is replicated per salt, which
    would duplicate unmatched build rows under right/full). Validated
    eagerly so the failure is not data-dependent: without this check,
    ``how='right'`` would succeed on uniform data and only raise once
    skew was detected."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"auto_salted_join supports how='inner'|'left', got {how!r} "
            "(build-side salt replication would duplicate unmatched "
            "build rows under right/full joins)"
        )
    import logging

    salt = choose_salt(probe, on, skew_threshold, max_salt)
    if salt <= 1:
        return probe.join(build, on, how)
    logging.getLogger(__name__).info(
        "auto_salted_join: probe key %r exceeds skew threshold %.1f — "
        "salting with factor %d (build side replicated %dx)",
        on,
        skew_threshold,
        salt,
        salt,
    )
    return salted_join(probe, build, on, salt=salt, how=how)


def touch_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lookback: str = "INTERVAL 7 DAYS",
) -> DataFrame:
    """First-touch / last-touch attribution: for each conversion, the
    earliest and latest same-key touch inside
    ``[conversion.ts − lookback, conversion.ts]`` — the standard
    marketing-attribution pair (first = acquisition credit, last =
    closing credit). One row per conversion; conversions with NO
    in-window touch keep NULL touch columns (they are the
    "unattributed" bucket every report needs, never dropped).

    Shape: an equi-join on the key plus the event-time RANGE
    predicate (the stream-stream interval-join condition run in
    batch), then ONE hash aggregate per conversion taking
    ``min(struct(ts, id))`` / ``max(struct(ts, id))`` — the argmin
    and argmax share a single aggregation, and the deterministic
    struct tie-break (id after ts) makes the result reproducible in
    any engine. The join shuffles on the key only — at 100 TB the
    lookback bound keeps per-key match fan-out proportional to touch
    frequency within the window, never stream history; a skewed key
    routes through the salted-join helpers like any other hot-key
    join."""
    c = conversions.select(
        F.col(on).alias("_k"),
        F.col(id_col).alias("conversion_id"),
        F.col(ts_col).alias("conversion_ts"),
    )
    t = touches.select(
        F.col(on).alias("_k"),
        F.col(id_col).alias("_t_id"),
        F.col(ts_col).alias("_t_ts"),
    )
    cond = (
        (c["_k"] == t["_k"])
        & (t["_t_ts"] >= c["conversion_ts"] - F.expr(lookback))
        & (t["_t_ts"] <= c["conversion_ts"])
    )
    joined = c.join(t, cond, "left_outer")
    agg = joined.groupBy(
        c["_k"].alias(on), "conversion_id", "conversion_ts"
    ).agg(
        F.min(F.struct("_t_ts", "_t_id")).alias("_first"),
        F.max(F.struct("_t_ts", "_t_id")).alias("_last"),
        F.count("_t_id").alias("n_touches"),
    )
    return agg.select(
        on,
        "conversion_id",
        "conversion_ts",
        F.col("_first._t_id").alias("first_touch_id"),
        F.col("_first._t_ts").alias("first_touch_ts"),
        F.col("_last._t_id").alias("last_touch_id"),
        F.col("_last._t_ts").alias("last_touch_ts"),
        "n_touches",
    )


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    action_col: str = "action",
) -> DataFrame:
    """Batch MERGE (upsert) expressed as pure dataflow: full-outer
    join on ``key``; matched rows take the UPDATE side's values,
    unmatched update rows INSERT, unmatched target rows pass through
    UNCHANGED — `MERGE INTO ... WHEN MATCHED THEN UPDATE WHEN NOT
    MATCHED THEN INSERT` for engines/table-formats without a native
    MERGE, plus an ``action`` audit column (updated/inserted/
    unchanged) every CDC-apply job wants to report. Both inputs must
    share a schema (asserted eagerly — a silent column mismatch
    would coalesce the wrong values).

    Update semantics are SPARSE: a NULL field in an update row
    inherits the target's value (coalesce update-first), so partial
    updates don't wipe columns; to explicitly null a field, model it
    as a sentinel upstream. Inserted rows keep their NULLs (no target
    to inherit from).

    Scale shape: ONE full-outer shuffle on the merge key (broadcast
    if the update batch is dim-sized — Catalyst picks it up from
    statistics or an explicit broadcast() on the caller's side); the
    coalesce projection is codegen'd. The snapshot-swap write
    (write merged → atomic rename) is the same pattern the key-table
    upsert uses (operators/keys.py)."""
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"merge_upsert: target columns {sorted(target.columns)} != "
            f"update columns {sorted(updates.columns)} — both sides must "
            "share a schema"
        )
    # SQL MERGE raises "multiple source rows matched" when the update
    # batch carries the same key twice; silently full-outer-joining
    # would FAN OUT the matched target row (the snapshot would hold
    # the key twice, both 'updated'). Check eagerly — one
    # map-side-combinable aggregate over the update batch, which is
    # dim-sized by contract; the probe reads ONE scalar row.
    dup = (
        updates.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .first()
    )
    if dup is not None:
        raise ValueError(
            f"merge_upsert: update batch contains key {dup[key]!r} "
            f"{dup['_n']} times — MERGE requires at most one source row "
            "per key (dedupe the batch first, e.g. keep the latest by "
            "a version column)"
        )
    value_cols = [c for c in target.columns if c != key]
    t = target.select(
        F.col(key).alias("_tk"), *[F.col(c).alias(f"_t_{c}") for c in value_cols]
    )
    u = updates.select(
        F.col(key).alias("_uk"), *[F.col(c).alias(f"_u_{c}") for c in value_cols]
    )
    joined = t.join(u, t["_tk"] == u["_uk"], "full_outer")
    action = (
        F.when(F.col("_tk").isNotNull() & F.col("_uk").isNotNull(), "updated")
        .when(F.col("_tk").isNull(), "inserted")
        .otherwise("unchanged")
    )
    return joined.select(
        F.coalesce("_tk", "_uk").alias(key),
        *[
            F.coalesce(F.col(f"_u_{c}"), F.col(f"_t_{c}")).alias(c)
            for c in value_cols
        ],
        action.alias(action_col),
    )
