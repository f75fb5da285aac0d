"""Incremental key-table maintenance over a stream (foreachBatch).

The reference's only cross-run state is the persistent uid→pseudonym
key table parquet, upserted once per batch run
(reference/anonymize_datasets.py:27-84). This module maintains the
SAME table incrementally from a stream: each micro-batch discovers
unseen uids, derives their blake2b pseudonyms, and appends them via
the atomic-swap writer — so a live ingest and the batch anonymizer
share one consistent mapping.

foreachBatch is the right tool (not a stateful operator): the key
table is an external artifact with its own durability contract, and
foreachBatch hands each micro-batch to ordinary batch code where the
existing upsert logic (existing-mappings-win, distinct-unmatched
discovery) applies unchanged. Batches are processed serially per
query, so the read-modify-swap is single-writer by construction.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import blake2b_10hex
from ..operators.keys import load_key_table, save_key_table


def upsert_batch_into_key_table(
    batch_df: DataFrame, key_dir: str, col: str
) -> None:
    """One micro-batch worth of upsert: unseen uids → blake2b append.
    Idempotent (re-delivered batches add nothing), existing mappings
    always win — identical semantics to the batch anonymizer."""
    spark = batch_df.sparkSession
    hcol = f"{col}_"
    seen = batch_df.select(F.col(col).cast("string")).dropna().distinct()
    key_df = load_key_table(spark, key_dir, col)
    new_keys = seen.join(key_df.select(col), on=col, how="left_anti").withColumn(
        hcol, blake2b_10hex(F.col(col))
    )
    if new_keys.isEmpty():
        return
    updated = key_df.unionByName(new_keys).dropDuplicates([col, hcol])
    save_key_table(updated, key_dir, col)


def stream_key_table_upsert(
    stream_df: DataFrame,
    key_dir: str,
    col: str = "user_id",
    timeout_s: int = 300,
) -> None:
    """Drain ``stream_df`` with Trigger.AvailableNow, upserting the
    persistent key table once per micro-batch. Raises on timeout
    rather than leaving a partially-ingested table unreported."""

    def _upsert(batch_df: DataFrame, _batch_id: int) -> None:
        upsert_batch_into_key_table(batch_df, key_dir, col)

    q = (
        stream_df.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="key_upsert_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_s)
    finally:
        if q.isActive:
            q.stop()
    if not finished:
        raise TimeoutError(
            f"key-table upsert stream did not finish within {timeout_s}s"
        )
