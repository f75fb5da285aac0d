"""Persistent pseudonym key tables (J1/F4/U1/A4/Q6).

The reference keeps one parquet per uid column
(``./key/key_{col}.snappy.parquet``) mapping original → pseudonym and
upserts it on every run (reference/anonymize_datasets.py:27-84). That
read-modify-overwrite of a path currently being read fails naively in
Spark, so the upsert here writes to a temp directory and atomically
swaps it in (single-writer semantics, as in the reference).

Scale notes: the key table is a dimension but can grow large (one row
per distinct uid ever seen). Nothing here collects it: enrichment is
a join (AQE auto-broadcasts while small, shuffles when not), new-uid
discovery is a distinct over the unmatched rows, and the pseudonym
derivation runs distributed through the blake2b pandas UDF.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mape_calculation_and_anonymization_spark.functions.hashing import blake2b_10hex


def key_table_path(key_dir: str, col: str) -> str:
    """Mirrors the reference's layout (anonymize_datasets.py:35)."""
    return os.path.join(key_dir, f"key_{col}.snappy.parquet")


def load_key_table(spark: SparkSession, key_dir: str, col: str) -> DataFrame:
    """Existing key table, or an empty two-column frame (fresh run —
    reference/anonymize_datasets.py:41-44)."""
    path = key_table_path(key_dir, col)
    if os.path.exists(path):
        return spark.read.parquet(path)
    schema = T.StructType(
        [
            T.StructField(col, T.StringType()),
            T.StructField(f"{col}_", T.StringType()),
        ]
    )
    return spark.createDataFrame([], schema)


def save_key_table(key_df: DataFrame, key_dir: str, col: str) -> None:
    """Atomic overwrite: write to a temp dir, swap, drop the old one.

    Unlike the reference (which assumes ./key/ exists and crashes on
    fresh checkouts — Q6), the directory is created on demand.
    """
    os.makedirs(key_dir, exist_ok=True)
    final_path = key_table_path(key_dir, col)
    tmp_path = f"{final_path}.__tmp_{uuid.uuid4().hex[:8]}"
    key_df.write.mode("overwrite").option("compression", "snappy").parquet(tmp_path)
    old_path = f"{final_path}.__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(final_path):
        os.rename(final_path, old_path)
    os.rename(tmp_path, final_path)
    if os.path.exists(old_path):
        shutil.rmtree(old_path, ignore_errors=True)


def uid_anonymization(
    col: str, df: DataFrame, key_dir: str = "./key"
) -> DataFrame:
    """X5+J1+F4+U1+A4 — replace ``col`` with a stable 10-hex blake2b
    pseudonym, keeping pseudonyms consistent across runs through the
    persistent key table (reference/anonymize_datasets.py:27-84).

    Existing mappings win (so a manually-edited key table is honored);
    unseen uids get ``blake2b(uid)`` and are appended to the table.

    Null uids stay null — a conscious fix: the reference's
    ``astype(str)`` coerced missing values to the literal string
    ``'nan'`` and pseudonymized that.
    """
    spark = df.sparkSession
    df = df.withColumn(col, F.col(col).cast("string"))
    key_df = load_key_table(spark, key_dir, col)
    hcol = f"{col}_"

    if hcol in key_df.columns and len(key_df.columns) >= 2:
        # F4+U1+A4: distinct unmatched uids → new pseudonyms → upsert.
        # (left_anti against the key table = the reference's
        # null-match filter after its left join.)
        new_keys = (
            df.select(col)
            .distinct()
            .join(key_df.select(col), on=col, how="left_anti")
            .withColumn(hcol, blake2b_10hex(F.col(col)))
        )
        updated = key_df.unionByName(new_keys).dropDuplicates([col, hcol])
        save_key_table(updated, key_dir, col)
        # Enrich from the freshly-written table: the pre-swap key_df
        # plan must not leak into the returned (lazy) DataFrame, or it
        # would re-read a path the swap just replaced. The updated
        # table covers every uid, so no digest fallback is needed —
        # existing mappings win by construction.
        fresh = spark.read.parquet(key_table_path(key_dir, col))
        result = df.join(fresh.select(col, hcol), on=col, how="left")
        return result.drop(col).withColumnRenamed(hcol, col)

    # fresh key table (or legacy file missing the hash column — Q6:
    # the reference rebuilds from scratch in that case)
    hashed = df.withColumn(hcol, blake2b_10hex(F.col(col)))
    save_key_table(hashed.select(col, hcol).dropDuplicates(), key_dir, col)
    return hashed.drop(col).withColumnRenamed(hcol, col)
