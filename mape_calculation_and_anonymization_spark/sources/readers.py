"""Sources: CSV / parquet scans, latest-partition discovery.

Reference parity (see SURVEY.md §2.1):
  S1  CSV scan            — reference/main.py:159,183; anonymize_datasets.py:164
  S2  Parquet scan        — reference/anonymize_datasets.py:39,191
  S3  Latest-partition    — reference/anonymize_datasets.py:154-159
  S4  Mixed-format folder — reference/anonymize_datasets.py:159-213
  P3  Lowercase columns   — reference/main.py:160,184; anonymize_datasets.py:133

Scale notes: S1/S2 are plain ``spark.read`` so Catalyst gets predicate
pushdown + column pruning for free. S3 supports two layouts: Hive-style
``date=YYYY-MM-DD/`` partitioned data (filter → partition pruning, no
listing on the driver) and the reference's plain dated folders (driver
lists one directory level — metadata-only, O(#folders)).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def lowercase_columns(df: DataFrame) -> DataFrame:
    """P3 — normalize every column name to lowercase.

    Metadata-only (a projection rename); no shuffle, no scan cost.
    """
    lowered = [c.lower() for c in df.columns]
    if lowered == list(df.columns):
        return df
    return df.toDF(*lowered)


def read_csv(
    spark: SparkSession,
    path: str,
    lowercase: bool = True,
    infer_schema: bool = True,
) -> DataFrame:
    """S1 — header CSV scan with schema inference (as the reference's
    ``pd.read_csv`` does). Prefer passing an explicit schema via
    ``spark.read.schema(...)`` in production paths; inference triggers
    an extra pass over the file."""
    df = (
        spark.read.option("header", "true")
        .option("inferSchema", str(infer_schema).lower())
        .csv(path)
    )
    return lowercase_columns(df) if lowercase else df


def read_parquet(spark: SparkSession, path: str, lowercase: bool = False) -> DataFrame:
    """S2 — parquet scan (vectorized reader, pruning/pushdown free)."""
    df = spark.read.parquet(path)
    return lowercase_columns(df) if lowercase else df


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    lowercase: bool = False,
) -> DataFrame:
    """Newline-delimited JSON scan (the interchange format most
    crawl/event feeds arrive in). Pass ``schema`` (DDL string) in
    production: without it Spark runs a full inference pass over the
    files, and at 100 TB that doubles the scan. Malformed lines go to
    NULL-rows under the default PERMISSIVE mode instead of failing the
    pipeline."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    return lowercase_columns(df) if lowercase else df


def read_parquet_merged(
    spark: SparkSession, path: str, lowercase: bool = False
) -> DataFrame:
    """Schema-evolution parquet scan: ``mergeSchema`` unions the
    footers of every drop under ``path``, so a dataset whose later
    drops ADDED columns reads as one frame (old drops yield NULL for
    the new columns) — the append-only lake layout where each
    ingestion wave may carry a wider schema.

    Costs a footer read per file at planning (not a data scan); at
    100 TB prefer declaring the superset schema explicitly via
    ``spark.read.schema(...)`` and leave mergeSchema for exploration
    or migration backfills."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    return lowercase_columns(df) if lowercase else df


def latest_partition(input_directory: str) -> str:
    """S3 — newest lexicographic child folder (``YYYY-MM-DD`` sorts
    correctly as text). Driver-side single listing, O(#folders) —
    the same cost the reference pays, and fine at any data scale
    because only *names* are listed."""
    children = [
        d
        for d in os.listdir(input_directory)
        if os.path.isdir(os.path.join(input_directory, d))
    ]
    if not children:
        raise FileNotFoundError(f"no dated folders under {input_directory}")
    return max(children)


@dataclass
class FolderFile:
    """One file discovered by :func:`read_input_folder`."""

    filename: str
    path: str
    fmt: str  # 'csv' | 'parquet'


def read_input_folder(
    spark: SparkSession,
    input_directory: str,
    date_folder: str | None = None,
) -> list[tuple[FolderFile, DataFrame]]:
    """S3+S4 — discover the newest dated folder and open every CSV /
    parquet file in it as a (lazy) DataFrame.

    The per-file loop is driver-side metadata iteration only — each
    DataFrame stays lazy and distributed. Files of the same format are
    intentionally *not* unioned: the anonymizer contract is
    one-output-file-per-input-file (reference/anonymize_datasets.py:159-213).
    """
    folder = date_folder or latest_partition(input_directory)
    base = os.path.join(input_directory, folder)
    out: list[tuple[FolderFile, DataFrame]] = []
    for filename in sorted(os.listdir(base)):
        path = os.path.join(base, filename)
        if filename.endswith(".csv"):
            out.append((FolderFile(filename, path, "csv"), read_csv(spark, path, lowercase=False)))
        elif filename.endswith(".parquet"):
            out.append((FolderFile(filename, path, "parquet"), read_parquet(spark, path)))
    return out
