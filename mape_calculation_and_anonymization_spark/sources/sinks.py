"""Sinks: snappy parquet, multi-sheet Excel, output naming.

Reference parity (SURVEY.md §2.1):
  K1  Parquet snappy sink — reference/anonymize_datasets.py:66,78,180,207
  K2  Multi-sheet Excel   — reference/main.py:147-153
  K3  Output filename     — reference/anonymize_datasets.py:175,202
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet_snappy(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K1 — distributed snappy parquet write.

    Unlike the reference (single ``df.to_parquet`` file) this writes a
    directory of part files — the scalable layout. Partition count
    follows the upstream plan / AQE coalesce.
    """
    df.write.mode(mode).option("compression", "snappy").parquet(path)


def compact_parquet(
    spark, path: str, target_partitions: int, mode: str = "overwrite"
) -> None:
    """Small-file compaction: rewrite a parquet directory into
    ``target_partitions`` files — the maintenance job every streaming
    or micro-batch sink needs, since each trigger lands its own part
    files and a 100 TB table degrades into millions of footer reads.

    coalesce (not repartition): collapsing partitions needs NO
    shuffle — each output task reads several input files and streams
    them through. The rewrite lands in a sibling temp dir first and
    swaps in atomically-enough for a single writer; readers mid-swap
    see the old or new listing, never a mix of half-written files.
    """
    import shutil

    tmp = path.rstrip("/") + ".compact_tmp"
    spark.read.parquet(path).coalesce(target_partitions).write.mode(
        "overwrite"
    ).option("compression", "snappy").parquet(tmp)
    shutil.rmtree(path, ignore_errors=True)
    shutil.move(tmp, path)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    dynamic: bool = False,
) -> None:
    """Hive-style partitioned parquet layout (``col=value/`` dirs) —
    the scale-out form of the reference's dated-folder convention
    (reference/anonymize_datasets.py:154-159 picks ``max(listdir)``;
    here the date is a partition column and Catalyst prunes to it).

    ``dynamic=True`` switches to dynamic partition overwrite: an
    incremental daily job rewrites ONLY the partitions present in
    ``df`` instead of truncating the whole dataset — the idempotent
    re-run semantics a 100 TB date-partitioned table needs.
    """
    writer = df.write.option("compression", "snappy")
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.partitionBy(*partition_cols).mode(mode).parquet(path)


def read_latest_partition(spark, path: str, partition_col: str) -> DataFrame:
    """S3 at scale: newest partition of a ``col=value/`` layout.

    The max is computed over partition *metadata* (directory names —
    a listing-only job, no data rows read), then the main read filters
    on the partition column so the scan plans PartitionFilters and
    touches only that directory's files.
    """
    from pyspark.sql import functions as F

    part_values = spark.read.parquet(path).select(partition_col).distinct()
    latest = part_values.agg(F.max(partition_col)).first()[0]
    return spark.read.parquet(path).filter(F.col(partition_col) == latest)


def anonymized_output_name(filename: str, client: str, client_demo: str = "client_demo") -> str:
    """K3 — rewrite ``{client}*.csv`` → ``{client_demo}*.snappy.parquet``."""
    return filename.replace(client, client_demo).replace(".csv", ".snappy.parquet")


def _col_ref(i: int) -> str:
    """0-based column index → spreadsheet letters (0→A, 26→AA)."""
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def _xml_escape(s: str) -> str:
    from xml.sax.saxutils import escape

    # quote entities included: this helper is also used in attribute
    # context (sheet name="..."), where a literal '"' would end the
    # attribute and corrupt workbook.xml
    return escape(s, {'"': "&quot;", "'": "&apos;"})


_XLSX_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"


def _write_xlsx_stdlib(filepath: str, pdfs: dict) -> None:
    """Dependency-free OOXML workbook writer (zip of XML parts —
    [Content_Types], package rels, workbook + rels, one worksheet per
    sheet). Strings go as inline strings (``t="inlineStr"``) so no
    sharedStrings table is needed; numbers as plain ``<v>``; booleans
    as ``t="b"``; NaN/None as omitted cells; anything else (dates,
    timestamps) as its ``str()`` inline. Valid OOXML — Excel,
    openpyxl, and :func:`..readers.read_xlsx_sheet` all read it."""
    import math
    import numbers
    import zipfile

    import numpy as np

    def cell_xml(ref: str, v) -> str:
        # numbers.Integral/Real (not bare int/float) so numpy scalars
        # inside object columns serialize as numbers, not inline
        # strings; values go through int()/float() because numpy 2's
        # repr is 'np.float64(1.5)', not a bare literal
        if v is None:
            return ""
        if isinstance(v, (bool, np.bool_)):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, numbers.Integral):
            return f'<c r="{ref}"><v>{int(v)!r}</v></c>'
        if isinstance(v, numbers.Real):
            fv = float(v)
            if math.isnan(fv):
                return ""
            return f'<c r="{ref}"><v>{fv!r}</v></c>'
        return (
            f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
            f"{_xml_escape(str(v))}</t></is></c>"
        )

    def sheet_xml(pdf) -> str:
        rows = [
            "<row r=\"1\">"
            + "".join(
                cell_xml(f"{_col_ref(j)}1", str(c))
                for j, c in enumerate(pdf.columns)
            )
            + "</row>"
        ]
        for i, rec in enumerate(pdf.itertuples(index=False), start=2):
            rows.append(
                f'<row r="{i}">'
                + "".join(
                    cell_xml(f"{_col_ref(j)}{i}", v) for j, v in enumerate(rec)
                )
                + "</row>"
            )
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{_XLSX_NS}"><sheetData>'
            + "".join(rows)
            + "</sheetData></worksheet>"
        )

    names = list(pdfs)
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/'
        'vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        f"{overrides}</Types>"
    )
    pkg_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_REL_NS}">'
        f'<Relationship Id="rId1" Type="{_REL_NS}/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    sheets_decl = "".join(
        f'<sheet name="{_xml_escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_XLSX_NS}" xmlns:r="{_REL_NS}">'
        f"<sheets>{sheets_decl}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_REL_NS}">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="{_REL_NS}/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    with zipfile.ZipFile(filepath, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", pkg_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, n in enumerate(names):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", sheet_xml(pdfs[n]))


def write_excel_workbook(filepath: str, **sheets: DataFrame) -> str:
    """K2 — one sheet per kwarg, like the reference's
    ``save_to_excelspreadsheet`` (reference/main.py:147-153).

    Excel is inherently a single-file, driver-side format, so each
    sheet DataFrame is collected via ``toPandas()``. Callers must only
    pass post-aggregation results (daily MAPE tables are ≤ a few
    thousand rows); raw fact tables would OOM the driver by design.

    Engine order: pandas' ``to_excel`` with openpyxl/xlsxwriter when
    one is installed; otherwise the dependency-free stdlib OOXML
    writer (:func:`_write_xlsx_stdlib`) — a real ``.xlsx`` either way,
    matching the reference's actual sink format. Read back with
    ``sources.readers.read_xlsx_sheet``.
    """
    import pandas as pd  # driver-side only

    pdfs = {
        name[:31]: (df.toPandas() if isinstance(df, DataFrame) else df)
        for name, df in sheets.items()
    }
    try:
        import openpyxl  # noqa: F401
        engine_ok = True
    except ImportError:
        try:
            import xlsxwriter  # noqa: F401
            engine_ok = True
        except ImportError:
            engine_ok = False

    if engine_ok:
        with pd.ExcelWriter(filepath, mode="w") as writer:
            for sheet_name, pdf in pdfs.items():
                pdf.to_excel(writer, sheet_name=sheet_name, index=False)
    else:
        _write_xlsx_stdlib(filepath, pdfs)
    return filepath


def write_versioned(df: DataFrame, path: str) -> int:
    """Versioned snapshot write (time travel): each call lands a full
    snapshot under ``<path>/v=<N>/`` and then atomically points the
    JSON manifest at it — the minimal form of the lake-table pattern
    (Delta/Iceberg) where readers never see a half-written version:
    the manifest rename is the commit.

    Returns the version number written. Single-writer discipline (like
    the reference's key-table append); concurrent writers need a real
    table format's conditional commit.
    """
    import json
    import os

    os.makedirs(path, exist_ok=True)
    manifest = os.path.join(path, "_manifest.json")
    current = -1
    if os.path.exists(manifest):
        with open(manifest) as fh:
            current = json.load(fh)["version"]
    version = current + 1
    df.write.mode("overwrite").option("compression", "snappy").parquet(
        os.path.join(path, f"v={version}")
    )
    tmp = manifest + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"version": version}, fh)
    os.replace(tmp, manifest)  # the commit point
    return version


def read_versioned(spark, path: str, version: int | None = None) -> DataFrame:
    """Time-travel read: ``version=None`` reads the manifest's current
    snapshot; an explicit version reads that historical snapshot. A
    version never committed (no manifest entry reached it) raises."""
    import json
    import os

    manifest = os.path.join(path, "_manifest.json")
    with open(manifest) as fh:
        current = json.load(fh)["version"]
    if version is None:
        version = current
    if not 0 <= version <= current:
        raise ValueError(
            f"version {version} not in committed range [0, {current}]"
        )
    return spark.read.parquet(os.path.join(path, f"v={version}"))


def write_orc_zstd(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K7 — ORC sink (zstd): the other mainstream columnar lake format
    (Hive/Trino ecosystems standardize on it), supported natively by
    Spark's vectorized ORC reader/writer — same pruning + predicate
    pushdown story as parquet, so a reference user with ORC-consuming
    downstream tooling can switch sinks with one call."""
    df.write.mode(mode).option("compression", "zstd").orc(path)


def delete_keys(
    spark,
    path: str,
    key_col: str,
    keys_df: DataFrame,
) -> dict:
    """Targeted row deletion (GDPR right-to-erasure shape): remove
    every row whose ``key_col`` appears in ``keys_df``, rewriting ONLY
    the part files that actually contain a matching row — the
    copy-on-write DELETE of the lake-table formats (Delta/Iceberg),
    expressed directly over a parquet directory.

    At 100 TB the whole point is the file pruning: an erasure request
    names a handful of keys, so (a) the probe that finds affected
    files is a broadcast semi join against the key list, (b) parquet
    row-group statistics/bloom filters prune most file reads in the
    probe itself, and (c) the rewrite touches only the affected files
    — DATA moved is O(affected files), never O(table); untouched
    files enter the replacement directory as hard links (listing-cost
    only). The deletion key list is dimension-sized by contract (it is
    collected to list affected files); route bulk deletes through a
    partition-level overwrite instead.

    Commit is a directory swap (build complete replacement dir → two
    renames), the same single-writer contract as
    :func:`compact_parquet`: a reader never sees a half-rewritten MIX
    of files; a crash before the swap leaves the original table fully
    intact (the orphaned ``.delete_*`` siblings are garbage, not
    damage). The brief window between the two renames is the
    single-writer caveat both functions document; snapshot isolation
    needs :func:`write_versioned`.

    Returns ``{"files_total", "files_rewritten", "rows_deleted"}``.
    """
    import glob
    import os
    import shutil
    import uuid
    from urllib.parse import unquote, urlparse

    from pyspark.sql import functions as F

    root = os.path.abspath(path)
    files_total = len(glob.glob(os.path.join(root, "part-*")))
    tagged = spark.read.parquet(root).withColumn(
        "_f", F.col("_metadata.file_path")
    )
    # _metadata.file_path is a percent-encoded URI (file:/...); map to
    # decoded absolute local paths so set membership below is exact
    affected = {
        os.path.abspath(unquote(urlparse(r["_f"]).path))
        for r in tagged.join(F.broadcast(keys_df), key_col, "left_semi")
        .select("_f")
        .distinct()
        .collect()
    }
    if not affected:
        return {
            "files_total": files_total,
            "files_rewritten": 0,
            "rows_deleted": 0,
        }
    aff = sorted(affected)
    before_n = spark.read.parquet(*aff).count()
    tmp = root + ".delete_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    # ONE evaluation of the anti join: the write; rows_deleted comes
    # from counting the (affected-files-sized) inputs and outputs
    spark.read.parquet(*aff).join(
        F.broadcast(keys_df), key_col, "left_anti"
    ).write.mode("overwrite").option("compression", "snappy").parquet(tmp)
    kept_n = spark.read.parquet(tmp).count()

    stamp = uuid.uuid4().hex[:8]
    new_dir = root + f".delete_new_{stamp}"
    os.makedirs(new_dir)
    # hard-link every untouched regular file (incl. _SUCCESS-style
    # markers) — no data copy; move the rewritten parts in; then swap
    for name in sorted(os.listdir(root)):
        src_f = os.path.join(root, name)
        if os.path.isfile(src_f) and os.path.abspath(src_f) not in affected:
            os.link(src_f, os.path.join(new_dir, name))
    for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*")))):
        os.replace(
            f, os.path.join(new_dir, f"part-delete-{stamp}-{i:05d}.parquet")
        )
    shutil.rmtree(tmp, ignore_errors=True)
    old_dir = root + f".delete_old_{stamp}"
    os.rename(root, old_dir)
    os.rename(new_dir, root)  # the commit point
    shutil.rmtree(old_dir, ignore_errors=True)
    return {
        "files_total": files_total,
        "files_rewritten": len(affected),
        "rows_deleted": before_n - kept_n,
    }
