"""Sink maintenance: fsck-style audit + orphan vacuum for the
parquet + `_manifests` snapshot sink (jobs/extract_job.py).

The sink's commit protocol is data-first, manifest-second (per bucket).
Without a table format (Iceberg unavailable in this environment —
README probe), the failure windows are:

- a writer crashes AFTER writing a bucket's data but BEFORE its
  manifest row → an ORPHAN bucket (resume re-runs and dynamically
  overwrites it, but a bucket that later falls out of scope — e.g. a
  narrowed lang filter — would linger as unaccounted data);
- data files lost/corrupted after commit → a MISSING bucket or a
  CHECKSUM_MISMATCH against the manifest's order-insensitive
  content checksum.

``audit_sink`` recomputes every bucket's manifest row from the data
actually on disk and full-outer-joins it against the committed
manifest — the same integrity check a table format's snapshot
validation gives. ``vacuum_orphans`` deletes orphan bucket directories
(dry-run by default; destructive only with ``apply=True``).

Scale posture: the audit is ONE scan of the sink + one per-bucket hash
aggregate (the identical shape as manifest creation) joined against
the tiny manifest table (broadcast); no driver-side iteration over
rows — only over the handful of orphan bucket ids when vacuuming.

Reference anchor: the reference trusts `to_gbq(if_exists='replace')`
for table integrity (utils.py:633); this module provides the
equivalent auditability for the manifest-based stand-in.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oct_report_ocr_spark.jobs.extract_job import _manifest_rows


def audit_sink(spark: SparkSession, output: str) -> DataFrame:
    """Per-bucket consistency report of the sink at ``output``.

    Returns (bucket, status, data_rows, manifest_rows) with status in:
    ``ok`` — manifested and the recomputed row count + content checksum
    match; ``checksum_mismatch`` — data present and manifested but
    drifted; ``orphan`` — data on disk without a manifest row;
    ``missing`` — manifest row without data on disk."""
    data_path = os.path.join(output, "extracted")
    manifest_path = os.path.join(output, "_manifests")
    data = spark.read.parquet(data_path)
    recomputed = (
        _manifest_rows(data)
        .withColumnRenamed("n_rows", "data_rows")
        .withColumnRenamed("content_checksum", "data_checksum")
        .select("bucket", "data_rows", "data_checksum")
    )
    manifest = (
        spark.read.parquet(manifest_path)
        .select("bucket", "n_rows", "content_checksum")
        .withColumnRenamed("n_rows", "manifest_rows")
        .withColumnRenamed("content_checksum", "manifest_checksum")
    )
    j = recomputed.join(F.broadcast(manifest), "bucket", "full_outer")
    status = (
        F.when(F.col("manifest_rows").isNull(), F.lit("orphan"))
        .when(F.col("data_rows").isNull(), F.lit("missing"))
        .when(
            (F.col("data_rows") == F.col("manifest_rows"))
            & (F.col("data_checksum") == F.col("manifest_checksum")),
            F.lit("ok"),
        )
        .otherwise(F.lit("checksum_mismatch"))
    )
    return j.select(
        "bucket",
        status.alias("status"),
        "data_rows",
        "manifest_rows",
    )


def vacuum_orphans(
    spark: SparkSession, output: str, apply: bool = False
) -> list[int]:
    """Delete (or with ``apply=False``, just report) bucket directories
    present in the sink's data but absent from the manifest. Returns
    the orphan bucket ids. Only the orphan id list — never row data —
    reaches the driver."""
    # deletion below is driver-local (os/shutil); on a remote sink URI
    # it would silently delete nothing while still returning the orphan
    # list as if vacuumed (ADVICE r03) — refuse loudly, and before the
    # audit so the caller sees THIS error, not a filesystem one
    if apply and "://" in output and not output.startswith("file:"):
        raise NotImplementedError(
            f"vacuum_orphans apply=True only supports local paths; got "
            f"{output!r} — use the Hadoop FileSystem API for remote sinks"
        )
    report = audit_sink(spark, output)
    orphans = [
        r.bucket for r in report.filter(F.col("status") == "orphan").collect()
    ]
    if apply:
        data_path = os.path.join(output, "extracted")
        for b in orphans:
            d = os.path.join(data_path, f"bucket={b}")
            if os.path.isdir(d):
                shutil.rmtree(d)
    return sorted(orphans)
