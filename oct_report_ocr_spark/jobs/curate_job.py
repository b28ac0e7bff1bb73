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
5. sinks — hive-partitioned (tier, lang) corpus via
   ``write_tiered_corpus`` (partition-pruned mixing reads) and the
   dataloader shard layout via ``write_training_shards``.

Scale posture: stage 2 is the only corpus shuffle before the sinks'
own layout shuffles; the survivor join runs on the same key as the
groupBy so the exchange is reused. Metrics are one small JSON line
(driver-side aggregates only).

Reference anchor: generalizes the reference's per-batch fetch→clean→
assemble loop (extract_onh_rnfl_report_text_ou.py:60-170) into a
declarative curation DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    n_shards: int = 8,
    input_format: str = "parquet",
    mix_target: int | None = None,
) -> dict:
    from oct_report_ocr_spark.operators.curation import (
        _NORM,
        mix_sample_df,
        tier_label,
    )
    from oct_report_ocr_spark.sources.io import (
        read_wet,
        write_tiered_corpus,
        write_training_shards,
    )

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
    # deterministic hash thresholds, no PRNG) between dedup and labeling
    if mix_target is not None:
        deduped = mix_sample_df(deduped, mix_target)

    labeled = tier_label(deduped)
    tier_manifest = write_tiered_corpus(labeled, output_path + "/tiered")
    shard_manifest = write_training_shards(
        labeled.select("doc_id", "lang", "tier", "n_words"),
        output_path + "/shards",
        n_shards=n_shards,
    )

    cells = tier_manifest.collect()
    shards = shard_manifest.collect()
    n_out = sum(r.n_docs for r in cells)
    return {
        "rows_in": int(n_in),
        "rows_out": int(n_out),
        "removed": int(n_in) - int(n_out),
        "tiers": {f"{r.tier}/{r.lang}": int(r.n_docs) for r in cells},
        "shards": {int(r.shard): int(r.n_rows) for r in shards},
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
            )
        )
    )


if __name__ == "__main__":
    main()
