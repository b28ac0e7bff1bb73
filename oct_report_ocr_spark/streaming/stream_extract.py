"""Structured Streaming form of the extraction pipeline.

The reference is strictly batch (SURVEY.md §2.9); its closest streaming
shapes are the resumable incremental CSV append (D10,
extract_onh_rnfl_report_text_ou.py:64,308-310) and the ≤1-day-gap
interval merge (utils.py:1306-1325). Both map naturally onto
Structured Streaming:

- ``stream_extract``: file-source micro-batches → the SAME stateless
  mapInArrow extraction kernel as the batch job → exactly-once parquet
  append via the streaming checkpoint (the principled version of the
  reference's file-exists resume).
- ``sessionize_stream``: event-time session windows with a watermark —
  the streaming form of the gaps-and-islands coalescing (W3).

Running ``trigger(availableNow=True)`` turns either into an
incremental batch job: process everything new since the last
checkpoint, then stop — which is exactly the reference's re-run
semantics, minus the duplicate-row window its CSV append had.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oct_report_ocr_spark.jobs.extract_udf import OUTPUT_DDL, extract_batches
from oct_report_ocr_spark.synth.gen_corpus import SCHEMA as _CORPUS_SCHEMA  # noqa: F401

CORPUS_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    lang: str = "en",
    available_now: bool = True,
):
    """Micro-batch extraction: new parquet files under ``input_dir`` are
    extracted and appended exactly-once. Returns the StreamingQuery."""
    docs = (
        spark.readStream.schema(CORPUS_DDL)
        .option("maxFilesPerTrigger", "8")
        .parquet(input_dir)
    )
    if lang:
        docs = docs.filter(F.col("lang") == lang)
    extracted = docs.select("url", "warc_ts", "html").mapInArrow(
        extract_batches, schema=OUTPUT_DDL
    )
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sessionize_stream(events: DataFrame, gap: str = "1 hour") -> DataFrame:
    """Streaming gaps-and-islands: session windows per user keyed on
    event time with a watermark for late data — expressible identically
    on a batch DataFrame (the driver's oracle uses the batch form)."""
    return (
        events.withWatermark("ts", "1 day")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
