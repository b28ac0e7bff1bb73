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

_INTERVAL_UNIT_MS = {
    "millisecond": 1,
    "second": 1000,
    "minute": 60 * 1000,
    "hour": 3600 * 1000,
    "day": 24 * 3600 * 1000,
    "week": 7 * 24 * 3600 * 1000,
}


def _interval_ms(interval: str) -> int:
    """Parse a Spark-style interval string ('1 day', '7 days',
    '30 minutes') into milliseconds — the same unit vocabulary
    withWatermark accepts for these durations."""
    parts = interval.strip().lower().split()
    if len(parts) != 2:
        raise ValueError(f"unsupported interval: {interval!r}")
    n, unit = parts
    unit = unit.rstrip("s")
    if unit not in _INTERVAL_UNIT_MS:
        raise ValueError(f"unsupported interval unit: {interval!r}")
    return int(n) * _INTERVAL_UNIT_MS[unit]


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


def crawl_monitor_stream(
    docs: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time crawl-health monitor: per (window, tier)
    document count and char mass over the live crawl — the dashboard
    feed a 10¹²-doc ingestion runs next to extraction. Expects the
    crawl-page shape (``warc_ts timestamp, text string, lang string``,
    extra columns ignored) and works identically on a batch frame (the
    pytest proves batch/stream equality).

    The tier column comes from the SAME ``_tier_of`` expression as
    ``tier_extract`` / ``quality_tiers`` (operators/curation.py), so
    the monitor can never disagree with the batch labeling.

    Scale posture: the label is stateless map-only; the windowed
    aggregate keeps one (window, tier) cell per group with map-side
    partial combine, and the watermark bounds state to the open
    windows — O(windows × tiers), independent of crawl size. Late
    captures beyond ``watermark`` are dropped, the documented horizon.
    Note for availableNow runs: windows are emitted in append mode only
    once the watermark passes them — use outputMode('complete') (as the
    test does) when the final open windows must be visible at stop."""
    from oct_report_ocr_spark.operators.curation import _tier_of
    from oct_report_ocr_spark.operators.extra import _toks

    labeled = docs.filter(F.length("text") > 0).select(
        "warc_ts",
        _tier_of(_toks()).alias("tier"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    return (
        labeled.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "tier")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "tier",
            "n_docs",
            "total_chars",
        )
    )


def dedup_stream(docs: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Custom stateful streaming operator (§2.9 depth):
    first-occurrence-wins exact dedup across micro-batches via
    ``applyInPandasWithState``. State per content fingerprint = the
    first url seen + a duplicate counter; later arrivals of the same
    fingerprint are dropped, so the downstream extraction stage never
    pays for a page the corpus already contains — the streaming form of
    q_dedup_exact's hash-groupBy.

    Scale posture: state is partitioned by the fingerprint key (one
    shuffle), each key holds O(1) state (url + count, not the payload),
    and an event-time timeout pegged to the watermark expires state for
    fingerprints not seen within ``watermark``, so the store cannot
    grow unboundedly on an infinite crawl (re-crawls beyond that
    horizon re-admit a page — the standard bounded-state trade). Rows
    within a micro-batch are ordered by url so the survivor choice is
    deterministic per batch; across batches it is arrival-order, as in
    any streaming dedup. Works identically under
    ``trigger(availableNow=True)`` incremental batches.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    expiry_ms = _interval_ms(watermark)

    keyed = docs.withWatermark("warc_ts", watermark).withColumn(
        "fp", F.xxhash64(F.col("html")).cast("string")
    )

    def keep_first(key, pdfs, state):
        fp = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        known = state.get[0] if state.exists else None
        n_dup = state.get[1] if state.exists else 0
        # Drain ALL chunks before choosing the survivor: one
        # fingerprint's rows can span pandas chunks, and a per-chunk
        # sort would let an earlier chunk's url beat a lower url in a
        # later chunk (ADVICE r02). Duplicate groups are tiny relative
        # to the batch, so materializing the key's rows is safe.
        best_url, best_ts, n_rows = None, None, 0
        for pdf in pdfs:
            n_rows += len(pdf)
            for url, ts in zip(pdf["url"], pdf["warc_ts"]):
                if best_url is None or url < best_url:
                    best_url, best_ts = url, ts
        out = []
        if known is None and n_rows:
            known = best_url
            out.append((fp, best_url, best_ts))
            n_dup += n_rows - 1
        else:
            n_dup += n_rows
        state.update((known, n_dup))
        # expire this fingerprint once the watermark passes one
        # `watermark` horizon beyond now-seen data — the documented
        # dedup horizon, not a hardcoded day (ADVICE r02)
        wm_ms = state.getCurrentWatermarkMs()
        if wm_ms > 0:
            state.setTimeoutTimestamp(wm_ms + expiry_ms)
        if out:
            yield pd.DataFrame(
                {
                    "fp": [r[0] for r in out],
                    "url": [r[1] for r in out],
                    "warc_ts": pd.Series(
                        [r[2] for r in out], dtype="datetime64[us, UTC]"
                    ),
                }
            )

    return keyed.groupBy("fp").applyInPandasWithState(
        keep_first,
        outputStructType="fp string, url string, warc_ts timestamp",
        stateStructType="first_url string, n_dup long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
