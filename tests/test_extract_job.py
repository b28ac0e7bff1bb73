"""End-to-end Spark extraction-job tests (SURVEY.md §5.2 items 1-5).

Exercises the real pipeline — scan → salted repartition → mapInArrow →
partitioned write + manifest — on the deterministic sf0.001 corpus.
"""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from oct_report_ocr_spark.extract import extract_one
from oct_report_ocr_spark.jobs import extract_job
from oct_report_ocr_spark.synth.gen_corpus import ensure_corpus

from .conftest import CACHE


@pytest.fixture(scope="module")
def corpus():
    return ensure_corpus(CACHE, 0.001)


@pytest.fixture(scope="module")
def job_out(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("job") / "out")
    stats = extract_job.run(spark, corpus, out, buckets=16, fresh=True)
    return out, stats


def test_job_counts(job_out):
    _, stats = job_out
    assert stats["rows"] > 300  # ~500 docs minus non-en
    assert stats["ok"] > 0 and stats["failed"] > 0  # dirty rows quarantined
    assert stats["buckets_done"] == 16


def test_byte_identity_per_url_vs_core(spark, corpus, job_out):
    """The Spark path must produce byte-identical extracted_text per url
    to the pure core run on the driver (the north-rule invariant)."""
    out, _ = job_out
    spark_rows = {
        r.url: (r.extracted_text, r.error)
        for r in spark.read.parquet(os.path.join(out, "extracted")).collect()
    }
    docs = spark.read.parquet(corpus).filter(F.col("lang") == "en").collect()
    assert len(docs) == len(spark_rows)
    for d in docs:
        want = extract_one(d.html, d.url)
        got_text, got_err = spark_rows[d.url]
        assert got_text == want.extracted_text, d.url
        assert got_err == want.error, d.url


def test_no_duplicate_urls(spark, job_out):
    out, _ = job_out
    df = spark.read.parquet(os.path.join(out, "extracted"))
    assert df.count() == df.select("url").distinct().count()


def test_quarantine_view(spark, job_out):
    out, _ = job_out
    q = extract_job.quarantine(spark, out)
    kinds = {r.error for r in q.select("error").distinct().collect()}
    assert kinds  # dirty rows present
    assert kinds <= {"empty", "decode-error", "no-content", "oversize"}
    assert q.filter(F.col("extracted_text").isNotNull()).count() == 0


def test_resume_after_simulated_crash(spark, corpus, tmp_path):
    """Kill-after-K-buckets semantics: wipe 5 buckets' data and manifest
    rows, rerun, and require the exact same final row set — no dupes, no
    gaps (D10)."""
    out = str(tmp_path / "out")
    extract_job.run(spark, corpus, out, buckets=8, fresh=True)
    full = {
        (r.url, r.extracted_text, r.error)
        for r in spark.read.parquet(os.path.join(out, "extracted")).collect()
    }

    # simulate a crash that lost buckets 0,1,2 (data + manifest) and
    # bucket 3 (data written but manifest commit lost → must be redone)
    lost = [0, 1, 2]
    for b in lost:
        for d in glob.glob(os.path.join(out, "extracted", f"bucket={b}")):
            shutil.rmtree(d)
    m = spark.read.parquet(os.path.join(out, "_manifests"))
    kept = m.filter(~F.col("bucket").isin(lost + [3])).collect()
    shutil.rmtree(os.path.join(out, "_manifests"))
    if kept:
        spark.createDataFrame(kept, m.schema).write.parquet(os.path.join(out, "_manifests"))

    stats = extract_job.run(spark, corpus, out, buckets=8)
    assert stats["resumed_buckets_skipped"] == 4  # 8 - (3 lost + 1 uncommitted)
    after = {
        (r.url, r.extracted_text, r.error)
        for r in spark.read.parquet(os.path.join(out, "extracted")).collect()
    }
    assert after == full


def test_partitioning_permutation_invariance(spark, corpus, tmp_path):
    """Same input under different bucket counts ⇒ identical output set
    (guards against order/batch-dependent extraction state)."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    extract_job.run(spark, corpus, a, buckets=4, fresh=True)
    extract_job.run(spark, corpus, b, buckets=32, fresh=True)
    sa = {
        (r.url, r.extracted_text, r.error)
        for r in spark.read.parquet(os.path.join(a, "extracted")).collect()
    }
    sb = {
        (r.url, r.extracted_text, r.error)
        for r in spark.read.parquet(os.path.join(b, "extracted")).collect()
    }
    assert sa == sb


def test_scan_aligned_run_matches_salted_and_file_layout(spark, corpus, tmp_path, job_out):
    """run(mode='scan-aligned') must produce the identical row set as
    the salted run AND one clean file per bucket (the pre-write
    repartition prevents the tasks x buckets small-file blowup)."""
    out_ref, _ = job_out
    out = str(tmp_path / "aligned")
    stats = extract_job.run(spark, corpus, out, buckets=16, fresh=True, mode="scan-aligned")
    assert stats["buckets_done"] == 16
    sa = {
        (r.url, r.extracted_text, r.error)
        for r in spark.read.parquet(os.path.join(out, "extracted")).collect()
    }
    sb = {
        (r.url, r.extracted_text, r.error)
        for r in spark.read.parquet(os.path.join(out_ref, "extracted")).collect()
    }
    assert sa == sb
    for bdir in glob.glob(os.path.join(out, "extracted", "bucket=*")):
        n_files = len(glob.glob(os.path.join(bdir, "*.parquet")))
        assert n_files == 1, bdir


def test_lang_filter_pushed_to_scan(spark, corpus):
    """The routing predicate must reach the parquet reader (S2 analog:
    BigQuery executed the LIKE server-side; Catalyst must push ours)."""
    docs = spark.read.parquet(corpus)
    plan = extract_job.extract_df(docs, buckets=4)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "EqualTo(lang,en)" in plan.replace(" ", "")


def test_salt_width_rule():
    """The salted-exchange width resolver: max of the sink bucket count,
    5x cluster parallelism (the r04 profile's finer-reduce-task win),
    and the payload-bytes/256MB task-size floor; absurd/unknown byte
    estimates (stats not computed -> Long.Max sentinel) are ignored."""
    # parallelism floor reproduces the measured best at both bench levels
    assert extract_job.salt_width(64, 8) == 64        # 5*8=40 < 64: neutral at N
    assert extract_job.salt_width(64, 32) == 160      # the measured 32-core win
    assert extract_job.salt_width(160, 32) == 160     # explicit buckets keep priority
    # byte floor: 100 TB / 256 MB ~ 409600 reduce tasks, not 5*parallelism
    assert extract_job.salt_width(64, 8000, est_input_bytes=100 * 2**40) == 409600
    # unknown / absurd stats sentinel is ignored, parallelism floor stands
    assert extract_job.salt_width(64, 32, est_input_bytes=None) == 160
    assert extract_job.salt_width(64, 32, est_input_bytes=0) == 160
    assert extract_job.salt_width(64, 32, est_input_bytes=1 << 62) == 160


def test_salted_exchange_width_decoupled_from_sink_buckets(spark, corpus, tmp_path):
    """salt_partitions widens the Python-stage exchange without touching
    the sink bucket identity (resume manifests stay valid), and the
    output row set is unchanged (partitioning invariance)."""
    docs = spark.read.parquet(corpus)
    df = extract_job.extract_df(docs, buckets=4, mode="salted", salt_partitions=24)
    # exchange width = salt keys + large-page key range
    assert df.rdd.getNumPartitions() == 24 + max(24 // 4, 8)
    # sink bucket column still spans the SINK bucket count, not the salt
    assert df.select("bucket").distinct().count() <= 4
    ref = {
        (r.url, r.extracted_text, r.error)
        for r in extract_job.extract_df(docs, buckets=4, mode="scan-aligned").collect()
    }
    got = {(r.url, r.extracted_text, r.error) for r in df.collect()}
    assert got == ref


def test_salted_widened_resume_manifest_identity(spark, corpus, tmp_path):
    """The decoupling's point at scale: a salted run with a WIDENED
    exchange (salt_partitions > buckets) must keep the sink/manifest
    identity — per-bucket manifest rows (counts + content checksum)
    byte-identical to a scan-aligned run's, one clean file per bucket,
    and a crash/resume under the widened exchange reproduces the exact
    row set (VERDICT r04 item 4 Done criterion)."""
    ref = str(tmp_path / "ref")
    out = str(tmp_path / "out")
    extract_job.run(spark, corpus, ref, buckets=8, fresh=True)
    extract_job.run(spark, corpus, out, buckets=8, fresh=True, mode="salted", salt_partitions=24)

    def manifest_rows(path):
        return {
            tuple(r)
            for r in spark.read.parquet(os.path.join(path, "_manifests"))
            .select("bucket", "n_rows", "n_ok", "n_failed", "n_text_bytes", "content_checksum")
            .collect()
        }

    assert manifest_rows(out) == manifest_rows(ref)
    for bdir in glob.glob(os.path.join(out, "extracted", "bucket=*")):
        assert len(glob.glob(os.path.join(bdir, "*.parquet"))) == 1, bdir

    full = {
        (r.url, r.extracted_text, r.error)
        for r in spark.read.parquet(os.path.join(out, "extracted")).collect()
    }
    # crash: lose buckets 0,1 (data + manifest)
    for b in (0, 1):
        shutil.rmtree(os.path.join(out, "extracted", f"bucket={b}"))
    m = spark.read.parquet(os.path.join(out, "_manifests"))
    kept = m.filter(~F.col("bucket").isin([0, 1])).collect()
    shutil.rmtree(os.path.join(out, "_manifests"))
    spark.createDataFrame(kept, m.schema).write.parquet(os.path.join(out, "_manifests"))

    stats = extract_job.run(spark, corpus, out, buckets=8, mode="salted", salt_partitions=24)
    assert stats["resumed_buckets_skipped"] == 6
    after = {
        (r.url, r.extracted_text, r.error)
        for r in spark.read.parquet(os.path.join(out, "extracted")).collect()
    }
    assert after == full
    assert manifest_rows(out) == manifest_rows(ref)
