"""Session-level helpers guarding the resume contract (ADVICE r04):

- ``conf_override`` must restore ``partitionOverwriteMode`` (et al.)
  after a sink write, so a shared session's later partitioned
  ``mode("overwrite")`` keeps truncate-all semantics;
- ``read_parquet_if_exists`` must treat ONLY a missing path as "first
  run" — a corrupt manifest must raise, never be misread as "nothing
  completed" (which would double-commit every prior unit on resume).
"""

import os

import pytest

from oct_report_ocr_spark.jobs import curate_job, extract_job
from oct_report_ocr_spark.session import conf_override, read_parquet_if_exists

KEY = "spark.sql.sources.partitionOverwriteMode"


def test_conf_override_restores_prior_value(spark):
    spark.conf.set(KEY, "static")
    with conf_override(spark, KEY, "dynamic"):
        assert spark.conf.get(KEY) == "dynamic"
    assert spark.conf.get(KEY) == "static"


def test_conf_override_restores_on_error(spark):
    spark.conf.set(KEY, "static")
    with pytest.raises(RuntimeError):
        with conf_override(spark, KEY, "dynamic"):
            raise RuntimeError("sink write failed")
    assert spark.conf.get(KEY) == "static"


def test_conf_override_unsets_when_previously_unset(spark):
    key = "spark.oct.test.ephemeral"
    assert spark.conf.get(key, None) is None
    with conf_override(spark, key, "x"):
        assert spark.conf.get(key) == "x"
    assert spark.conf.get(key, None) is None


def test_read_parquet_missing_path_is_none(spark, tmp_path):
    assert read_parquet_if_exists(spark, str(tmp_path / "nope")) is None


def test_read_parquet_corrupt_manifest_raises(spark, tmp_path):
    """A directory that exists but holds garbage is NOT a first run."""
    bad = tmp_path / "_manifests"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"this is not parquet")
    with pytest.raises(Exception, match="(?i)parquet|footer|magic"):
        df = read_parquet_if_exists(spark, str(bad))
        if df is not None:  # schema inference may defer the failure
            df.collect()


def test_completed_units_raise_on_corrupt_manifest(spark, tmp_path):
    for fn, sub in (
        (extract_job.completed_buckets, "_manifests"),
        (curate_job.completed_cells, os.path.join("_manifests", "cells")),
        (curate_job.completed_shards, os.path.join("_manifests", "shards")),
    ):
        out = tmp_path / sub.replace(os.sep, "_")
        bad = out / sub
        bad.mkdir(parents=True)
        (bad / "part-00000.parquet").write_bytes(b"garbage bytes, no footer")
        with pytest.raises(Exception):
            fn(spark, str(out))


def test_completed_units_empty_on_fresh_sink(spark, tmp_path):
    assert extract_job.completed_buckets(spark, str(tmp_path / "a")) == []
    assert curate_job.completed_cells(spark, str(tmp_path / "b")) == []
    assert curate_job.completed_shards(spark, str(tmp_path / "c")) == []
