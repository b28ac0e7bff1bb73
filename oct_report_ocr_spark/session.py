"""SparkSession factory — one tuned config profile for the whole engine.

Local-mode testing stands in for the multi-executor cluster: the same
partitioning/shuffle discipline applies, only ``master`` changes (the
north-rule scaling evidence runs the identical job at local[8] vs
local[32]). On a real cluster, pass ``master=None`` and let
spark-submit supply it.
"""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import DataFrame, SparkSession


@contextlib.contextmanager
def conf_override(spark: SparkSession, key: str, value: str):
    """Set a session conf for the duration of a block, restoring the
    prior value (or unsetting) on exit — sink writes that need
    ``partitionOverwriteMode=dynamic`` must not leak it into a shared
    session, where it would silently switch a later partitioned
    ``mode("overwrite")`` write from truncate-all to dynamic semantics
    (ADVICE r04)."""
    prior = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)


def read_parquet_if_exists(spark: SparkSession, path: str) -> DataFrame | None:
    """``spark.read.parquet`` that returns None ONLY when the path does
    not exist (first run: no manifest yet). Any other failure —
    transient FS error, corrupt footer, permission — propagates: a
    resume job must fail loudly rather than treat a damaged manifest as
    "nothing completed" and double-commit every prior unit (ADVICE
    r04)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        klass = ""
        for attr in ("getCondition", "getErrorClass"):  # 4.x name, then legacy
            get_klass = getattr(e, attr, None)
            if callable(get_klass):
                klass = get_klass() or ""
                break
        if "PATH_NOT_FOUND" in klass or "Path does not exist" in str(e):
            return None
        raise


def get_spark(
    app_name: str = "oct_report_ocr_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        # match parallelism, not the 200 default — at cluster scale this is
        # sized to target ~128-256 MB shuffle partitions instead
        shuffle_partitions = max(cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batches are bounded BOTH ways (SURVEY.md §7.3 risk 3):
        # 1024 rows amortizes per-batch Python/Arrow overhead (+21%
        # throughput vs 128 on the extraction hot path after the kernel
        # speedups), while 16 MB caps batch BYTES so a run of multi-MB
        # pages degrades to small/singleton batches instead of OOMing a
        # worker — row-count-only batching cannot give that guarantee
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "16m")
        # shuffle-block codec (VERDICT r01 item 6): zstd level 1 beat
        # the lz4 default on the salted full-payload exchange in 2 of 3
        # A/B windows, median +11% (31.3k vs 28.1k docs/sec at sf0.4 —
        # bench.py --salted-tuning): HTML payloads compress ~2x better
        # under zstd, and the saved shuffle bytes outweigh the codec
        # CPU even on tmpfs; on a cluster the byte saving also halves
        # NVMe/NIC shuffle traffic. Override with SPARK_GRAFT_IO_CODEC.
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "zstd"),
        )
        .config("spark.io.compression.zstd.level", "1")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # throughput GC measured ~15% faster than G1 on the Arrow-heavy
        # extraction stage (large short-lived buffers, no latency SLO)
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        # small splits keep the scan parallel on the single-file local
        # corpora; on a real cluster with many large files, raise via env
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "4194304"),
        )
    )
    # Shuffle/spill dirs on tmpfs are OPT-IN (SPARK_GRAFT_TMPFS=1, set by
    # bench.py): this host's /tmp disk is slow AND bursty (measured 2x
    # slower with 2.5x run-to-run variance on the shuffle-heavy extraction
    # job), but tmpfs spill is RAM — fine for bounded benchmark runs,
    # wrong as a default because a job that would degrade by spilling to
    # disk instead hits no-space/memory pressure. Cluster nodes use local
    # NVMe via SPARK_LOCAL_DIRS.
    if (
        os.environ.get("SPARK_GRAFT_TMPFS") == "1"
        and "SPARK_LOCAL_DIRS" not in os.environ
        and os.path.isdir("/dev/shm")
    ):
        shm = "/dev/shm/spark-local"
        os.makedirs(shm, exist_ok=True)
        b = b.config("spark.local.dir", shm)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
