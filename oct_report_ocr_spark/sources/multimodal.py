"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's document model is exactly this shape — a binary payload
(DICOM wrapping a PDF) plus typed attributes projected into columns
(/root/reference/utils.py:1587-1630, extract_gcc_report_text_ou.py:46-56).
For a training-data pipeline the same pattern covers image/audio/video:
``content: binary`` + a metadata struct, with decode / feature-extract /
resize / frame-sample as Arrow-batched stages.

The decode kernels themselves are STUBBED — the image/audio libraries
are not in this container — behind ``DecodeUnavailable`` or a
deterministic fake, but everything Spark-side is real and tested:
schema, partitioning, mapInPandas signature, batch shape, error
quarantine (D9 semantics).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "media_id long, kind string, content binary, "
    "meta struct<width:int,height:int,sample_rate:int,n_frames:int,mime:string>"
)

FEATURE_DDL = (
    "media_id long, kind string, n_bytes long, content_sha256 string, "
    "feature array<float>, decode_error string"
)


class DecodeUnavailable(NotImplementedError):
    """Raised by real decode kernels when the codec library is absent."""


def decode_image(content: bytes) -> "object":
    """Real image decode would go here (PIL/turbojpeg). Not available in
    this container — callers must use the deterministic fake path."""
    raise DecodeUnavailable("image codec libraries not present in this environment")


def fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding/feature extractor: unit
    values derived from the payload digest. Stable across batches,
    partitions and retries — usable in tests and plumbing benchmarks."""
    h = hashlib.sha256(content).digest()
    return [h[i] / 255.0 for i in range(dim)]


def featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (media_id, kind, content, meta) → features.

    Per-row fault isolation mirrors the extraction job's quarantine
    contract: a corrupt payload yields decode_error, never an exception.
    """
    for pdf in batches:
        shas, feats, errs = [], [], []
        for content in pdf["content"]:
            if content is None or len(content) == 0:
                shas.append(None)
                feats.append(None)
                errs.append("empty")
                continue
            b = bytes(content)
            shas.append(hashlib.sha256(b).hexdigest())
            try:
                feats.append(fake_feature(b))
                errs.append(None)
            except Exception as e:  # noqa: BLE001 — quarantine, don't fail the job
                feats.append(None)
                errs.append(f"decode:{type(e).__name__}")
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"]
                .map(lambda b: len(b) if b is not None else 0)
                .astype("int64"),
                "content_sha256": shas,
                "feature": feats,
                "decode_error": errs,
            }
        )


def featurize(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """The multimodal feature pipeline: salted repartition by media_id
    (payload sizes are skewed, same argument as html pages) → Arrow-
    batched featurization."""
    df = media
    if partitions:
        df = df.repartition(partitions, F.pmod(F.xxhash64("media_id"), F.lit(partitions)))
    return df.mapInPandas(featurize_batches, schema=FEATURE_DDL)


def synth_media(spark, n: int = 64):
    """Deterministic fake media table for tests (binary payload sizes
    deliberately skewed, one empty payload per 16)."""
    rows = []
    for i in range(n):
        size = (i * 977) % 4096 + (8192 if i % 11 == 0 else 0)
        payload = bytes((i * 31 + j) % 256 for j in range(size)) if i % 16 else b""
        kind = ("image", "audio", "video")[i % 3]
        rows.append(
            (
                i,
                kind,
                payload,
                {
                    "width": 64 + i % 512 if kind == "image" else None,
                    "height": 64 + i % 256 if kind == "image" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "n_frames": i % 300 if kind == "video" else None,
                    "mime": f"{kind}/x-fake",
                },
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA_DDL)
