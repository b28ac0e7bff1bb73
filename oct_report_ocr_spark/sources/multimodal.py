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


class CorruptImage(ValueError):
    """Raised on a payload that claims a supported format but is
    malformed — lands in decode_error quarantine (D9)."""


def _decode_bmp(b: bytes) -> tuple[int, int, float, float, float]:
    """Uncompressed 24-bpp BI_RGB BMP → (width, height, mean RGB).

    Pure stdlib (struct + memoryview slicing): rows are bottom-up and
    padded to 4 bytes; pixels are BGR. Channel means use strided
    slices, so cost is O(pixels) with no Python per-pixel loop."""
    import struct

    if len(b) < 54:
        raise CorruptImage("bmp: truncated header")
    if b[:2] != b"BM":
        raise CorruptImage("bmp: bad magic")
    (pix_off,) = struct.unpack_from("<I", b, 10)
    (hdr_size, w, h) = struct.unpack_from("<Iii", b, 14)
    (planes, bpp) = struct.unpack_from("<HH", b, 26)
    (compression,) = struct.unpack_from("<I", b, 30)
    if hdr_size < 40 or planes != 1:
        raise CorruptImage("bmp: unsupported header")
    if bpp != 24 or compression != 0:
        raise DecodeUnavailable(f"bmp: only 24bpp BI_RGB supported (bpp={bpp})")
    h = abs(h)
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise CorruptImage("bmp: implausible dimensions")
    stride = (3 * w + 3) & ~3
    if pix_off + stride * h > len(b):
        raise CorruptImage("bmp: pixel array truncated")
    sums = [0, 0, 0]  # B, G, R
    mv = memoryview(b)
    for row in range(h):
        base = pix_off + row * stride
        line = mv[base : base + 3 * w]
        for c in range(3):
            sums[c] += sum(line[c::3])
    n = w * h
    return w, h, sums[2] / n / 255.0, sums[1] / n / 255.0, sums[0] / n / 255.0


def _decode_ppm(b: bytes) -> tuple[int, int, float, float, float]:
    """Binary PPM (P6, maxval 255) → (width, height, mean RGB)."""
    import re as _re

    m = _re.match(rb"P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s", b)
    if not m:
        raise CorruptImage("ppm: bad header")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise DecodeUnavailable("ppm: only maxval 255 supported")
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise CorruptImage("ppm: implausible dimensions")
    pix = memoryview(b)[m.end() : m.end() + 3 * w * h]
    if len(pix) < 3 * w * h:
        raise CorruptImage("ppm: pixel array truncated")
    n = w * h
    return (
        w,
        h,
        sum(pix[0::3]) / n / 255.0,
        sum(pix[1::3]) / n / 255.0,
        sum(pix[2::3]) / n / 255.0,
    )


def decode_image(content: bytes) -> tuple[int, int, float, float, float]:
    """Real image decode (VERDICT r01 item 9): zero-external-dep kernels
    for uncompressed BMP (24bpp BI_RGB) and binary PPM (P6) →
    (width, height, mean_r, mean_g, mean_b). Compressed formats
    (JPEG/PNG/…) still raise DecodeUnavailable — their codec libraries
    are not in this container; the Spark-side plumbing treats both
    exceptions identically (fake-feature fallback vs quarantine is the
    caller's choice)."""
    if content[:2] == b"BM":
        return _decode_bmp(content)
    if content[:2] == b"P6":
        return _decode_ppm(content)
    raise DecodeUnavailable("image codec libraries not present in this environment")


def image_feature(content: bytes, dim: int = 8) -> list[float]:
    """Feature vector from a really-decoded image: [w, h, mean_r,
    mean_g, mean_b, aspect, 0, 0] — deterministic, byte-stable."""
    w, h, r, g, b = decode_image(content)
    out = [float(w), float(h), r, g, b, w / h]
    return (out + [0.0] * dim)[:dim]


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
        for kind, content in zip(pdf["kind"], pdf["content"]):
            if content is None or len(content) == 0:
                shas.append(None)
                feats.append(None)
                errs.append("empty")
                continue
            b = bytes(content)
            shas.append(hashlib.sha256(b).hexdigest())
            try:
                if kind == "image":
                    try:
                        feats.append(image_feature(b))  # real BMP/PPM decode
                    except DecodeUnavailable:
                        feats.append(fake_feature(b))  # codec absent: honest fake
                else:
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


def make_bmp(w: int, h: int, seed: int = 0) -> bytes:
    """Deterministic uncompressed 24-bpp bottom-up BMP for tests."""
    import struct

    stride = (3 * w + 3) & ~3
    pix = bytearray()
    for row in range(h):
        line = bytearray((seed + row * 7 + col * 3 + c) % 256 for col in range(w) for c in range(3))
        pix += line + b"\x00" * (stride - 3 * w)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return bytes(hdr + dib + pix)


def make_ppm(w: int, h: int, seed: int = 0) -> bytes:
    """Deterministic binary P6 PPM for tests."""
    pix = bytes((seed + i) % 256 for i in range(3 * w * h))
    return f"P6\n{w} {h}\n255\n".encode() + pix


def synth_media(spark, n: int = 64):
    """Deterministic fake media table for tests (binary payload sizes
    deliberately skewed, one empty payload per 16). Every 5th image row
    carries a REAL decodable payload (BMP or PPM, alternating) so the
    real decode kernel is exercised in the distributed path; every 13th
    image row is a corrupt BMP (quarantine path)."""
    rows = []
    for i in range(n):
        size = (i * 977) % 4096 + (8192 if i % 11 == 0 else 0)
        payload = bytes((i * 31 + j) % 256 for j in range(size)) if i % 16 else b""
        if i % 16 and i % 3 == 0:  # kind == "image" rows
            if i % 13 == 0:
                payload = b"BM" + payload[:40]  # corrupt: truncated header
            elif i % 5 == 0:
                payload = (
                    make_bmp(8 + i % 16, 4 + i % 8, seed=i)
                    if i % 2
                    else make_ppm(8 + i % 16, 4 + i % 8, seed=i)
                )
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
