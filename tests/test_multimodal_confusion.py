"""Cross-format confusion matrix for the multimodal decode kernels
(VERDICT r04 item 7): a payload of kind X landing in a row tagged
kind Y must quarantine with the right error class — never a wrong
decode, never a silent fake-feature fallback when the magic is one
this container actually recognizes.

Grid axes: row ``kind`` (image / audio) × payload format (BMP, P6-PPM,
PNG, baseline JPEG, RIFF/WAVE, unknown). Plus header-vs-payload
confusion inside WAV (PCM claim over float data, float claim with
illegal width, inconsistent block align) and a JPEG truncated at SOS.
"""

import struct

import pytest

from oct_report_ocr_spark.sources import multimodal as M

IMAGE_PAYLOADS = {
    "bmp": lambda: M.make_bmp(6, 4, seed=1),
    "ppm": lambda: M.make_ppm(6, 4, seed=2),
    "png": lambda: M.make_png(6, 4, seed=3),
    "jpeg": lambda: M.make_jpeg(16, 12, seed=4),
}


# ---- cross-kind: recognized magic in the wrong row kind ----


@pytest.mark.parametrize("fmt", sorted(IMAGE_PAYLOADS))
def test_image_payload_in_audio_row_quarantines(fmt):
    with pytest.raises(M.CorruptAudio, match="image payload"):
        M.decode_audio(IMAGE_PAYLOADS[fmt]())


def test_audio_payload_in_image_row_quarantines():
    with pytest.raises(M.CorruptImage, match="RIFF/WAVE"):
        M.decode_image(M.make_wav(50))


def test_unknown_magic_stays_decode_unavailable():
    """Unrecognized formats keep the honest DecodeUnavailable path in
    BOTH kinds (fake-feature fallback downstream) — the sniff only
    fires on magics this container can really decode."""
    mp3ish = b"\xff\xfb\x90\x00" + bytes(64)  # MPEG audio frame sync
    with pytest.raises(M.DecodeUnavailable):
        M.decode_image(mp3ish)
    with pytest.raises(M.DecodeUnavailable):
        M.decode_audio(mp3ish)


def test_riff_avi_is_not_sniffed_as_audio():
    """RIFF is a container family; only RIFF+WAVE means audio."""
    avi = b"RIFF" + struct.pack("<I", 16) + b"AVI " + bytes(16)
    with pytest.raises(M.DecodeUnavailable):
        M.decode_image(avi)


# ---- header-vs-payload confusion inside one format ----


def _patch_fmt_tag(wav: bytes, new_tag: int) -> bytes:
    i = wav.index(b"fmt ")
    return wav[: i + 8] + struct.pack("<H", new_tag) + wav[i + 10 :]


def test_wav_pcm_claim_over_float_data_follows_header():
    """fmt says PCM(1), data is IEEE float32: byte-indistinguishable
    from int32 PCM, so the decoder must follow the header claim
    deterministically (no content heuristics) — and the two readings
    must actually differ, proving the header is what's honored."""
    w = M.make_wav(64, channels=1, bits=32, fmt="float")
    as_float = M.decode_audio(w)
    as_pcm = M.decode_audio(_patch_fmt_tag(w, 1))
    assert as_float[:3] == as_pcm[:3]  # rate/channels/frames from header
    assert as_float[4] != as_pcm[4]  # rms differs: interpretation followed the claim
    assert M.decode_audio(_patch_fmt_tag(w, 1)) == as_pcm  # deterministic


def test_wav_float_claim_with_pcm_width_is_unavailable():
    """fmt says float(3) but 16-bit: no such codec — honest
    DecodeUnavailable, not a garbage decode."""
    w = M.make_wav(64, channels=1, bits=16)
    with pytest.raises(M.DecodeUnavailable, match="16-bit float"):
        M.decode_audio(_patch_fmt_tag(w, 3))


def test_wav_block_align_mismatch_quarantines():
    w = bytearray(M.make_wav(64, channels=1, bits=32, fmt="float"))
    j = bytes(w).index(b"fmt ")
    struct.pack_into("<H", w, j + 8 + 12, 7)  # block_align field
    with pytest.raises(M.CorruptAudio, match="block align"):
        M.decode_audio(bytes(w))


def test_jpeg_truncated_at_sos_quarantines():
    b = M.make_jpeg(16, 12, seed=1)
    i = b.index(b"\xff\xda")
    with pytest.raises(M.CorruptImage, match="SOS|truncated"):
        M.decode_image(b[:i])
    with pytest.raises(M.CorruptImage):
        M.decode_image(b[: i + 6])


# ---- the distributed path: quarantine column, not exceptions ----


def test_featurize_confusion_grid_lands_in_quarantine(spark):
    """Through the real mapInPandas kernel: mislabeled rows produce
    decode_error rows with the right class name; the job never fails,
    correctly-labeled neighbors in the same batch are untouched."""
    rows = [
        (1, "image", M.make_wav(50), "decode:CorruptImage"),
        (2, "audio", M.make_png(6, 4, seed=3), "decode:CorruptAudio"),
        (3, "audio", M.make_jpeg(16, 12, seed=4), "decode:CorruptAudio"),
        (4, "image", M.make_jpeg(16, 12, seed=1)[:40], "decode:CorruptImage"),
        (5, "image", M.make_png(6, 4, seed=3), None),  # control
        (6, "audio", M.make_wav(50), None),  # control
        (7, "image", b"\xff\xfb\x90\x00" + bytes(64), None),  # unknown → fake
    ]
    df = spark.createDataFrame(
        [(i, k, bytearray(c), None) for i, k, c, _ in rows],
        schema=M.MEDIA_SCHEMA_DDL,
    )
    got = {r.media_id: r for r in M.featurize(df, partitions=2).collect()}
    for media_id, _, _, want_err in rows:
        assert got[media_id].decode_error == want_err, media_id
        if want_err is None:
            assert got[media_id].feature is not None
        else:
            assert got[media_id].feature is None
