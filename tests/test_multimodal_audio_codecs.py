"""G.711 a-law/μ-law, IMA/DVI ADPCM and Microsoft ADPCM WAV decode
(r05 codec breadth): the compressed-audio families that are pure
table/formula codecs — no library needed — now decode for real instead
of DecodeUnavailable.

Ground truth comes from scalar reference implementations transcribed
here directly from the published algorithms (g711.c expansion; the IMA
reference quantizer; the RIFF-spec MS ADPCM predictor), independent of
the vectorized/table production path — plus nearest-code /
greedy-encoder round-trips with quantization bounds derived from the
codecs' largest step sizes.
"""

import struct

import numpy as np
import pytest

from oct_report_ocr_spark.sources import multimodal as M


# ---- independent scalar references ---------------------------------------

def _ulaw_ref(code: int) -> int:
    u = ~code & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw_ref(code: int) -> int:
    a = code ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


_STEP = M._IMA_STEP
_INDEX = M._IMA_INDEX


def _ima_ref_decode(data: bytes, channels: int, block_align: int):
    """Scalar IMA reference decoder (independent transcription)."""
    frames = []
    for boff in range(0, len(data), block_align):
        preds, idxs, chans = [], [], []
        for c in range(channels):
            p, i, _ = struct.unpack_from("<hBB", data, boff + 4 * c)
            preds.append(p)
            idxs.append(i)
            chans.append([p])
        body = boff + 4 * channels
        n_groups = (block_align - 4 * channels) // (4 * channels)
        for g in range(n_groups):
            for c in range(channels):
                goff = body + (g * channels + c) * 4
                for byte in data[goff : goff + 4]:
                    for nib in (byte & 0x0F, byte >> 4):
                        step = _STEP[idxs[c]]
                        diff = step >> 3
                        if nib & 1:
                            diff += step >> 2
                        if nib & 2:
                            diff += step >> 1
                        if nib & 4:
                            diff += step
                        p = preds[c] + (-diff if nib & 8 else diff)
                        preds[c] = max(-32768, min(32767, p))
                        idxs[c] = max(0, min(88, idxs[c] + _INDEX[nib & 7]))
                        chans[c].append(preds[c])
        frames.append(np.array(chans, dtype=np.float64).T / 32768.0)
    return np.concatenate(frames, axis=0)


def _raw_wav(tag, channels, rate, bits, block, data, fmt_extra=b""):
    fmt_body = struct.pack("<HHIIHH", tag, channels, rate, rate * block, block, bits)
    fmt_body += fmt_extra
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _wav_data_chunk(b: bytes) -> tuple[bytes, int]:
    """(data chunk bytes, block_align) pulled back out of a WAV."""
    off = 12
    data = block = None
    while off + 8 <= len(b):
        tag = b[off : off + 4]
        (size,) = struct.unpack_from("<I", b, off + 4)
        if tag == b"fmt ":
            block = struct.unpack_from("<HHIIHH", b, off + 8)[4]
        elif tag == b"data":
            data = b[off + 8 : off + 8 + size]
        off += 8 + size + (size & 1)
    return data, block


# ---- G.711 ----------------------------------------------------------------

@pytest.mark.parametrize("fmt,tag,ref", [
    ("mulaw", 0x0007, _ulaw_ref),
    ("alaw", 0x0006, _alaw_ref),
])
def test_g711_all_256_codes_exact(fmt, tag, ref):
    """Decode a WAV whose data is every code 0..255: each sample must
    equal the scalar reference expansion (normalized by 32768)."""
    wav = _raw_wav(tag, 1, 8000, 8, 1, bytes(range(256)))
    rate, ch, samples = M._wav_samples(wav)
    assert (rate, ch) == (8000, 1)
    expect = np.array([ref(c) for c in range(256)], dtype=np.float64) / 32768.0
    assert (samples[:, 0] == expect).all()


@pytest.mark.parametrize("fmt", ["mulaw", "alaw"])
@pytest.mark.parametrize("channels", [1, 2])
def test_g711_roundtrip_within_quantizer_bound(fmt, channels):
    """make_wav quantizes nearest-code, so reconstruction error is at
    most half the widest step (1024 int16 units for both laws at the
    top segment) — except at full scale, where the law itself clips:
    μ-law peaks at ±32124 (error up to 32767−32124+0.5 ≈ 644),
    a-law at ±32256 (within the half-step bound)."""
    wav = M.make_wav(200, channels=channels, fmt=fmt, seed=5)
    _, ch, samples = M._wav_samples(wav)
    s = np.arange(200)[:, None]
    c = np.arange(channels)[None, :]
    truth = ((5 + 7 * s + 3 * c) % 509 - 254) / 254.0
    assert ch == channels and samples.shape == truth.shape
    bound = (645.0 if fmt == "mulaw" else 512.5) / 32768.0
    assert float(np.max(np.abs(samples - truth))) <= bound


def test_mulaw_two_zero_codes():
    """μ-law encodes zero twice (0x7F and 0xFF) — both must decode to
    exactly 0, and the decode table must contain no other zeros."""
    table = M._g711_table(M._WAV_MULAW)
    assert table[0x7F] == 0.0 and table[0xFF] == 0.0
    assert int((table == 0.0).sum()) == 2


def test_g711_wrong_bits_quarantines():
    wav = _raw_wav(0x0007, 1, 8000, 16, 2, bytes(range(64)))
    with pytest.raises(M.CorruptAudio, match="G.711 requires 8 bits"):
        M._wav_samples(wav)


# ---- IMA ADPCM -------------------------------------------------------------

@pytest.mark.parametrize("channels", [1, 2, 3])
def test_ima_adpcm_decode_matches_scalar_reference(channels):
    """The production decoder must agree bit-for-bit with the scalar
    reference transcription on make_wav's greedy-encoded blocks,
    including multi-block state carry and channel interleave."""
    wav = M.make_wav(17 * 3, channels=channels, fmt="ima_adpcm", seed=9)
    data, block = _wav_data_chunk(wav)
    rate, ch, samples = M._wav_samples(wav)
    assert ch == channels and block == 4 * channels * 3
    ref = _ima_ref_decode(data, channels, block)
    assert samples.shape == ref.shape == (17 * 3, channels)
    assert (samples == ref).all()


def test_ima_adpcm_roundtrip_tracks_signal():
    """Greedy IMA encoding of the deterministic ramp reconstructs it
    closely away from the sawtooth wrap (the codec needs a few samples
    to re-adapt after a full-scale jump — that transient is the codec,
    not a bug)."""
    n = 17 * 6
    wav = M.make_wav(n, channels=1, fmt="ima_adpcm", seed=0)
    _, _, samples = M._wav_samples(wav)
    truth = ((0 + 7 * np.arange(n)) % 509 - 254) / 254.0
    err = np.abs(samples[:, 0] - truth)
    # steady-state (no full-scale sawtooth wrap within 8 samples
    # behind): tight tracking. The 12-sample wrap windows are the
    # codec's documented recovery transient, not a decoder bug.
    wrap = np.where(np.diff(truth) < -1.0)[0]
    steady = np.ones(n, dtype=bool)
    for widx in wrap:
        steady[widx + 1 : widx + 13] = False
    assert float(np.max(err[steady])) < 0.05
    # block-header samples carry the exact predictor — error is only
    # the int16 quantization of the truth itself
    assert float(np.max(err[::17])) < 1.5 / 32768.0
    # and even through the wraps, every error is bounded by full scale
    # with headers resetting it at worst one block later
    assert float(np.max(err)) <= 2.0 and int((err > 0.05).sum()) <= 12 * len(wrap)


def test_ima_adpcm_padding_repeats_last_frame():
    """n_frames not divisible by samples-per-block: the encoder pads by
    repeating the final frame; decode returns whole blocks."""
    wav = M.make_wav(20, channels=1, fmt="ima_adpcm", seed=3)
    _, _, samples = M._wav_samples(wav)
    assert samples.shape[0] == 34  # padded up to two 17-sample blocks


def test_ima_adpcm_violations_quarantine():
    good = M.make_wav(17, channels=1, fmt="ima_adpcm")
    data, block = _wav_data_chunk(good)
    # step index > 88 in the block header
    bad = bytearray(data)
    bad[2] = 89
    with pytest.raises(M.CorruptAudio, match="step index out of range"):
        M._wav_samples(_raw_wav(0x0011, 1, 16000, 4, block, bytes(bad)))
    # data not a whole number of blocks
    with pytest.raises(M.CorruptAudio, match="whole number of adpcm blocks"):
        M._wav_samples(_raw_wav(0x0011, 1, 16000, 4, block, data[:-2]))
    # block align not compatible with the channel count
    with pytest.raises(M.CorruptAudio, match="block align invalid"):
        M._wav_samples(_raw_wav(0x0011, 2, 16000, 4, 14, data))
    # wrong bits-per-sample claim
    with pytest.raises(M.CorruptAudio, match="IMA ADPCM requires 4 bits"):
        M._wav_samples(_raw_wav(0x0011, 1, 16000, 8, block, data))


# ---- container plumbing ----------------------------------------------------

@pytest.mark.parametrize("fmt", ["alaw", "mulaw", "ima_adpcm"])
def test_extensible_wrapping_decodes_identically(fmt):
    plain = M.make_wav(34, channels=2, fmt=fmt, seed=1)
    wrapped = M.make_wav(34, channels=2, fmt=fmt, seed=1, extensible=True)
    _, _, a = M._wav_samples(plain)
    _, _, b = M._wav_samples(wrapped)
    assert (a == b).all()


def test_unknown_guid_stays_unavailable():
    """An unknown extensible GUID is still an honest stub (MS-ADPCM
    itself decodes for real since r05 — see the section below)."""
    guid = struct.pack("<H", 0x0011) + b"\xde\xad" + M._KS_SUFFIX[2:]
    fmt_body = struct.pack(
        "<HHIIHHHHI", 0xFFFE, 1, 8000, 8000, 1, 8, 22, 8, 0
    ) + guid
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", 4) + b"\x00\x01\x02\x03"
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(M.DecodeUnavailable, match="extensible subformat"):
        M._wav_samples(wav)


def test_decode_audio_features_and_distributed_path(spark):
    """decode_audio's feature contract holds for the new codecs, and
    they produce REAL features through the mapInPandas kernel."""
    rate, ch, n, dur, rms, peak, zcr = M.decode_audio(
        M.make_wav(100, channels=2, fmt="mulaw")
    )
    assert (rate, ch, n) == (16000, 2, 100) and 0 < rms <= peak <= 1.0
    rows = [
        (0, "audio", bytearray(M.make_wav(100, fmt="alaw")), None),
        (1, "audio", bytearray(M.make_wav(17 * 4, fmt="ima_adpcm")), None),
        (2, "audio", bytearray(M.make_wav(100, fmt="mulaw", extensible=True)), None),
    ]
    df = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA_DDL)
    feats = {r.media_id: r for r in M.featurize(df, partitions=2).collect()}
    for i in range(3):
        assert feats[i].decode_error is None
        assert feats[i].feature[0] == 16000.0  # leads with the real rate


# ---- Microsoft ADPCM (r05) ------------------------------------------------

_MS_ADAPT_REF = (230, 230, 230, 230, 307, 409, 512, 614,
                 768, 614, 512, 409, 307, 230, 230, 230)
_MS_COEFS_REF = ((256, 0), (512, -256), (0, 0), (192, 64),
                 (240, 0), (460, -208), (392, -232))


def _ms_ref_decode(data: bytes, channels: int, block_align: int):
    """Scalar MS ADPCM reference decoder — an independent transcription
    of the RIFF-spec algorithm (C-truncating /256 predictor, signed
    nibble * delta correction, adaptation-table delta update with the
    16 floor), high nibble first, channel-interleaved per frame."""
    frames = []
    hdr = 7 * channels
    for boff in range(0, len(data), block_align):
        ks = [data[boff + c] for c in range(channels)]
        deltas = [struct.unpack_from("<h", data, boff + channels + 2 * c)[0]
                  for c in range(channels)]
        s1 = [struct.unpack_from("<h", data, boff + 3 * channels + 2 * c)[0]
              for c in range(channels)]
        s2 = [struct.unpack_from("<h", data, boff + 5 * channels + 2 * c)[0]
              for c in range(channels)]
        chans = [[s2[c], s1[c]] for c in range(channels)]
        nibs = []
        for byte in data[boff + hdr : boff + block_align]:
            nibs.append(byte >> 4)
            nibs.append(byte & 0x0F)
        for f in range(len(nibs) // channels):
            for c in range(channels):
                nib = nibs[f * channels + c]
                c1, c2 = _MS_COEFS_REF[ks[c]]
                q = s1[c] * c1 + s2[c] * c2
                base = q // 256 if q >= 0 else -((-q) // 256)  # C trunc
                signed = nib - 16 if nib >= 8 else nib
                pred = max(-32768, min(32767, base + signed * deltas[c]))
                deltas[c] = max(16, (_MS_ADAPT_REF[nib] * deltas[c]) // 256)
                s2[c], s1[c] = s1[c], pred
                chans[c].append(pred)
        frames.append(np.array(chans, dtype=np.float64).T / 32768.0)
    return np.concatenate(frames, axis=0)


@pytest.mark.parametrize("channels", [1, 2])
def test_ms_adpcm_decode_matches_scalar_reference(channels):
    wav = M.make_wav(75, channels=channels, fmt="ms_adpcm", seed=9)
    data, block = _wav_data_chunk(wav)
    _, _, got = M._wav_samples(wav)
    want = _ms_ref_decode(data, channels, block)
    assert got.shape == want.shape
    assert (got == want).all()  # int16/32768 is exact in float64


def test_ms_adpcm_roundtrip_tracks_signal():
    """Lossy round-trip: exact on the two header samples of every
    16-sample block, mean error bounded; the only large errors sit at
    the ramp's full-scale wrap discontinuities (delta must re-adapt)."""
    n = 100
    wav = M.make_wav(n, channels=1, fmt="ms_adpcm", seed=5)
    _, _, got = M._wav_samples(wav)
    s = np.arange(n)[:, None]
    want = ((5 + 7 * s) % 509 - 254) / 254.0
    err = np.abs(got[:n, 0] - want[:, 0])
    assert err.mean() < 0.03
    # block headers carry the first two samples verbatim (quantized)
    for b0 in range(0, n - 1, 16):
        assert err[b0] < 1 / 254 and err[b0 + 1] < 1 / 254


def test_ms_adpcm_predictor_choice_exercised():
    """The greedy encoder tries all 7 coefficient pairs; across blocks
    of a varied signal more than one predictor must win at least once
    (guards against the selection loop silently collapsing to pair 0)."""
    wav = M.make_wav(16 * 12, channels=1, fmt="ms_adpcm", seed=3)
    data, block = _wav_data_chunk(wav)
    preds = {data[boff] for boff in range(0, len(data), block)}
    assert len(preds) > 1, preds


def test_ms_adpcm_extensible_defaults_to_spec_coefs():
    plain = M.make_wav(34, channels=2, fmt="ms_adpcm", seed=1)
    wrapped = M.make_wav(34, channels=2, fmt="ms_adpcm", seed=1, extensible=True)
    _, _, a = M._wav_samples(plain)
    _, _, b = M._wav_samples(wrapped)
    assert (a == b).all()


def test_ms_adpcm_violations_quarantine():
    good = M.make_wav(32, channels=1, fmt="ms_adpcm", seed=2)
    data, block = _wav_data_chunk(good)
    ext = struct.pack("<HHH", 32, 16, len(_MS_COEFS_REF))
    for c1, c2 in _MS_COEFS_REF:
        ext += struct.pack("<hh", c1, c2)
    # predictor index past the coefficient table
    bad = bytearray(data)
    bad[0] = 7
    with pytest.raises(M.CorruptAudio, match="predictor index"):
        M._wav_samples(_raw_wav(0x0002, 1, 8000, 4, block, bytes(bad), ext))
    # partial trailing block
    with pytest.raises(M.CorruptAudio, match="whole number"):
        M._wav_samples(_raw_wav(0x0002, 1, 8000, 4, block, data[:-3], ext))
    # block align smaller than the per-channel header
    with pytest.raises(M.CorruptAudio, match="block align too small"):
        M._wav_samples(_raw_wav(0x0002, 1, 8000, 4, 7, data[:7], ext))
    # declared samples-per-block disagrees with the block align
    bad_ext = struct.pack("<HHH", 32, 99, len(_MS_COEFS_REF)) + ext[6:]
    with pytest.raises(M.CorruptAudio, match="samples-per-block"):
        M._wav_samples(_raw_wav(0x0002, 1, 8000, 4, block, data, bad_ext))
    # cbSize smaller than the declared coefficient table
    with pytest.raises(M.CorruptAudio, match="coefficient table"):
        M._wav_samples(_raw_wav(0x0002, 1, 8000, 4, block, data,
                                struct.pack("<HHH", 8, 16, 7) + ext[6:10]))
    # wrong bits-per-sample claim
    with pytest.raises(M.CorruptAudio, match="4 bits"):
        M._wav_samples(_raw_wav(0x0002, 1, 8000, 8, block, data, ext))


def test_ms_adpcm_decode_audio_features():
    rate, ch, n, dur, rms, peak, zcr = M.decode_audio(
        M.make_wav(64, channels=2, rate=22050, fmt="ms_adpcm", seed=4)
    )
    assert (rate, ch, n) == (22050, 2, 64)
    assert 0 < rms <= peak <= 1.0 and abs(dur - 64 / 22050) < 1e-9
