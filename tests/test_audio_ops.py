"""Audio standardization: resampling pinned against a per-sample
reference and exact ramp expectations, mixdown/length rules, and the
decode→standardize→WAV seam verified by re-decoding its own output."""

from __future__ import annotations

import numpy as np
import pytest

from python_kinesis_streaming_spark.llm.audio_ops import (
    audio_standardize_frame,
    encode_wav_pcm16,
    fit_length,
    mixdown_mono,
    resample_linear,
)
from python_kinesis_streaming_spark.llm.media_codecs import decode_wav


def _ref_resample(mono, src, dst):
    n = len(mono)
    out = []
    for i in range(max(1, round(n * dst / src))):
        pos = i * src / dst
        i0 = min(int(np.floor(pos)), n - 1)
        i1 = min(i0 + 1, n - 1)
        frac = min(max(pos - i0, 0.0), 1.0)
        v = mono[i0] * (1 - frac) + mono[i1] * frac
        out.append(
            int(np.clip(np.floor(abs(v) + 0.5) * np.sign(v), -32768, 32767))
        )
    return np.array(out, dtype=np.int16)


@pytest.mark.parametrize("src,dst", [(44100, 16000), (8000, 16000),
                                     (22050, 22050), (16000, 8000)])
def test_resample_matches_reference(src, dst):
    rng = np.random.default_rng(src)
    mono = rng.integers(-30000, 30000, 500).astype(np.int16)
    got = resample_linear(mono, src, dst)
    want = _ref_resample(mono.astype(np.float64), src, dst)
    assert got.dtype == np.int16
    assert (got == want).all()
    assert len(got) == max(1, round(500 * dst / src))


def test_resample_ramp_is_exact():
    # linear interpolation reproduces a linear signal exactly
    mono = np.arange(0, 1000, 2, dtype=np.int16)  # slope 2 per sample
    up = resample_linear(mono, 8000, 16000)  # 2x: new samples midway
    assert (up[::2] == mono).all()
    assert (up[1:-1:2] == mono[:-1] + 1).all()


def test_mixdown_and_fit_length():
    st = np.array([[100, 200], [-100, -201]], dtype=np.int16)
    m = mixdown_mono(st)
    assert list(m) == [150, -151]  # half away from zero
    assert list(fit_length(m, 4)) == [150, -151, 0, 0]
    long = np.arange(10, dtype=np.int16)
    assert list(fit_length(long, 4)) == [3, 4, 5, 6]  # centered


def test_wav_writer_roundtrips_through_decoder():
    mono = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
    samples, rate = decode_wav(encode_wav_pcm16(mono, 16000))
    assert rate == 16000
    assert (samples[:, 0] == mono).all()


def test_standardize_seam(spark):
    from python_kinesis_streaming_spark.llm.flac_codec import encode_flac

    t = np.arange(44100)
    tone = (9000 * np.sin(2 * np.pi * 440 * t / 44100)).astype(np.int32)
    stereo = np.stack([tone, tone], axis=1)
    rows = [
        (1, "wav", bytearray(encode_wav_pcm16(tone.astype(np.int16), 44100))),
        (2, "flac", bytearray(encode_flac(stereo, 44100))),
        (3, "wav", bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "clip long, fmt string, payload binary")
    out = {
        r["id"]: r
        for r in audio_standardize_frame(
            df, "clip", "fmt", "payload", target_rate=16000,
            target_seconds=0.5,
        ).collect()
    }
    for i in (1, 2):
        assert out[i]["sample_rate"] == 16000
        assert out[i]["n_samples"] == 8000
        dec, rate = decode_wav(bytes(out[i]["payload"]))
        assert rate == 16000 and dec.shape[0] == 8000
        assert out[i]["rms"] > 1000  # the tone survived the chain
    assert out[3]["format"].startswith("error:")
