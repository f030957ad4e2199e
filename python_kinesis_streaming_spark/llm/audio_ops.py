"""Audio standardization kernels — the audio twin of ``image_ops``:
every audio corpus gets mixed to mono, resampled to one target rate,
and length-normalized before feature extraction or tokenization.

- ``mixdown_mono`` — channel mean (the decode convention used by
  ``audio_features``), int16-safe rounding.
- ``resample_linear`` — sample-rate conversion by linear interpolation
  on the continuous-time index map (out[i] = x(i·src/dst)), pinned in
  tests against a literal per-sample reference loop and against exact
  expectations on ramps (linear interpolation reproduces a ramp
  exactly). Linear is the honest cheap kernel; a windowed-sinc would
  plug into the same seam.
- ``fit_length`` — pad (zeros) or center-truncate to a fixed sample
  count, the "n-second clip" dataloader convention.
- ``audio_standardize_frame`` — (id, format, payload) → decoded,
  mixed, resampled, length-fitted rows with the standardized PCM
  re-encoded as WAV bytes, through the standard Arrow seam with the
  documented quarantine tuple.
"""

from __future__ import annotations

import numpy as np


def mixdown_mono(samples: np.ndarray) -> np.ndarray:
    """(n, ch) int → (n,) int16 channel mean (round half away from 0)."""
    if samples.ndim == 1:
        return samples.astype(np.int16)
    m = samples.astype(np.float64).mean(axis=1)
    return (
        (np.floor(np.abs(m) + 0.5) * np.sign(m))
        .clip(-32768, 32767)
        .astype(np.int16)
    )


def resample_linear(
    mono: np.ndarray, src_rate: int, dst_rate: int
) -> np.ndarray:
    """1-D int16 → int16 at dst_rate by linear interpolation.

    Output length = round(n · dst/src); sample i reads the source at
    continuous position i · src/dst, clamped at the final sample.
    """
    if src_rate == dst_rate:
        return mono.astype(np.int16)
    n = len(mono)
    if n == 0:
        return mono.astype(np.int16)
    out_n = max(1, round(n * dst_rate / src_rate))
    # multiply-then-divide, matching the definition i·src/dst exactly
    # (precomputing src/dst shifts half-sample boundaries by one ulp)
    pos = np.arange(out_n) * float(src_rate) / float(dst_rate)
    i0 = np.minimum(np.floor(pos).astype(int), n - 1)
    i1 = np.minimum(i0 + 1, n - 1)
    frac = np.clip(pos - i0, 0.0, 1.0)
    x = mono.astype(np.float64)
    v = x[i0] * (1 - frac) + x[i1] * frac
    return (
        (np.floor(np.abs(v) + 0.5) * np.sign(v))
        .clip(-32768, 32767)
        .astype(np.int16)
    )


def fit_length(mono: np.ndarray, n_samples: int) -> np.ndarray:
    """Zero-pad (right) or center-truncate to exactly n_samples."""
    n = len(mono)
    if n == n_samples:
        return mono
    if n < n_samples:
        return np.concatenate(
            [mono, np.zeros(n_samples - n, dtype=mono.dtype)]
        )
    start = (n - n_samples) // 2
    return mono[start : start + n_samples].copy()


def encode_wav_pcm16(mono: np.ndarray, rate: int) -> bytes:
    """Minimal valid RIFF/WAVE PCM16 mono writer (test + seam output)."""
    import struct

    data = mono.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_standardize_frame(
    df,
    id_col: str,
    fmt_col: str,
    payload_col: str,
    target_rate: int = 16_000,
    target_seconds: float = 1.0,
):
    """Decode (wav/aiff/au/flac) → mono → resample → fixed length →
    WAV-re-encode. Output: (id, format, sample_rate, n_samples, rms,
    payload); failures become error:<reason> rows."""
    from pyspark import cloudpickle

    import python_kinesis_streaming_spark.llm.audio_ops as _self
    import python_kinesis_streaming_spark.llm.flac_codec as _flac
    import python_kinesis_streaming_spark.llm.media_codecs as _media

    cloudpickle.register_pickle_by_value(_self)
    cloudpickle.register_pickle_by_value(_flac)
    cloudpickle.register_pickle_by_value(_media)
    decoders = {
        "wav": _media.decode_wav,
        "aiff": _media.decode_aiff,
        "au": _media.decode_au,
    }
    decode_flac_k = _flac.decode_flac

    n_target = int(round(target_rate * target_seconds))

    def standardize_batches(batches):
        import struct
        import zlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, fmt, payload in zip(
                pdf[id_col], pdf[fmt_col], pdf[payload_col]
            ):
                try:
                    blob = bytes(payload)
                    if fmt == "flac":
                        d = decode_flac_k(blob)
                        samples, rate = d["samples"], d["sample_rate"]
                    elif fmt in decoders:
                        samples, rate = decoders[fmt](blob)
                    else:
                        raise ValueError(f"unknown audio format {fmt!r}")
                    mono = mixdown_mono(samples)
                    mono = resample_linear(mono, rate, target_rate)
                    mono = fit_length(mono, n_target)
                    rms = float(
                        np.sqrt(np.mean(mono.astype(np.float64) ** 2))
                    )
                    rows.append(
                        {
                            "id": rid,
                            "format": fmt,
                            "sample_rate": target_rate,
                            "n_samples": n_target,
                            "rms": round(rms, 4),
                            "payload": encode_wav_pcm16(mono, target_rate),
                        }
                    )
                except (ValueError, struct.error, zlib.error, IndexError,
                        EOFError, OSError) as e:
                    rows.append(
                        {
                            "id": rid,
                            "format": f"error:{e}",
                            "sample_rate": None,
                            "n_samples": None,
                            "rms": None,
                            "payload": None,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "format", "sample_rate", "n_samples", "rms",
                    "payload",
                ],
            )

    return df.mapInPandas(
        standardize_batches,
        schema=(
            "id long, format string, sample_rate int, n_samples int, "
            "rms double, payload binary"
        ),
    )
