"""Property-based laws for the round-6 codecs (hypothesis; pure Python,
no SparkSession).

- JPEG: for ANY image, progressive and sequential encodings decode
  bit-identically (they carry the same quantized coefficients), across
  qualities, odd dimensions, grayscale and 4:2:0.
- Avro: encode/decode is the identity on schema-conforming records for
  a composite schema, under both container codecs.
- mu-law: the formula-derived expansion table equals the stdlib
  audioop implementation on ALL 256 code points (exhaustive, not
  sampled).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from python_kinesis_streaming_spark.llm.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
)
from python_kinesis_streaming_spark.sources.avro_codec import (
    read_container,
    write_container,
)


@settings(max_examples=12, deadline=None)
@given(
    h=st.integers(8, 40),
    w=st.integers(8, 40),
    quality=st.sampled_from([35, 60, 85, 95]),
    gray=st.booleans(),
    subsample=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_progressive_always_equals_sequential(
    h, w, quality, gray, subsample, seed
):
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    sub = subsample and not gray
    seq = decode_jpeg(encode_jpeg(img, quality=quality, subsample=sub))
    prog = decode_jpeg(
        encode_jpeg(img, quality=quality, subsample=sub, progressive=True)
    )
    assert np.array_equal(prog, seq)


AVRO_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "bytes"},
        {"name": "opt", "type": ["null", "long"]},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
    ],
}

record_st = st.fixed_dictionaries(
    {
        "i": st.integers(-(2**62), 2**62),
        "d": st.floats(allow_nan=False, allow_infinity=False, width=64),
        "s": st.text(max_size=40),
        "b": st.binary(max_size=40),
        "opt": st.one_of(st.none(), st.integers(-(2**31), 2**31)),
        "xs": st.lists(st.integers(-(2**40), 2**40), max_size=8),
        "m": st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=5),
    }
)


@settings(max_examples=30, deadline=None)
@given(rows=st.lists(record_st, max_size=10), codec=st.sampled_from(["null", "deflate"]))
def test_avro_container_roundtrip_identity(rows, codec):
    blob = write_container(rows, AVRO_SCHEMA, codec=codec)
    assert list(read_container(blob)) == rows


def test_ulaw_table_matches_audioop_exhaustively():
    audioop = pytest.importorskip("audioop")

    from python_kinesis_streaming_spark.llm.media_codecs import _ULAW

    all_bytes = bytes(range(256))
    expect = np.frombuffer(audioop.ulaw2lin(all_bytes, 2), dtype="=i2")
    assert np.array_equal(_ULAW, expect)
