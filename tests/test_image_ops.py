"""Image transforms: bilinear pinned against a literal per-pixel
reference, nearest/crop/letterbox semantics, and the decode→transform→
re-encode seam verified by decoding its own PNG output."""

from __future__ import annotations

import numpy as np
import pytest

from python_kinesis_streaming_spark.llm.image_ops import (
    center_crop,
    image_transform_frame,
    letterbox,
    resize_bilinear,
    resize_nearest,
)
from python_kinesis_streaming_spark.llm.media_codecs import (
    decode_png,
    encode_png,
)


def _ref_bilinear(arr, out_h, out_w):
    """Literal per-output-pixel loop — the definition, not the
    vectorization."""
    h, w = arr.shape[:2]
    a = arr.astype(np.float64)
    out = np.zeros((out_h, out_w, arr.shape[2]), dtype=np.uint8)
    for oy in range(out_h):
        for ox in range(out_w):
            fy = (oy + 0.5) * h / out_h - 0.5
            fx = (ox + 0.5) * w / out_w - 0.5
            y0 = min(max(int(np.floor(fy)), 0), h - 1)
            x0 = min(max(int(np.floor(fx)), 0), w - 1)
            y1 = min(y0 + 1, h - 1)
            x1 = min(x0 + 1, w - 1)
            wy = min(max(fy - y0, 0.0), 1.0)
            wx = min(max(fx - x0, 0.0), 1.0)
            v = (
                a[y0, x0] * (1 - wy) * (1 - wx)
                + a[y0, x1] * (1 - wy) * wx
                + a[y1, x0] * wy * (1 - wx)
                + a[y1, x1] * wy * wx
            )
            out[oy, ox] = np.floor(v + 0.5).clip(0, 255)
    return out


@pytest.mark.parametrize("shape", [(8, 8), (7, 13), (16, 5)])
@pytest.mark.parametrize("out", [(4, 4), (11, 3), (16, 16)])
def test_bilinear_matches_per_pixel_reference(shape, out):
    rng = np.random.default_rng(shape[0] * 100 + out[0])
    arr = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    got = resize_bilinear(arr, *out)
    want = _ref_bilinear(arr, *out)
    assert got.shape == (*out, 3)
    assert (got == want).all()


def test_bilinear_identity_and_constant():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (9, 9, 3), dtype=np.uint8)
    assert (resize_bilinear(arr, 9, 9) == arr).all()
    flat = np.full((6, 6, 3), 77, dtype=np.uint8)
    assert (resize_bilinear(flat, 13, 4) == 77).all()


def test_nearest_exact_upscale():
    arr = np.array([[[0], [255]]], dtype=np.uint8)  # 1x2 gray
    out = resize_nearest(arr, 2, 4)
    assert out[:, :2].max() == 0 and out[:, 2:].min() == 255


def test_grayscale_2d_roundtrip():
    rng = np.random.default_rng(4)
    g = rng.integers(0, 256, (10, 12), dtype=np.uint8)
    out = resize_bilinear(g, 5, 6)
    assert out.shape == (5, 6)


def test_center_crop():
    arr = np.arange(25, dtype=np.uint8).reshape(5, 5)
    got = center_crop(arr, 3, 3)
    assert (got == arr[1:4, 1:4]).all()
    with pytest.raises(ValueError):
        center_crop(arr, 6, 3)


def test_letterbox_aspect_and_padding():
    arr = np.full((10, 20, 3), 200, dtype=np.uint8)  # wide image
    out = letterbox(arr, 8, pad_value=0)
    assert out.shape == (8, 8, 3)
    # content occupies 4 rows (10*8/20=4) centered → rows 2..5
    assert (out[2:6] == 200).all()
    assert (out[:2] == 0).all() and (out[6:] == 0).all()


def test_transform_seam_png_roundtrip(spark):
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (24, 36, 3), dtype=np.uint8)
    rows = [
        (1, "png", bytearray(encode_png(img))),
        (2, "png", bytearray(b"broken")),
    ]
    df = spark.createDataFrame(rows, "img_id long, fmt string, payload binary")
    out = {
        r["id"]: r
        for r in image_transform_frame(
            df, "img_id", "fmt", "payload", out_size=16, mode="letterbox"
        ).collect()
    }
    ok = out[1]
    assert (ok["height"], ok["width"]) == (16, 16)
    decoded = decode_png(bytes(ok["payload"]))
    assert (decoded == letterbox(img, 16)).all()  # seam == kernel
    assert out[2]["format"].startswith("error:")
