"""Image preprocessing kernels (resize / crop / letterbox) + the
Arrow-batched transform seam — the step between decode and
feature-extraction in a multimodal training pipeline, implemented with
exact, test-pinned semantics instead of a library call.

- ``resize_bilinear`` — vectorized numpy bilinear with the standard
  half-pixel (align_corners=False) sampling grid; pinned in tests
  against a literal per-output-pixel reference loop.
- ``resize_nearest`` — floor-of-center index map (the common
  nearest-neighbor convention).
- ``center_crop`` / ``letterbox`` — dataset-normalization helpers
  (letterbox = aspect-preserving resize + pad to square, the detection
  -pipeline convention; padding value configurable).
- ``image_transform_frame`` — (id, format, payload) → decoded,
  transformed, PNG-re-encoded rows through the same mapInPandas seam
  as media_features_frame: decode errors become error rows, the
  transform is partition-local, and the output payload is a real PNG
  (verified by decoding it back in tests).

Scale: per-blob CPU kernel behind the Arrow seam — zero shuffle; the
vectorized bilinear runs at memory bandwidth (two gathers + lerps per
output pixel), so the decode (not the resize) dominates the task.
"""

from __future__ import annotations

import numpy as np

from python_kinesis_streaming_spark.llm.media_codecs import (
    resize_nearest as _nn_kernel,
)


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """HxWxC (or HxW) uint8 → out_h x out_w, nearest neighbor
    (floor of the half-pixel center map). Delegates to the single
    nearest-neighbor kernel in media_codecs (centers=True) so the
    index-map convention is pinned in exactly one place."""
    return _nn_kernel(arr, out_h, out_w, centers=True)


def resize_bilinear(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """HxWxC (or HxW) uint8 → out_h x out_w bilinear, half-pixel
    centers (align_corners=False), edge-clamped, round-half-up to
    uint8 — the torchvision/PIL-style convention."""
    h, w = arr.shape[:2]
    squeeze = arr.ndim == 2
    a = arr[:, :, None].astype(np.float64) if squeeze else arr.astype(
        np.float64
    )
    fy = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    fx = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(fy).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    out = np.floor(out + 0.5).clip(0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def center_crop(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = arr.shape[:2]
    if out_h > h or out_w > w:
        raise ValueError("crop larger than image")
    y = (h - out_h) // 2
    x = (w - out_w) // 2
    return arr[y : y + out_h, x : x + out_w].copy()


def letterbox(
    arr: np.ndarray, size: int, pad_value: int = 114
) -> np.ndarray:
    """Aspect-preserving resize so the long side equals ``size``,
    centered on a size×size canvas filled with ``pad_value``."""
    h, w = arr.shape[:2]
    scale = size / max(h, w)
    nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
    resized = resize_bilinear(arr, nh, nw)
    if resized.ndim == 2:
        canvas = np.full((size, size), pad_value, dtype=np.uint8)
    else:
        canvas = np.full(
            (size, size, resized.shape[2]), pad_value, dtype=np.uint8
        )
    y, x = (size - nh) // 2, (size - nw) // 2
    canvas[y : y + nh, x : x + nw] = resized
    return canvas


def image_transform_frame(
    df,
    id_col: str,
    fmt_col: str,
    payload_col: str,
    out_size: int = 64,
    mode: str = "letterbox",
):
    """Decode → transform → PNG-re-encode each image blob. Output:
    (id, format, height, width, payload) where payload is a valid PNG
    of the transformed pixels; failures become error:<reason> rows.

    ``mode``: "letterbox" (default), "bilinear" (plain resize to
    out_size × out_size), or "nearest".
    """
    from pyspark import cloudpickle

    import python_kinesis_streaming_spark.llm.image_ops as _self
    import python_kinesis_streaming_spark.llm.jpeg_codec as _jpeg
    import python_kinesis_streaming_spark.llm.media_codecs as _media

    cloudpickle.register_pickle_by_value(_self)
    cloudpickle.register_pickle_by_value(_jpeg)
    cloudpickle.register_pickle_by_value(_media)
    decode_png_k = _media.decode_png
    encode_png_k = _media.encode_png
    decode_bmp_k = _media.decode_bmp
    decode_gif_k = _media.decode_gif
    decode_jpeg_k = _jpeg.decode_jpeg

    def transform_batches(batches):
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
                    if fmt == "png":
                        arr = decode_png_k(blob)
                    elif fmt == "bmp":
                        arr = decode_bmp_k(blob)
                    elif fmt == "jpeg":
                        arr = decode_jpeg_k(blob)
                    elif fmt == "gif":
                        arr = decode_gif_k(blob)[0]
                    else:
                        raise ValueError(f"unknown image format {fmt!r}")
                    if mode == "letterbox":
                        out = letterbox(arr, out_size)
                    elif mode == "bilinear":
                        out = resize_bilinear(arr, out_size, out_size)
                    elif mode == "nearest":
                        out = resize_nearest(arr, out_size, out_size)
                    else:
                        raise ValueError(f"unknown mode {mode!r}")
                    rows.append(
                        {
                            "id": rid,
                            "format": fmt,
                            "height": out.shape[0],
                            "width": out.shape[1],
                            "payload": encode_png_k(out),
                        }
                    )
                except (ValueError, struct.error, zlib.error, IndexError,
                        EOFError, OSError) as e:
                    # the documented quarantine tuple (media_codecs seam)
                    rows.append(
                        {
                            "id": rid,
                            "format": f"error:{e}",
                            "height": None,
                            "width": None,
                            "payload": None,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["id", "format", "height", "width", "payload"],
            )

    return df.mapInPandas(
        transform_batches,
        schema="id long, format string, height int, width int, payload binary",
    )
