"""PNG image sink (SURVEY K3, reference plot.py:64-71 + 206-216).

The reference shades each series' raster with its color, stacks the layers
(datashader ``tf.stack``), converts to PIL and base64-encodes a PNG. Here
the pixel rows arrive as bounded aggregates (<= w*h per series) and the
shade/stack/encode happens driver-side with a dependency-free PNG writer
(stdlib zlib) - RGBA, alpha scaled by count like datashader's default
eq-hist-ish shading, simplified to linear.
"""

from __future__ import annotations

import base64
import struct
import zlib

import numpy as np

#: default per-series colors (mirrors the client's LINE_COLORS role,
#: reference js/reducers.js:96-131)
LINE_COLORS = [
    (31, 119, 180),
    (255, 127, 14),
    (44, 160, 44),
    (214, 39, 40),
    (148, 103, 189),
    (140, 86, 75),
]


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png_rgba(img: np.ndarray) -> bytes:
    """Minimal RGBA PNG encoder: img is (h, w, 4) uint8, row 0 = top."""
    h, w = img.shape[:2]
    raw = b"".join(b"\x00" + img[row].tobytes() for row in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def compose_image(
    pixel_rows: list,
    w: int,
    h: int,
    colors: dict | None = None,
) -> np.ndarray:
    """Stack per-series pixel rows (series, xb, yb, cnt) into one RGBA
    image. Data orientation yb=0 at bottom -> flipped to PNG top-down; later
    series draw over earlier (reference stacks in attribute order)."""
    img = np.zeros((h, w, 4), dtype=np.uint8)
    series_ids = []
    for r in pixel_rows:
        if r["series"] not in series_ids:
            series_ids.append(r["series"])
    # user overrides layered OVER the default palette: a request that colors
    # only SOME series must not crash the uncolored ones (they fall back to
    # their palette slot, like the reference client's per-line defaults)
    defaults = {s: LINE_COLORS[i % len(LINE_COLORS)] for i, s in enumerate(series_ids)}
    color_of = {**defaults, **(colors or {})}
    max_cnt = max((r["cnt"] for r in pixel_rows), default=1)
    for r in pixel_rows:
        x, y = int(r["xb"]), int(r["yb"])
        if not (0 <= x < w and 0 <= y < h):
            continue
        alpha = int(128 + 127 * min(r["cnt"] / max_cnt, 1.0))
        rgb = color_of[r["series"]]
        img[h - 1 - y, x] = (*rgb, alpha)
    return img


def render_png_base64(pixel_rows: list, w: int, h: int, colors: dict | None = None) -> str:
    """The /image payload's image field (reference plot.py:64-71)."""
    return base64.b64encode(encode_png_rgba(compose_image(pixel_rows, w, h, colors))).decode()
