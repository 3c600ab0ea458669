"""PNG image sink (SURVEY K3, reference plot.py:27-71 + 195-216).

The reference shades each series' raster with its color (datashader
``tf.shade(agg, cmap=[color])`` - single-hue, EQ-HIST alpha by default),
optionally widens the line (``tf.spread(image, px=width)``,
plot.py:38-42), then stacks the per-series layers with source-over
compositing (``tf.stack``, plot.py:206). Here the pixel rows arrive as
bounded aggregates (<= w*h per series) and the shade/spread/stack/encode
happens driver-side with a dependency-free PNG writer (stdlib zlib):

  - eq-hist shading: alpha follows the count histogram's CDF (rank-based),
    so dense and sparse regions both keep contrast - same transfer
    function family as datashader's default; ``shading="linear"`` keeps
    the simpler count-proportional alpha.
  - spread: per-series max-alpha dilation by a square (2*px+1) kernel
    before stacking (single-hue layers make over-compositing of a layer
    with itself equivalent to max-alpha).
  - stack: straight source-over in float, later series over earlier
    (attribute order), like the reference.
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


def decode_png_rgba(data: bytes) -> np.ndarray:
    """Inverse of ``encode_png_rgba`` for the subset it emits (8-bit RGBA,
    filter 0 on every scanline, any IDAT chunking): back to (h, w, 4)
    uint8. Raises on anything else - this is a verification decoder for
    pixel-level witnesses (the PNG BYTES are not stable across zlib
    versions/levels; the decoded array is), not a general PNG reader."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if (depth, ctype) != (8, 6):
                raise ValueError("decoder handles 8-bit RGBA only")
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    if w is None:
        raise ValueError("missing IHDR chunk")
    raw = zlib.decompress(idat)
    stride = 1 + 4 * w
    rows = []
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        if line[0] != 0:
            raise ValueError(f"unexpected filter {line[0]} on row {y}")
        rows.append(np.frombuffer(line[1:], dtype=np.uint8).reshape(w, 4))
    return np.stack(rows)


#: datashader's default minimum alpha for shaded (non-empty) pixels
MIN_ALPHA = 40


def _eq_hist_alpha(cnts: np.ndarray, min_alpha: int = MIN_ALPHA) -> np.ndarray:
    """Histogram-equalized alpha (datashader tf.shade's default transfer
    function): alpha follows the CDF of the count distribution, so a few
    hot pixels can't wash out the rest of the line."""
    vals, inv, freq = np.unique(cnts, return_inverse=True, return_counts=True)
    if len(vals) == 1:
        return np.full(len(cnts), 255, dtype=np.float64)
    cdf = freq.cumsum().astype(np.float64)
    norm = (cdf - cdf[0]) / (cdf[-1] - cdf[0])
    return (min_alpha + (255.0 - min_alpha) * norm)[inv]


def _spread(alpha: np.ndarray, px: int) -> np.ndarray:
    """Max-alpha dilation by a (2*px+1)^2 kernel (reference tf.spread,
    plot.py:38-42): widens 1-pixel lines for visibility."""
    if px <= 0:
        return alpha
    h, w = alpha.shape
    out = alpha.copy()
    for dy in range(-px, px + 1):
        for dx in range(-px, px + 1):
            if dy == 0 and dx == 0:
                continue
            shifted = np.zeros_like(alpha)
            ys0, ys1 = max(dy, 0), h + min(dy, 0)
            xs0, xs1 = max(dx, 0), w + min(dx, 0)
            shifted[ys0:ys1, xs0:xs1] = alpha[ys0 - dy : ys1 - dy, xs0 - dx : xs1 - dx]
            np.maximum(out, shifted, out=out)
    return out


def snap_streamed_edge_rows(pixel_rows: list, w: int) -> list:
    """Adapter from ``streaming_raster_windowed`` rows to batch canvas
    semantics at the RIGHT edge (ADVICE r13): the streaming raster leaves
    x unclipped (its watermark must ride every event), so an event
    bitwise-exactly on the canvas right edge x0+span opens column ``w``
    there, while batch ``bin_2d`` snaps it into ``w-1``
    (datashader's inclusive upper edge). Apply this when - and only when
    - the consumer's canvas right edge equals the raster's x0+span:
    rows at xb == w are folded into xb = w-1, summing ``cnt`` per
    (series, yb) exactly as the batch hash aggregate would have.
    Only ``cnt`` is merged - ``compose_image`` reads nothing else;
    callers needing merged vmean/vmin/vmax must re-aggregate upstream.
    Columns beyond w (a moved canvas) are left for compose's crop."""
    merged: dict = {}
    for r in pixel_rows:
        if int(r["xb"]) == w:
            key = (r["series"], int(r["yb"]))
            merged[key] = merged.get(key, 0) + r["cnt"]
    result = []
    for r in pixel_rows:
        if int(r["xb"]) == w:
            continue
        key = (r["series"], int(r["yb"]))
        if int(r["xb"]) == w - 1 and key in merged:
            result.append({**r, "cnt": r["cnt"] + merged.pop(key)})
        else:
            result.append(dict(r))
    # an edge-only pixel (no existing w-1 row to fold into) still renders
    for (series, yb), cnt in merged.items():
        result.append({"series": series, "xb": w - 1, "yb": yb, "cnt": cnt})
    return result


def compose_image(
    pixel_rows: list,
    w: int,
    h: int,
    colors: dict | None = None,
    shading: str = "eqhist",
    widths: dict | None = None,
    order: list | None = None,
) -> np.ndarray:
    """Shade + spread + stack per-series pixel rows (series, xb, yb, cnt)
    into one RGBA image. Data orientation yb=0 at bottom -> flipped to PNG
    top-down; series composite later OVER earlier in REQUEST order when
    ``order`` (series ids as the request listed them) is given — the
    reference stacks in attributes.items() request order (plot.py:206) —
    else in ascending id order. Either key is DETERMINISTIC, where
    first-appearance order of collected pixel rows depends on partition
    scheduling and would flip both the default palette assignment and the
    stacking between runs. ``widths`` maps series -> spread px."""
    by_series: dict = {}
    for r in pixel_rows:
        by_series.setdefault(r["series"], []).append(r)
    if order is not None:
        # request order first (reference z-order), any series the request
        # didn't name appended deterministically by ascending id
        series_ids = [s for s in order if s in by_series]
        series_ids += sorted(s for s in by_series if s not in set(order))
    else:
        series_ids = sorted(by_series)
    # user overrides layered OVER the default palette: a request that colors
    # only SOME series must not crash the uncolored ones (they fall back to
    # their palette slot, like the reference client's per-line defaults)
    defaults = {s: LINE_COLORS[i % len(LINE_COLORS)] for i, s in enumerate(series_ids)}
    color_of = {**defaults, **(colors or {})}

    # premultiplied float compositing; unpremultiply at the end
    acc = np.zeros((h, w, 4), dtype=np.float64)
    for s in series_ids:
        rows = [
            r for r in by_series[s] if 0 <= int(r["xb"]) < w and 0 <= int(r["yb"]) < h
        ]
        if not rows:
            continue
        xs = np.array([int(r["xb"]) for r in rows])
        ys = h - 1 - np.array([int(r["yb"]) for r in rows])
        cnts = np.array([r["cnt"] for r in rows], dtype=np.float64)
        if shading == "linear":
            alphas = 128.0 + 127.0 * np.minimum(cnts / cnts.max(), 1.0)
        else:
            alphas = _eq_hist_alpha(cnts)
        layer_a = np.zeros((h, w), dtype=np.float64)
        layer_a[ys, xs] = alphas / 255.0
        layer_a = _spread(layer_a, int((widths or {}).get(s, 0)))
        rgb = np.array(color_of[s], dtype=np.float64)
        a = layer_a[..., None]
        acc[..., :3] = rgb * a + acc[..., :3] * (1.0 - a)
        acc[..., 3] = layer_a + acc[..., 3] * (1.0 - layer_a)

    img = np.zeros((h, w, 4), dtype=np.uint8)
    visible = acc[..., 3] > 0
    img[..., 3] = np.rint(acc[..., 3] * 255.0).astype(np.uint8)
    # unpremultiply for straight-alpha PNG output
    img[..., :3][visible] = np.rint(
        acc[..., :3][visible] / acc[..., 3][visible][:, None]
    ).astype(np.uint8)
    return img


def render_png_base64(
    pixel_rows: list,
    w: int,
    h: int,
    colors: dict | None = None,
    shading: str = "eqhist",
    widths: dict | None = None,
    order: list | None = None,
) -> str:
    """The /image payload's image field (reference plot.py:64-71)."""
    return base64.b64encode(
        encode_png_rgba(
            compose_image(pixel_rows, w, h, colors, shading, widths, order)
        )
    ).decode()
