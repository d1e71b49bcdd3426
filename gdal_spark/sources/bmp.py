"""BMP codec (the capability surface of the reference's
``frmts/bmp/bmpdataset.cpp``) — hand-rolled from the public Windows
BITMAPFILEHEADER/BITMAPINFOHEADER layout: uncompressed 8-bit palette and
24-bit BGR, bottom-up or top-down rows, 4-byte row padding. Lossless, so
roundtrips are byte-exact.

Scale note: one BMP is one uncompressed pixel buffer — per-file decode
parallelism only; the distributed use is per-blob multimodal decode
inside Arrow batches, like PNG/JPEG.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(data: bytes):
    """Decode one BMP → ``(bands, info)``: bands = {1..n: (H, W) uint8}
    (24-bit decodes to R/G/B bands; 8-bit palette to one band + the
    palette in info['palette'] as an (N, 3) RGB array)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs are out of scope")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    n_colors = struct.unpack_from("<I", data, 46)[0]
    if planes != 1 or compression != 0:
        raise NotImplementedError("only uncompressed single-plane BMPs")
    if bpp not in (8, 24):
        raise NotImplementedError(f"bpp {bpp} unsupported (8/24 only)")
    top_down = h < 0
    h = abs(h)
    info = {"width": w, "height": h, "bpp": bpp}
    if bpp == 8:
        n_colors = n_colors or 256
        pal = np.frombuffer(
            data, dtype=np.uint8, count=n_colors * 4, offset=14 + hdr_size
        ).reshape(n_colors, 4)
        info["palette"] = pal[:, [2, 1, 0]].copy()  # BGRX → RGB
    stride = (w * (bpp // 8) + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pix_off)
    rows = raw.reshape(h, stride)[:, : w * (bpp // 8)]
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        return {1: np.ascontiguousarray(rows)}, info
    px = rows.reshape(h, w, 3)
    # file order is B, G, R
    return (
        {1: np.ascontiguousarray(px[:, :, 2]),
         2: np.ascontiguousarray(px[:, :, 1]),
         3: np.ascontiguousarray(px[:, :, 0])},
        info,
    )


def encode_bmp(bands: dict, palette: np.ndarray | None = None) -> bytes:
    """Encode {1: gray} (8-bit, grayscale identity palette unless one is
    given as (N, 3) RGB) or {1: R, 2: G, 3: B} (24-bit) uint8 bands."""
    if set(bands) == {1}:
        arr = np.asarray(bands[1], dtype=np.uint8)
        h, w = arr.shape
        if palette is None:
            pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        else:
            pal = np.asarray(palette, dtype=np.uint8)
        n_colors = len(pal)
        bpp = 8
        pal_bytes = np.zeros((n_colors, 4), dtype=np.uint8)
        pal_bytes[:, :3] = pal[:, [2, 1, 0]]  # RGB → BGRX
        pal_blob = pal_bytes.tobytes()
        row = arr
    elif set(bands) == {1, 2, 3}:
        r = np.asarray(bands[1], dtype=np.uint8)
        h, w = r.shape
        px = np.stack([np.asarray(bands[3], dtype=np.uint8),
                       np.asarray(bands[2], dtype=np.uint8), r], axis=-1)
        n_colors = 0
        bpp = 24
        pal_blob = b""
        row = px.reshape(h, w * 3)
    else:
        raise ValueError("encode_bmp wants bands {1} or {1,2,3}")
    stride = (w * (bpp // 8) + 3) & ~3
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : row.shape[1]] = row
    pix = padded[::-1].tobytes()  # bottom-up
    pix_off = 14 + 40 + len(pal_blob)
    header = (
        b"BM"
        + struct.pack("<IHHI", pix_off + len(pix), 0, 0, pix_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(pix),
                      2835, 2835, n_colors, 0)
    )
    return header + pal_blob + pix
