"""ISO WKB encode/decode, NumPy-vectorized where it matters.

WKB is the engine's on-the-wire geometry representation (BinaryType
columns), matching the reference's interchange format
(``exportToWkb``/``importFromWkb``, ogr/ogr_geometry.h:457-463). Only
little-endian 2-D geometries are produced; both byte orders are parsed.

Supported types: Point(1), LineString(2), Polygon(3), MultiPoint(4),
MultiLineString(5), MultiPolygon(6), GeometryCollection(7) — the
non-curved OGR core set (ogr/ogr_core.h:405-409). Curved/3-D types are
out of scope for v1 (the reference linearizes them for most drivers too).
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_GEOMETRYCOLLECTION = 7

_POINT_HDR = struct.pack("<BI", 1, WKB_POINT)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def point_wkb(x: float, y: float) -> bytes:
    return _POINT_HDR + struct.pack("<dd", x, y)


def points_wkb_np(xs, ys) -> list[bytes]:
    """Vectorized batch encode of N points → list of 21-byte WKB blobs."""
    xs = np.ascontiguousarray(xs, dtype="<f8")
    ys = np.ascontiguousarray(ys, dtype="<f8")
    n = len(xs)
    buf = np.zeros((n, 21), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1] = WKB_POINT  # little-endian uint32 type: bytes 1..4
    buf[:, 5:13] = xs.view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = ys.view(np.uint8).reshape(n, 8)
    return [b.tobytes() for b in buf]


def linestring_wkb(coords) -> bytes:
    coords = np.asarray(coords, dtype="<f8")
    return (
        struct.pack("<BII", 1, WKB_LINESTRING, len(coords))
        + coords.tobytes()
    )


def polygon_wkb(exterior, holes=()) -> bytes:
    """Polygon from rings (each an (N,2) array; closed or not — closed here)."""
    rings = [np.asarray(exterior, dtype="<f8")] + [
        np.asarray(h, dtype="<f8") for h in holes
    ]
    out = [struct.pack("<BII", 1, WKB_POLYGON, len(rings))]
    for r in rings:
        if len(r) and not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        out.append(struct.pack("<I", len(r)))
        out.append(r.astype("<f8").tobytes())
    return b"".join(out)


def multipolygon_wkb(polys) -> bytes:
    parts = [polygon_wkb(*p) if isinstance(p, tuple) else polygon_wkb(p) for p in polys]
    return struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(parts)) + b"".join(parts)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def geom(self):
        order = self.buf[self.pos]
        self.pos += 1
        fmt = "<" if order == 1 else ">"
        gtype = struct.unpack_from(fmt + "I", self.buf, self.pos)[0]
        self.pos += 4
        base = gtype % 1000  # tolerate ISO Z/M offsets (1001 → 1)
        ndim = 2 + (1 if gtype >= 1000 else 0)
        if base == WKB_POINT:
            vals = struct.unpack_from(fmt + "d" * ndim, self.buf, self.pos)
            self.pos += 8 * ndim
            return ("Point", (vals[0], vals[1]))
        if base in (WKB_LINESTRING,):
            return ("LineString", self._coords(fmt, ndim))
        if base == WKB_POLYGON:
            nrings = self._u32(fmt)
            return ("Polygon", [self._coords(fmt, ndim) for _ in range(nrings)])
        if base in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON, WKB_GEOMETRYCOLLECTION):
            name = {4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon", 7: "GeometryCollection"}[base]
            n = self._u32(fmt)
            return (name, [self.geom() for _ in range(n)])
        raise ValueError(f"unsupported WKB geometry type {gtype}")

    def _u32(self, fmt):
        v = struct.unpack_from(fmt + "I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def _coords(self, fmt, ndim):
        n = self._u32(fmt)
        if fmt == "<":
            arr = np.frombuffer(self.buf, dtype="<f8", count=n * ndim, offset=self.pos)
        else:
            arr = np.frombuffer(self.buf, dtype=">f8", count=n * ndim, offset=self.pos).astype("<f8")
        self.pos += 8 * n * ndim
        return arr.reshape(n, ndim)[:, :2].copy()


def parse_wkb(buf: bytes):
    """Parse one WKB blob → (type_name, payload).

    Point → (x, y); LineString → (N,2) ndarray; Polygon → [rings];
    Multi*/Collection → [children].
    """
    return _Reader(buf).geom()


def parse_point_wkb_np(blobs) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode of a column of little-endian point WKBs → (xs, ys)."""
    arr = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(-1, 21)
    xs = arr[:, 5:13].copy().view("<f8").ravel()
    ys = arr[:, 13:21].copy().view("<f8").ravel()
    return xs, ys


def polygon_rings(buf: bytes) -> list[np.ndarray]:
    """All rings of a Polygon/MultiPolygon WKB as a flat list of (N,2) arrays,
    exterior-first per part."""
    name, payload = parse_wkb(buf)
    if name == "Polygon":
        return payload
    if name == "MultiPolygon":
        out = []
        for _, rings in payload:
            out.extend(rings)
        return out
    raise ValueError(f"not a polygon: {name}")
