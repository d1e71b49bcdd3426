"""Minimal ESRI Shapefile reader (.shp + .dbf) → DataFrame with a WKB
geometry column — enough to run the reference's own .shp-based test
fixtures (e.g. autotest/ogr/data/poly.shp) directly instead of
re-synthesizing them.

Format parsed from the public ESRI Shapefile Technical Description
(July 1998 whitepaper) and the dBase III .dbf layout; the reference's
driver lives at ogr/ogrsf_frmts/shape/ (shapefil.h, shpopen.c — not
consulted for code, only for the same public spec).

Supported shape types: 0 Null, 1 Point, 3 PolyLine, 5 Polygon,
8 MultiPoint, and their Z/M variants (Z/M values dropped — 2D engine).
Ring grouping follows the spec: clockwise rings are exteriors,
counter-clockwise rings are holes of the containing exterior.

Scale note: .shp files are not splittable (variable-length records, no
sync markers), so parsing is driver-side and intended for fixture-scale
files; at pipeline scale, convert once to parquet
(``read_shapefile(...).write.parquet``) and let every later scan be
columnar + distributed — the same one-time ingest any Spark pipeline
does for legacy formats.
"""

from __future__ import annotations

import struct
from datetime import date

import numpy as np

from gdal_spark.geometry import wkb as _wkb


def _read_shp(path: str):
    """Yields (record_number, shape_type, geometry-or-None as
    (name, payload) parsed-geometry)."""
    with open(path, "rb") as f:
        buf = f.read()
    (code,) = struct.unpack(">i", buf[0:4])
    if code != 9994:
        raise ValueError(f"{path}: not a shapefile (file code {code})")
    (flen_words,) = struct.unpack(">i", buf[24:28])
    end = flen_words * 2
    pos = 100
    out = []
    while pos < end:
        recno, clen = struct.unpack(">ii", buf[pos : pos + 8])
        content = buf[pos + 8 : pos + 8 + clen * 2]
        pos += 8 + clen * 2
        (stype,) = struct.unpack("<i", content[0:4])
        out.append((recno, stype, _parse_shape(stype, content)))
    return out


def _parse_shape(stype: int, c: bytes):
    base = stype % 10 if stype in (11, 13, 15, 18, 21, 23, 25, 28) else stype
    if stype == 0:
        return None
    if base == 1:  # Point
        x, y = struct.unpack("<dd", c[4:20])
        return ("Point", (x, y))
    if base == 8:  # MultiPoint
        (n,) = struct.unpack("<i", c[36:40])
        pts = np.frombuffer(c[40 : 40 + 16 * n], dtype="<f8").reshape(n, 2)
        return ("MultiPoint", [("Point", tuple(p)) for p in pts])
    if base in (3, 5):  # PolyLine / Polygon
        nparts, npts = struct.unpack("<ii", c[36:44])
        parts = np.frombuffer(c[44 : 44 + 4 * nparts], dtype="<i4")
        off = 44 + 4 * nparts
        pts = np.frombuffer(c[off : off + 16 * npts], dtype="<f8").reshape(npts, 2)
        bounds = list(parts) + [npts]
        rings = [
            pts[bounds[i] : bounds[i + 1]].astype(np.float64)
            for i in range(nparts)
            if bounds[i + 1] > bounds[i]
        ]
        if base == 3:
            if len(rings) == 1:
                return ("LineString", rings[0])
            return ("MultiLineString", [("LineString", r) for r in rings])
        return _group_rings(rings)
    raise NotImplementedError(f"shapefile shape type {stype}")


def _ring_signed_area(r: np.ndarray) -> float:
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _group_rings(rings):
    """Spec: CW (negative shoelace) rings are exterior; CCW rings are
    holes of the exterior whose bbox contains them (first match by
    area-descending order — sufficient for non-nested fixtures)."""
    ext = [(i, r) for i, r in enumerate(rings) if _ring_signed_area(r) <= 0]
    holes = [(i, r) for i, r in enumerate(rings) if _ring_signed_area(r) > 0]
    if not ext:  # degenerate: treat all as exteriors
        ext, holes = holes, []
    polys = [[r] for _, r in ext]
    for _, h in holes:
        hx, hy = h[0]
        placed = False
        for k, (_, er) in enumerate(ext):
            if (
                er[:, 0].min() <= hx <= er[:, 0].max()
                and er[:, 1].min() <= hy <= er[:, 1].max()
            ):
                polys[k].append(h)
                placed = True
                break
        if not placed:
            polys.append([h])
    if len(polys) == 1:
        return ("Polygon", polys[0])
    return ("MultiPolygon", [("Polygon", p) for p in polys])


def _read_dbf(path: str):
    """(field_defs, records) — dBase III fixed-width layout."""
    with open(path, "rb") as f:
        buf = f.read()
    nrec, hsize, rsize = struct.unpack("<iHH", buf[4:12])
    fields = []
    pos = 32
    while buf[pos] != 0x0D:
        name = buf[pos : pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fdec = buf[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    recs = []
    pos = hsize
    for _ in range(nrec):
        rec = buf[pos : pos + rsize]
        pos += rsize
        if rec[0:1] == b"*":  # deleted
            recs.append(None)
            continue
        vals = []
        off = 1
        for name, ftype, flen, fdec in fields:
            raw = rec[off : off + flen].decode("ascii", "replace").strip()
            off += flen
            if raw == "":
                vals.append(None)
            elif ftype == "N" or ftype == "F":
                # same rule as the output schema (fdec==0 → LONG): a
                # stray "12.0" in an integer-declared field must still
                # parse to int or createDataFrame rejects the row
                vals.append(int(float(raw)) if fdec == 0 else float(raw))
            elif ftype == "L":
                vals.append(raw in "YyTt")
            elif ftype == "D" and len(raw) == 8:
                vals.append(date(int(raw[:4]), int(raw[4:6]), int(raw[6:8])))
            else:
                vals.append(raw)
        recs.append(vals)
    return fields, recs


def read_shapefile(spark, shp_path: str):
    """.shp(+.dbf) → DataFrame(fid LONG, <dbf fields>, geometry BINARY)."""
    from gdal_spark.geometry import wkt as _wkt

    shapes = _read_shp(shp_path)
    dbf_path = shp_path[:-4] + ".dbf"
    try:
        fields, recs = _read_dbf(dbf_path)
    except FileNotFoundError:
        fields, recs = [], [[] for _ in shapes]
    rows = []
    for (recno, stype, geom), attrs in zip(shapes, recs):
        if attrs is None:
            continue
        g = None if geom is None else bytearray(_wkt.geom_to_wkb(*geom))
        rows.append(tuple([recno - 1] + list(attrs) + [g]))
    type_map = {"N": "DOUBLE", "F": "DOUBLE", "C": "STRING", "L": "BOOLEAN", "D": "DATE"}
    cols = ["fid LONG"]
    for name, ftype, flen, fdec in fields:
        if ftype in ("N", "F") and fdec == 0:
            cols.append(f"{name} LONG")
        else:
            cols.append(f"{name} {type_map.get(ftype, 'STRING')}")
    cols.append("geometry BINARY")
    return spark.createDataFrame(rows, ", ".join(cols))
