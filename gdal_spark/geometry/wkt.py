"""WKT ⇄ geometry (type_name, payload) codec matching the parse_wkb shapes.

Emission format mirrors OGR's ``exportToWkt`` ISO style: upper-case type
names, coordinates space-separated, rings/parts comma-separated. Numbers
are printed with %.15g then trailing-zero trimmed the way OGR's
OGRFormatDouble does for typical doubles.
"""

from __future__ import annotations

import re

import numpy as np


def _num(v: float) -> str:
    s = f"{v:.15g}"
    return s


def _coords_txt(arr) -> str:
    return ",".join(f"{_num(p[0])} {_num(p[1])}" for p in np.asarray(arr, dtype=float))


def geom_to_wkt(name: str, payload) -> str:
    if name == "Point":
        x, y = payload
        return f"POINT ({_num(x)} {_num(y)})"
    if name == "LineString":
        if len(payload) == 0:
            return "LINESTRING EMPTY"
        return f"LINESTRING ({_coords_txt(payload)})"
    if name == "Polygon":
        if not payload:
            return "POLYGON EMPTY"
        rings = ",".join(f"({_coords_txt(r)})" for r in payload)
        return f"POLYGON ({rings})"
    if name == "MultiPoint":
        pts = ",".join(f"({_num(c[0])} {_num(c[1])})" for _, c in payload)
        return f"MULTIPOINT ({pts})"
    if name == "MultiLineString":
        ls = ",".join(f"({_coords_txt(c)})" for _, c in payload)
        return f"MULTILINESTRING ({ls})"
    if name == "MultiPolygon":
        ps = ",".join(
            "(" + ",".join(f"({_coords_txt(r)})" for r in rings) + ")" for _, rings in payload
        )
        return f"MULTIPOLYGON ({ps})"
    if name == "GeometryCollection":
        gs = ",".join(geom_to_wkt(n, p) for n, p in payload)
        return f"GEOMETRYCOLLECTION ({gs})"
    raise ValueError(f"cannot emit WKT for {name}")


_TOKEN = re.compile(r"\s*([A-Za-z]+|\(|\)|,|[-+0-9.eE]+)")


class _P:
    def __init__(self, s: str):
        self.toks = _TOKEN.findall(s)
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self, expect=None):
        t = self.toks[self.i]
        self.i += 1
        if expect is not None and t != expect:
            raise ValueError(f"WKT parse: expected {expect!r}, got {t!r}")
        return t

    def coords(self):
        out = []
        self.take("(")
        while True:
            x = float(self.take())
            y = float(self.take())
            # tolerate Z values
            if self.peek() not in (",", ")"):
                self.take()
            out.append((x, y))
            if self.take() == ")":
                break
        return np.asarray(out, dtype=np.float64)

    def geom(self):
        name = self.take().upper()
        if self.peek() and self.peek().upper() in ("Z", "M", "ZM"):
            self.take()
        if self.peek() and self.peek().upper() == "EMPTY":
            self.take()
            return {
                "POINT": ("Point", (float("nan"), float("nan"))),
                "LINESTRING": ("LineString", np.zeros((0, 2))),
                "POLYGON": ("Polygon", []),
                "MULTIPOINT": ("MultiPoint", []),
                "MULTILINESTRING": ("MultiLineString", []),
                "MULTIPOLYGON": ("MultiPolygon", []),
                "GEOMETRYCOLLECTION": ("GeometryCollection", []),
            }[name]
        if name == "POINT":
            c = self.coords()
            return ("Point", (float(c[0, 0]), float(c[0, 1])))
        if name == "LINESTRING":
            return ("LineString", self.coords())
        if name == "POLYGON":
            return ("Polygon", self._ring_list())
        if name == "MULTIPOINT":
            self.take("(")
            pts = []
            while True:
                if self.peek() == "(":
                    c = self.coords()
                    pts.append(("Point", (float(c[0, 0]), float(c[0, 1]))))
                else:
                    x, y = float(self.take()), float(self.take())
                    pts.append(("Point", (x, y)))
                if self.take() == ")":
                    break
            return ("MultiPoint", pts)
        if name == "MULTILINESTRING":
            self.take("(")
            ls = []
            while True:
                ls.append(("LineString", self.coords()))
                if self.take() == ")":
                    break
            return ("MultiLineString", ls)
        if name == "MULTIPOLYGON":
            self.take("(")
            ps = []
            while True:
                ps.append(("Polygon", self._ring_list()))
                if self.take() == ")":
                    break
            return ("MultiPolygon", ps)
        if name == "GEOMETRYCOLLECTION":
            self.take("(")
            gs = []
            while True:
                gs.append(self.geom())
                if self.take() == ")":
                    break
            return ("GeometryCollection", gs)
        # curved types — linearized on ingest (OGR_G_GetLinearGeometry
        # semantics, same 4° arc step as the WKB path)
        if name == "CIRCULARSTRING":
            from gdal_spark.geometry.wkb import linearize_circularstring

            return ("LineString", linearize_circularstring(self.coords()))
        if name == "COMPOUNDCURVE":
            from gdal_spark.geometry.wkb import _join_curve_parts

            self.take("(")
            parts = []
            while True:
                if self.peek() == "(":  # bare coords = LineString segment
                    parts.append(self.coords())
                else:
                    parts.append(np.asarray(self.geom()[1]))
                if self.take() == ")":
                    break
            return ("LineString", _join_curve_parts(parts))
        if name == "CURVEPOLYGON":
            self.take("(")
            rings = []
            while True:
                if self.peek() == "(":
                    rings.append(self.coords())
                else:
                    rings.append(np.asarray(self.geom()[1]))
                if self.take() == ")":
                    break
            return ("Polygon", rings)
        if name == "MULTICURVE":
            self.take("(")
            ls = []
            while True:
                if self.peek() == "(":
                    ls.append(("LineString", self.coords()))
                else:
                    ls.append(self.geom())
                if self.take() == ")":
                    break
            return ("MultiLineString", ls)
        if name == "MULTISURFACE":
            self.take("(")
            ps = []
            while True:
                if self.peek() == "(":
                    ps.append(("Polygon", self._ring_list()))
                else:
                    ps.append(self.geom())
                if self.take() == ")":
                    break
            return ("MultiPolygon", ps)
        raise ValueError(f"unknown WKT type {name}")

    def _ring_list(self):
        self.take("(")
        rings = []
        while True:
            rings.append(self.coords())
            if self.take() == ")":
                break
        return rings


def parse_wkt(s: str):
    return _P(s).geom()


def wkt_to_wkb(s: str) -> bytes:
    from gdal_spark.geometry import wkb as W

    name, payload = parse_wkt(s)
    return geom_to_wkb(name, payload)


def geom_to_wkb(name: str, payload) -> bytes:
    import struct

    from gdal_spark.geometry import wkb as W

    if name == "Point":
        return W.point_wkb(payload[0], payload[1])
    if name == "LineString":
        return W.linestring_wkb(payload)
    if name == "Polygon":
        if not payload:
            return struct.pack("<BII", 1, W.WKB_POLYGON, 0)
        return W.polygon_wkb(payload[0], payload[1:])
    type_ids = {
        "MultiPoint": W.WKB_MULTIPOINT,
        "MultiLineString": W.WKB_MULTILINESTRING,
        "MultiPolygon": W.WKB_MULTIPOLYGON,
        "GeometryCollection": W.WKB_GEOMETRYCOLLECTION,
    }
    if name in type_ids:
        parts = [geom_to_wkb(n, p) for n, p in payload]
        return struct.pack("<BII", 1, type_ids[name], len(parts)) + b"".join(parts)
    raise ValueError(f"cannot emit WKB for {name}")


def wkb_to_wkt(buf: bytes) -> str:
    from gdal_spark.geometry import wkb as W

    return geom_to_wkt(*W.parse_wkb(bytes(buf)))
