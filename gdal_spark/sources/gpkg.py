"""GeoPackage vector reader (.gpkg) → DataFrame with a WKB geometry
column — runs the reference's own .gpkg fixtures (e.g.
autotest/ogr/data/gpkg/poly_golden.gpkg) directly.

Format parsed from the public OGC GeoPackage Encoding Standard
(https://www.geopackage.org/spec/ — GeoPackageBinaryHeader §2.1.3 + the
SQLite container tables gpkg_contents / gpkg_geometry_columns); the
reference's driver lives at ogr/ogrsf_frmts/gpkg/ (not consulted for
code, only the same public spec). SQLite access is the Python stdlib
``sqlite3`` module — no native dependency.

Geometry blobs: 'GP' magic, version, flags byte (bit0 header byte
order, bits1-3 envelope size, bit4 empty-geometry), int32 srs_id, the
declared envelope, then standard ISO WKB (2D parsed; Z/M linearized
away like the shapefile reader).

Scale note: like the .shp reader this is driver-side ingest-only —
SQLite files are not splittable. At pipeline scale, convert once to
parquet (``read_gpkg(...).write.parquet``) and let every later scan be
columnar + distributed.
"""

from __future__ import annotations

import sqlite3
import struct

_ENVELOPE_BYTES = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}


def _connect_ro(path: str) -> sqlite3.Connection:
    return sqlite3.connect(f"file:{path}?mode=ro", uri=True)


def gpkg_layers(path: str) -> list[str]:
    """Feature layer names (gpkg_contents data_type='features')."""
    con = _connect_ro(path)
    try:
        return [
            r[0]
            for r in con.execute(
                "SELECT table_name FROM gpkg_contents "
                "WHERE data_type = 'features' ORDER BY table_name"
            )
        ]
    finally:
        con.close()


def parse_gpkg_blob(blob: bytes | None) -> bytes | None:
    """GeoPackageBinaryHeader (spec §2.1.3) → the embedded standard WKB
    bytes, or None for NULL / empty-flagged geometries."""
    if blob is None:
        return None
    if len(blob) < 8 or blob[0:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob")
    flags = blob[3]
    if flags & 0x20:
        raise ValueError("extended (non-standard) GeoPackage geometry")
    env = _ENVELOPE_BYTES.get((flags >> 1) & 0x07)
    if env is None:
        raise ValueError(f"invalid envelope indicator in flags {flags:#x}")
    if flags & 0x10:  # empty-geometry flag
        return None
    return blob[8 + env :]


def _spark_type(decl: str) -> str:
    d = decl.upper()
    if d.startswith("BOOL"):
        return "boolean"
    if any(d.startswith(p) for p in ("INT", "MEDIUMINT", "TINYINT", "SMALLINT", "BIGINT")):
        return "bigint"
    if any(d.startswith(p) for p in ("REAL", "DOUBLE", "FLOAT")):
        return "double"
    if d.startswith("BLOB") or d == "":
        return "binary"
    return "string"  # TEXT(n), DATE, DATETIME travel as strings


def read_gpkg(spark, path: str, layer: str | None = None, geom_col: str = "geometry"):
    """Read one feature layer of a GeoPackage into a DataFrame.

    Columns: the layer's attribute columns (SQLite declared types mapped
    INTEGER→bigint, REAL→double, TEXT/DATE→string, BLOB→binary) plus
    ``geom_col`` holding standard WKB. ``layer=None`` picks the single
    feature layer, erroring if the package has several."""
    layers = gpkg_layers(path)
    if layer is None:
        if len(layers) != 1:
            raise ValueError(f"{path}: specify layer= (found {layers})")
        layer = layers[0]
    elif layer not in layers:
        raise ValueError(f"{path}: no feature layer {layer!r} (found {layers})")

    con = _connect_ro(path)
    try:
        g = con.execute(
            "SELECT column_name, srs_id FROM gpkg_geometry_columns "
            "WHERE table_name = ?",
            (layer,),
        ).fetchone()
        gcol, srs_id = (g[0], int(g[1])) if g else (None, 0)
        info = con.execute(f'PRAGMA table_info("{layer}")').fetchall()
        names = [r[1] for r in info]
        decls = {r[1]: (r[2] or "") for r in info}
        sel = ", ".join(f'"{n}"' for n in names)
        raw = con.execute(f'SELECT {sel} FROM "{layer}"').fetchall()
    finally:
        con.close()

    fields = []
    rows = []
    for n in names:
        if n == gcol:
            fields.append(f"`{geom_col}` binary")
        else:
            fields.append(f"`{n}` {_spark_type(decls[n])}")
    gi = names.index(gcol) if gcol in names else -1
    for r in raw:
        vals = list(r)
        if gi >= 0:
            w = parse_gpkg_blob(vals[gi])
            vals[gi] = bytearray(w) if w is not None else None
        for i, n in enumerate(names):
            if i != gi and isinstance(vals[i], bytes):
                vals[i] = bytearray(vals[i])
        rows.append(tuple(vals))
    df = spark.createDataFrame(rows, ", ".join(fields))
    df._gpkg_srs_id = srs_id  # informational; SRS carried at column level
    return df
