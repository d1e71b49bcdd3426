"""Mapbox Vector Tile reader/writer (``ogr/ogrsf_frmts/mvt/``; public
spec https://github.com/mapbox/vector-tile-spec 2.1 — protobuf wire
format hand-rolled, no protobuf package in the container).

Schema (vector_tile.proto):

- Tile: layers=3 (repeated message)
- Layer: version=15, name=1, features=2 (repeated), keys=3, values=4,
  extent=5 (default 4096)
- Feature: id=1, tags=2 (packed uint32 key/value index pairs),
  type=3 (1 POINT, 2 LINESTRING, 3 POLYGON), geometry=4 (packed uint32)
- Value: one-of string=1, float=2, double=3, int=4, uint=5, sint=6
  (zigzag), bool=7

Geometry commands: ``(id & 7) | (count << 3)`` with MoveTo=1, LineTo=2,
ClosePath=7; parameters are zigzag varint deltas in integer tile
coordinates. Polygon ring role follows the spec's winding rule: in the
y-down tile frame an exterior ring has positive signed area (shoelace
with screen coords), interior rings negative — each exterior starts a
new polygon.

A tileset directory (``{z}/{x}/{y}.pbf``) reads DISTRIBUTED: the driver
lists tile paths; executors decode disjoint tile subsets (mapInPandas),
exactly the shape a 100 TB tile pyramid needs.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# protobuf primitives
# ---------------------------------------------------------------------------


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _zigzag_dec(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _zigzag_enc(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _enc_uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_field(fid: int, wire: int) -> bytes:
    return _enc_uvarint((fid << 3) | wire)


def _enc_len(fid: int, payload: bytes) -> bytes:
    return _enc_field(fid, 2) + _enc_uvarint(len(payload)) + payload


def _fields(buf: bytes):
    """Iterate (field_id, wire_type, value) over one message."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _uvarint(buf, pos)
        fid, wire = key >> 3, key & 0x7
        if wire == 0:
            v, pos = _uvarint(buf, pos)
        elif wire == 1:
            v = buf[pos : pos + 8]
            pos += 8
        elif wire == 2:
            ln, pos = _uvarint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            v = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wire}")
        yield fid, wire, v


def _packed_u32(buf: bytes) -> list[int]:
    out = []
    pos = 0
    while pos < len(buf):
        v, pos = _uvarint(buf, pos)
        out.append(v)
    return out


# ---------------------------------------------------------------------------
# geometry command stream <-> parsed geometry
# ---------------------------------------------------------------------------


def decode_geometry(gtype: int, cmds: list[int]):
    """Command stream → parsed geometry tuple (integer tile coords)."""
    pos = 0
    x = y = 0
    parts: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] | None = None
    while pos < len(cmds):
        cmd = cmds[pos]
        pos += 1
        cid, count = cmd & 0x7, cmd >> 3
        if cid == 1:  # MoveTo
            for _ in range(count):
                x += _zigzag_dec(cmds[pos])
                y += _zigzag_dec(cmds[pos + 1])
                pos += 2
                cur = [(x, y)]
                parts.append(cur)
        elif cid == 2:  # LineTo
            for _ in range(count):
                x += _zigzag_dec(cmds[pos])
                y += _zigzag_dec(cmds[pos + 1])
                pos += 2
                cur.append((x, y))
        elif cid == 7:  # ClosePath
            cur.append(cur[0])
        else:
            raise ValueError(f"unknown geometry command {cid}")
    if gtype == 1:
        pts = [("Point", (float(px), float(py))) for part in parts for px, py in part]
        return pts[0] if len(pts) == 1 else ("MultiPoint", pts)
    if gtype == 2:
        lines = [("LineString", np.asarray(p, dtype=float)) for p in parts]
        return lines[0] if len(lines) == 1 else ("MultiLineString", lines)
    if gtype == 3:
        polys: list[list[np.ndarray]] = []
        for p in parts:
            r = np.asarray(p, dtype=float)
            # y-down shoelace: positive → exterior (spec 4.3.3.3)
            area2 = float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))
            if area2 > 0 or not polys:
                polys.append([r])
            else:
                polys[-1].append(r)
        if len(polys) == 1:
            return ("Polygon", polys[0])
        return ("MultiPolygon", [("Polygon", rr) for rr in polys])
    raise ValueError(f"unsupported MVT geometry type {gtype}")


def encode_geometry(geom) -> tuple[int, list[int]]:
    """Parsed geometry tuple (integer coords) → (type, command stream)."""
    name, payload = geom

    def enc_parts(parts, close: bool) -> list[int]:
        cmds: list[int] = []
        x = y = 0
        for part in parts:
            pts = [(int(round(px)), int(round(py))) for px, py in np.asarray(part)]
            if close and len(pts) > 1 and pts[0] == pts[-1]:
                pts = pts[:-1]
            cmds.append((1) | (1 << 3))  # MoveTo 1
            cmds.append(_zigzag_enc(pts[0][0] - x))
            cmds.append(_zigzag_enc(pts[0][1] - y))
            x, y = pts[0]
            rest = pts[1:]
            if rest:
                cmds.append((2) | (len(rest) << 3))
                for px, py in rest:
                    cmds.append(_zigzag_enc(px - x))
                    cmds.append(_zigzag_enc(py - y))
                    x, y = px, py
            if close:
                cmds.append(7 | (1 << 3))
        return cmds

    if name == "Point":
        px, py = int(round(payload[0])), int(round(payload[1]))
        return 1, [1 | (1 << 3), _zigzag_enc(px), _zigzag_enc(py)]
    if name == "MultiPoint":
        cmds = [1 | (len(payload) << 3)]
        x = y = 0
        for _, (px, py) in payload:
            px, py = int(round(px)), int(round(py))
            cmds.append(_zigzag_enc(px - x))
            cmds.append(_zigzag_enc(py - y))
            x, y = px, py
        return 1, cmds
    if name == "LineString":
        return 2, enc_parts([payload], close=False)
    if name == "MultiLineString":
        return 2, enc_parts([c for _, c in payload], close=False)
    if name == "Polygon":
        return 3, enc_parts(payload, close=True)
    if name == "MultiPolygon":
        rings = [r for _, rr in payload for r in rr]
        return 3, enc_parts(rings, close=True)
    raise ValueError(f"unsupported geometry {name}")


# ---------------------------------------------------------------------------
# Value encoding
# ---------------------------------------------------------------------------


def _decode_value(buf: bytes):
    for fid, wire, v in _fields(buf):
        if fid == 1:
            return v.decode("utf-8")
        if fid == 2:
            return struct.unpack("<f", v)[0]
        if fid == 3:
            return struct.unpack("<d", v)[0]
        if fid == 4:  # int64 varint (two's complement)
            return v - (1 << 64) if v >> 63 else v
        if fid == 5:
            return v
        if fid == 6:
            return _zigzag_dec(v)
        if fid == 7:
            return bool(v)
    return None


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _enc_field(7, 0) + _enc_uvarint(int(v))
    if isinstance(v, str):
        b = v.encode("utf-8")
        return _enc_len(1, b)
    if isinstance(v, (int, np.integer)):
        return _enc_field(6, 0) + _enc_uvarint(_zigzag_enc(int(v)))
    if isinstance(v, (float, np.floating)):
        return _enc_field(3, 1) + struct.pack("<d", float(v))
    raise ValueError(f"unsupported value type {type(v)}")


# ---------------------------------------------------------------------------
# tile decode / encode
# ---------------------------------------------------------------------------


def decode_tile(buf: bytes) -> list[dict]:
    """One .pbf tile → list of layer dicts
    ``{name, extent, version, features:[(fid, geom, props)]}``."""
    layers = []
    for fid_, wire, v in _fields(buf):
        if fid_ != 3:
            continue
        name = ""
        extent = 4096
        version = 1
        keys: list[str] = []
        values: list = []
        feats_raw: list[bytes] = []
        for f2, w2, v2 in _fields(v):
            if f2 == 1:
                name = v2.decode("utf-8")
            elif f2 == 15:
                version = v2
            elif f2 == 5:
                extent = v2
            elif f2 == 3:
                keys.append(v2.decode("utf-8"))
            elif f2 == 4:
                values.append(_decode_value(v2))
            elif f2 == 2:
                feats_raw.append(v2)
        feats = []
        for fb in feats_raw:
            fid = None
            gtype = 0
            tags: list[int] = []
            cmds: list[int] = []
            for f3, w3, v3 in _fields(fb):
                if f3 == 1:
                    fid = v3
                elif f3 == 3:
                    gtype = v3
                elif f3 == 2:
                    tags = _packed_u32(v3)
                elif f3 == 4:
                    cmds = _packed_u32(v3)
            props = {keys[tags[i]]: values[tags[i + 1]] for i in range(0, len(tags), 2)}
            feats.append((fid, decode_geometry(gtype, cmds), props))
        layers.append({"name": name, "extent": extent, "version": version,
                       "features": feats})
    return layers


def encode_tile(layers: list[dict]) -> bytes:
    """Inverse of decode_tile (integer-coordinate geometries)."""
    out = b""
    for layer in layers:
        keys: list[str] = []
        values: list = []
        kidx: dict = {}
        vidx: dict = {}
        body = b""
        body += _enc_len(1, layer["name"].encode("utf-8"))
        feat_bufs = []
        for fid, geom, props in layer["features"]:
            gtype, cmds = encode_geometry(geom)
            fb = b""
            if fid is not None:
                fb += _enc_field(1, 0) + _enc_uvarint(int(fid))
            tags = []
            for k, v in props.items():
                if v is None:
                    continue
                if k not in kidx:
                    kidx[k] = len(keys)
                    keys.append(k)
                vk = (type(v).__name__, v)
                if vk not in vidx:
                    vidx[vk] = len(values)
                    values.append(v)
                tags += [kidx[k], vidx[vk]]
            if tags:
                fb += _enc_len(2, b"".join(_enc_uvarint(t) for t in tags))
            fb += _enc_field(3, 0) + _enc_uvarint(gtype)
            fb += _enc_len(4, b"".join(_enc_uvarint(c) for c in cmds))
            feat_bufs.append(fb)
        for fb in feat_bufs:
            body += _enc_len(2, fb)
        for k in keys:
            body += _enc_len(3, k.encode("utf-8"))
        for v in values:
            body += _enc_len(4, _encode_value(v))
        body += _enc_field(5, 0) + _enc_uvarint(int(layer.get("extent", 4096)))
        body += _enc_field(15, 0) + _enc_uvarint(int(layer.get("version", 2)))
        out += _enc_len(3, body)
    return out


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def write_mvt_tile(path: str, layers: list[dict]) -> None:
    with open(path, "wb") as f:
        f.write(encode_tile(layers))


def read_mvt(
    spark: SparkSession, paths, layer: str | None = None, geom_col: str = "geometry"
) -> DataFrame:
    """Distributed MVT read: ``paths`` is a list of .pbf tile paths (a
    tileset directory's files); executors decode disjoint subsets.
    Output: (tile_path, layer, fid, props json-ish map, geometry WKB in
    integer tile coords)."""
    from gdal_spark.geometry import wkt as _wkt

    if isinstance(paths, str):
        paths = [paths]
    pdf = spark.createDataFrame([(p,) for p in paths], "path STRING").repartition(
        min(len(paths), spark.sparkContext.defaultParallelism)
    )

    def scan(iterator):
        for chunk in iterator:
            rows = []
            for p in chunk["path"]:
                with open(p, "rb") as f:
                    for lyr in decode_tile(f.read()):
                        if layer is not None and lyr["name"] != layer:
                            continue
                        for fid, geom, props in lyr["features"]:
                            rows.append((
                                p, lyr["name"],
                                None if fid is None else int(fid),
                                {k: None if v is None else str(v)
                                 for k, v in props.items()},
                                _wkt.geom_to_wkb(*geom),
                            ))
            yield pd.DataFrame(
                rows, columns=["tile_path", "layer", "fid", "props", geom_col]
            )

    return pdf.mapInPandas(
        scan,
        f"tile_path STRING, layer STRING, fid LONG, "
        f"props MAP<STRING,STRING>, {geom_col} BINARY",
    )


def write_mvt_tileset(
    df: DataFrame,
    out_dir: str,
    zoom: int,
    layer: str = "layer",
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str | None = None,
    prop_cols: tuple = (),
    extent: int = 4096,
) -> DataFrame:
    """Distributed MVT tileset SINK (the reference's ``ogr2ogr -f MVT``
    directory layout, ogr/ogrsf_frmts/mvt/ writer side): POINT features
    are tile-assigned with the exact GetTileIndices math
    (tiling.tile_indices_np), grouped per tile, and each ``{z}/{x}/{y}
    .pbf`` is encoded and written ON THE EXECUTOR that owns the group —
    one shuffle on the tile key, zero driver collect, which is the
    shape a planet-scale tile build needs. Line/polygon tiling (clip +
    cell cover) is not in this v1 — point layers only.

    Returns the written-tile summary (z, x, y, n_features, path)."""
    import os as _os

    from gdal_spark import tiling
    from gdal_spark.operators.spatial_join import assign_tiles

    sel = [lon_col, lat_col, *prop_cols]
    if id_col is not None:
        sel.append(id_col)
    tiled = assign_tiles(df.select(*sel), zoom, lon_col=lon_col, lat_col=lat_col)

    def emit(key, pdf):
        tx, ty = int(key[0]), int(key[1])
        n = 1 << zoom
        span = tiling.WORLD_SPAN / n
        x0 = -tiling.ORIGIN + tx * span
        y0 = tiling.ORIGIN - ty * span
        mx, my = tiling.lonlat_to_mercator_np(
            pdf[lon_col].to_numpy(), pdf[lat_col].to_numpy()
        )
        px = np.round((mx - x0) / span * extent).astype(np.int64)
        py = np.round((y0 - my) / span * extent).astype(np.int64)
        feats = []
        for i in range(len(pdf)):
            props = {c: pdf[c].iloc[i] for c in prop_cols}
            props = {
                k: (v.item() if hasattr(v, "item") else v)
                for k, v in props.items()
                if v is not None
            }
            fid = int(pdf[id_col].iloc[i]) if id_col is not None else None
            feats.append((fid, ("Point", (float(px[i]), float(py[i]))), props))
        d = _os.path.join(out_dir, str(zoom), str(tx))
        _os.makedirs(d, exist_ok=True)
        path = _os.path.join(d, f"{ty}.pbf")
        write_mvt_tile(path, [{
            "name": layer, "extent": extent, "version": 2, "features": feats,
        }])
        return pd.DataFrame(
            [(zoom, tx, ty, len(feats), path)],
            columns=["z", "x", "y", "n_features", "path"],
        )

    return tiled.groupBy("tile_x", "tile_y").applyInPandas(
        emit, "z INT, x LONG, y LONG, n_features LONG, path STRING"
    )
