"""Mapbox Vector Tile codec (sources/mvt.py): protobuf roundtrip,
winding-rule ring assembly, distributed tileset read."""

import numpy as np

from gdal_spark.geometry import wkt as _wkt
from gdal_spark.sources.mvt import (
    decode_geometry,
    decode_tile,
    encode_geometry,
    encode_tile,
    read_mvt,
    write_mvt_tile,
)

EXT = np.array([(0, 0), (40, 0), (40, 40), (0, 40), (0, 0)], float)
HOLE = np.array([(10, 10), (10, 30), (30, 30), (30, 10), (10, 10)], float)


def test_geometry_command_roundtrip():
    poly = ("Polygon", [EXT, HOLE])
    g, cmds = encode_geometry(poly)
    assert g == 3
    back = decode_geometry(g, cmds)
    assert back[0] == "Polygon" and len(back[1]) == 2
    assert all(np.array_equal(a, b) for a, b in zip(poly[1], back[1]))
    line = ("LineString", np.array([(2, 2), (2, 10), (10, 10)], float))
    g2, c2 = encode_geometry(line)
    assert np.array_equal(decode_geometry(g2, c2)[1], line[1])
    pt = ("Point", (100.0, 200.0))
    g3, c3 = encode_geometry(pt)
    assert decode_geometry(g3, c3) == pt


def test_winding_splits_multipolygon():
    # two exteriors (positive y-down shoelace) → MultiPolygon
    ext2 = EXT + 100.0
    g, cmds = encode_geometry(("MultiPolygon", [("Polygon", [EXT]), ("Polygon", [ext2])]))
    back = decode_geometry(g, cmds)
    assert back[0] == "MultiPolygon" and len(back[1]) == 2


def test_tile_roundtrip_values():
    layers = [{
        "name": "t", "extent": 4096, "version": 2,
        "features": [
            (1, ("Polygon", [EXT, HOLE]),
             {"kind": "park", "rank": 3, "score": 2.5, "flag": True}),
            (2, ("LineString", np.array([(2, 2), (9, 2)], float)), {"kind": "road"}),
            (7, ("Point", (5.0, 6.0)), {}),
        ],
    }]
    out = decode_tile(encode_tile(layers))
    assert out[0]["name"] == "t" and out[0]["extent"] == 4096
    f0, f1, f2 = out[0]["features"]
    assert f0[0] == 1 and f0[2] == {"kind": "park", "rank": 3, "score": 2.5,
                                    "flag": True}
    assert f1[2] == {"kind": "road"}
    assert f2[1] == ("Point", (5.0, 6.0))


def test_read_mvt_distributed(spark, tmp_path):
    for i in range(3):
        write_mvt_tile(str(tmp_path / f"t{i}.pbf"), [{
            "name": "roads", "extent": 4096, "version": 2,
            "features": [
                (i * 10 + 1, ("Polygon", [EXT + i]), {"rank": i}),
                (i * 10 + 2, ("LineString", np.array([(0, i), (5, i)], float)), {}),
            ],
        }])
    df = read_mvt(spark, [str(tmp_path / f"t{i}.pbf") for i in range(3)])
    rows = sorted(df.collect(), key=lambda r: r.fid)
    assert len(rows) == 6
    assert rows[0].layer == "roads" and rows[0].props["rank"] == "0"
    assert _wkt.wkb_to_wkt(bytes(rows[0].geometry)).startswith("POLYGON")
    assert _wkt.wkb_to_wkt(bytes(rows[1].geometry)).startswith("LINESTRING")


def test_write_mvt_tileset_roundtrip(spark, tmp_path):
    """Distributed tileset sink: executor-side {z}/{x}/{y}.pbf writes,
    read back and re-aggregated must reproduce the tile assignment."""
    from pyspark.sql import functions as F

    from gdal_spark.sources.mvt import write_mvt_tileset

    df = spark.range(500).select(
        F.col("id"),
        (((F.col("id") * 7919) % 360000) / 1000.0 - 180.0).alias("lon"),
        (((F.col("id") * 4409) % 168000) / 1000.0 - 84.0).alias("lat"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
    )
    out = write_mvt_tileset(
        df, str(tmp_path), zoom=4, layer="pts", id_col="id",
        prop_cols=("name",),
    ).collect()
    assert sum(r.n_features for r in out) == 500
    assert all(r.path.endswith(f"{r.y}.pbf") for r in out)
    back = read_mvt(spark, [r.path for r in out])
    assert back.count() == 500
    row = back.filter("fid = 123").collect()[0]
    assert row.layer == "pts" and row.props["name"] == "n123"
    # tile-local integer coords stay within the extent + rounding slack
    from gdal_spark.geometry import wkb as W
    name, (px, py) = W.parse_wkb(bytes(row.geometry))
    assert name == "Point" and -1 <= px <= 4097 and -1 <= py <= 4097
