"""OSM PBF codec (sources/osm.py): blob framing, DenseNodes delta
coding, stringtable tags, distributed read, way assembly."""

import zlib

from gdal_spark.geometry import wkt as _wkt
from gdal_spark.sources.osm import (
    osm_ways_to_lines,
    read_osm_pbf,
    scan_blob_index,
    write_osm_pbf,
)


def _fixture(n_nodes=25, n_ways=4):
    nodes = [
        (
            100 + i,
            -1.5 + i * 0.0001,
            47.25 + i * 0.00005,
            {"amenity": "cafe"} if i % 5 == 0 else {},
        )
        for i in range(n_nodes)
    ]
    ways = [
        (500 + w, [100 + (w * 3 + j) % n_nodes for j in range(5)], {"highway": "residential"})
        for w in range(n_ways)
    ]
    rels = [
        (900, [("way", 500, "outer"), ("way", 501, "inner"), ("node", 103, "")],
         {"type": "multipolygon"}),
    ]
    return nodes, ways, rels


def test_blob_index_and_roundtrip(tmp_path):
    nodes, ways, rels = _fixture()
    path = str(tmp_path / "fixture.osm.pbf")
    nblobs = write_osm_pbf(path, nodes, ways, rels, block_nodes=10)
    assert nblobs >= 4  # 3 node blobs (25/10) + 1 way/rel blob
    idx = scan_blob_index(path)
    assert idx[0][0] == "OSMHeader"
    assert sum(1 for t, _o, _s in idx if t == "OSMData") == nblobs


def test_read_osm_pbf_distributed(spark, tmp_path):
    nodes, ways, rels = _fixture()
    path = str(tmp_path / "fixture.osm.pbf")
    write_osm_pbf(path, nodes, ways, rels, block_nodes=10)
    df = read_osm_pbf(spark, path)
    rows = df.collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r.kind, []).append(r)
    assert len(by_kind["node"]) == 25
    assert len(by_kind["way"]) == 4
    assert len(by_kind["relation"]) == 1
    n0 = sorted(by_kind["node"], key=lambda r: r.id)[0]
    assert n0.id == 100
    assert round(n0.lon * 1e7) == -15000000
    assert round(n0.lat * 1e7) == 472500000
    assert n0.tags["amenity"] == "cafe"
    w0 = sorted(by_kind["way"], key=lambda r: r.id)[0]
    assert list(w0.refs) == [100, 101, 102, 103, 104]
    assert w0.tags["highway"] == "residential"
    rel = by_kind["relation"][0]
    assert rel.id == 900
    assert [tuple(m) for m in rel.members] == [
        ("way", 500, "outer"),
        ("way", 501, "inner"),
        ("node", 103, ""),
    ]
    assert rel.tags["type"] == "multipolygon"


def test_uncompressed_raw_blob(spark, tmp_path):
    nodes, _w, _r = _fixture(n_nodes=5)
    path = str(tmp_path / "raw.osm.pbf")
    write_osm_pbf(path, nodes, compress=False)
    with open(path, "rb") as f:
        assert b"zlib" not in f.read(64)
    df = read_osm_pbf(spark, path)
    assert df.filter("kind = 'node'").count() == 5


def test_ways_to_lines(spark, tmp_path):
    nodes, ways, rels = _fixture()
    path = str(tmp_path / "fixture.osm.pbf")
    write_osm_pbf(path, nodes, ways, rels, block_nodes=10)
    osm = read_osm_pbf(spark, path)
    lines = osm_ways_to_lines(osm).orderBy("id")
    rows = lines.collect()
    assert [r.id for r in rows] == [500, 501, 502, 503]
    assert all(r.n_pts == 5 for r in rows)
    w = _wkt.wkb_to_wkt(bytes(rows[0].geometry))
    assert w.startswith("LINESTRING")
    # way 500 refs [100..104] -> first vertex is node 100
    assert "-1.5 47.25" in w
    assert rows[0].tags["highway"] == "residential"


def test_relations_to_multipolygons(spark, tmp_path):
    """Two multipolygon relations: (a) square outer split across two
    ways, one stored REVERSED, with a square hole; (b) a simple
    triangle. Hole nesting resolved by ray-cast containment."""
    from gdal_spark.sources.osm import osm_relations_to_multipolygons

    # grid of node ids -> integer-ish coords
    nodes = {
        1: (0.0, 0.0), 2: (10.0, 0.0), 3: (10.0, 10.0), 4: (0.0, 10.0),
        5: (2.0, 2.0), 6: (8.0, 2.0), 7: (8.0, 8.0), 8: (2.0, 8.0),
        9: (20.0, 0.0), 10: (30.0, 0.0), 11: (25.0, 9.0),
    }
    node_rows = [(nid, lon, lat, {}) for nid, (lon, lat) in nodes.items()]
    ways = [
        (100, [1, 2, 3], {}),          # outer half A
        (101, [1, 4, 3], {}),          # outer half B, needs reversal
        (102, [5, 6, 7, 8, 5], {}),    # hole (already closed)
        (103, [9, 10, 11, 9], {}),     # triangle outer
    ]
    rels = [
        (200, [("way", 100, "outer"), ("way", 101, "outer"),
               ("way", 102, "inner")], {"type": "multipolygon"}),
        (201, [("way", 103, "outer")], {"type": "multipolygon"}),
        (202, [("node", 1, "stop")], {"type": "route"}),  # filtered out
    ]
    path = str(tmp_path / "mp.osm.pbf")
    write_osm_pbf(path, node_rows, ways, rels)
    osm = read_osm_pbf(spark, path)
    out = {r.id: r for r in osm_relations_to_multipolygons(osm).collect()}
    assert set(out) == {200, 201}
    assert (out[200].n_polys, out[200].n_holes, out[200].n_pts) == (1, 1, 10)
    assert (out[201].n_polys, out[201].n_holes, out[201].n_pts) == (1, 0, 4)
    assert out[200].tags["type"] == "multipolygon"
    w = _wkt.wkb_to_wkt(bytes(out[200].geometry))
    assert w.startswith("MULTIPOLYGON")
    # hole ring must be present: contains vertex 2 2
    assert "2 2" in w
