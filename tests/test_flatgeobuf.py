"""FlatGeobuf (sources/flatgeobuf.py): hand-rolled flatbuffers codec,
write→distributed-read roundtrip, header metadata."""

import numpy as np
import pytest

from gdal_spark.geometry import wkt as _wkt
from gdal_spark.sources.flatgeobuf import (
    _Builder,
    _Tab,
    fgb_header,
    read_fgb,
    write_fgb,
)


def test_flatbuffers_primitives():
    b = _Builder()
    s = b.string("héllo")
    t = b.table([(0, "off", s), (1, "u8", 11), (8, "u64", 1 << 40)])
    tab = _Tab.root(b.finish(t))
    assert tab.string(0) == "héllo"
    assert tab.scalar(1, "B") == 11
    assert tab.scalar(8, "Q") == 1 << 40
    assert tab.scalar(5, "B", 7) == 7  # absent field → default


def test_flatbuffers_vectors_and_nested_tables():
    b = _Builder()
    offs = []
    for name, code in (("a", 5), ("bb", 10)):
        so = b.string(name)
        offs.append(b.table([(0, "off", so), (1, "u8", code)]))
    ov = b.offset_vector(offs)
    dv = b.vector("d", [1.5, 2.5, 3.5])
    t = b.table([(7, "off", ov), (1, "off", dv)])
    tab = _Tab.root(b.finish(t))
    kids = tab.tables(7)
    assert [(k.string(0), k.scalar(1, "B")) for k in kids] == [("a", 5), ("bb", 10)]
    assert np.allclose(tab.vector_np(1, "<f8"), [1.5, 2.5, 3.5])


FIXTURE = [
    (1, "alpha", 2.5, True,
     "POLYGON ((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))"),
    (2, "beta", -1.25, False, "POINT (3 7)"),
    (3, None, 0.0, None, "LINESTRING (0 0,5 5,10 0)"),
    (4, "delta", 9.5, True,
     "MULTIPOLYGON (((0 0,1 0,1 1,0 0)),((5 5,6 5,6 6,5 6,5 5)))"),
]


def test_fgb_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, s, d, b, bytearray(_wkt.wkt_to_wkb(w))) for i, s, d, b, w in FIXTURE],
        "id INT, tag STRING, val DOUBLE, flag BOOLEAN, geometry BINARY",
    )
    path = str(tmp_path / "t.fgb")
    write_fgb(df, path, name="t")
    info, offs = fgb_header(path)
    assert info["name"] == "t"
    assert info["features_count"] == len(FIXTURE)
    assert info["columns"] == [("id", 5), ("tag", 11), ("val", 10), ("flag", 2)]
    assert len(offs) == len(FIXTURE)
    got = sorted(
        (r.id, r.tag, r.val, r.flag, _wkt.wkb_to_wkt(bytes(r.geometry)))
        for r in read_fgb(spark, path).collect()
    )
    exp = sorted(
        (i, s, d, b, _wkt.wkb_to_wkt(_wkt.wkt_to_wkb(w)))
        for i, s, d, b, w in FIXTURE
    )
    assert got == exp


def test_fgb_write_row_cap(spark):
    df = spark.range(5).selectExpr("CAST(id AS INT) AS id",
                                   "CAST(NULL AS BINARY) AS geometry")
    with pytest.raises(ValueError, match="fixture sink"):
        write_fgb(df, "/tmp/never.fgb", max_rows=3)


MULTI_FIXTURE = [
    (1, "MULTIPOINT ((1 2),(3 4),(5 6))"),
    (2, "MULTILINESTRING ((0 0,1 1,2 0),(5 5,6 6))"),
    (3, "MULTILINESTRING ((7 7,8 8))"),
]


def test_fgb_multipoint_multilinestring_flat_encoding(spark, tmp_path):
    """Spec conformance (ADVICE r4): MultiPoint is ONE flat xy vector and
    MultiLineString is flat xy+ends (reference geometryreader.cpp
    readMultiPoint/readMultiLineString) — never parts child tables, which
    GDAL/QGIS cannot read for these types."""
    from gdal_spark.sources.flatgeobuf import _geom_fields, _geom_decode
    from gdal_spark.geometry import wkb as _wkb
    import struct

    df = spark.createDataFrame(
        [(i, bytearray(_wkt.wkt_to_wkb(w))) for i, w in MULTI_FIXTURE],
        "id INT, geometry BINARY",
    )
    path = str(tmp_path / "m.fgb")
    write_fgb(df, path, name="m")
    got = sorted(
        (r.id, _wkt.wkb_to_wkt(bytes(r.geometry)))
        for r in read_fgb(spark, path).collect()
    )
    exp = sorted(
        (i, _wkt.wkb_to_wkt(_wkt.wkt_to_wkb(w))) for i, w in MULTI_FIXTURE
    )
    assert got == exp
    # wire-level: no parts vector (fid 7), flat xy present (fid 1)
    for _, w in MULTI_FIXTURE:
        b = _Builder()
        tab = _Tab.root(b.finish(b.table(
            _geom_fields(b, _wkb.parse_wkb(_wkt.wkt_to_wkb(w))))))
        assert not tab.tables(7)
        assert tab.vector_np(1, "<f8") is not None
