"""ST_ registry + geometry ops vs reference goldens (poly.dbf AREA,
WKT round trips, predicate truth tables)."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fixtures_poly import POLY_ATTRS, poly_rings
from gdal_spark.functions.st import (
    register_st_functions,
    st_area,
    st_astext,
    st_centroid,
    st_contains,
    st_distance,
    st_geomfromtext,
    st_intersects,
    st_makepoint,
    st_within,
)
from gdal_spark.geometry import ops, wkb, wkt


def test_wkt_roundtrip():
    cases = [
        "POINT (1 2)",
        "LINESTRING (0 0,1 1,2 0)",
        "POLYGON ((0 0,4 0,4 4,0 4,0 0))",
        "POLYGON ((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))",
        "MULTIPOLYGON (((0 0,1 0,1 1,0 1,0 0)),((5 5,6 5,6 6,5 6,5 5)))",
        "MULTIPOINT ((1 1),(2 2))",
        "GEOMETRYCOLLECTION (POINT (1 2),LINESTRING (0 0,1 1))",
    ]
    for c in cases:
        b = wkt.wkt_to_wkb(c)
        assert wkt.wkb_to_wkt(b) == c, c


def test_ops_predicates():
    A = wkt.parse_wkt("POLYGON ((1 2,1 3,3 3,3 2,1 2))")
    B = wkt.parse_wkt("POLYGON ((2 1,2 4,6 4,6 1,2 1))")
    P_in = wkt.parse_wkt("POINT (2.5 2.5)")
    P_out = wkt.parse_wkt("POINT (10 10)")
    assert ops.intersects(A, B)
    assert ops.intersects(A, P_in) and not ops.intersects(A, P_out)
    assert ops.contains(B, wkt.parse_wkt("POINT (3 3)"))
    assert not ops.contains(A, B) and not ops.within(A, B)
    assert ops.contains(
        wkt.parse_wkt("POLYGON ((0 0,10 0,10 10,0 10,0 0))"), A
    )
    assert ops.disjoint(A, P_out)
    # shared-edge squares touch
    C = wkt.parse_wkt("POLYGON ((3 2,3 3,4 3,4 2,3 2))")
    assert ops.touches(A, C)
    assert ops.intersects(A, C)


def test_ops_measures():
    sq = wkt.parse_wkt("POLYGON ((0 0,4 0,4 4,0 4,0 0))")
    assert ops.area(sq) == 16.0
    assert ops.length(sq) == 16.0
    assert ops.centroid(sq) == (2.0, 2.0)
    holed = wkt.parse_wkt("POLYGON ((0 0,4 0,4 4,0 4,0 0),(1 1,3 1,3 3,1 3,1 1))")
    assert ops.area(holed) == 12.0
    # centroid of symmetric hole stays centered
    assert ops.centroid(holed) == (2.0, 2.0)
    a = wkt.parse_wkt("POINT (0 0)")
    b = wkt.parse_wkt("POINT (3 4)")
    assert ops.distance(a, b) == 5.0
    assert ops.distance(a, wkt.parse_wkt("LINESTRING (5 -10,5 10)")) == 5.0
    assert ops.distance(sq, b) == 0.0  # inside


def test_ops_intersection_golden():
    """Layer-algebra golden pair (ogr_layer_algebra.py:178): A1 ∩ B."""
    A1 = wkt.parse_wkt("POLYGON ((1 2,1 3,3 3,3 2,1 2))")
    B = wkt.parse_wkt("POLYGON ((2 1,2 4,6 4,6 1,2 1))")
    name, payload = ops.intersection(A1, B)
    assert name == "Polygon"
    assert ops.area((name, payload)) == pytest.approx(1.0)
    e = ops.envelope((name, payload))
    assert e == (2.0, 2.0, 3.0, 3.0)


def test_ops_difference_pieces():
    A1 = np.array([[1, 2], [1, 3], [3, 3], [3, 2], [1, 2]], dtype=float)
    B = np.array([[2, 1], [2, 4], [6, 4], [6, 1], [2, 1]], dtype=float)
    pieces = ops.difference_pieces([A1], [B])
    total = sum(ops.area(("Polygon", [p])) for p in pieces)
    assert total == pytest.approx(1.0)  # the (1,2)-(2,3) strip
    # self difference is empty
    assert ops.difference_pieces([A1], [A1]) == []


def test_st_udfs_on_fixture(spark):
    rings = poly_rings()
    pdf = pd.DataFrame(
        {
            "eas_id": [a[1] for a in POLY_ATTRS],
            "geometry": [bytearray(wkb.polygon_wkb(p[0], p[1:])) for p in rings],
        }
    )
    df = spark.createDataFrame(pdf)
    got = df.select("eas_id", st_area("geometry").alias("area")).collect()
    want = {a[1]: abs(a[0]) for a in POLY_ATTRS}
    for r in got:
        assert r.area == pytest.approx(want[r.eas_id], abs=0.05)


def test_st_sql_registration(spark):
    register_st_functions(spark)
    spark.createDataFrame(
        [(1, 479750.0, 4764600.0)], "id INT, x DOUBLE, y DOUBLE"
    ).createOrReplaceTempView("pts_v")
    row = spark.sql(
        """
        SELECT st_astext(st_makepoint(x, y)) AS w,
               st_area(st_geomfromtext('POLYGON ((0 0,2 0,2 2,0 2,0 0))')) AS a,
               st_intersects(st_geomfromtext('POLYGON ((0 0,2 0,2 2,0 2,0 0))'),
                             st_makepoint(1.0, 1.0)) AS i
        FROM pts_v
        """
    ).collect()[0]
    assert row.w == "POINT (479750 4764600)"
    assert row.a == 4.0
    assert row.i is True


def test_st_pairwise_on_reference_polys(spark):
    """Cross-product of the 10 fixture polygons: st_intersects symmetric,
    every polygon intersects itself and contains its own centroid."""
    rings = poly_rings()
    pdf = pd.DataFrame(
        {
            "id": range(10),
            "geometry": [bytearray(wkb.polygon_wkb(p[0], p[1:])) for p in rings],
        }
    )
    df = spark.createDataFrame(pdf)
    a = df.select(F.col("id").alias("ia"), F.col("geometry").alias("ga"))
    b = df.select(F.col("id").alias("ib"), F.col("geometry").alias("gb"))
    m = (
        a.crossJoin(b)
        .select("ia", "ib", st_intersects("ga", "gb").alias("x"))
        .toPandas()
        .pivot(index="ia", columns="ib", values="x")
    )
    assert all(m.iloc[i, i] for i in range(10))
    for i in range(10):
        for j in range(10):
            assert m.iloc[i, j] == m.iloc[j, i]
    cent = df.select("id", st_contains("geometry", st_centroid("geometry")).alias("c")).collect()
    # centroid inside for all these (they're near-convex parcels)
    assert sum(1 for r in cent if r.c) >= 9


def test_st_setops_and_predicates(spark):
    """ST_Union/Difference/SymDifference/IsValid/IsSimple/Crosses/Overlaps
    (ogrsqlitesqlfunctions.cpp:1188-1223 registry additions)."""
    from gdal_spark.functions import st
    from gdal_spark.geometry import wkt as _wkt
    from pyspark.sql import functions as F

    sq = "POLYGON ((0 0,4 0,4 4,0 4,0 0))"
    off = "POLYGON ((3 3,5 3,5 5,3 5,3 3))"
    bow = "POLYGON ((0 0,2 2,2 0,0 2,0 0))"
    l1 = "LINESTRING (0 0,4 4)"
    l2 = "LINESTRING (0 4,4 0)"
    df = spark.createDataFrame(
        [(bytearray(_wkt.wkt_to_wkb(sq)), bytearray(_wkt.wkt_to_wkb(off)),
          bytearray(_wkt.wkt_to_wkb(bow)), bytearray(_wkt.wkt_to_wkb(l1)),
          bytearray(_wkt.wkt_to_wkb(l2)))],
        "sq BINARY, off BINARY, bow BINARY, l1 BINARY, l2 BINARY",
    )
    r = df.select(
        st.st_area(st.st_union(F.col("sq"), F.col("off"))).alias("u"),
        st.st_area(st.st_difference(F.col("sq"), F.col("off"))).alias("d"),
        st.st_area(st.st_symdifference(F.col("sq"), F.col("off"))).alias("s"),
        st.st_isvalid(F.col("sq")).alias("v1"),
        st.st_isvalid(F.col("bow")).alias("v2"),
        st.st_issimple(F.col("l1")).alias("s1"),
        st.st_crosses(F.col("l1"), F.col("l2")).alias("c"),
        st.st_overlaps(F.col("sq"), F.col("off")).alias("o"),
    ).collect()[0]
    assert abs(r.u - 19.0) < 1e-9
    assert abs(r.d - 15.0) < 1e-9
    assert abs(r.s - 18.0) < 1e-9  # (16-1) + (4-1)
    assert r.v1 and not r.v2
    assert r.s1 and r.c and r.o


def test_st_geodesic_measures(spark):
    from gdal_spark.functions import st
    from gdal_spark.geometry import wkt as _wkt
    from pyspark.sql import functions as F

    # equator segment of 1 degree and a 1x1 deg square at the equator
    line = "LINESTRING (0 0,1 0)"
    sq = "POLYGON ((0 0,1 0,1 1,0 1,0 0))"
    df = spark.createDataFrame(
        [(bytearray(_wkt.wkt_to_wkb(line)), bytearray(_wkt.wkt_to_wkb(sq)))],
        "l BINARY, p BINARY",
    )
    r = df.select(
        st.st_geodesic_length(F.col("l")).alias("len"),
        st.st_geodesic_area(F.col("p")).alias("area"),
    ).collect()[0]
    assert abs(r.len - 111319.4908) < 0.01  # WGS84 equatorial degree
    assert abs(r.area - 12364e6) / 12364e6 < 0.002  # ~12364 km^2


def test_st_wkb_roundtrip(spark):
    from gdal_spark.functions import st
    from gdal_spark.geometry import wkt as _wkt
    from pyspark.sql import functions as F

    w = "POLYGON ((0 0,4 0,4 4,0 4,0 0))"
    df = spark.createDataFrame([(bytearray(_wkt.wkt_to_wkb(w)),)], "g BINARY")
    r = df.select(
        st.st_astext(st.st_geomfromwkb(st.st_asbinary(F.col("g")))).alias("t")
    ).collect()[0]
    assert "POLYGON" in r.t


def test_st_equals_collinear_tessellation(spark):
    """Same square traced with an extra collinear mid-edge vertex and
    rotated start must compare EQUAL (r2 deviation closed); a spike
    vertex changes the traced set and stays unequal."""
    from pyspark.sql import functions as F

    from gdal_spark.functions.st import st_equals
    from gdal_spark.geometry import wkt as _wkt

    sq = "POLYGON ((0 0,2 0,2 2,0 2,0 0))"
    sq_mid = "POLYGON ((2 0,2 2,0 2,0 0,1 0,2 0))"       # +collinear (1,0), rotated
    line = "LINESTRING (0 0,1 0,2 0)"
    line_plain = "LINESTRING (2 0,0 0)"                   # reversed, no midpoint
    line_spike = "LINESTRING (0 0,3 0,2 0)"               # overshoot spike
    rows = [
        (1, bytearray(_wkt.wkt_to_wkb(sq)), bytearray(_wkt.wkt_to_wkb(sq_mid))),
        (2, bytearray(_wkt.wkt_to_wkb(line)), bytearray(_wkt.wkt_to_wkb(line_plain))),
        (3, bytearray(_wkt.wkt_to_wkb(line)), bytearray(_wkt.wkt_to_wkb(line_spike))),
    ]
    df = spark.createDataFrame(rows, "id INT, a BINARY, b BINARY")
    got = {r.id: r.eq for r in df.select("id", st_equals("a", "b").alias("eq")).collect()}
    assert got == {1: True, 2: True, 3: False}


def test_st_polygonize(spark):
    """OGRGeometry::Polygonize parity (autotest/ogr/ogr_geos.py:613
    golden, JTS Polygonizer semantics): noded linework → polygons;
    dangles pruned, cut edges dropped, nested CCW rings become holes."""
    from gdal_spark.functions.st import register_st_functions

    register_st_functions(spark)
    rows = spark.sql(
        """
        SELECT st_astext(st_polygonize(st_geomfromtext(
          'MULTILINESTRING((0 0,0 1,1 1),(1 1,0 0))'))) AS golden,
          st_astext(st_polygonize(st_geomfromtext(
          'MULTILINESTRING((0 0,10 0,10 10,0 10,0 0),(2 2,8 2,8 8,2 8,2 2))'))) AS nested,
          st_astext(st_polygonize(st_geomfromtext(
          'MULTILINESTRING((0 0,2 0),(2 0,1 2),(1 2,0 0),(2 0,3 2),(3 2,1 2))'))) AS shared,
          st_astext(st_polygonize(st_geomfromtext(
          'MULTILINESTRING((0 0,1 0),(1 0,2 0))'))) AS open_only,
          st_polygonize(st_geomfromtext('POINT(1 2)')) AS pt
        """
    ).collect()[0]
    # byte-exact reference golden (test_ogr_geos_polygonize)
    assert rows.golden == "GEOMETRYCOLLECTION (POLYGON ((0 0,0 1,1 1,0 0)))"
    assert rows.nested == (
        "GEOMETRYCOLLECTION (POLYGON ((10 0,0 0,0 10,10 10,10 0),"
        "(2 2,8 2,8 8,2 8,2 2)),POLYGON ((8 2,2 2,2 8,8 8,8 2)))"
    )
    assert rows.shared == (
        "GEOMETRYCOLLECTION (POLYGON ((2 0,0 0,1 2,2 0)),"
        "POLYGON ((2 0,1 2,3 2,2 0)))"
    )
    assert rows.open_only == "GEOMETRYCOLLECTION ()"
    assert rows.pt is None
