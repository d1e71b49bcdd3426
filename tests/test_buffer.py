"""True round buffer (ops.buffer_geom) — replaces the r2 convex-hull
approximation (VERDICT r2 missing-2). Reference semantics:
OGRGeometry::Buffer == GEOS Buffer (ogr/ogr_geometry.h:568);
autotest/ogr/ogr_geom.py has the area-golden pattern these follow.

Pure-NumPy kernel tests (no Spark session needed) + one Spark UDF test.
"""
import math

import numpy as np
import pytest

from gdal_spark.geometry import ops, wkt


def _area(geom):
    return ops.area(geom)


def _contains(geom, x, y):
    return bool(np.any(ops._point_in_polygonal(np.array([x]), np.array([y]), geom)))


def test_line_buffer_area_capsule():
    # buffer of a length-10 segment with d=1: area = 2*10*1 + pi*1^2
    line = ("LineString", np.array([[0.0, 0.0], [10.0, 0.0]]))
    buf = ops.buffer_geom(line, 1.0, quadsegs=64)
    want = 20.0 + math.pi
    assert abs(_area(buf) - want) < 2e-3


def test_polyline_buffer_concave_bend():
    # L-shaped polyline: the concave elbow region must NOT be filled
    line = ("LineString", np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]]))
    buf = ops.buffer_geom(line, 1.0, quadsegs=32)
    assert _contains(buf, 5.0, 0.5)
    assert _contains(buf, 9.5, 5.0)
    # point inside the elbow, >1 from both arms: excluded (hull would include)
    assert not _contains(buf, 5.0, 5.0)
    # point just inside the outer corner arc
    assert _contains(buf, 10.5, -0.5)


def test_polygon_dilate_exact_growth():
    # unit square dilated by d: area = 1 + 4d + pi d^2
    sq = ("Polygon", [np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)])
    buf = ops.buffer_geom(sq, 0.5, quadsegs=64)
    want = 1.0 + 4 * 0.5 + math.pi * 0.25
    assert abs(_area(buf) - want) < 2e-3


def test_polygon_negative_buffer_erodes():
    # 4x4 square eroded by 1 -> 2x2 square
    sq = ("Polygon", [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)])
    ero = ops.buffer_geom(sq, -1.0, quadsegs=32)
    assert abs(_area(ero) - 4.0) < 2e-2
    assert _contains(ero, 2.0, 2.0)
    assert not _contains(ero, 0.5, 0.5)


def test_concave_polygon_buffer_stays_concave():
    # L-shaped polygon; hull-of-vertex-buffers would cover (4,4)+margin
    L = ("Polygon", [np.array(
        [[0, 0], [6, 0], [6, 2], [2, 2], [2, 6], [0, 6], [0, 0]], dtype=float)])
    buf = ops.buffer_geom(L, 0.5, quadsegs=32)
    assert _contains(buf, 6.25, 1.0)   # grown outward
    assert _contains(buf, 1.0, 6.25)
    assert not _contains(buf, 4.0, 4.0)  # deep in the concave notch
    # area: L (20) + perimeter*d (24*0.5) + convex-corner arcs (5 quarter
    # circles at 90deg corners minus the reflex corner overlap at (2,2))
    a = _area(buf)
    assert 20 + 12 < a < 20 + 12 + math.pi * 0.25 * 5 + 0.05
    # erode: notch corner rounds? no — erosion of polygon with reflex vertex
    ero = ops.buffer_geom(L, -0.5, quadsegs=32)
    assert not _contains(ero, 0.25, 0.25)
    assert _contains(ero, 1.0, 1.0)
    assert not _contains(ero, 2.2, 2.2)  # inside notch margin removed


def test_holed_polygon_dilate_erode():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    hole = np.array([[4, 4], [4, 6], [6, 6], [6, 4], [4, 4]], dtype=float)  # CW
    g = ("Polygon", [outer, hole])
    base = _area(g)
    assert abs(base - 96.0) < 1e-9
    d = ops.buffer_geom(g, 0.5, quadsegs=48)
    # outer grows (+ perim*d + pi d^2), hole shrinks (2x2 -> 1x1)
    want_d = 100 + 40 * 0.5 + math.pi * 0.25 - (2 - 1) ** 2 * 1.0
    assert abs(_area(d) - want_d) < 2e-2
    assert not _contains(d, 5.0, 5.0)  # hole center still open
    e = ops.buffer_geom(g, -0.5, quadsegs=48)
    # outer shrinks to 9x9; hole dilates by d: 4 + 8*0.5 + pi*0.25
    want_e = 81 - (8 + math.pi * 0.25)
    assert abs(_area(e) - want_e) < 5e-2
    assert not _contains(e, 4.0, 5.0)  # widened hole


def test_point_buffer_fast_path_unchanged():
    g = ("Point", (3.0, 4.0))
    buf = ops.buffer_geom(g, 2.0, quadsegs=64)
    assert abs(_area(buf) - math.pi * 4.0) < 2e-3


def test_spark_st_buffer_real(spark):
    from pyspark.sql import functions as F
    from gdal_spark.functions import st  # noqa: F401 (registers)
    from gdal_spark.geometry import wkt as _wkt

    line_wkb = _wkt.geom_to_wkb(
        "LineString", np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]])
    )
    df = spark.createDataFrame([(bytearray(line_wkb),)], "g binary")
    out = df.select(
        st.st_buffer(F.col("g"), F.lit(1.0)).alias("b")
    ).collect()[0]["b"]
    geom = __import__("gdal_spark.geometry.wkb", fromlist=["parse_wkb"]).parse_wkb(
        bytes(out)
    )
    a = ops.area(geom)
    # two length-10 arms with round caps/joins; far below the convex-hull
    # area (~60) the old approximation produced
    assert 38.0 < a < 44.0
    assert not _contains(geom, 5.0, 5.0)
