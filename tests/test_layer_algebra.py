"""Layer algebra vs the reference's goldens (ogr_layer_algebra.py):
A = two unit-height rects, B = one 4×3 rect; Intersection → 2 features,
Union → 5, SymDifference → 3, Identity → 4, Update → 3, Clip → 2,
Erase → 2; schemas use input_/method_ prefixes on colliding names."""
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark.geometry import ops, wkb, wkt
from gdal_spark.operators import layer_algebra as LA


def _df(spark, rows, fields):
    """rows: list of (wkt, attrs...)"""
    recs = []
    for r in rows:
        recs.append((bytearray(wkt.wkt_to_wkb(r[0])),) + tuple(r[1:]))
    return spark.createDataFrame(recs, f"geometry BINARY, {fields}")


@pytest.fixture(scope="module")
def AB(spark):
    A = _df(
        spark,
        [
            ("POLYGON ((1 2,1 3,3 3,3 2,1 2))", 1, 7),
            ("POLYGON ((5 2,5 3,7 3,7 2,5 2))", 2, 8),
        ],
        "A INT, same_in_both_layers INT",
    )
    B = _df(
        spark,
        [("POLYGON ((2 1,2 4,6 4,6 1,2 1))", "first", 9)],
        "B STRING, same_in_both_layers INT",
    )
    return A, B


def _areas(rows):
    return sorted(
        round(ops.area(wkb.parse_wkb(bytes(r.geometry))), 9) for r in rows
    )


def test_intersection_golden(spark, AB):
    A, B = AB
    out = LA.intersection(A, B)
    assert set(out.columns) == {
        "A", "input_same_in_both_layers", "B", "method_same_in_both_layers", "geometry",
    }
    rows = out.collect()
    assert len(rows) == 2  # golden: ogr_layer_algebra.py:176
    got = {(r.A, r.B): r for r in rows}
    g1 = wkb.parse_wkb(bytes(got[(1, "first")].geometry))
    assert ops.envelope(g1) == (2.0, 2.0, 3.0, 3.0)  # POLYGON((2 3,3 3,3 2,2 2,2 3))
    g2 = wkb.parse_wkb(bytes(got[(2, "first")].geometry))
    assert ops.envelope(g2) == (5.0, 2.0, 6.0, 3.0)
    assert _areas(rows) == [1.0, 1.0]


def test_union_golden(spark, AB):
    A, B = AB
    rows = LA.union(A, B).collect()
    assert len(rows) == 5  # golden: 2 intersections + 2 A-only + 1 B-only
    assert sum(ops.area(wkb.parse_wkb(bytes(r.geometry))) for r in rows) == pytest.approx(
        2.0 + 2.0 + 12.0 - 2.0  # |A| + |B| - |A∩B| = union area, via piece sum
    )


def test_symdifference_golden(spark, AB):
    A, B = AB
    rows = LA.sym_difference(A, B).collect()
    assert len(rows) == 3  # golden: ogr_layer_algebra.py:393
    assert sum(ops.area(wkb.parse_wkb(bytes(r.geometry))) for r in rows) == pytest.approx(
        (4.0 - 2.0) + (12.0 - 2.0)
    )


def test_symdifference_self_empty(spark):
    D = _df(
        spark,
        [
            ("POLYGON ((1 2,1 3,3 3,3 2,1 2))", 0),
            ("POLYGON ((3 2,3 3,4 3,4 2,3 2))", 1),
        ],
        "fid INT",
    )
    rows = LA.sym_difference(D, D).collect()
    assert rows == []  # golden: test_algebra_symdifference_3


def test_identity_golden(spark, AB):
    A, B = AB
    rows = LA.identity(A, B).collect()
    assert len(rows) == 4  # golden: 2 intersections + 2 A-remainders
    assert sum(ops.area(wkb.parse_wkb(bytes(r.geometry))) for r in rows) == pytest.approx(4.0)


def test_update_golden(spark, AB):
    A, B = AB
    rows = LA.update(A, B).collect()
    assert len(rows) == 3  # golden: 2 A-remainders + 1 method feature
    assert sum(ops.area(wkb.parse_wkb(bytes(r.geometry))) for r in rows) == pytest.approx(
        2.0 + 12.0
    )


def test_clip_golden(spark, AB):
    A, B = AB
    rows = LA.clip(A, B).collect()
    assert len(rows) == 2
    assert set(LA.clip(A, B).columns) == {"A", "same_in_both_layers", "geometry"}
    assert _areas(rows) == [1.0, 1.0]


def test_erase_golden(spark, AB):
    A, B = AB
    rows = LA.erase(A, B).collect()
    assert len(rows) == 2
    assert _areas(rows) == [1.0, 1.0]
    # erase against empty method returns input unchanged
    empty = _df(spark, [], "B STRING, same_in_both_layers INT").filter("1=0")
    rows2 = LA.erase(A, empty).collect()
    assert len(rows2) == 2
    assert _areas(rows2) == [2.0, 2.0]


def test_dissolve_keyed_and_global(spark):
    """Two-level salted union tree == analytic union areas; no-key form
    dissolves the whole layer."""
    from pyspark.sql import functions as F

    from gdal_spark.functions.st import st_area
    from gdal_spark.geometry import wkt as _wkt
    from gdal_spark.operators.layer_algebra import dissolve

    def r(x0, y0, x1, y1):
        return bytearray(_wkt.wkt_to_wkb(
            f"POLYGON (({x0} {y0},{x1} {y0},{x1} {y1},{x0} {y1},{x0} {y0}))"))

    df = spark.createDataFrame(
        [("a", r(0, 0, 2, 2)), ("a", r(1, 1, 3, 3)), ("b", r(0, 0, 1, 1)),
         ("b", r(0, 0, 1, 1)), ("b", r(5, 5, 6, 7))],
        "grp STRING, geometry BINARY",
    )
    got = {
        row.grp: row.area
        for row in dissolve(df, by=["grp"]).select(
            "grp", st_area("geometry").alias("area")).collect()
    }
    assert abs(got["a"] - 7.0) < 1e-9 and abs(got["b"] - 3.0) < 1e-9
    tot = dissolve(df).select(st_area("geometry").alias("area")).collect()
    assert len(tot) == 1 and abs(tot[0].area - 9.0) < 1e-9
