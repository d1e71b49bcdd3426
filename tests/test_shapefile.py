"""Shapefile reader vs the reference's own poly.shp fixture: geometry
areas must match the .dbf AREA attribute (the reference's stored golden,
autotest/ogr/data/poly.{shp,dbf})."""
import os

import numpy as np
import pytest

POLY_SHP = "/root/reference/autotest/ogr/data/poly.shp"

pytestmark = pytest.mark.skipif(
    not os.path.exists(POLY_SHP), reason="reference fixture not present"
)


def test_read_poly_shp_matches_dbf_goldens(spark):
    from gdal_spark.functions.st import st_area
    from gdal_spark.sources.shapefile import read_shapefile
    from pyspark.sql import functions as F

    df = read_shapefile(spark, POLY_SHP)
    assert df.count() == 10
    assert set(df.columns) == {"fid", "AREA", "EAS_ID", "PRFEDEA", "geometry"}
    rows = (
        df.select(
            "EAS_ID",
            F.col("AREA").alias("area_attr"),
            st_area(F.col("geometry")).alias("area_geom"),
        )
        .collect()
    )
    for r in rows:
        # the reference's dbf AREA values carry float32-era rounding (and
        # record EAS_ID=170 stores a NEGATIVE area for its CCW ring) —
        # compare magnitude at 1e-6 relative
        assert abs(r.area_geom - abs(r.area_attr)) <= 1e-6 * abs(r.area_attr), r.EAS_ID


def test_read_poly_shp_matches_extracted_fixture(spark):
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from fixtures_poly import POLY_ATTRS

    from gdal_spark.sources.shapefile import read_shapefile

    df = read_shapefile(spark, POLY_SHP)
    got = sorted((r.EAS_ID, r.PRFEDEA) for r in df.collect())
    want = sorted((eas, prf) for _, eas, prf in POLY_ATTRS)
    assert got == want


def test_point_and_line_shapefile_types():
    """Parse a synthetic in-memory .shp with point records (writer-free:
    craft the bytes per the public spec)."""
    import struct
    import tempfile

    from gdal_spark.sources.shapefile import _read_shp

    recs = b""
    for i, (x, y) in enumerate([(1.5, 2.5), (-3.0, 4.0)], 1):
        content = struct.pack("<idd", 1, x, y)
        recs += struct.pack(">ii", i, len(content) // 2) + content
    header = struct.pack(">i5xxxi", 9994, 0)  # code + 5 zero ints + length
    header = struct.pack(">iiiiiii", 9994, 0, 0, 0, 0, 0, (100 + len(recs)) // 2)
    header += struct.pack("<ii", 1000, 1) + struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    with tempfile.NamedTemporaryFile(suffix=".shp", delete=False) as f:
        f.write(header + recs)
        path = f.name
    shapes = _read_shp(path)
    assert [g for _, _, g in shapes] == [
        ("Point", (1.5, 2.5)),
        ("Point", (-3.0, 4.0)),
    ]
