"""CRS transforms (geometry/crs.py) and the reprojecting warp.

Correctness evidence in lieu of PROJ (not installed here): the Krüger
series and the independent Redfearn/Snyder series — two unrelated
derivations of the ellipsoidal transverse Mercator — must agree to
sub-millimeter inside a UTM zone; roundtrips must close to ~1e-12 deg;
and the distributed reprojecting warp must match its single-node oracle
bit-for-bit.
"""
import numpy as np
import pytest

from gdal_spark.geometry import crs


def test_kruger_vs_redfearn_independent_series():
    tm = crs._utm_tmerc(32633)
    rng = np.random.default_rng(1)
    lon = rng.uniform(12, 18, 500)
    lat = rng.uniform(-80, 84, 500)
    x1, y1 = tm.forward(lon, lat)
    x2, y2 = crs.utm_forward_redfearn(lon, lat, 33)
    assert np.abs(x1 - x2).max() < 1e-3
    assert np.abs(y1 - y2).max() < 1e-3


def test_utm_roundtrip_closes():
    for epsg in (32601, 32633, 32660, 32733):
        tm = crs._utm_tmerc(epsg)
        zone = epsg % 100
        lon0 = zone * 6.0 - 183.0
        rng = np.random.default_rng(epsg)
        lon = rng.uniform(lon0 - 3, lon0 + 3, 200)
        lat = rng.uniform(-79, 83, 200)
        x, y = tm.forward(lon, lat)
        lo, la = tm.inverse(x, y)
        assert np.abs(lo - lon).max() < 1e-11
        assert np.abs(la - lat).max() < 1e-11


def test_utm_known_anchor_points():
    """Closed-form anchors: central meridian maps to x=500000 with scale
    0.9996; the equator maps to northing 0 (N) / 10^7 (S)."""
    tm = crs._utm_tmerc(32631)  # zone 31N, lon0 = 3
    x, y = tm.forward(np.array([3.0]), np.array([0.0]))
    assert abs(x[0] - 500000.0) < 1e-6 and abs(y[0]) < 1e-6
    tms = crs._utm_tmerc(32731)
    _, ys = tms.forward(np.array([3.0]), np.array([0.0]))
    assert abs(ys[0] - 10000000.0) < 1e-6
    # meridian quarter arc: pole northing = k0 * A * pi/2
    _, yp = tm.forward(np.array([3.0]), np.array([89.9999999]))
    assert abs(yp[0] - 0.9996 * tm.A * np.pi / 2) < 1.0


def test_transformer_pivot_webmerc_utm():
    fn = crs.transformer("EPSG:3857", "EPSG:32633")
    inv = crs.transformer("EPSG:32633", "EPSG:3857")
    x = np.array([1669792.36])  # lon 15
    y = np.array([6800125.45])
    ux, uy = fn(x, y)
    bx, by = inv(ux, uy)
    assert abs(bx[0] - x[0]) < 1e-6 and abs(by[0] - y[0]) < 1e-6


def test_transformer_unknown_crs_raises():
    with pytest.raises(NotImplementedError):
        crs.transformer("EPSG:27700", "EPSG:4326")


def test_vector_pipeline_reproject_utm(spark):
    from gdal_spark.geometry import wkb as _wkb
    from gdal_spark.operators.vector_pipeline import VectorPipeline

    lon, lat = 15.5, 52.0
    df = spark.createDataFrame(
        [(1, bytearray(_wkb.point_wkb(lon, lat)))], "fid INT, geometry BINARY"
    )
    out = VectorPipeline(df).reproject("EPSG:4326", "EPSG:32633").df
    g = _wkb.parse_wkb(bytes(out.collect()[0].geometry))
    ex, ey = crs._utm_tmerc(32633).forward(np.array([lon]), np.array([lat]))
    assert abs(g[1][0] - ex[0]) < 1e-9
    assert abs(g[1][1] - ey[0]) < 1e-9


@pytest.mark.parametrize("alg", ["near", "bilinear", "average"])
def test_warp_crs_distributed_matches_oracle(spark, alg):
    """byte.tif (UTM-style grid declared EPSG:32611) → EPSG:4326 on the
    suggested output grid; distributed == single-node oracle."""
    from gdal_spark.raster.model import byte_fixture, RasterMeta, tiles_from_array, tiles_to_array
    from gdal_spark.raster.warp import suggested_warp_output, warp_crs, warp_crs_np

    arr, meta = byte_fixture()
    meta_blocked = RasterMeta(width=20, height=20, dtype="uint8", block_w=8,
                              block_h=8, gt=meta.gt)
    dst = suggested_warp_output(meta_blocked, "EPSG:32611", "EPSG:4326",
                                block_w=10, block_h=10)
    got = tiles_to_array(
        warp_crs(tiles_from_array(spark, arr, meta_blocked), meta_blocked, dst,
                 "EPSG:32611", "EPSG:4326", alg=alg, init=0.0),
        dst,
    )
    want = warp_crs_np(arr, meta_blocked, dst, "EPSG:32611", "EPSG:4326",
                       alg=alg, init=0.0)
    np.testing.assert_array_equal(got, want)
    assert (got != 0).any()  # data actually landed
