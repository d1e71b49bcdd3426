"""Raster core: checksum 4672 golden, halo exchange, interpolate-at-point,
overview pyramid — distributed results vs NumPy oracles."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.raster.checksum import checksum_df, checksum_np
from gdal_spark.raster.halo import padded_blocks
from gdal_spark.raster.model import (
    RasterMeta,
    byte_fixture,
    synth_block_np,
    synth_raster,
    tiles_from_array,
    tiles_to_array,
)
from gdal_spark.raster.resample import (
    downsample2,
    downsample2_np,
    interpolate_at_point_np,
    interpolate_at_points,
)


def test_byte_fixture_checksum_golden():
    """autotest/gcore/tiff_read.py:45 — byte.tif full checksum is 4672."""
    arr, meta = byte_fixture()
    assert checksum_np(arr) == 4672


def test_checksum_distributed_matches_numpy(spark):
    meta = RasterMeta(width=100, height=80, dtype="uint8", block_w=32, block_h=32)
    tiles = synth_raster(spark, meta)
    full = tiles_to_array(tiles, meta)
    assert checksum_df(tiles, meta) == checksum_np(full)


def test_checksum_distributed_float(spark):
    meta = RasterMeta(width=50, height=40, dtype="float32", block_w=16, block_h=16)
    tiles = synth_raster(spark, meta)
    full = tiles_to_array(tiles, meta)
    assert checksum_df(tiles, meta) == checksum_np(full)


def test_checksum_negative_and_nan():
    arr = np.array([[-3.7, np.nan], [np.inf, 2.2]], dtype=np.float64)
    # float→int rule: +0.5 floor clamp; NaN/Inf → INT_MIN; C modulo on negatives
    v = checksum_np(arr)
    assert 0 <= v < 65536


def test_synth_raster_deterministic(spark):
    meta = RasterMeta(width=64, height=48, dtype="uint8", block_w=32, block_h=32)
    a = tiles_to_array(synth_raster(spark, meta), meta)
    b = tiles_to_array(synth_raster(spark, meta), meta)
    assert (a == b).all()
    # matches driver-side oracle
    blk = synth_block_np(0, 0, 32, 32, meta)
    assert (a[:32, :32] == blk).all()


def test_halo_padding_interior_and_edges(spark):
    meta = RasterMeta(width=60, height=40, dtype="uint8", block_w=20, block_h=20)
    tiles = synth_raster(spark, meta)
    full = tiles_to_array(tiles, meta)
    r = 2
    rows = padded_blocks(tiles, meta, r).collect()
    assert len(rows) == meta.blocks_x * meta.blocks_y
    for row in rows:
        pad = np.frombuffer(bytes(row.data), dtype=meta.dtype).reshape(
            row.h + 2 * r, row.w + 2 * r
        )
        y0 = row.block_y * meta.block_h - r
        x0 = row.block_x * meta.block_w - r
        ys = np.clip(np.arange(pad.shape[0]) + y0, 0, meta.height - 1)
        xs = np.clip(np.arange(pad.shape[1]) + x0, 0, meta.width - 1)
        want = full[np.ix_(ys, xs)]
        assert (pad == want).all(), (row.block_x, row.block_y)


@pytest.mark.parametrize("alg", ["near", "bilinear", "cubic", "cubicspline"])
def test_interpolate_at_points_distributed(spark, alg):
    meta = RasterMeta(width=60, height=40, dtype="float32", block_w=20, block_h=20)
    tiles = synth_raster(spark, meta)
    full = tiles_to_array(tiles, meta)
    rng = np.random.default_rng(5)
    px = rng.uniform(-1.0, meta.width + 1.0, 400)
    py = rng.uniform(-1.0, meta.height + 1.0, 400)
    pts = spark.createDataFrame(
        list(zip(range(len(px)), px.tolist(), py.tolist())), "pid LONG, px DOUBLE, py DOUBLE"
    )
    got = (
        interpolate_at_points(tiles, meta, pts, alg=alg)
        .toPandas()
        .set_index("pid")
        .value.to_dict()
    )
    want, valid = interpolate_at_point_np(full, px, py, alg)
    for i in range(len(px)):
        if valid[i]:
            assert i in got, (alg, i)
            assert got[i] == pytest.approx(want[i], rel=1e-12, abs=1e-9), (alg, i)
        else:
            assert i not in got, (alg, i)


@pytest.mark.parametrize("alg", ["near", "average", "min", "max", "rms", "mode"])
def test_downsample2_matches_oracle(spark, alg):
    meta = RasterMeta(width=64, height=48, dtype="uint8", block_w=16, block_h=16)
    tiles = synth_raster(spark, meta)
    full = tiles_to_array(tiles, meta)
    out, out_meta = downsample2(tiles, meta, alg=alg)
    got = tiles_to_array(out, out_meta)
    want = downsample2_np(full, alg)
    assert (got == want).all(), alg


def test_pyramid_two_levels(spark):
    meta = RasterMeta(width=64, height=64, dtype="uint8", block_w=16, block_h=16)
    tiles = synth_raster(spark, meta)
    full = tiles_to_array(tiles, meta)
    l1, m1 = downsample2(tiles, meta, alg="average")
    l2, m2 = downsample2(l1, m1, alg="average")
    got = tiles_to_array(l2, m2)
    want = downsample2_np(downsample2_np(full, "average"), "average")
    assert (got == want).all()
    assert m2.gt[1] == meta.gt[1] * 4


def test_overview_kernel_algs_match_numpy(spark):
    """gauss/cubic/cubicspline/lanczos overview kernels: distributed
    (quad + halo exchange) == single-node convolution, bit-exact."""
    from gdal_spark.raster.model import RasterMeta, synth_raster, tiles_to_array
    from gdal_spark.raster.resample import downsample2, downsample2_np

    meta = RasterMeta(width=96, height=64, dtype="float32", block_w=32, block_h=32)
    tiles = synth_raster(spark, meta)
    import numpy as np
    from gdal_spark.raster.model import synth_block_np

    full = np.zeros((64, 96), dtype="float32")
    for by in range(meta.blocks_y):
        for bx in range(meta.blocks_x):
            h, w = meta.block_shape(bx, by)
            full[by*32:by*32+h, bx*32:bx*32+w] = synth_block_np(bx, by, h, w, meta)
    for alg in ("gauss", "cubic", "cubicspline", "lanczos"):
        lvl1, m1 = downsample2(tiles, meta, alg=alg)
        got = tiles_to_array(lvl1, m1)
        want = downsample2_np(full, alg)
        np.testing.assert_array_equal(got, want, err_msg=alg)


def test_overview_gauss_uint8_rounding(spark):
    import numpy as np
    from gdal_spark.raster.model import RasterMeta, tiles_from_array, tiles_to_array
    from gdal_spark.raster.resample import downsample2, downsample2_np

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    meta = RasterMeta(width=48, height=32, dtype="uint8", block_w=16, block_h=16)
    lvl1, m1 = downsample2(tiles_from_array(spark, arr, meta), meta, alg="gauss")
    got = tiles_to_array(lvl1, m1)
    np.testing.assert_array_equal(got, downsample2_np(arr, "gauss"))
