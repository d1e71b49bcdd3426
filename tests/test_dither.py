"""Floyd–Steinberg dither (GDALDitherRGB2PCT, alg/gdaldither.cpp):
scanline oracle vs vectorized sweep vs distributed wavefront, plus
warp cutline masking (gdalwarp -cutline)."""

import numpy as np
import pytest

from gdal_spark.raster.dither import (
    _dither_sweep,
    build_colormap,
    dither_rgb2pct,
    dither_rgb2pct_np,
    find_nearest_color_np,
)
from gdal_spark.raster.model import RasterMeta, tiles_from_array


def _rand_rgb(rng, H, W):
    return tuple(rng.integers(0, 256, (H, W)).astype(np.uint8) for _ in range(3))


def test_nearest_color_l1_first_wins():
    pct = np.array([[10, 10, 10], [20, 20, 20], [10, 10, 10]])
    # equidistant between idx 0 and 1 → L1 argmin picks lowest index
    assert find_nearest_color_np(pct, [15], [15], [15])[0] == 0
    assert find_nearest_color_np(pct, [19], [20], [20])[0] == 1


def test_colormap_representatives():
    pct = np.array([[0, 0, 0], [255, 255, 255]])
    cmap = build_colormap(pct, 32)
    assert cmap[0] == 0  # (0,0,0)
    assert cmap[31 + 31 * 32 + 31 * 32 * 32] == 1  # (255,255,255)


def test_sweep_matches_scanline_oracle():
    rng = np.random.default_rng(3)
    H, W = 29, 41
    r, g, b = _rand_rgb(rng, H, W)
    pct = rng.integers(0, 256, (11, 3)).astype(np.int64)
    oracle = dither_rgb2pct_np(r, g, b, pct)
    # one whole-raster skewed block: independent check of the u-column
    # vectorization against the per-pixel loop
    buw = (W - 1) + 2 * (H - 1) + 1
    ys = np.arange(H)
    xs = np.arange(buw)[None, :] - 2 * ys[:, None]
    valid = (xs >= 0) & (xs < W)
    raw = np.zeros((H, buw, 3), dtype=np.int64)
    ri, ci = np.nonzero(valid)
    for ch, band in enumerate((r, g, b)):
        raw[ri, ci, ch] = band[ri, xs[ri, ci]]
    out, _, _ = _dither_sweep(
        raw, valid, np.zeros((H, buw + 3, 3), np.int64),
        np.zeros((H, 3), np.int64), pct, build_colormap(pct), 32,
    )
    got = np.zeros((H, W), np.uint8)
    got[ri, xs[ri, ci]] = out[ri, ci]
    assert np.array_equal(got, oracle)


@pytest.mark.parametrize("H,W,bh,bw,bu", [(48, 64, 16, 24, 40), (37, 53, 10, 17, 23)])
def test_distributed_dither_exact(spark, H, W, bh, bw, bu):
    rng = np.random.default_rng(11)
    meta = RasterMeta(width=W, height=H, dtype="uint8", block_w=bw, block_h=bh)
    r, g, b = _rand_rgb(rng, H, W)
    pct = rng.integers(0, 256, (17, 3)).astype(np.int64)
    tiles = (
        tiles_from_array(spark, r, meta, band=1)
        .unionByName(tiles_from_array(spark, g, meta, band=2))
        .unionByName(tiles_from_array(spark, b, meta, band=3))
    )
    oracle = dither_rgb2pct_np(r, g, b, pct)
    got = np.full((H, W), 255, np.uint8)
    for row in dither_rgb2pct(tiles, meta, pct, block_u=bu).collect():
        a = np.frombuffer(row.data, dtype=np.uint8).reshape(row.h, row.w)
        got[row.block_y * bh : row.block_y * bh + row.h,
            row.block_x * bw : row.block_x * bw + row.w] = a
    assert np.array_equal(got, oracle)


def test_warp_cutline_distributed_matches_oracle(spark):
    from gdal_spark.geometry.wkb import polygon_wkb
    from gdal_spark.raster.model import synth_block_np, synth_raster
    from gdal_spark.raster.warp import warp_affine, warp_affine_np

    src_meta = RasterMeta(width=120, height=90, dtype="float64", block_w=32,
                          block_h=25, gt=(1000.0, 10.0, 0.0, 5000.0, 0.0, -10.0))
    dst_meta = RasterMeta(width=80, height=60, dtype="float64", block_w=32,
                          block_h=25, gt=(980.0, 14.0, 0.0, 5020.0, 0.0, -14.0))
    cut = polygon_wkb(
        [(1100, 4950), (1900, 4950), (1900, 4400), (1500, 4700),
         (1100, 4300), (1100, 4950)],
        holes=[[(1300, 4850), (1450, 4850), (1450, 4750), (1300, 4750),
                (1300, 4850)]],
    )
    full = np.zeros((src_meta.height, src_meta.width))
    for by in range(src_meta.blocks_y):
        for bx in range(src_meta.blocks_x):
            h, w = src_meta.block_shape(bx, by)
            full[by * 25 : by * 25 + h, bx * 32 : bx * 32 + w] = synth_block_np(
                bx, by, h, w, src_meta, 42
            )
    for alg in ("near", "average"):
        oracle = warp_affine_np(full, src_meta, dst_meta, alg=alg, init=-1.0,
                                cutline=cut)
        got = np.full((dst_meta.height, dst_meta.width), np.nan)
        out = warp_affine(synth_raster(spark, src_meta), src_meta, dst_meta,
                          alg=alg, init=-1.0, cutline=cut)
        for r_ in out.collect():
            a = np.frombuffer(r_.data, dtype="float64").reshape(r_.h, r_.w)
            got[r_.block_y * 25 : r_.block_y * 25 + r_.h,
                r_.block_x * 32 : r_.block_x * 32 + r_.w] = a
        assert np.array_equal(got, oracle)
        n_masked = int((oracle == -1.0).sum())
        assert 0 < n_masked < oracle.size
