"""Warp vs the reference's own golden outputs:

- identity warp of byte.tif → checksum 4672 (test_gdalwarp_lib.py:36)
- 2× nearest upsample → checksum 18784 (test_gdalwarp_lib.py:217)
- bilinear/cubic/cubicspline/lanczos 2× upsample → max |diff| ≤ 1 vs
  autotest/utilities/ref_data/testgdalwarp11-14.tif (the reference's own
  acceptance criterion, test_gdalwarp_lib.py:225-330)
"""
import struct

import numpy as np
import pytest

from gdal_spark.raster.checksum import checksum_np
from gdal_spark.raster.model import RasterMeta, byte_fixture, tiles_from_array, tiles_to_array
from gdal_spark.raster.warp import warp_affine, warp_affine_np

REF = "/root/reference/autotest/utilities/ref_data"


def _read_tiff_gray(path):
    d = open(path, "rb").read()
    bo = "<" if d[:2] == b"II" else ">"
    off = struct.unpack(bo + "I", d[4:8])[0]
    n = struct.unpack(bo + "H", d[off : off + 2])[0]
    tags = {}
    for i in range(n):
        e = d[off + 2 + 12 * i : off + 2 + 12 * i + 12]
        tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
        val = struct.unpack(bo + "I", e[8:12])[0]
        tags[tag] = (typ, cnt, val)
    w, h = tags[256][2], tags[257][2]
    assert tags.get(259, (0, 0, 1))[2] == 1, "compressed tiff"

    def arr_of(tag):
        typ, cnt, val = tags[tag]
        if cnt == 1:
            return [val]
        sz = 4 if typ == 4 else 2
        f = "I" if typ == 4 else "H"
        return [
            struct.unpack(bo + f, d[val + i * sz : val + i * sz + sz])[0]
            for i in range(cnt)
        ]

    raw = b"".join(d[o : o + l] for o, l in zip(arr_of(273), arr_of(279)))
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w)


def _dst40():
    return RasterMeta(width=40, height=40, dtype="float64", block_w=40, block_h=40,
                      gt=(440720.0, 30.0, 0.0, 3751320.0, 0.0, -30.0))


def _to_byte(a):
    return np.clip(np.floor(a + 0.5), 0, 255).astype(np.uint8)


def test_identity_warp_checksum_4672():
    arr, meta = byte_fixture()
    out = warp_affine_np(arr, meta, RasterMeta(
        width=20, height=20, dtype="float64", block_w=20, block_h=20, gt=meta.gt
    ), alg="near")
    assert checksum_np(_to_byte(out)) == 4672


def test_near_2x_checksum_18784():
    """test_gdalwarp_lib.py:203-217 golden."""
    arr, meta = byte_fixture()
    out = warp_affine_np(arr, meta, _dst40(), alg="near")
    assert checksum_np(_to_byte(out)) == 18784


@pytest.mark.parametrize(
    "alg,ref",
    [
        ("bilinear", "testgdalwarp11.tif"),
        ("cubic", "testgdalwarp12.tif"),
        ("cubicspline", "testgdalwarp13.tif"),
        ("lanczos", "testgdalwarp14.tif"),
    ],
)
def test_kernel_2x_vs_reference_raster(alg, ref):
    arr, meta = byte_fixture()
    out = _to_byte(warp_affine_np(arr, meta, _dst40(), alg=alg))
    want = _read_tiff_gray(f"{REF}/{ref}")
    maxdiff = np.abs(out.astype(int) - want.astype(int)).max()
    assert maxdiff <= 1, (alg, maxdiff)  # the reference's own tolerance


def test_distributed_warp_matches_goldens(spark):
    """The distributed path reproduces the same goldens (multi-block
    source so the gather join actually runs)."""
    arr, meta = byte_fixture()
    meta_blocked = RasterMeta(width=20, height=20, dtype="uint8", block_w=8, block_h=8,
                              gt=meta.gt)
    tiles = tiles_from_array(spark, arr, meta_blocked)
    out = tiles_to_array(
        warp_affine(tiles, meta_blocked, _dst40(), alg="near"), _dst40()
    )
    assert checksum_np(_to_byte(out)) == 18784
    out2 = tiles_to_array(
        warp_affine(tiles, meta_blocked, _dst40(), alg="lanczos"), _dst40()
    )
    want = _read_tiff_gray(f"{REF}/testgdalwarp14.tif")
    assert np.abs(_to_byte(out2).astype(int) - want.astype(int)).max() <= 1


# ---------------------------------------------------------------------------
# reducing resamplers (GWKAverageOrMode family)
# ---------------------------------------------------------------------------

def _terrain():
    from gdal_spark.raster.model import RasterMeta, synth_block_np

    meta = RasterMeta(width=96, height=64, dtype="float32", block_w=32, block_h=32,
                      gt=(1000.0, 10.0, 0.0, 5000.0, 0.0, -10.0))
    full = np.zeros((64, 96), dtype="float32")
    for by in range(meta.blocks_y):
        for bx in range(meta.blocks_x):
            h, w = meta.block_shape(bx, by)
            full[by * 32 : by * 32 + h, bx * 32 : bx * 32 + w] = synth_block_np(bx, by, h, w, meta)
    return full, meta


@pytest.mark.parametrize("alg", ["average", "rms", "sum", "min", "max", "mode", "med", "q1", "q3"])
def test_warp_reduce_distributed_matches_numpy(spark, alg):
    from gdal_spark.raster.model import RasterMeta, tiles_from_array, tiles_to_array
    from gdal_spark.raster.warp import warp_affine, warp_affine_np

    full, src_meta = _terrain()
    # 3x downscale, slightly offset grid → fractional footprint weights
    dst_meta = RasterMeta(width=30, height=20, dtype="float64", block_w=10, block_h=10,
                          gt=(995.0, 32.0, 0.0, 5005.0, 0.0, -32.0))
    got = tiles_to_array(
        warp_affine(tiles_from_array(spark, full, src_meta), src_meta, dst_meta,
                    alg=alg, init=-1.0),
        dst_meta,
    )
    want = warp_affine_np(full, src_meta, dst_meta, alg=alg, init=-1.0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("dst_size", [(1, 1), (10, 10), (7, 13)])
def test_warp_sum_preserving(spark, dst_size):
    """-r sum preserves the total (test_gdalwarp_lib.py:3495 property):
    footprint weights must tile the source exactly."""
    from gdal_spark.raster.model import RasterMeta, byte_fixture
    from gdal_spark.raster.warp import warp_affine_np

    arr, meta = byte_fixture()
    w, h = dst_size
    # same geographic extent, different resolution
    sx = meta.gt[1] * meta.width / w
    sy = meta.gt[5] * meta.height / h
    dst = RasterMeta(width=w, height=h, dtype="float64", block_w=w, block_h=h,
                     gt=(meta.gt[0], sx, 0.0, meta.gt[3], 0.0, sy))
    out = warp_affine_np(arr.astype(np.float64), meta, dst, alg="sum", init=0.0)
    assert abs(out.sum() - float(arr.sum())) < 1e-6 * arr.sum()
