"""Hypothesis property tests for the pure kernels (no Spark session —
fast, wide input coverage). Mirrors the reference's correctness contracts
rather than its (minimal) property testing."""
import numpy as np
from hypothesis import given, settings, strategies as st

from gdal_spark import tiling
from gdal_spark.geometry import kernels, wkb, wkt
from gdal_spark.raster.checksum import checksum_np

finite = st.floats(
    min_value=-1e7, max_value=1e7, allow_nan=False, allow_infinity=False
)


@given(st.lists(st.tuples(finite, finite), min_size=3, max_size=12))
@settings(max_examples=200, deadline=None)
def test_wkb_polygon_roundtrip_property(pts):
    ring = np.asarray(pts, dtype=np.float64)
    b = wkb.polygon_wkb(ring)
    name, rings = wkb.parse_wkb(b)
    assert name == "Polygon"
    assert np.array_equal(rings[0][:-1], ring) or np.array_equal(rings[0], ring)


@given(st.lists(st.tuples(finite, finite), min_size=2, max_size=10))
@settings(max_examples=200, deadline=None)
def test_wkt_roundtrip_property(pts):
    coords = np.asarray(pts, dtype=np.float64)
    s = wkt.geom_to_wkt("LineString", coords)
    name, back = wkt.parse_wkt(s)
    assert name == "LineString"
    np.testing.assert_allclose(back, coords, rtol=1e-14)


@given(
    st.floats(min_value=-179.99, max_value=179.99),
    st.floats(min_value=-83.9, max_value=83.9),
    st.integers(min_value=0, max_value=20),
)
@settings(max_examples=300, deadline=None)
def test_tile_indices_in_range(lon, lat, z):
    tx, ty = tiling.lonlat_to_tile_np([lon], [lat], z)
    assert 0 <= tx[0] < (1 << z)
    assert 0 <= ty[0] < (1 << z)
    # tms flip is an involution
    assert tiling.tms_y(tiling.tms_y(ty[0], z), z) == ty[0]


@given(
    st.floats(min_value=-170, max_value=170),
    st.floats(min_value=-80, max_value=80),
    st.floats(min_value=0.1, max_value=20.0),
)
@settings(max_examples=200, deadline=None)
def test_point_in_own_square(cx, cy, half):
    ring = np.array(
        [
            [cx - half, cy - half], [cx + half, cy - half],
            [cx + half, cy + half], [cx - half, cy + half], [cx - half, cy - half],
        ]
    )
    assert kernels.points_in_ring_np([cx], [cy], ring)[0]
    assert not kernels.points_in_ring_np([cx + 3 * half], [cy], ring)[0]
    assert kernels.ring_area(ring) == (2 * half) * (2 * half) or np.isclose(
        kernels.ring_area(ring), 4 * half * half, rtol=1e-9
    )


@given(st.integers(min_value=1, max_value=40), st.integers(min_value=1, max_value=40),
       st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_checksum_partials_sum_to_whole(h, w, seed):
    """Block partials with globally-phased primes must reassemble to the
    whole-image checksum for ANY split point."""
    from gdal_spark.raster.checksum import block_partial
    from gdal_spark.raster.model import RasterMeta

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
    meta = RasterMeta(width=w, height=h, dtype="uint8",
                      block_w=max(1, w // 2), block_h=max(1, h // 2))
    total = 0
    for by in range(meta.blocks_y):
        for bx in range(meta.blocks_x):
            bh, bw = meta.block_shape(bx, by)
            blk = arr[by * meta.block_h : by * meta.block_h + bh,
                      bx * meta.block_w : bx * meta.block_w + bw]
            total += block_partial(blk, bx, by, meta)
    assert total % 65536 == checksum_np(arr)


@given(st.lists(st.tuples(finite, finite), min_size=4, max_size=20),
       st.floats(min_value=0.0, max_value=100.0))
@settings(max_examples=100, deadline=None)
def test_simplify_keeps_endpoints_and_subset(pts, tol):
    from gdal_spark.geometry import ops

    line = np.asarray(pts, dtype=np.float64)
    out = ops.simplify_ring(line, tol)
    assert np.array_equal(out[0], line[0])
    assert np.array_equal(out[-1], line[-1])
    # every output vertex is an input vertex
    in_set = {tuple(p) for p in line}
    assert all(tuple(p) in in_set for p in out)


# coordinates bounded so k = ceil(len/max_len) stays small: at the
# `finite` ±1e7 range a 0.5 max_len inserts ~5e7 vertices PER SEGMENT
# (hours of linspace + 8 GB — this test hung two full-suite runs)
small = st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False)


@given(st.lists(st.tuples(small, small), min_size=2, max_size=10),
       st.floats(min_value=0.5, max_value=1000.0))
@settings(max_examples=100, deadline=None)
def test_segmentize_respects_max_len(pts, max_len):
    from gdal_spark.geometry import ops

    line = np.asarray(pts, dtype=np.float64)
    out = ops.segmentize_line(line, max_len)
    if len(out) > 1:
        seg = np.sqrt(((out[1:] - out[:-1]) ** 2).sum(axis=1))
        # scale-aware slack: interpolated vertices carry O(eps * |coord|)
        # rounding, which can exceed a purely relative bound when the
        # coordinates dwarf max_len
        atol = 1e-9 * (1.0 + np.abs(line).max())
        assert (seg <= max_len + atol).all()
    assert np.array_equal(out[0], line[0]) and np.array_equal(out[-1], line[-1])


def test_segmentize_scale_slack_large_coords():
    """Deterministic stand-in for the former huge-coordinate draws: the
    interpolated-vertex rounding slack at |coord| ~ 1e7 with a
    proportionate max_len."""
    from gdal_spark.geometry import ops

    line = np.array([[-1e7, -1e7], [1e7, 1e7]])
    out = ops.segmentize_line(line, 1e5)
    seg = np.sqrt(((out[1:] - out[:-1]) ** 2).sum(axis=1))
    assert (seg <= 1e5 + 1e-9 * 1e7).all()
    assert np.array_equal(out[0], line[0]) and np.array_equal(out[-1], line[-1])


# -- round-4 codec properties (pure driver-side, no Spark) --------------------


@given(st.binary(min_size=0, max_size=4000))
@settings(max_examples=200, deadline=None)
def test_packbits_roundtrip_property(data):
    from gdal_spark.sources.geotiff import packbits_decode, packbits_encode

    assert packbits_decode(packbits_encode(data), len(data)) == data


@given(
    st.sampled_from(["uint8", "int16", "uint16", "int32", "float32", "float64"]),
    st.integers(min_value=1, max_value=37),
    st.integers(min_value=1, max_value=23),
    st.integers(min_value=1, max_value=11),
    st.booleans(),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_tiff_write_read_roundtrip_property(dtype, w, h, rps, deflate, seed):
    """write_geotiff → header parse → serial chunk decode is
    byte-identical for any shape/dtype/strip-size/compression combo."""
    import os
    import tempfile

    import numpy as np

    from gdal_spark.raster.model import RasterMeta
    from gdal_spark.sources.geotiff import decode_chunk, read_tiff_header, write_geotiff

    rng = np.random.default_rng(seed)
    if dtype.startswith("float"):
        arr = rng.standard_normal((h, w)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, info.max, size=(h, w), dtype=dtype)
    meta = RasterMeta(width=w, height=h, dtype=dtype, block_w=w, block_h=rps,
                      gt=(10.0, 0.5, 0.0, 20.0, 0.0, -0.25))

    class _FakeDF:  # write_geotiff only needs limit().collect()
        def limit(self, n):
            return self

        def collect(self):
            rows = []
            for by in range((h + rps - 1) // rps):
                hh = min(rps, h - by * rps)
                blk = arr[by * rps : by * rps + hh]

                class R:
                    pass

                r = R()
                r.band, r.block_y, r.block_x = 1, by, 0
                r.h, r.w, r.data = hh, w, blk.tobytes()
                rows.append(r)
            return rows

    p = os.path.join(tempfile.mkdtemp(), "prop.tif")
    write_geotiff(_FakeDF(), meta, p, compress="deflate" if deflate else None)
    info = read_tiff_header(p)
    assert (info.width, info.height, info.dtype) == (w, h, dtype)
    assert info.gt == meta.gt
    out = np.zeros((h, w), dtype=dtype)
    with open(p, "rb") as f:
        for _b, bx, by, off, size in info.chunks:
            rows_disk = min(info.block_h, h - by * info.block_h)
            f.seek(off)
            a = decode_chunk(f.read(size), info, rows_disk, info.block_w)
            out[by * info.block_h : by * info.block_h + rows_disk] = a[:, :, 0]
    assert np.array_equal(out, arr, equal_nan=True)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-180_000, max_value=180_000),
            st.integers(min_value=-84_000, max_value=84_000),
        ),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    st.integers(min_value=1, max_value=9),
)
@settings(max_examples=50, deadline=None)
def test_osm_pbf_roundtrip_property(coords, block_nodes):
    """write_osm_pbf → blob scan → serial decode reproduces ids, the
    1e-3-degree quantized coords, and tags for any node set."""
    import os
    import tempfile

    from gdal_spark.sources.osm import (
        _decode_block,
        _inflate_blob,
        scan_blob_index,
        write_osm_pbf,
    )

    nodes = [
        (1000 + i, x / 1000.0, y / 1000.0, {"i": str(i)} if i % 2 else {})
        for i, (x, y) in enumerate(coords)
    ]
    p = os.path.join(tempfile.mkdtemp(), "prop.osm.pbf")
    write_osm_pbf(p, nodes, block_nodes=block_nodes)
    got = []
    with open(p, "rb") as f:
        for btype, off, size in scan_blob_index(p):
            if btype != "OSMData":
                continue
            f.seek(off)
            got += _decode_block(_inflate_blob(f.read(size)))
    got.sort(key=lambda r: r[1])
    assert len(got) == len(nodes)
    for (nid, lon, lat, tags), r in zip(nodes, got):
        assert r[0] == "node" and r[1] == nid
        assert round(r[2] * 1e7) == round(lon * 1e9) // 100
        assert round(r[3] * 1e7) == round(lat * 1e9) // 100
        assert (r[6] or {}) == tags
