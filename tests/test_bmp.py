"""BMP codec (frmts/bmp/bmpdataset.cpp surface): lossless roundtrips."""
import numpy as np
import pytest

from gdal_spark.sources.bmp import decode_bmp, encode_bmp


def test_bmp_gray_roundtrip_padding():
    rng = np.random.default_rng(3)
    for shape in [(13, 21), (1, 1), (4, 4), (7, 3)]:
        g = rng.integers(0, 256, shape, dtype=np.uint8)
        bands, info = decode_bmp(encode_bmp({1: g}))
        assert np.array_equal(bands[1], g)
        assert (info["height"], info["width"]) == shape and info["bpp"] == 8


def test_bmp_rgb_and_palette():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    bands, info = decode_bmp(
        encode_bmp({1: img[:, :, 0], 2: img[:, :, 1], 3: img[:, :, 2]})
    )
    assert np.array_equal(np.stack([bands[1], bands[2], bands[3]], -1), img)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    g = rng.integers(0, 256, (6, 6), dtype=np.uint8)
    b8, i8 = decode_bmp(encode_bmp({1: g}, palette=pal))
    assert np.array_equal(i8["palette"], pal) and np.array_equal(b8[1], g)


def test_bmp_rejects():
    with pytest.raises(ValueError):
        decode_bmp(b"PX" + b"\x00" * 60)
    with pytest.raises(ValueError):
        encode_bmp({1: np.zeros((2, 2), np.uint8), 4: np.zeros((2, 2), np.uint8)})
    # 16-bpp header -> NotImplementedError
    data = bytearray(encode_bmp({1: np.zeros((2, 2), np.uint8)}))
    data[28] = 16
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(data))


def test_bmp_real_decode_multimodal(spark):
    from gdal_spark.multimodal import image_features, synth_bmp_media

    feats = {
        r.media_id: r
        for r in image_features(synth_bmp_media(spark, 6), decode="real").collect()
    }
    for mid in range(6):
        rng = np.random.default_rng(mid + 1)
        w, h = 16 + (mid * 5) % 31, 16 + (mid * 11) % 17
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert feats[mid].mean_e6 == int(np.floor(img.mean() * 1e6 + 0.5))


def test_mixed_codec_real_decode(spark):
    """One media table, three payload formats — decode='real' dispatches
    by magic bytes per row inside the same Arrow batch. PNG/BMP rows are
    lossless (exact means); the JPEG rows are the exact-by-construction
    block-constant q100 payloads."""
    from pyspark.sql import functions as F

    from gdal_spark.multimodal import (
        image_features, synth_bmp_media, synth_jpeg_media, synth_png_media,
    )

    mixed = (
        synth_png_media(spark, 3)
        .unionByName(
            synth_jpeg_media(spark, 3)
            .withColumn("media_id", F.col("media_id") + 100)
        )
        .unionByName(
            synth_bmp_media(spark, 3)
            .withColumn("media_id", F.col("media_id") + 200)
        )
        .coalesce(1)  # force all three formats into the same Arrow batch
    )
    feats = {r.media_id: r for r in
             image_features(mixed, decode="real").collect()}
    assert set(feats) == {0, 1, 2, 100, 101, 102, 200, 201, 202}
    for base, maker in ((0, "png"), (200, "bmp")):
        for mid in range(3):
            rng = np.random.default_rng(mid + 1)
            if maker == "png":
                w, h = 32 + mid % 29, 32 + (mid * 7) % 23
                img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            else:
                w, h = 16 + (mid * 5) % 31, 16 + (mid * 11) % 17
                img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert feats[base + mid].mean_e6 == int(
                np.floor(img.mean() * 1e6 + 0.5)
            )
    for mid in range(3):  # jpeg block-constant exact
        rng = np.random.default_rng(mid + 1)
        bw, bh = 2 + mid % 5, 2 + (mid * 3) % 4
        vals = rng.integers(0, 256, (bh, bw), dtype=np.uint8)
        img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        assert feats[100 + mid].mean_e6 == int(np.floor(img.mean() * 1e6 + 0.5))
