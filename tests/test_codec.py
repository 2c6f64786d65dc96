import numpy as np
import pytest

from lbf_spark.functions import codec


def test_png_roundtrip_exact():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (8, 8), (16, 9), (32, 32)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(codec.png_decode(codec.png_encode(img)), img)


def test_lossy_psnr_above_gate():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    dec = codec.decode_lossy(codec.encode_lossy(img))
    assert codec.psnr(img, dec) >= 40.0  # BASELINE.json per-row invariant


def test_lossy_deterministic():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert codec.encode_lossy(img) == codec.encode_lossy(img.copy())


def test_psnr_identical_is_inf():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    assert codec.psnr(img, img) == float("inf")


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        codec.decode_image(b"xxxx", "webp")


@pytest.fixture(scope="module")
def img_df(spark):
    """6 tiny images: mixed formats and non-square shapes."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(6):
        h, w = (5 + i, 9 - i)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        fmt = "png" if i % 2 == 0 else "jpeg"
        rows.append((f"im{i}", codec.encode_image(img, fmt), w, h, fmt))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def test_augment_group_laws_and_metadata(spark, img_df):
    from lbf_spark.operators.images import augment_images, pixel_digest

    orig = pixel_digest(img_df).toPandas().set_index("image_id")
    f2 = pixel_digest(
        augment_images(augment_images(img_df, "flip_h"), "flip_h")
    ).toPandas().set_index("image_id")
    assert (f2["pix_md5"] == orig["pix_md5"]).all()
    r = img_df
    for _ in range(4):
        r = augment_images(r, "rot90")
    r4 = pixel_digest(r).toPandas().set_index("image_id")
    assert (r4["pix_md5"] == orig["pix_md5"]).all()
    # one rot90 is NOT identity on these non-symmetric images, and the
    # metadata swaps and matches the decoded shape
    r1 = pixel_digest(augment_images(img_df, "rot90")).toPandas().set_index("image_id")
    assert (r1["pix_md5"] != orig["pix_md5"]).all()
    assert (r1["w"] == orig["h"]).all() and (r1["h"] == orig["w"]).all()
    assert (r1["dec_w"] == r1["w"]).all() and (r1["dec_h"] == r1["h"]).all()


def test_augment_seeded_choice_deterministic(spark, img_df):
    from lbf_spark.operators.images import augment_images, pixel_digest

    kw = dict(ops=["flip_h", "rot90", "identity"], out_op_col="aug_op")
    a = augment_images(img_df, seed=3, **kw)
    b = augment_images(img_df, seed=3, **kw)
    pa = pixel_digest(a).toPandas().set_index("image_id").sort_index()
    pb = pixel_digest(b).toPandas().set_index("image_id").sort_index()
    assert (pa["pix_md5"] == pb["pix_md5"]).all()
    assert (pa["aug_op"] == pb["aug_op"]).all()
    assert pa["aug_op"].nunique() > 1  # the choice actually varies by row
    # a different seed reshuffles at least one row's op
    pc = (
        pixel_digest(augment_images(img_df, seed=4, **kw))
        .toPandas().set_index("image_id").sort_index()
    )
    assert (pc["aug_op"] != pa["aug_op"]).any()


def test_augment_validation_and_nulls(spark, img_df):
    from lbf_spark.operators.images import augment_images

    with pytest.raises(ValueError, match="exactly one"):
        augment_images(img_df, "flip_h", ops=["rot90"])
    with pytest.raises(ValueError, match="unknown augmentation"):
        augment_images(img_df, "zoom")
    from pyspark.sql import functions as F

    withnull = img_df.withColumn(
        "bytes",
        F.when(F.col("image_id") == "im0", None).otherwise(F.col("bytes")),
    )
    got = augment_images(withnull, "flip_v").toPandas()
    assert got.loc[got.image_id == "im0", "bytes"].isna().all()
    assert len(got) == 6


def test_pixel_digest_cross_format_equality(spark):
    """Same pixels, different containers → same digest (the
    encoding-independent dedup primitive)."""
    from lbf_spark.operators.images import pixel_digest

    rng = np.random.default_rng(5)
    img = (rng.integers(0, 64, (6, 7, 3), dtype=np.uint8) * 4).astype(np.uint8)
    # multiples of 4 survive the 6-bit lossy quantization exactly
    lossy_px = codec.decode_lossy(codec.encode_lossy(img))
    df = spark.createDataFrame(
        [
            ("a", codec.encode_image(lossy_px, "png"), 7, 6, "png"),
            ("b", codec.encode_image(lossy_px, "jpeg"), 7, 6, "jpeg"),
        ],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    got = pixel_digest(df).toPandas()
    assert got["pix_md5"].nunique() == 1
