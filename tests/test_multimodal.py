"""Multimodal plumbing — binary columns, typed metadata, decode /
resize / frame-sample / embed stages over the deterministic FAKE1 codec
(real codecs are absent in this container; the NotImplementedError stubs
are asserted too)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomsearch_spark.functions.multimodal import (
    decode_images,
    embed_media,
    fake_image_bytes,
    fake_mean_luma,
    fake_video_bytes,
    resize_images,
    sample_frames,
    with_media_metadata,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (i, fake_image_bytes(width=(i % 64) + 1, height=(i % 32) + 1, seed=i))
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "id int, img binary")


def test_metadata_from_magic_bytes(spark, media_df):
    out = with_media_metadata(media_df, "img").toPandas()
    assert (out["media_format"] == "fake1").all()
    assert (out["media_size_bytes"] == 16).all()
    # foreign magic numbers classify without decoding
    other = spark.createDataFrame(
        [(1, b"\x89PNG\r\n\x1a\n--"), (2, b"\xff\xd8\xff\xe0xx"), (3, b"\x00\x00\x00\x00")],
        "id int, img binary",
    )
    fmts = dict(
        with_media_metadata(other, "img").select("id", "media_format").collect()
    )
    assert fmts == {1: "png", 2: "jpeg", 3: "unknown"}


def test_decode_images_fake_codec(spark, media_df):
    out = decode_images(media_df, "img", keep=["id"]).toPandas().sort_values("id")
    assert (out["width"] == (out["id"] % 64) + 1).all()
    assert (out["height"] == (out["id"] % 32) + 1).all()
    assert (out["channels"] == 1).all()
    assert (out["mean_luma"] == fake_mean_luma(out["id"].to_numpy())).all()


def test_decode_unknown_format_raises_stub(spark):
    df = spark.createDataFrame([(1, b"\x89PNG\r\n\x1a\nxxxx")], "id int, img binary")
    with pytest.raises(Exception, match="Pillow"):
        decode_images(df, "img", keep=["id"]).collect()


def test_resize_rewrites_header(spark, media_df):
    out = resize_images(media_df, "img", keep=["id"], width=8, height=8)
    dec = decode_images(out, "resized", keep=["id"]).toPandas()
    assert (dec["width"] == 8).all() and (dec["height"] == 8).all()
    # seed (and thus content identity) survives the resize
    assert (dec["mean_luma"] == fake_mean_luma(dec["id"].to_numpy())).all()


def test_sample_frames_explodes(spark):
    rows = [(i, fake_video_bytes(n_frames=10, width=4, height=4, seed=i * 100)) for i in range(20)]
    df = spark.createDataFrame(rows, "id int, vid binary")
    frames = sample_frames(df, "vid", keep=["id"], every_n=2).toPandas()
    assert len(frames) == 20 * 5  # every 2nd of 10 frames
    assert sorted(frames["frame_idx"].unique()) == [0, 2, 4, 6, 8]
    # each sampled frame is itself a decodable FAKE1 image with seed+idx
    fdf = spark.createDataFrame(frames[["id", "frame_idx", "frame"]])
    dec = decode_images(fdf, "frame", keep=["id", "frame_idx"]).toPandas()
    expect = fake_mean_luma((dec["id"] * 100 + dec["frame_idx"]).to_numpy())
    assert (dec["mean_luma"] == expect).all()


def test_embed_media_deterministic(spark, media_df):
    e1 = embed_media(media_df, "img", keep=["id"], dim=16).toPandas().sort_values("id")
    e2 = embed_media(media_df, "img", keep=["id"], dim=16).toPandas().sort_values("id")
    import numpy as np

    assert all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(e1["embedding"], e2["embedding"])
    )
    assert all(len(v) == 16 for v in e1["embedding"])
    import numpy as np

    flat = np.concatenate([np.asarray(v) for v in e1["embedding"]])
    assert flat.min() >= -1.0 and flat.max() <= 1.0 and flat.std() > 0.3
