"""Multimodal plumbing tests — real Spark plumbing, fake deterministic
codec (no image libs in this environment; see functions/multimodal.py)."""

import numpy as np
import pytest
from pyspark.sql import Row

from gdal_spark.functions import multimodal as MM


def _img(h, w, seed):
    rng = np.arange(h * w * 3, dtype=np.int64)
    arr = ((rng * 31 + seed) % 251).astype(np.uint8).reshape(h, w, 3)
    return arr


def _media(spark):
    rows = []
    for i, (h, w) in enumerate([(32, 48), (64, 64), (16, 24)]):
        rows.append(Row(media_id=str(i), data=bytearray(MM.fake_image_encode(_img(h, w, i)))))
    return spark.createDataFrame(rows)


def test_attach_media_meta(spark):
    df = spark.createDataFrame(
        [Row(media_ref="media://000000005"), Row(media_ref="media://000000007")]
    )
    got = MM.attach_media_meta(df).collect()
    assert got[0]["media_id"] == "000000005"
    assert got[0]["modality"] in ("image", "audio", "video")
    assert got[1]["modality"] != got[0]["modality"]  # 5%3 != 7%3


def test_decode_images(spark):
    got = MM.decode_images(_media(spark), decoder=MM.fake_image_decoder).toPandas()
    got = got.sort_values("media_id").reset_index(drop=True)
    assert list(got["height"]) == [32, 64, 16]
    assert list(got["width"]) == [48, 64, 24]
    assert list(got["channels"]) == [3, 3, 3]
    arr = np.frombuffer(got.loc[0, "pixels"], dtype=np.uint8).reshape(32, 48, 3)
    assert np.array_equal(arr, _img(32, 48, 0))


def test_default_decoder_is_explicit_stub(spark):
    with pytest.raises(Exception) as ei:
        MM.decode_images(_media(spark)).collect()
    assert "NotImplementedError" in str(ei.value) or "no image codec" in str(ei.value)


def test_thumbnail_box_filter(spark):
    got = MM.thumbnail(_media(spark), factor=4, decoder=MM.fake_image_decoder).toPandas()
    got = got.sort_values("media_id").reset_index(drop=True)
    assert (got["height"].tolist(), got["width"].tolist()) == ([8, 16, 4], [12, 16, 6])
    th = MM.fake_image_decoder(got.loc[0, "thumb"])
    src = _img(32, 48, 0).astype(np.float64)
    exp = src.reshape(8, 4, 12, 4, 3).mean(axis=(1, 3))
    exp = np.clip(np.floor(exp + 0.5), 0, 255).astype(np.uint8)
    assert np.array_equal(th, exp)


def test_sample_frames(spark):
    frames = [_img(8, 8, i) for i in range(25)]

    def fake_video_decoder(data):
        return frames

    df = spark.createDataFrame([Row(media_id="v0", data=bytearray(b"\x00"))])
    got = MM.sample_frames(df, every=10, frame_decoder=fake_video_decoder).toPandas()
    assert got["frame_no"].tolist() == [0, 10, 20]
    f10 = np.frombuffer(got.iloc[1]["pixels"], dtype=np.uint8).reshape(8, 8, 3)
    assert np.array_equal(f10, frames[10])
