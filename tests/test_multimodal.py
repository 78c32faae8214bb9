"""Multimodal binary-column plumbing (decode stubbed, Spark contract real)."""

import pytest

from recordlinkage_spark import multimodal


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"0123456789abcdef" * 8),
        (2, "image", b"zyxw" * 40),
        (3, "audio", None),
    ]
    return spark.createDataFrame(rows, "doc_id long, kind string, payload binary")


def test_extract_features_schema_and_shape(media):
    out = multimodal.extract_features(media)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert len(rows[1]["feature"]) == 16
    assert rows[1]["width"] == 4 and rows[1]["height"] == 4
    # deterministic fake decode
    again = {r["doc_id"]: r for r in multimodal.extract_features(media).collect()}
    assert again[1]["feature"] == rows[1]["feature"]


def test_resize_stub_raises_on_execution(media):
    plan = multimodal.resize_stub(media, 64, 64)  # lazy: plan builds fine
    assert plan.schema == media.schema
    with pytest.raises(Exception, match="NotImplementedError|image resize"):
        plan.collect()


def test_frame_sample(media):
    out = multimodal.frame_sample(media, every_n=1)
    rows = [r for r in out.collect() if r["doc_id"] == 1]
    assert len(rows) == 2  # 128 bytes -> 2 chunks of 64
    assert rows[0]["frame_no"] == 0


def test_media_meta(media):
    out = multimodal.with_media_meta(media)
    r = {x["doc_id"]: x for x in out.collect()}
    assert r[1]["n_bytes"] == 128
    assert len(r[1]["payload_md5"]) == 32
