"""Unit tests: UDF surface kernels and multimodal binary plumbing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hbase_observer_elasticsearch_spark.operators.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    decode_image,
    extract_audio_features,
    media_table,
    multimodal_frame_sample,
)
from hbase_observer_elasticsearch_spark.operators.udf_surface import (
    _quality_millis,
)


def test_pandas_udf_quality_millis(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "x y z"), (3, "w")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["q"]
        for r in df.select("doc_id", _quality_millis("text").alias("q")).collect()
    }
    assert got == {1: 666, 2: 1000, 3: 1000}  # 2*1000//3, 3*1000//3, 1*1000//1


def test_media_table_payload_is_binary(spark, sf_dir):
    m = media_table(spark, sf_dir)
    assert dict(m.dtypes)["payload"] == "binary"
    row = m.orderBy("doc_id").first()
    assert isinstance(row["payload"], bytearray | bytes)
    assert row["meta"]["byte_len"] == len(row["payload"])  # ASCII fixture


def test_frame_sample_matches_python(spark, sf_dir):
    rows = (
        multimodal_frame_sample(spark, sf_dir)
        .filter(F.col("doc_id") == 0)
        .orderBy("frame_idx")
        .collect()
    )
    payload = bytes(
        media_table(spark, sf_dir).filter("doc_id = 0").first()["payload"]
    )
    n = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
    expect = [
        (i, hashlib.md5(payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]).hexdigest())
        for i in range(0, n, FRAME_STRIDE)
    ]
    assert [(r["frame_idx"], r["frame_md5"]) for r in rows] == expect


def test_codec_stubs_raise():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        extract_audio_features(b"RIFF")
