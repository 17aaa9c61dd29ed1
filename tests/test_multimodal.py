"""Multimodal binary-column plumbing: metadata, deterministic fake
feature extraction (stub for real decoders), payload-aware partitioning."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from timeseriesflattener_spark.operators.multimodal import (
    binary_metadata,
    decode_image,
    extract_features,
    fake_feature_extract,
    with_binary_partitioning,
)


@pytest.fixture(scope="module")
def payloads(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    return docs.select("doc_id", F.col("text").cast("binary").alias("payload")).cache()


def test_binary_metadata(spark, payloads):
    rows = {r["doc_id"]: r for r in binary_metadata(payloads).collect()}
    orig = {r["doc_id"]: bytes(r["payload"]) for r in payloads.collect()}
    assert rows.keys() == orig.keys()
    for doc_id, payload in orig.items():
        assert rows[doc_id]["n_bytes"] == len(payload)
        assert rows[doc_id]["sha256_hex"] == hashlib.sha256(payload).hexdigest()


def test_extract_features_deterministic(spark, payloads):
    a = {r["doc_id"]: tuple(r["feature"]) for r in extract_features(payloads, dim=8).collect()}
    b = {r["doc_id"]: tuple(r["feature"]) for r in extract_features(payloads, dim=8).collect()}
    assert a == b
    assert all(len(v) == 8 and all(0 <= x < 1 for x in v) for v in a.values())
    # matches the local kernel (the Spark plumbing adds nothing)
    orig = {r["doc_id"]: bytes(r["payload"]) for r in payloads.collect()}
    for doc_id, payload in list(orig.items())[:5]:
        assert a[doc_id] == pytest.approx(tuple(fake_feature_extract(payload, 8)))


def test_decode_stub_raises(spark):
    with pytest.raises(NotImplementedError, match="image decoding"):
        decode_image(b"\xff\xd8\xff")


def test_payload_aware_partitioning(spark, payloads):
    out = with_binary_partitioning(payloads, target_partition_bytes=1024)
    assert out.rdd.getNumPartitions() >= 2  # 50 docs x ~700B >> 1KiB target
    assert out.count() == payloads.count()


def test_extract_frames_fanout_and_determinism(spark):
    from timeseriesflattener_spark.operators.multimodal import extract_frames

    payloads = spark.createDataFrame(
        [(1, bytes(range(256)) * 3), (2, b"xy")], "doc_id long, payload binary"
    )
    out = extract_frames(payloads, every_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    # doc 1: 3 frames of 256 bytes -> indices 0,1,2 -> every 2nd = [0, 2]
    assert sorted(by_doc[1]) == [0, 2]
    assert by_doc[2] == [0]
    # deterministic features
    out2 = extract_frames(payloads, every_n=2).collect()
    assert {(r["doc_id"], r["frame_idx"], tuple(r["frame_feature"])) for r in out} == {
        (r["doc_id"], r["frame_idx"], tuple(r["frame_feature"])) for r in out2
    }


def test_resize_payloads_bounded_and_deterministic(spark):
    from timeseriesflattener_spark.operators.multimodal import resize_payloads

    payloads = spark.createDataFrame(
        [(1, bytes(range(256)) * 40), (2, b"tiny")], "doc_id long, payload binary"
    )
    out = {r["doc_id"]: (bytes(r["payload"]), r["n_bytes"]) for r in
           resize_payloads(payloads, target_bytes=1000).collect()}
    assert out[1][1] <= 1000 and out[1][1] > 0
    assert out[2][0] == b"tiny"  # already under target: identity
    out2 = {r["doc_id"]: bytes(r["payload"]) for r in
            resize_payloads(payloads, target_bytes=1000).collect()}
    assert {k: v[0] for k, v in out.items()} == out2
