"""Multimodal binary-column plumbing: schemas, batch shapes, determinism,
poison-pill isolation, and the media constraint suite."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandasschema_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.media_df(spark, 200, seed=42, partitions=4).cache()


def test_codec_roundtrip():
    img = M.synth_image(7, 20, 11)
    assert M.decode_image(M.encode_fake_image(img)).tolist() == img.tolist()
    vid = np.stack([M.synth_image(7 + f, 8, 6) for f in range(5)])
    assert M.decode_video(M.encode_fake_video(vid)).tolist() == vid.tolist()
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG\r\n\x1a\n not a real png")
    with pytest.raises(NotImplementedError):
        M.decode_video(b"RIFFxxxxAVI ")


def test_media_df_deterministic(spark):
    a = {r["media_id"]: bytes(r["payload"]) for r in M.media_df(spark, 50, partitions=2).collect()}
    b = {r["media_id"]: bytes(r["payload"]) for r in M.media_df(spark, 50, partitions=7).collect()}
    assert a == b  # content independent of partitioning


def test_image_features(spark, media):
    imgs = media.where(F.col("kind") == "image")
    feats = {r["media_id"]: r for r in M.image_features(imgs).collect()}
    rows = {r["media_id"]: r for r in imgs.collect()}
    assert set(feats) == set(rows)
    for mid, f in feats.items():
        assert f["ok"]
        assert f["width"] == rows[mid]["width"] and f["height"] == rows[mid]["height"]
        assert f["channels"] == 3
        arr = M.decode_image(bytes(rows[mid]["payload"]))
        assert abs(f["mean_intensity"] - float(arr.mean())) < 1e-9


def test_image_features_poison_pill(spark):
    rows = [(0, M.encode_fake_image(M.synth_image(1, 4, 4))), (1, b"garbage")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r["ok"] for r in M.image_features(df).collect()}
    assert out == {0: True, 1: False}  # corrupt blob isolated, stage survives


def test_resize(spark, media):
    imgs = media.where(F.col("kind") == "image").limit(10)
    out = M.resize_images(imgs, 8, 8).collect()
    for r in out:
        arr = M.decode_image(bytes(r["payload"]))
        assert arr.shape == (8, 8, 3)
    # deterministic: resizing twice gives identical bytes
    out2 = M.resize_images(imgs, 8, 8).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in out} == \
           {r["media_id"]: bytes(r["payload"]) for r in out2}


def test_sample_frames(spark, media):
    vids = media.where(F.col("kind") == "video")
    n_vids = vids.count()
    frames = M.sample_frames(vids, every_k=2).collect()
    # 4 frames per video, every 2nd -> indices {0, 2}
    assert len(frames) == 2 * n_vids
    assert {r["frame_idx"] for r in frames} == {0, 2}
    arr = M.decode_image(bytes(frames[0]["payload"]))
    assert arr.ndim == 3


def test_media_defect_df_injection(spark):
    """media_defect_df: non-injected rows byte-identical to media_df;
    each injected class materializes its documented defect; videos are
    never injected."""
    n = 400
    clean = {r["media_id"]: r for r in M.media_df(spark, n, partitions=4).collect()}
    tainted = {r["media_id"]: r for r in M.media_defect_df(spark, n, partitions=4).collect()}
    assert set(clean) == set(tainted)
    injected = {i: M.media_injected_class(i) for i in range(n)
                if M.media_injected_class(i) is not None}
    assert injected == {89: 1, 178: 2, 267: 0, 356: 1}  # 445 is a video row
    for i in range(n):
        c, t = clean[i], tainted[i]
        cls = injected.get(i)
        if cls is None:
            assert bytes(c["payload"]) == bytes(t["payload"]) and \
                c["width"] == t["width"], i
            continue
        w, h = 16 + i % 17, 16 + i % 13
        if cls == 0:
            assert t["width"] == w + 1 and bytes(t["payload"]) == bytes(c["payload"])
            assert M.decode_image(bytes(t["payload"])).shape == (h, w, 3)
        elif cls == 1:
            assert len(bytes(t["payload"])) == 9 + (w * h * 3) // 2
            with pytest.raises(Exception):
                M.decode_image(bytes(t["payload"]))
        else:
            assert bytes(t["payload"])[:4] == b"XIMG"
            with pytest.raises(NotImplementedError):
                M.decode_image(bytes(t["payload"]))


def test_media_defect_integrity_flags_exactly_injected(spark):
    n = 400
    df = M.media_defect_df(spark, n, partitions=4)
    res = M.media_integrity_checks(df).validate(
        df, columns=["media_id", "kind", "payload"], row_key="media_id")
    got = {(r["row"], r["column"]) for r in res.violations.collect()}
    assert got == {(i, "payload") for i in (89, 178, 267, 356)}


def test_media_constraint_suite(spark, media):
    # clean table -> 0 violations
    schema = M.media_integrity_checks(media)
    res = schema.validate(media, columns=["media_id", "kind", "payload"], row_key="media_id")
    assert res.violations.count() == 0
    # corrupt one payload + two duplicated ids -> exactly those violations;
    # explicit row ordinals so keep-first ordering is well-defined for the
    # injected duplicates (they reuse existing media_ids)
    bad = media.limit(0).sparkSession.createDataFrame(
        [(1, "image", b"garbage", 4, 4), (2, "image", M.encode_fake_image(M.synth_image(1, 4, 4)), 9, 9)],
        M.MEDIA_SCHEMA,
    )
    tainted = (
        media.withColumn("row_ord", F.col("media_id"))
        .unionByName(bad.withColumn("row_ord", F.col("media_id") + 10000))
    )
    res2 = schema.validate(tainted, columns=["media_id", "kind", "payload"], row_key="row_ord")
    got = {(r["row"], r["message"]) for r in res2.violations.collect()}
    assert (10001, "payload does not decode to the declared dimensions") in got
    assert (10002, "payload does not decode to the declared dimensions") in got  # 4x4 != declared 9x9
    assert (10001, "contains values that are not unique") in got
    assert (10002, "contains values that are not unique") in got
    # the original rows (the keep='first' winners) must NOT be flagged
    assert (1, "contains values that are not unique") not in got
    assert (2, "contains values that are not unique") not in got
