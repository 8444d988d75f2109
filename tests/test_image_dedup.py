"""image_ahash / image_dup_pairs: perceptual pixel dedup — the image
member of the dedup-modality set (text simhash, acoustic fingerprints,
embedding LSH, now pixels)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandasschema_spark.operators.multimodal import (
    encode_fake_image,
    image_ahash,
    image_dup_pairs,
    media_df,
)


def _ahash_py(arr):
    """Independent replay of the hash rule: 8x7 nearest-neighbor
    downsample, integer gray, strict 56*gray > total threshold."""
    h, w, _ = arr.shape
    gray = [[sum(int(arr[y * h // 7][x * w // 8][c]) for c in range(3)) // 3
             for x in range(8)] for y in range(7)]
    tot = sum(map(sum, gray))
    v = 0
    for y in range(7):
        for x in range(8):
            if 56 * gray[y][x] > tot:
                v |= 1 << (y * 8 + x)
    return v


def _flat(cells):
    """(7, 8) gray-cell grid -> an 8x7 FIMG payload with all three
    channels equal to the cell value (gray == the cell value exactly)."""
    arr = np.repeat(np.asarray(cells, dtype=np.uint8)[:, :, None], 3, axis=2)
    return encode_fake_image(arr)


def test_ahash_matches_python_replay(spark):
    media = media_df(spark, 40, seed=42, partitions=2)
    imgs = {r["media_id"]: r for r in
            media.where(F.col("kind") == "image").collect()}
    got = {r["id"]: r["ahash"] for r in image_ahash(media).collect()}
    assert set(got) == set(imgs)  # videos absent (decode contract)
    from pandasschema_spark.operators.multimodal import decode_image

    for mid, row in imgs.items():
        assert got[mid] == _ahash_py(decode_image(bytes(row["payload"]))), mid
        assert 0 <= got[mid] < 1 << 56  # int64-positive by construction


def test_dup_pairs_exact_hamming_ball(spark):
    """Crafted hashes: C == A (hamming 0), B differs from A in exactly
    the 3 cells demoted from 200 to 100 (hamming 3 — ON the threshold,
    and within the lossless banding ball), D shares no set bits with A.
    The output must be exactly the Hamming<=3 pairs with exact
    distances — banding at 4 chunks loses nothing at <= 3."""
    base = [[200 if (y * 8 + x) % 2 == 0 else 100 for x in range(8)]
            for y in range(7)]
    b = [row[:] for row in base]
    for p in (0, 2, 4):      # three even (set-bit) cells demoted
        b[p // 8][p % 8] = 100
    d = [[100 if (y * 8 + x) % 2 == 0 else 200 for x in range(8)]
         for y in range(7)]  # complement pattern
    rows = [(0, _flat(base)), (1, _flat(b)), (2, _flat(base)), (3, _flat(d))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in image_dup_pairs(df, max_bucket=None).collect()}
    assert got == {(0, 1): 3, (0, 2): 0, (1, 2): 3}


def test_hot_chunk_cap_drops_wholesale(spark):
    """20 identical constant-pattern images share every chunk; with
    max_bucket=10 the degenerate chunks drop from BOTH sides and no
    pair among them survives, while a distinct small pair does."""
    base = [[200 if (y * 8 + x) % 2 == 0 else 100 for x in range(8)]
            for y in range(7)]
    other = [[200 if x < 4 else 100 for x in range(8)] for y in range(7)]
    rows = [(i, _flat(base)) for i in range(20)] + \
        [(100, _flat(other)), (101, _flat(other))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    capped = image_dup_pairs(df, max_bucket=10).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in capped] == \
        [(100, 101, 0)]
    exact = image_dup_pairs(df, max_bucket=None)
    assert exact.count() == 20 * 19 // 2 + 1


def _vid(cell_grids):
    """List of (7, 8) gray grids -> an FVID payload (one frame each,
    all channels equal so the frame's gray cells are the grid)."""
    from pandasschema_spark.operators.multimodal import encode_fake_video

    frames = np.stack([
        np.repeat(np.asarray(g, dtype=np.uint8)[:, :, None], 3, axis=2)
        for g in cell_grids])
    return encode_fake_video(frames)


def test_video_dup_pairs_all_frames_and_count_rule(spark):
    """Videos match only when EVERY sampled frame pair is within the
    ball AND both contribute the same frame set: an exact copy matches
    at 0; a video sharing frame 0 but diverging at frame 2 is excluded;
    a truncated video (fewer sampled frames) is excluded even though
    its one frame matches."""
    from pandasschema_spark.operators.multimodal import video_dup_pairs

    base = [[200 if (y * 8 + x) % 2 == 0 else 100 for x in range(8)]
            for y in range(7)]
    far = [[100 if (y * 8 + x) % 2 == 0 else 200 for x in range(8)]
           for y in range(7)]
    other = [[200 if x < 4 else 100 for x in range(8)] for y in range(7)]
    rows = [
        (0, _vid([base, far, other])),   # samples frames {0, 2}
        (1, _vid([base, far, other])),   # exact copy -> (0,1) ham 0
        (2, _vid([base, far, far])),     # frame 0 matches, frame 2 far
        (3, _vid([base])),               # truncated: samples {0} only
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {(r["id_a"], r["id_b"]): (r["n_frames"], r["max_hamming_seen"])
           for r in video_dup_pairs(df, every_k=2, max_bucket=None).collect()}
    assert got == {(0, 1): (2, 0)}


def test_video_fid_overflow_fails_loud(spark):
    from pandasschema_spark.operators.multimodal import video_dup_pairs

    base = [[100] * 8] * 7
    df = spark.createDataFrame(
        [(1 << 50, _vid([base, base, base]))], "media_id long, payload binary")
    with pytest.raises(Exception, match="fid range"):
        video_dup_pairs(df, max_bucket=None).collect()


def test_guards_and_poison_pill(spark):
    rows = [(0, _flat([[100] * 8] * 7)), (1, b"garbage")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    with pytest.raises(ValueError, match="divide 56"):
        image_dup_pairs(df, chunk_bits=15)
    # undecodable rows are absent, not fatal (dedup over what decodes)
    assert {r["id"] for r in image_ahash(df).collect()} == {0}


def test_poison_pill_degenerate_payloads(spark):
    """Decodable-but-degenerate payloads (zero width/height header with
    an empty pixel buffer) and NULL ids must be skipped like decode
    failures — one corrupt blob must never kill the task (the docstring's
    poison-pill isolation covers the WHOLE per-row body, not just the
    decode call)."""
    import struct
    from pandasschema_spark.operators.multimodal import IMG_MAGIC

    zero_dim = IMG_MAGIC + struct.pack("<HHB", 0, 0, 3)
    rows = [(0, _flat([[100] * 8] * 7)), (1, zero_dim), (None, _flat([[7] * 8] * 7))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    assert {r["id"] for r in image_ahash(df).collect()} == {0}
