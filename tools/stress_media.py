"""Scale-stress the media suite on a synthetic corpus of FIMG/FVID
payloads: image_features (decode + per-pixel stats), sample_frames
(video fan-out), and the defect-injected integrity suite — the
mapInPandas shapes whose scale claims (bytes never shuffle, narrow
stages, poison-pill isolation) deserve a measured number, not just a
plan dump. Every expectation is asserted exactly from the closed-form
generation/injection rules.

Usage: python tools/stress_media.py [n_media] [cpus]
Prints one JSON line; paste the numbers into SCALE.md's measured
evidence section.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> None:
    n_media = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    # Arrow-UDF-heavy: task slots = CPU budget / 2 (the house rule —
    # each slot pairs a JVM thread with a Python worker)
    slots = max(2, cpus // 2)
    spark = (SparkSession.builder.master("local[{}]".format(slots))
             .config("spark.sql.shuffle.partitions", str(2 * slots))
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from pandasschema_spark.operators.multimodal import (
        image_features,
        media_defect_df,
        media_df,
        media_injected_class,
        media_integrity_checks,
        sample_frames,
    )

    parts = slots * 4
    media = media_df(spark, n_media, seed=42, partitions=parts)

    n_videos = (n_media + 4) // 5
    n_images = n_media - n_videos

    t0 = time.time()
    feats = image_features(media)
    agg = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("ok").cast("long")).alias("n_ok")).collect()[0]
    feat_sec = round(time.time() - t0, 2)
    assert agg["n"] == n_media, (agg["n"], n_media)
    assert agg["n_ok"] == n_images, (agg["n_ok"], n_images)  # videos fail

    t0 = time.time()
    frames = sample_frames(media, every_k=2)
    n_frames = frames.count()
    frame_sec = round(time.time() - t0, 2)
    assert n_frames == 2 * n_videos, (n_frames, n_videos)

    tainted = media_defect_df(spark, n_media, seed=42, partitions=parts)
    expect_bad = sum(1 for i in range(n_media)
                     if media_injected_class(i) is not None)
    t0 = time.time()
    res = media_integrity_checks(tainted).validate(
        tainted, columns=["media_id", "kind", "payload"],
        row_key="media_id")
    n_viol = res.violations.count()
    integ_sec = round(time.time() - t0, 2)
    assert n_viol == expect_bad, (n_viol, expect_bad)

    # perceptual dedup leg (smaller corpus: the banding self-join is the
    # quadratic-ish part the hot-chunk cap governs; at this size the
    # production-default cap never binds, so plants are structurally
    # recalled — exact copies share every chunk)
    from pandasschema_spark.operators.multimodal import image_dup_pairs

    n_dedup = min(n_media, 60_000)
    base = media_df(spark, n_dedup, seed=42, partitions=parts)
    plants = (base.where((F.col("kind") == "image")
                         & (F.col("media_id") % 97 == 1))
              .select((F.col("media_id") + 10_000_000).alias("media_id"),
                      "kind", "payload", "width", "height"))
    expect_plants = sum(1 for i in range(n_dedup)
                        if i % 97 == 1 and i % 5 != 0)
    t0 = time.time()
    pairs = image_dup_pairs(base.unionByName(plants))
    planted_found = pairs.where(
        F.col("id_b") - F.col("id_a") == 10_000_000).count()
    dedup_sec = round(time.time() - t0, 2)
    assert planted_found == expect_plants, (planted_found, expect_plants)

    print(json.dumps({
        "n_media": n_media, "cpus": cpus,
        "features_sec": feat_sec,
        "features_media_per_sec": round(n_media / feat_sec, 1),
        "frame_sample_sec": frame_sec,
        "frames_emitted": n_frames,
        "integrity_sec": integ_sec,
        "integrity_media_per_sec": round(n_media / integ_sec, 1),
        "violations_found": n_viol,
        "dedup_corpus": n_dedup,
        "dedup_sec": dedup_sec,
        "dedup_media_per_sec": round(n_dedup / dedup_sec, 1),
        "dedup_planted_recalled": planted_found,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
