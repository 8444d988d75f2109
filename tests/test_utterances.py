"""operators/audio.py utterances: silence-split voiced-run extraction.

Constructed int16 PCM is the oracle here — the synthetic warehouse's
injection classes plant no interior silence, so multi-utterance clips,
the min_frames threshold and frame-straddle behavior are locked locally
(the gated query attests the class closed-forms at 20k clips)."""

import numpy as np
import pytest

from pandasschema_spark.operators.audio import utterances

SR = 8000          # frame length at 10 ms = 80 samples
FL = 80


def _pcm(frames):
    """frames: iterable of 'v' (voiced: constant 1000) or 's' (silent:
    zeros); one entry = one full 80-sample frame."""
    parts = [np.full(FL, 1000 if f == "v" else 0, dtype="<i2") for f in frames]
    arr = np.concatenate(parts) if parts else np.zeros(0, dtype="<i2")
    return bytearray(arr.tobytes())


def _mk(spark, clips):
    return spark.createDataFrame(
        [(cid, _pcm(frames), SR) for cid, frames in clips],
        "clip_id string, bytes binary, sr_hz int")


def _by_clip(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["clip_id"], []).append(
            (r["utt_idx"], r["start_frame"], r["n_frames"],
             r["start_ms"], r["dur_ms"]))
    for v in out.values():
        v.sort()
    return out


def test_interior_dropout_splits_into_two_utterances(spark):
    got = _by_clip(utterances(_mk(spark, [
        ("a", "vvvssvv"),       # voiced 0-2, silent 3-4, voiced 5-6
        ("b", "svvvvs"),        # lead+trail silence
        ("c", "ssss"),          # all silent -> nothing
        ("d", "vvvv"),          # all voiced -> one full-width run
    ])))
    assert got["a"] == [(0, 0, 3, 0, 30), (1, 5, 2, 50, 20)]
    assert got["b"] == [(0, 1, 4, 10, 40)]
    assert "c" not in got
    assert got["d"] == [(0, 0, 4, 0, 40)]


def test_min_frames_drops_short_runs_and_renumbers(spark):
    # runs: v(1), ss, vvv(3), s, vv(2) -> min_frames=2 keeps the 3- and
    # 2-frame runs as utt 0/1 (the 1-frame blip vanishes, no merging)
    got = _by_clip(utterances(_mk(spark, [("a", "vssvvvsvv")]),
                              min_frames=2))
    assert got["a"] == [(0, 3, 3, 30, 30), (1, 7, 2, 70, 20)]


def test_partial_tail_frame_is_ignored(spark):
    # 2 full voiced frames + 40 voiced samples of tail: tail is not a
    # full frame, so the run ends at frame 2 (same rule as frame_silence)
    raw = bytearray(np.full(2 * FL + 40, 1000, dtype="<i2").tobytes())
    df = spark.createDataFrame([("a", raw, SR)],
                               "clip_id string, bytes binary, sr_hz int")
    got = _by_clip(utterances(df))
    assert got["a"] == [(0, 0, 2, 0, 20)]


def test_empty_and_subframe_clips_emit_nothing(spark):
    raw = bytearray(np.full(10, 1000, dtype="<i2").tobytes())  # < 1 frame
    df = spark.createDataFrame(
        [("a", bytearray(b""), SR), ("b", raw, SR)],
        "clip_id string, bytes binary, sr_hz int")
    assert utterances(df).count() == 0


def test_consistency_with_trim_bounds(spark):
    """Shared frame rule: on any corpus, a clip's voiced frames (sum of
    utterance n_frames at min_frames=1) == n_frames - n_silent_frames
    from frame_silence."""
    from pandasschema_spark.operators.audio import frame_silence

    clips = [("x%d" % i, ("v" * (i % 4) + "s" * (i % 3) + "v" * 2) )
             for i in range(12)]
    df = _mk(spark, clips)
    voiced = {k: sum(u[2] for u in v)
              for k, v in _by_clip(utterances(df)).items()}
    for r in frame_silence(df).collect():
        assert voiced.get(r["clip_id"], 0) == r["n_frames"] - r["n_silent_frames"]


def test_arg_guard(spark):
    df = _mk(spark, [("a", "v")])
    with pytest.raises(ValueError):
        utterances(df, min_frames=0)
