"""Side-by-side throughput: this engine vs the actual reference package
(multimeric/PandasSchema, imported from /root/reference) on the SAME
clips warehouse and the SAME checks. Reproduces REFERENCE_COMPARISON.md.

Usage: python tools/compare_reference.py [warehouse_dir] [n_full]
(default: the bench warehouse at /tmp/spark_graft_bench/clips_400000 —
run `python bench.py` first to materialize it.)
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")
warnings.filterwarnings("ignore")

import pandas as pd  # noqa: E402

if not hasattr(pd.DataFrame, "iteritems"):  # pandas 2.x shim for the reference
    pd.DataFrame.iteritems = pd.DataFrame.items

from pandas_schema import Column as RC  # noqa: E402
from pandas_schema import Schema as RS  # noqa: E402
from pandas_schema import validation as RV  # noqa: E402

from pandasschema_spark import clips_suite as CS  # noqa: E402
from pandasschema_spark.functions import audio as A  # noqa: E402

META_COLS = ["clip_id", "sr_hz", "dur_ms", "codec", "transcript"]


def ref_meta_columns():
    return [
        RC("clip_id", [RV.MatchesPatternValidation(r"^clip_\d{12}$"), RV.IsDistinctValidation()]),
        RC("sr_hz", [RV.InListValidation([8000, 16000, 44100, 48000])]),
        RC("dur_ms", [RV.InRangeValidation(min=1)]),
        RC("codec", [RV.InListValidation(["pcm_s16le", "flac", "opus", "mp3"])]),
        RC("transcript", [RV.MatchesPatternValidation(r"^[a-z0-9 ,.'?!-]+$")]),
    ]


def _pcm_ok(t):
    clip_id, raw, sr, dur = t
    o = CS._parse_ordinal(clip_id)
    if o is None or raw is None:
        return False
    f = A.clip_fields(42, o)
    if f["sr_hz"] != sr or f["dur_ms"] != dur:
        return False
    if len(raw) != A.expected_len_bytes(sr, dur):
        return False
    ref = A.synth_pcm(f["sr_hz"], f["dur_ms"], f["f1"], f["f2"], f["p1"], f["p2"], f["amp"])
    return A.snr_db(ref, A.decode_pcm(raw)) >= 30.0


def _tr_ok(t):
    clip_id, tr = t
    o = CS._parse_ordinal(clip_id)
    return o is not None and tr is not None and A.clip_fields(42, o)["transcript"] == tr


def run_reference(files, *, full: bool, n: int):
    t0 = time.time()
    parts, total = [], 0
    for f in files:
        p = pd.read_parquet(f, columns=None if full else META_COLS)
        parts.append(p)
        total += len(p)
        if total >= n:
            break
    pdf = pd.concat(parts, ignore_index=True).head(n)
    load_s = time.time() - t0
    cols = ref_meta_columns()
    validate_cols = META_COLS[:]
    t0 = time.time()
    if full:
        # the reference API is strictly per-Series: cross-column checks
        # require user-side tuple columns (a real capability gap)
        pdf["__pcm__"] = list(zip(pdf.clip_id, pdf.bytes, pdf.sr_hz, pdf.dur_ms))
        pdf["__tr__"] = list(zip(pdf.clip_id, pdf.transcript))
        cols += [RC("__pcm__", [RV.CustomElementValidation(_pcm_ok, "pcm mismatch")]),
                 RC("__tr__", [RV.CustomElementValidation(_tr_ok, "transcript mismatch")])]
        validate_cols += ["__pcm__", "__tr__"]
    ws = RS(cols).validate(pdf[validate_cols + []], columns=validate_cols) if full else RS(cols).validate(pdf[META_COLS])
    sec = (time.time() - t0) + load_s
    return {"n": len(pdf), "sec": round(sec, 2),
            "clips_per_sec": round(len(pdf) / sec, 1), "warnings": len(ws)}


def run_ours(warehouse, *, full: bool, slots: int = 16):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[{}]".format(slots))
        .config("spark.sql.shuffle.partitions", str(slots))
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1048576")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(warehouse)
    n = df.count()
    best, viol = float("inf"), 0
    for _ in range(3):
        t0 = time.time()
        viol = CS.validate_clips(df, None, with_pcm_checks=full).violations.count()
        best = min(best, time.time() - t0)
    spark.stop()
    return {"n": n, "sec": round(best, 2), "clips_per_sec": round(n / best, 1),
            "violations": viol}


def main():
    warehouse = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_bench/clips_400000"
    n_full = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    files = sorted(glob.glob(os.path.join(warehouse, "bucket=*", "*.parquet")))
    assert files, "run `python bench.py` first to materialize the warehouse"
    out = {
        "reference_meta": run_reference(files, full=False, n=10**12),
        "ours_meta": run_ours(warehouse, full=False),
        "reference_full": run_reference(files, full=True, n=n_full),
        "ours_full": run_ours(warehouse, full=True),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
