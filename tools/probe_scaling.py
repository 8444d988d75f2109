"""One-off probe: split per-run cost into plan-build / Catalyst-planning /
execution at a given pinned CPU budget, against the bench warehouse.

Usage: taskset/affinity is set by the caller; SPARK_GRAFT_LEG=<budget>.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

budget = int(os.environ.get("SPARK_GRAFT_LEG", "32"))
first = int(os.environ.get("SPARK_GRAFT_LEG_FIRST_CPU", "0"))
# honor the leg layout: pin to [first, first+budget), so a caller
# mirroring the narrow leg's cpuset (16-19) is not silently moved onto
# the wide leg's CPUs 0-3 (bench.leg_server's convention)
os.sched_setaffinity(0, range(first, first + budget))

from bench import make_session, warm_workers, WAREHOUSE  # noqa: E402

slots = max(budget // 2, 1)
spark = make_session(slots)
spark.sparkContext.setLogLevel("ERROR")
warm_workers(spark, slots)

from pandasschema_spark.clips_suite import validate_clips  # noqa: E402
from pandasschema_spark.sources.datagen import codec_dim  # noqa: E402

df = spark.read.parquet(WAREHOUSE)

for rep in range(4):
    t0 = time.time()
    res = validate_clips(df, codec_dim(spark), with_pcm_checks=True, row_key="row_ord")
    viol = res.violations
    t1 = time.time()  # python-side plan construction
    # force analysis + optimization + physical planning without executing
    viol._jdf.queryExecution().executedPlan()
    t2 = time.time()
    n = viol.count()
    t3 = time.time()
    print(
        "rep=%d build=%.3f plan=%.3f exec=%.3f total=%.3f viol=%d"
        % (rep, t1 - t0, t2 - t1, t3 - t2, t3 - t0, n),
        flush=True,
    )
spark.stop()
