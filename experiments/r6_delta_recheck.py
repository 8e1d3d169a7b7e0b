"""VERDICT r5 item 2: the driver's r5 bench put four Python-worker /
streaming-adjacent queries +0.4..+1.5 s over their r4 driver timings
(sim_pq_adc_rerank +1.49, dedup_cluster_keep_best +1.00,
udf_cogroup_merge +0.99, udf_suite +0.76).  All four function bodies
are BYTE-IDENTICAL between the r4-final commit (a477aeb) and HEAD
(verified with git show + regex extraction in the r6 session), so a
plan regression is impossible; this script settles whether the deltas
reproduce on a quiet box by timing the four back-to-back, interleaved,
REPS times each after a warm-up rep, and printing medians next to the
r4/r5 driver numbers.

Run on an otherwise-idle box: python experiments/r6_delta_recheck.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covid_data_pipeline_spark.registry import load_all  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 5
# per-query seconds from the committed BENCH_FULL artifacts:
# r4-final (git show a477aeb:BENCH_FULL.json) and r5-final (HEAD)
DRIVER = {
    "sim_pq_adc_rerank": (5.15, 6.64),
    "dedup_cluster_keep_best": (4.247, 5.243),
    "udf_cogroup_merge": (3.533, 4.524),
    "udf_suite": (3.135, 3.898),
}


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("r6-delta-recheck")
    reg = load_all()
    names = list(DRIVER)
    # warm-up rep (uncounted): JVM, codegen, Arrow worker pool
    for n in names:
        materialize(reg[n].fn(spark, SF_DIR))
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(REPS):
        for n in names:  # interleaved: same box conditions for all four
            t0 = time.monotonic()
            materialize(reg[n].fn(spark, SF_DIR))
            times[n].append(time.monotonic() - t0)
    out = {}
    for n in names:
        med = statistics.median(times[n])
        r4, r5 = DRIVER[n]
        out[n] = {
            "median": round(med, 2),
            "all": [round(t, 2) for t in times[n]],
            "driver_r4": r4,
            "driver_r5": r5,
            "verdict": "load-variance" if med <= r4 * 1.10 else "reproduces",
        }
        print(
            f"{n}: median {med:.2f}s (r4 driver {r4}, r5 driver {r5}) "
            f"-> {out[n]['verdict']}"
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
