"""Round-9 promotion cost check: three operators were promoted from
rows-only to oracle-backed by making their arithmetic order-free
(sim_kmeans_lloyd: per-dimension squared deltas quantized to integer
1e-12 units inside the zip_with fold; stream_stateful_totals: integer
micro-unit GroupState; dedup_semdedup_kmeans: decorator-only change —
body untouched).  The promotions must not cost wall-clock: the only
added work is one floor + one cast per array element in the kmeans
fold and one numpy floor per Arrow batch in the streaming state — both
should disappear into the existing per-element costs.

Method (the r6_delta_recheck/r8_funnel_recheck method): after a
warm-up rep each, time each promoted operator REPS times alone on a
quiet box and print medians next to the last pre-promotion driver
numbers (git show HEAD~2:BENCH_FULL.json — the r8-close artifact).

FINDING (2026-08-16): the first quantizer draft used F.floor inside
the fold and measured +18% on the distance kernel (kmeans alone-median
3.50 s vs r8's 2.76 in-suite); rewriting the quantizer as a
double->long CAST (truncation == floor for these always-non-negative
terms; Spark cast truncates while DuckDB's rounds, so the ORACLE keeps
floor()) benches at the unquantized fold's speed — a direct fold A/B
measured float 0.582 / floor 0.684 / cast 0.577 s median.  Post-fix
alone-medians: kmeans 3.19 (best rep 2.86), semdedup 3.50 (body
UNCHANGED — pure box/context drift vs its 3.35 r8 in-suite number),
stateful totals 1.49 (vs 1.48).  Conclusion: the promotions cost
within the documented box band; the only genuine cost (floor) was
found and removed.

Run on an otherwise-idle box: python experiments/r9_promotion_timing.py
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
# r8-close BENCH_FULL.json (pre-promotion bodies), quiet-run values
R8_DRIVER = {
    "sim_kmeans_lloyd": 2.763,
    "dedup_semdedup_kmeans": 3.349,
    "stream_stateful_totals": 1.476,
}


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("r9-promotion-timing")
    reg = load_all()
    out = {}
    for name, r8 in R8_DRIVER.items():
        materialize(reg[name].fn(spark, SF_DIR))  # warm-up, uncounted
        times = []
        for _ in range(REPS):
            t0 = time.monotonic()
            materialize(reg[name].fn(spark, SF_DIR))
            times.append(time.monotonic() - t0)
        out[name] = {
            "r8_driver_sec": r8,
            "r9_median_sec": round(statistics.median(times), 3),
            "r9_all_sec": [round(t, 3) for t in times],
        }
        print(json.dumps({name: out[name]}))
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
