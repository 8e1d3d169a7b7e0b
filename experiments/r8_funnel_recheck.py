"""VERDICT r7 item 3: the r7 full-suite bench put pipeline_dedup_funnel
at 8.78 s vs 6.33 s in the r6 artifact (+39%), the only shared-query
delta beyond the documented +-10..20% band.  The function body is
byte-identical between the r6-final commit (9c2ceec) and HEAD (git
shows zero r7 commits touching llm_dedup.py before the r8 additions),
so a plan regression is impossible; the candidates are box load vs a
suite-context effect (cache/GC pressure from 288 -> 378 registered
queries sharing one JVM).

Method (the r6_delta_recheck method, extended with an in-context arm):
after a warm-up rep, time pipeline_dedup_funnel REPS times ALONE
(quiet JVM), then run a GC-pressure arm — REPS more timings, each
preceded by a burst of other heavyweight suite queries to recreate the
full-suite heap/code-cache conditions — and print medians next to the
r6/r7 driver numbers.

Run on an otherwise-idle box: python experiments/r8_funnel_recheck.py
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
TARGET = "pipeline_dedup_funnel"
DRIVER_R6 = 6.331  # git show 9c2ceec:BENCH_FULL.json
DRIVER_R7 = 8.777  # BENCH_FULL.json at HEAD
# heavyweight neighbors from BENCH_FULL.json to recreate suite context
PRESSURE = (
    "dedup_containment",
    "stream_dedup_simhash",
    "dedup_ngram_jaccard",
    "sim_pq_adc_rerank",
)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("r8-funnel-recheck")
    reg = load_all()
    # warm-up (uncounted): JVM, codegen caches, Arrow pool
    materialize(reg[TARGET].fn(spark, SF_DIR))
    alone: list[float] = []
    for _ in range(REPS):
        t0 = time.monotonic()
        materialize(reg[TARGET].fn(spark, SF_DIR))
        alone.append(time.monotonic() - t0)
    in_context: list[float] = []
    for _ in range(REPS):
        for p in PRESSURE:
            materialize(reg[p].fn(spark, SF_DIR))
        t0 = time.monotonic()
        materialize(reg[TARGET].fn(spark, SF_DIR))
        in_context.append(time.monotonic() - t0)
    med_a = statistics.median(alone)
    med_c = statistics.median(in_context)
    verdict = (
        "load-variance"
        if med_c <= DRIVER_R6 * 1.20
        else ("suite-context" if med_c > med_a * 1.20 else "reproduces-alone")
    )
    out = {
        "alone_median": round(med_a, 2),
        "alone_all": [round(t, 2) for t in alone],
        "in_context_median": round(med_c, 2),
        "in_context_all": [round(t, 2) for t in in_context],
        "driver_r6": DRIVER_R6,
        "driver_r7": DRIVER_R7,
        "verdict": verdict,
    }
    print(
        f"{TARGET}: alone median {med_a:.2f}s, in-context median "
        f"{med_c:.2f}s (r6 driver {DRIVER_R6}, r7 driver {DRIVER_R7}) "
        f"-> {verdict}"
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
