#!/usr/bin/env python3
"""Measure sim_pq_adc_rerank's recall-vs-shortlist dial: the ADC
shortlist fraction is the operator's only latency/recall trade-off
(codebook size is fixed by memory), so the 100 TB tuning guidance
should carry a measured curve, not folklore.

Method: run the PQ pipeline at sf0.1 (2,000 vectors + seeded copies)
with shortlist = {1%, 2.5%, 5%, 10%, 20%} of the corpus and score
recall@5 against the exact brute-force twin (sim_topk_neighbors).

Run: python experiments/pq_shortlist_ab.py   (~2 min, local[32])
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covid_data_pipeline_spark.registry import load_all  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FRACTIONS = (0.01, 0.025, 0.05, 0.10, 0.20)


def recall_at(spark, frac: float, exact: dict) -> float:
    """Monkey-patch the shortlist sizing through a fraction and rerun."""
    reg = load_all()
    rows = reg["sim_pq_adc_rerank"].fn(spark, SF_DIR).collect()
    got = defaultdict(set)
    for r in rows:
        got[r["query_id"]].add(r["neighbor_id"])
    return sum(
        len(got[q] & exact[q]) / len(exact[q]) for q in exact
    ) / len(exact)


def main() -> None:
    spark = get_spark("pq-shortlist-ab")
    reg = load_all()
    exact = defaultdict(set)
    for r in reg["sim_topk_neighbors"].fn(spark, SF_DIR).collect():
        exact[r["query_id"]].add(r["neighbor_id"])

    for frac in FRACTIONS:
        os.environ["SPARK_GRAFT_PQ_SHORTLIST_FRAC"] = str(frac)
        r = recall_at(spark, frac, exact)
        print(f"shortlist {frac:>5.1%} of corpus -> mean recall@5 = {r:.2f}")
    os.environ.pop("SPARK_GRAFT_PQ_SHORTLIST_FRAC", None)
    spark.stop()


if __name__ == "__main__":
    main()
