"""Round-11 evidence: the multi-probe radius is the LSH recall/cost
dial.  For probe radius 0/1/2 over the 6-bit hyperplane index
(sim_ann_bucketed's exact expressions), measure recall@5 vs the
brute-force top-5 (sim_topk_neighbors) and the candidate volume the
re-rank touches — the two sides of the dial.

Radius r probes every bucket within Hamming distance <= r of the
query's signature: 1 / 7 / 22 of the 64 buckets.  Candidate volume
scales with buckets probed (corpus vectors live in exactly ONE bucket,
so probing is query-side fan-out only); recall rises with it.  The
registered query ships radius 1 — the knee on this fixture.

Run on an otherwise-idle box:
    python experiments/r11_ann_multiprobe_sweep.py
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from covid_data_pipeline_spark.io import load, tune  # noqa: E402
from covid_data_pipeline_spark.queries.llm_similarity import (  # noqa: E402
    _N_PLANES,
    _PLANES,
    _dot,
    _norm,
    _vec,
)
from covid_data_pipeline_spark.registry import load_all  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def probe_masks(radius: int) -> list[int]:
    """All XOR masks within Hamming distance <= radius of 0 (incl. 0)."""
    masks = [0]
    for r in range(1, radius + 1):
        for bits in itertools.combinations(range(_N_PLANES), r):
            masks.append(sum(1 << b for b in bits))
    return masks


def ann_topk(spark, radius: int):
    """sim_ann_bucketed's exact expressions, radius parameterized."""
    e = load(spark, SF_DIR, "embeddings").select(
        "vec_id", _vec("embedding").alias("vec")
    )
    sig = F.lit(0).cast("long")
    for p in range(_N_PLANES):
        plane = F.array(*[F.lit(v) for v in _PLANES[p]])
        proj = F.aggregate(
            F.zip_with("vec", plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(0)
    sigged = e.withColumn("bucket", sig)
    q = sigged.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("q_vec"),
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m))
                      for m in probe_masks(radius)])
        ).alias("bucket"),
    )
    c = sigged.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("vec").alias("c_vec"),
        "bucket",
    )
    cand = c.join(F.broadcast(q), on="bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = F.round(_dot("q_vec", "c_vec") / (_norm("q_vec") * _norm("c_vec")), 6)
    scored = cand.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    top = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
    )
    return cand, top


def main() -> None:
    spark = get_spark("r11-ann-multiprobe")
    tune(spark)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in load_all()["sim_topk_neighbors"].fn(spark, SF_DIR).collect()
    }
    n_corpus = load(spark, SF_DIR, "embeddings").count()
    out = {"sf_dir": SF_DIR, "n_corpus": n_corpus, "radii": {}}
    for radius in (0, 1, 2):
        t0 = time.time()
        cand, top = ann_topk(spark, radius)
        got = {(r["query_id"], r["neighbor_id"]) for r in top.collect()}
        wall = time.time() - t0
        n_cand = cand.count()
        out["radii"][radius] = {
            "buckets_probed": len(probe_masks(radius)),
            "recall_at_5": round(len(exact & got) / len(exact), 3),
            "candidates": n_cand,
            "candidates_per_query_pct_of_corpus": round(
                100.0 * n_cand / (10 * n_corpus), 1
            ),
            "wall_s": round(wall, 2),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
