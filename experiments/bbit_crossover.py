#!/usr/bin/env python3
"""A/B the b-bit-minhash pre-verification prune (Li & Koenig) across
controlled duplication regimes, to put a MEASURED crossover number on
the SCALE.md recommendation ("prune pays only when band collisions are
dominated by low-J accidents" — VERDICT r3 asked for the threshold).

The fixture itself sits at one extreme (nearly all band collisions are
true J>0.7 pairs, where the prune was measured SLOWER: 17.5 s vs
8-14 s at sf0.1).  This script synthesizes corpora where the
accident:true ratio is a KNOB and times both arms of the SAME candidate
pipeline as ``dedup_minhash_lsh``:

  arm A (ship):  band candidates -> rejoin token arrays -> exact Jaccard
  arm B (prune): band candidates -> join 1-bit-packed signatures ->
                 bit_count(xor) cutoff -> rejoin tokens -> exact Jaccard

Corpus construction (all deterministic, xxhash64-derived tokens):
  N docs x 80 tokens = T template tokens shared by a group of g docs
  (J within group = T/(160-T) — the mid-J "boilerplate" population whose
  band collisions are the prunable ACCIDENTS) + (80-T) unique tokens.
  A fraction q of docs get a twin with 6 unique tokens swapped
  (J = 74/86 = 0.86 — the TRUE pairs).  g sweeps the accident volume,
  q the true volume.

Run:  python experiments/bbit_crossover.py   (~3 min, local[32], prints
one result line per (g, q) config plus a summary table for SCALE.md)
"""

from __future__ import annotations

import functools
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from covid_data_pipeline_spark.queries.llm_dedup import (  # noqa: E402
    _MH_AB,
    _MH_BANDS,
    _MH_P,
    _MH_ROWS,
    JACCARD_THRESHOLD,
)
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

N_DOCS = 60_000
N_TOK = 80  # overridden per config: doc length is the second knob
T_TPL = 24  # template tokens -> in-group J = 24/136 = 0.176
K_SWAP = 6  # twin swaps 6 unique tokens -> twin J = 74/86 = 0.86
# bit_count(xor) cutoff: mismatch ~ Binomial(64, (1-J)/2); J=0.7 gives
# mean 9.6 sd 2.9, so <=21 keeps essentially every true pair while
# killing ~97% of J=0.18 accidents (mean 26.4).
BBIT_CUTOFF = 21


def synth_corpus(
    spark, out_dir: str, g: int, q: float, n_docs: int, n_tok: int
) -> None:
    """Write documents.parquet: n_docs base docs + q*n_docs twins.
    Template share and twin-swap count scale with n_tok so the J
    regimes stay fixed (in-group J ~= 0.18, twin J ~= 0.86) while doc
    LENGTH — the per-candidate verification cost — varies."""
    t_tpl = max(1, int(n_tok * 0.3))
    k_swap = max(1, int(n_tok * 0.075))
    base = spark.range(n_docs).select(F.col("id").alias("src"))
    twins = spark.range(int(n_docs * q)).select(F.col("id").alias("src"))

    def tokens(df: DataFrame, twin: bool) -> DataFrame:
        grp = F.floor(F.col("src") / F.lit(g))
        tpl = F.transform(
            F.sequence(F.lit(0), F.lit(t_tpl - 1)),
            lambda j: F.concat(F.lit("t"), F.xxhash64(grp, j).cast("string")),
        )
        n_uniq = n_tok - t_tpl
        # twins keep the first n_uniq-K_SWAP unique tokens of their source
        # and re-derive the last K_SWAP from their own id
        if twin:
            uniq = F.transform(
                F.sequence(F.lit(0), F.lit(n_uniq - 1)),
                lambda j: F.concat(
                    F.lit("u"),
                    F.when(
                        j < F.lit(n_uniq - k_swap),
                        F.xxhash64(F.col("src"), j + F.lit(1000)),
                    )
                    .otherwise(
                        F.xxhash64(
                            F.col("src") + F.lit(n_docs), j + F.lit(5000)
                        )
                    )
                    .cast("string"),
                ),
            )
            doc_id = F.col("src") + F.lit(n_docs)
        else:
            uniq = F.transform(
                F.sequence(F.lit(0), F.lit(n_uniq - 1)),
                lambda j: F.concat(
                    F.lit("u"),
                    F.xxhash64(F.col("src"), j + F.lit(1000)).cast("string"),
                ),
            )
            doc_id = F.col("src")
        return df.select(
            doc_id.alias("doc_id"),
            F.lit("en").alias("lang"),
            F.array_join(F.concat(tpl, uniq), " ").alias("text"),
        )

    corpus = tokens(base, twin=False).unionByName(tokens(twins, twin=True))
    corpus.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def candidates(spark, sf_dir: str, carry_bits: bool = False):
    """The dedup_minhash_lsh candidate pipeline.  With carry_bits=True
    the 1-bit-packed signature rides THROUGH the band-key explode (+8
    bytes per band row) so candidate pairs come out with (a_bb, b_bb)
    attached — the prune then costs zero extra joins and zero signature
    recomputation, which is how a real implementation would ship it."""
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t = d.select(
        "doc_id",
        "lang",
        F.array_distinct(
            F.transform(F.split("text", " "), lambda tok: F.xxhash64(tok))
        ).alias("toks"),
    )
    t = t.withColumn(
        "toks31", F.transform("toks", lambda x: F.pmod(x, F.lit(_MH_P)))
    )

    def affine(a: int, b: int):
        return lambda x: F.pmod(a * x + b, F.lit(_MH_P))

    minhashes = [
        F.array_min(F.transform("toks31", affine(a, b))).alias(f"h{i}")
        for i, (a, b) in enumerate(_MH_AB)
    ]
    sig = t.select("doc_id", "lang", *minhashes)
    if carry_bits:
        # 1-bit pack: low bit of each of the 64 minhashes -> one int64
        sig = sig.withColumn(
            "bbit",
            functools.reduce(
                lambda acc, i: acc.bitwiseOR(
                    F.shiftleft(F.col(f"h{i}").bitwiseAND(F.lit(1)), i)
                ),
                range(1, 64),
                F.col("h0").bitwiseAND(F.lit(1)),
            ),
        )
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.xxhash64(
                    *[F.col(f"h{j * _MH_ROWS + i}") for i in range(_MH_ROWS)]
                ).alias("bsig"),
            )
            for j in range(_MH_BANDS)
        ]
    )
    carry = ["bbit"] if carry_bits else []
    keys = sig.select(
        "doc_id", "lang", *carry, F.explode(bands).alias("b")
    ).select("doc_id", "lang", *carry, "b.band", "b.bsig")
    a = keys.select(
        F.col("doc_id").alias("a_id"),
        "lang",
        "band",
        "bsig",
        *([F.col("bbit").alias("a_bb")] if carry_bits else []),
    )
    b = keys.select(
        F.col("doc_id").alias("b_id"),
        "lang",
        "band",
        "bsig",
        *([F.col("bbit").alias("b_bb")] if carry_bits else []),
    )
    cand = (
        a.join(b, on=["lang", "band", "bsig"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", *(["a_bb", "b_bb"] if carry_bits else []))
        .dropDuplicates(["a_id", "b_id"])
    )
    return cand, t


def verify(cand, t) -> DataFrame:
    ta = t.select(F.col("doc_id").alias("a_id"), F.col("toks").alias("a_toks"))
    tb = t.select(F.col("doc_id").alias("b_id"), F.col("toks").alias("b_toks"))
    inter = F.size(F.array_intersect("a_toks", "b_toks"))
    union = F.size("a_toks") + F.size("b_toks") - inter
    jac = inter.cast("double") / union
    return (
        cand.join(ta, "a_id")
        .join(tb, "b_id")
        .withColumn("jaccard_est", jac)
        .filter(F.col("jaccard_est") > JACCARD_THRESHOLD)
        .select("a_id", "b_id", "jaccard_est")
    )


def run_config(
    spark, g: int, q: float, n_docs: int = N_DOCS, n_tok: int = N_TOK
) -> dict:
    out = tempfile.mkdtemp(prefix="bbit_")
    try:
        synth_corpus(spark, out, g, q, n_docs, n_tok)
        # stats pass (uncached, not timed as an arm): candidate volume
        cand, t = candidates(spark, out)
        n_cand = cand.count()
        n_true = verify(cand, t).count()

        # arm A: verify everything (the shipping plan)
        t0 = time.perf_counter()
        cand, t = candidates(spark, out)
        verify(cand, t).write.format("noop").mode("overwrite").save()
        t_a = time.perf_counter() - t0

        # arm B: bits carried through the band keys, prune, then verify
        t0 = time.perf_counter()
        cand_b, t = candidates(spark, out, carry_bits=True)
        pruned = cand_b.filter(
            F.bit_count(F.col("a_bb").bitwiseXOR(F.col("b_bb")))
            <= F.lit(BBIT_CUTOFF)
        ).select("a_id", "b_id")
        verify(pruned, t).write.format("noop").mode("overwrite").save()
        t_b = time.perf_counter() - t0
        n_surv = pruned.count()

        ratio = (n_cand - n_true) / max(n_true, 1)
        return {
            "g": g,
            "q": q,
            "n_docs": n_docs,
            "n_tok": n_tok,
            "cand": n_cand,
            "true": n_true,
            "accident_ratio": round(ratio, 1),
            "survivors": n_surv,
            "t_noprune": round(t_a, 2),
            "t_prune": round(t_b, 2),
            "prune_wins": t_b < t_a,
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    spark = get_spark("bbit-crossover")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    # warm-up: JVM + codegen
    run_config(spark, 1, 0.01)
    configs = [
        # (g, q, n_docs, n_tok) — duplication sweep at fixture-ish length
        (1, 0.50, 60_000, 80),    # fixture-like: every collision true
        (16, 0.02, 60_000, 80),   # light boilerplate
        (64, 0.02, 60_000, 80),   # medium
        (64, 0.20, 60_000, 80),   # medium accidents, more true pairs
        (256, 0.02, 60_000, 80),  # heavy boilerplate: accidents dominate
        # length sweep: verification cost per candidate is the other axis
        (64, 0.02, 30_000, 320),
        (256, 0.02, 30_000, 320),
        (64, 0.02, 12_000, 800),
        (256, 0.02, 12_000, 800),
        (256, 0.02, 6_000, 2000),
    ]
    rows = [run_config(spark, g, q, nd, nt) for g, q, nd, nt in configs]
    print(f"\n{'g':>4} {'q':>5} {'docs':>7} {'tok':>5} {'cand':>9} "
          f"{'true':>7} {'acc:true':>9} {'surv':>9} {'A(s)':>7} {'B(s)':>7} win")
    for r in rows:
        print(
            f"{r['g']:>4} {r['q']:>5} {r['n_docs']:>7} {r['n_tok']:>5} "
            f"{r['cand']:>9} {r['true']:>7} "
            f"{r['accident_ratio']:>9} {r['survivors']:>9} "
            f"{r['t_noprune']:>7} {r['t_prune']:>7} "
            f"{'PRUNE' if r['prune_wins'] else 'plain'}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
