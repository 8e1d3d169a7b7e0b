#!/usr/bin/env python3
"""r12: BPE trainer action fold (VERDICT #7).

Old shape: per merge round, TWO collects for the compression twin (the
argmax via orderBy().limit(1) + a separate corpus_tokens aggregate) and
one TakeOrdered collect for the plain trainer.  New shape: ONE
single-row aggregate per round carrying both the argmax (min_by on
(-n, a, b) — identical tie-break) and the curve's token count
(sum(n) + sum(freq), exact integers), plus one trailing pass for the
curve's final point.  Merge table and curve must be byte-identical.

This script copies the OLD trainer verbatim (pre-fold) and A/Bs it
in-process against the committed new one: exact equality of merges and
curve, then interleaved wall-clock.

Run: python experiments/opt_r12_bpe_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from covid_data_pipeline_spark.io import load, tune  # noqa: E402
from covid_data_pipeline_spark.queries.llm_text import (  # noqa: E402
    _BPE_MERGES,
    _bpe_train,
)
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 3


def _bpe_train_old(spark, sf_dir, track_corpus_tokens=False):
    """The pre-r12 trainer, verbatim (argmax via orderBy+limit, curve
    via a second per-round aggregate)."""
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seqs = words.select("w", "freq", F.split("w", "").alias("seq"))
    seqs = seqs.localCheckpoint(eager=False)

    def corpus_tokens() -> int:
        return int(
            seqs.agg(F.sum(F.col("freq") * F.size("seq")).alias("t")).collect()[0]["t"]
        )

    curve = [(0, corpus_tokens())] if track_corpus_tokens else []
    merges = []
    for rank in range(1, _BPE_MERGES + 1):
        pairs = seqs.select(
            "freq",
            F.explode(
                F.expr(
                    "transform(slice(seq, 1, size(seq)-1),"
                    " (x, i) -> struct(x AS a, seq[i+1] AS b))"
                )
            ).alias("p"),
        )
        counts = pairs.groupBy("p.a", "p.b").agg(F.sum("freq").alias("n"))
        best = counts.orderBy(F.col("n").desc(), "a", "b").limit(1).collect()[0]
        a, b, n = best["a"], best["b"], best["n"]
        merges.append((rank, a, b, a + b, int(n)))

        def _make_merge_fold(sym_a: str, sym_b: str):
            lit_a, lit_b, lit_ab = F.lit(sym_a), F.lit(sym_b), F.lit(sym_a + sym_b)

            def _merge_fold(acc, x):
                return F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == lit_a)
                    & (x == lit_b),
                    F.concat(
                        F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(lit_ab)
                    ),
                ).otherwise(F.concat(acc, F.array(x)))

            return _merge_fold

        seqs = seqs.select(
            "w",
            "freq",
            F.aggregate(
                "seq", F.array().cast("array<string>"), _make_merge_fold(a, b)
            ).alias("seq"),
        )
        seqs = seqs.localCheckpoint(eager=False)
        if track_corpus_tokens:
            curve.append((rank, corpus_tokens()))
    return merges, curve, seqs


def _bpe_train_nockpt(spark, sf_dir, track_corpus_tokens=False):
    """Fused argmax + NO per-round localCheckpoint: the per-round replay
    is <= 8 nested folds over the 31-row checkpointed word table —
    microseconds of execution — while each per-round checkpoint costs a
    materialization job.  Only the corpus-sized initial rollup stays
    truncated."""
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seqs = words.select("w", "freq", F.split("w", "").alias("seq"))
    seqs = seqs.localCheckpoint(eager=False)

    def pair_counts(s):
        pairs = s.select(
            "freq",
            F.explode(
                F.expr(
                    "transform(slice(seq, 1, size(seq)-1),"
                    " (x, i) -> struct(x AS a, seq[i+1] AS b))"
                )
            ).alias("p"),
        )
        return pairs.groupBy("p.a", "p.b").agg(F.sum("freq").alias("n"))

    w_total = (
        int(seqs.agg(F.sum("freq").alias("t")).collect()[0]["t"])
        if track_corpus_tokens
        else 0
    )
    curve = []
    merges = []
    from covid_data_pipeline_spark.queries.llm_text import _BPE_MERGES as NM
    for rank in range(1, NM + 1):
        counts = pair_counts(seqs)
        row = counts.agg(
            F.min_by(
                F.struct("a", "b", "n"),
                F.struct((-F.col("n")).alias("k1"), F.col("a").alias("k2"), F.col("b").alias("k3")),
            ).alias("best"),
            F.sum("n").alias("pw"),
        ).collect()[0]
        a, b, n = row["best"]["a"], row["best"]["b"], row["best"]["n"]
        if track_corpus_tokens:
            curve.append((rank - 1, int(row["pw"]) + w_total))
        merges.append((rank, a, b, a + b, int(n)))

        def _make_merge_fold(sym_a, sym_b):
            lit_a, lit_b, lit_ab = F.lit(sym_a), F.lit(sym_b), F.lit(sym_a + sym_b)
            def _merge_fold(acc, x):
                return F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == lit_a)
                    & (x == lit_b),
                    F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(lit_ab)),
                ).otherwise(F.concat(acc, F.array(x)))
            return _merge_fold

        seqs = seqs.select(
            "w", "freq",
            F.aggregate("seq", F.array().cast("array<string>"), _make_merge_fold(a, b)).alias("seq"),
        )
    if track_corpus_tokens:
        pw = pair_counts(seqs).agg(F.sum("n").alias("pw")).collect()[0]["pw"]
        curve.append((NM, int(pw) + w_total))
    return merges, curve, seqs


def main() -> None:
    spark = get_spark("opt-r12-bpe-ab")
    tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    spark.sparkContext.setJobDescription("bpe: correctness")
    m_old, c_old, _ = _bpe_train_old(spark, SF_DIR, track_corpus_tokens=True)
    m_new, c_new, _ = _bpe_train(spark, SF_DIR, track_corpus_tokens=True)
    m_nc, c_nc, _ = _bpe_train_nockpt(spark, SF_DIR, track_corpus_tokens=True)
    ok = m_old == m_new == m_nc and c_old == c_new == c_nc
    print(f"merges equal: {m_old == m_new}  curve equal: {c_old == c_new}")
    if not ok:
        print("old merges:", m_old)
        print("new merges:", m_new)
        print("old curve:", c_old)
        print("new curve:", c_new)
    print(f"CORRECTNESS: {'PASS' if ok else 'FAIL'}")

    spark.sparkContext.setJobDescription("bpe: perf A/B")
    arms = {
        "old train": lambda: _bpe_train_old(spark, SF_DIR),
        "new train": lambda: _bpe_train(spark, SF_DIR),
        "old compress": lambda: _bpe_train_old(spark, SF_DIR, True),
        "new compress": lambda: _bpe_train(spark, SF_DIR, True),
        "nockpt train": lambda: _bpe_train_nockpt(spark, SF_DIR),
        "nockpt compress": lambda: _bpe_train_nockpt(spark, SF_DIR, True),
    }
    tot = {k: [] for k in arms}
    for _ in range(ROUNDS):
        for k, fn in arms.items():
            t0 = time.perf_counter()
            fn()
            tot[k].append(time.perf_counter() - t0)
    for k, ts in tot.items():
        ts.sort()
        print(f"{k:14s} med={ts[len(ts)//2]:6.3f}s  min={ts[0]:6.3f}  max={ts[-1]:6.3f}")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
