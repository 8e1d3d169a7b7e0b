#!/usr/bin/env python3
"""Measure stream_dedup_simhash's per-micro-batch cost as the stateful
LSH index GROWS — the question that decides whether the streaming
near-dup design survives an unbounded ingest: does batch k pay for the
k-1 batches already filed in state?

Method: split the sf0.1 documents into K equal files by doc_id hash,
drain with maxFilesPerTrigger=1 (one file per micro-batch, checkpointed
state carried across batches), and read per-batch durations and state
row counts from the streaming progress events.  The design predicts
~flat per-batch cost: each arrival compares only against its four
pigeonhole buckets' occupancy (bands of 7/7/6/6 bits — occupancy grows
like corpus/128 and corpus/64 per lang per band), never against the
whole index — so cost per batch should track CANDIDATE PAIRS per
batch, not cumulative state size.

Both state backends run (default HDFS-backed, then RocksDB — the
SCALE.md policy backend for unbounded key cardinality, which this op
has): per-batch costs are printed for each and the final pair sets are
asserted identical, putting a measured number on what the RocksDB
policy costs at this scale.

Run: python experiments/stream_dedup_growth.py   (~4 min, local[32])
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from covid_data_pipeline_spark.io import load, tune  # noqa: E402
from covid_data_pipeline_spark.queries.llm_dedup import (  # noqa: E402
    banded_simhash,
)
from covid_data_pipeline_spark.schemas import DOCUMENTS  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402
from covid_data_pipeline_spark.streaming import transforms as TR  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K_BATCHES = 10


def drain(spark, src: str, provider: str | None):
    """One availableNow drain of the K-file split under the given state
    store provider; returns (per-batch rows, sorted emitted pair set)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    if provider:
        spark.conf.set(key, provider)
    else:
        spark.conf.unset(key)
    stream = (
        spark.readStream.schema(DOCUMENTS)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    sdf = TR.stateful_simhash_band_dedup(banded_simhash(stream.repartition(32)))
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sdg_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [
        (
            p["batchId"],
            p["numInputRows"],
            p["batchDuration"],
            p["stateOperators"][0]["numRowsTotal"],
        )
        for p in q.recentProgress
        if p["numInputRows"] > 0
    ]
    pairs = sorted(
        tuple(r)
        for r in spark.table(name)
        .select("doc_a", "doc_b", "lang", "hamming")
        .distinct()
        .collect()
    )
    return rows, pairs


def main() -> None:
    spark = get_spark("stream-dedup-growth")
    tune(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    src = tempfile.mkdtemp(prefix="sdg_src_")
    d = load(spark, SF_DIR, "documents")
    n_docs = d.count()
    # deterministic K-way split; one file per slice => one micro-batch each
    for k in range(K_BATCHES):
        d.filter((F.col("doc_id") * 2654435761 % 2**32) % K_BATCHES == k) \
            .coalesce(1).write.mode("overwrite") \
            .parquet(os.path.join(src, f"b{k:02d}"))

    print(f"# {n_docs} docs in {K_BATCHES} micro-batches (sf_dir={SF_DIR})")
    results = {}
    for label, provider in (
        ("default", None),
        (
            "rocksdb",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        ),
    ):
        rows, pairs = drain(spark, src, provider)
        results[label] = (rows, pairs)
        print(f"# [{label}] batch  input_rows  batch_ms  state_rows")
        for bid, n_in, ms, st in rows:
            print(f"[{label}] {bid:>5} {n_in:>11} {ms:>9} {st:>11}")
        steady = [ms for _, _, ms, _ in rows[1:]]
        print(
            json.dumps(
                {
                    "backend": label,
                    "batches": len(rows),
                    "first_batch_ms": rows[0][2],
                    "steady_min_ms": min(steady),
                    "steady_max_ms": max(steady),
                    "distinct_pairs": len(pairs),
                }
            )
        )
    assert results["default"][1] == results["rocksdb"][1], (
        "pair sets differ between state backends"
    )
    print("# pair sets bit-identical across backends")
    spark.stop()


if __name__ == "__main__":
    main()
