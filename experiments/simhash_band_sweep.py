#!/usr/bin/env python3
"""Sweep the simhash LSH band width — the accuracy/cost dial both
dedup_cluster_cc and stream_dedup_simhash expose (two bands of B bits
over the 26-bit fingerprint, collision in either band => candidate).

For each B, measure against ALL same-lang Hamming<=3 pairs (ground
truth, exact): recall (what fraction of true pairs collide in a band),
candidate volume (sum of bucket-pair counts — the verification work),
and max bucket size (the skew/hot-key risk).  Wider bands => fewer,
more-precise candidates but lower recall for pairs whose differing bits
straddle both bands; narrower bands => recall -> 1 but buckets coarsen
toward all-pairs.  DuckDB computes the sweep (exact integer simhash,
same CTE the oracles use) — this is a DATA study, not an engine
benchmark.

Run: python experiments/simhash_band_sweep.py   (~1 min)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from covid_data_pipeline_spark.queries.llm_dedup import (  # noqa: E402
    _SIMHASH_SQL_CTES,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HAM_MAX = 3
BAND_BITS = (8, 10, 13, 16, 20)


def main() -> None:
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    con.sql(f"CREATE TABLE sh_t AS WITH {_SIMHASH_SQL_CTES} SELECT * FROM sh")

    true_pairs = con.sql(f"""
        SELECT count(*) FROM sh_t a JOIN sh_t b
          ON a.lang = b.lang AND a.doc_id < b.doc_id
         AND bit_count(xor(a.simhash, b.simhash)) <= {HAM_MAX}
    """).fetchone()[0]
    print(f"# sf_dir={SF_DIR}  true same-lang ham<={HAM_MAX} pairs: {true_pairs}")
    print("# band_bits  recall  candidate_pairs  max_bucket")

    for bb in BAND_BITS:
        mask = (1 << bb) - 1
        caught = con.sql(f"""
            SELECT count(*) FROM sh_t a JOIN sh_t b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
             AND bit_count(xor(a.simhash, b.simhash)) <= {HAM_MAX}
             AND ((a.simhash & {mask}) = (b.simhash & {mask})
                  OR (a.simhash >> {bb}) = (b.simhash >> {bb}))
        """).fetchone()[0]
        cand, mx = con.sql(f"""
            WITH buckets AS (
                SELECT lang, 0 AS band, simhash & {mask} AS val FROM sh_t
                UNION ALL
                SELECT lang, 1, simhash >> {bb} FROM sh_t
            ),
            occ AS (SELECT count(*) AS n FROM buckets GROUP BY lang, band, val)
            SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT), max(n) FROM occ
        """).fetchone()
        rec = caught / true_pairs if true_pairs else 1.0
        print(f"{bb:>11} {rec:>7.4f} {cand:>16} {mx:>11}")
        print(json.dumps({
            "band_bits": bb, "recall": round(rec, 4),
            "candidate_pairs": int(cand), "max_bucket": int(mx),
        }))

    # the pigeonhole scheme stream_dedup_simhash ships: 4 bands of
    # 7+7+6+6 bits — recall for ham<=3 is EXACTLY 1 (<=3 flips cannot
    # touch all 4 bands), so only cost is measured
    bands = ((0, 7), (7, 7), (14, 6), (20, 6))
    sel = " UNION ALL ".join(
        f"SELECT lang, {i} AS band, (simhash >> {off}) & {(1 << w) - 1} AS val"
        f" FROM sh_t"
        for i, (off, w) in enumerate(bands)
    )
    cand, mx = con.sql(f"""
        WITH buckets AS ({sel}),
        occ AS (SELECT count(*) AS n FROM buckets GROUP BY lang, band, val)
        SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT), max(n) FROM occ
    """).fetchone()
    print(json.dumps({
        "band_scheme": "4x(7,7,6,6) pigeonhole", "recall": 1.0,
        "candidate_pairs": int(cand), "max_bucket": int(mx),
    }))


if __name__ == "__main__":
    main()
