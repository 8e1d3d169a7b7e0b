#!/usr/bin/env python3
"""Sweep the shingle GRANULE of substring-span dedup (dedup_span_ngram /
dedup_span_removal) — the recall/volume dial the SCALE.md note names.

The Lee et al. suffix-array formulation finds duplicated substrings at
EVERY length >= L; the distributed fixed-granule variant only sees
duplication at >= k tokens, so smaller k recovers more (and finer)
spans at the cost of a bigger duplicated-shingle set and more marked
positions flowing into the islands merge.  For each k this sweep
measures, per scale factor: duplicated shingles (the rejoin build
side), marked positions (islands input volume), resulting span count,
and the interval-union token coverage (what a removal pass would cut —
the number that actually matters to a mixture builder).

DuckDB computes the sweep (same CTE shape as the shipped oracles —
this is a DATA study, not an engine benchmark).

Run: python experiments/span_granule_sweep.py   (~1 min)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SWEEP_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
pos AS (
    SELECT doc_id,
           unnest(generate_series(1, greatest(len(toks) - {km1}, 0))) AS pos,
           toks
    FROM d
),
sh AS (
    SELECT doc_id, pos,
           array_to_string(list_slice(toks, pos, pos + {km1}), ' ') AS shingle
    FROM pos
),
dup AS (
    SELECT shingle FROM sh GROUP BY shingle
    HAVING COUNT(DISTINCT doc_id) >= 2
),
marked AS (SELECT s.doc_id, s.pos FROM sh s JOIN dup USING (shingle)),
isl AS (
    SELECT doc_id, pos,
           pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS anchor
    FROM marked
),
spans AS (
    SELECT doc_id, MIN(pos) AS s, MAX(pos) + {km1} AS e
    FROM isl GROUP BY doc_id, anchor
),
cov AS (
    SELECT doc_id,
           list_reduce(
               list_prepend({{'s': CAST(0 AS BIGINT), 'e': CAST(0 AS BIGINT)}},
                            list_sort(list({{'s': s, 'e': e}}))),
               (a, x) -> {{'s': a.s + greatest(CAST(0 AS BIGINT),
                                               x.e - greatest(a.e, x.s - 1)),
                           'e': greatest(a.e, x.e)}}
           ).s AS removed
    FROM spans GROUP BY doc_id
)
SELECT (SELECT COUNT(*) FROM dup)                       AS dup_shingles,
       (SELECT COUNT(*) FROM marked)                    AS marked_positions,
       (SELECT COUNT(*) FROM spans)                     AS n_spans,
       (SELECT COALESCE(SUM(removed), 0) FROM cov)      AS tokens_removed,
       (SELECT SUM(len(string_split(text, ' ')))
        FROM documents)                                 AS tokens_total
"""


def main() -> None:
    results = []
    for sf in ("0.01", "0.1"):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'/root/testdata/sf{sf}/documents.parquet'"
        )
        for k in (3, 5, 8):
            row = con.execute(SWEEP_SQL.format(km1=k - 1)).fetchone()
            dup_sh, marked, n_spans, removed, total = row
            results.append(
                {
                    "sf": sf,
                    "k": k,
                    "dup_shingles": dup_sh,
                    "marked_positions": marked,
                    "n_spans": n_spans,
                    "tokens_removed": int(removed),
                    "removed_pct": round(100.0 * removed / total, 2),
                }
            )
            print(json.dumps(results[-1]))
        con.close()


if __name__ == "__main__":
    main()
