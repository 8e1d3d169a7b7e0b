#!/usr/bin/env python3
"""Generate OPERATORS.md — the live operator inventory — from the query
registry, so the doc can never drift from the code.  Rerun after adding
operators: python gen_operators_md.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from covid_data_pipeline_spark.registry import load_all  # noqa: E402

FAMILIES = (
    ("scan_", "Scans / sources / sinks (§2.1)"),
    ("sink_", None),
    ("source_", None),
    ("proj_", "Projections / filters (§2.2)"),
    ("filter_", None),
    ("join_", "Joins (§2.3)"),
    ("agg_", "Aggregations (§2.4)"),
    ("select_", None),
    ("win_", "Window functions (§2.5)"),
    ("sort_", "Sorts / top-k (§2.6)"),
    ("limit_", None),
    ("topk_", None),
    ("set_", "Set operations (§2.7)"),
    ("str_", "Scalar functions (§2.8)"),
    ("date_", None),
    ("ts_", None),
    ("math_", None),
    ("cond_", None),
    ("cast_", None),
    ("array_", None),
    ("explode_", None),
    ("map_", None),
    ("json_", None),
    ("stream_", "Streaming (§2.9)"),
    ("dedup_", "LLM-pipeline: dedup (§2.10)"),
    ("sim_", "LLM-pipeline: similarity search (§2.10)"),
    ("embed_", None),
    ("text_", "LLM-pipeline: text analysis (§2.10)"),
    ("quality_", None),
    ("multimodal_", "LLM-pipeline: multimodal (§2.10)"),
    ("udf_", "LLM-pipeline: UDF migration ladder (§2.10)"),
    ("udtf_", None),
    ("pipeline_", "Composed pipelines & analytics (§2.11)"),
    ("analytics_", None),
    ("scd2_", None),
    ("merge_", None),
    ("reshape_", None),
    ("profile_", None),
    ("corpus_", "Corpus management & training prep (§2.11)"),
    ("sample_", None),
    ("doc_", None),
)


def family_of(name: str) -> str:
    current = "Other"
    for prefix, title in FAMILIES:
        if name.startswith(prefix):
            # walk back to the nearest named section for grouped prefixes
            idx = [p for p, _ in FAMILIES].index(prefix)
            while FAMILIES[idx][1] is None:
                idx -= 1
            return FAMILIES[idx][1]
    return current


# One-line justification per rows-only id: WHY no DuckDB oracle can
# hash-check it, and what asserts its correctness instead.  Keyed by
# query id; the generator fails if an id here is stale or a rows-only
# query lacks an entry — so this list can never drift from the registry.
ROWS_ONLY_WHY = {
    "graph_kcore": (
        "iterative degree peeling to a fixpoint — recursive set "
        "shrinkage has no fixed-depth ANSI-SQL twin (append-only "
        "recursive CTEs cannot drop rows). Exact equality with an "
        "imperative Python peel replay asserted in tests."
    ),
    "stream_progress_metrics": (
        "the output IS the engine's own StreamingQueryProgress telemetry "
        "(batch counts, state rows) — no SQL twin exists by definition. "
        "Exact expected values at fixture scale asserted in "
        "tests/test_streaming.py."
    ),
    "sim_pq_adc_rerank": (
        "iterative Lloyd codebook training + model-state collect — the "
        "driver-contract category exempt from SQL twins. Determinism and "
        "recall@5 >= 0.7 vs the brute-force twin asserted in tests."
    ),
    "text_bpe_compression": (
        "per-round corpus token counts from the iterative trainer — no "
        "SQL twin. The pure-Python replay asserts the curve exactly in "
        "tests."
    ),
    "text_bpe_train": (
        "iterative merge training with per-round model-state argmax — no "
        "SQL twin. Exact equality with an independent pure-Python BPE "
        "replay asserted in tests."
    ),
    "text_bpe_encode": (
        "applies the iteratively-trained merge table — no SQL twin for "
        "the training half. Per-doc token counts equal a pure-Python "
        "train+apply replay exactly in tests."
    ),
    "sink_compact_small_files": (
        "output is a FILE-COUNT audit of a filesystem rewrite; DuckDB has no "
        "view of Spark's task file layout. Row preservation is proven by the "
        "in-query count; layout collapse asserted in tests/test_corpus.py."
    ),
    "agg_approx_distinct": (
        "HyperLogLog++ estimate — implementation-defined value with no "
        "DuckDB twin. Accuracy vs exact COUNT(DISTINCT) asserted in tests."
    ),
    "agg_sketch_mergeable": (
        "DataSketches HLL binary sketches + union — engine-specific "
        "representation. Union-vs-direct agreement and accuracy asserted in "
        "tests."
    ),
    "agg_sliding_sketch_union": (
        "window over DataSketches HLL sketches — engine-specific. 5% "
        "agreement vs exact sliding distinct asserted day-by-day in tests."
    ),
    "dedup_minhash_lsh": (
        "LSH is approximate BY DESIGN (recall < 1); an exact oracle would "
        "assert the wrong contract. Recall >= 0.8 vs the exact Jaccard twin "
        "asserted in tests/test_llm_ops.py."
    ),
    "dedup_containment_lsh": (
        "LSH candidate generation is approximate BY DESIGN; precision is "
        "exact (candidates are verified) but recall < 1. Recall >= 0.9 and "
        "pair-subset precision vs the exact containment twin asserted in "
        "tests/test_llm_ops.py."
    ),
    "sim_pca_project": (
        "eigenvector sign/order are numpy implementation detail. Variance "
        "ordering, centering and reconstruction quality asserted in tests."
    ),
    "profile_parquet_footers": (
        "audits the PHYSICAL file/row-group layout of a Spark write in a "
        "fresh scratch dir; DuckDB has no view of that filesystem state. "
        "Row counts cross-checked against the logical groupBy and layout "
        "asserted in tests/test_corpus.py."
    ),
    "stream_spacesaving_topk": (
        "custom GroupState operator on a TRUE incremental stream; the "
        "sketch state evolves per micro-batch. Exact Space-Saving "
        "invariants (sum(est) == n_seen, no undercount, <= capacity "
        "counters) asserted vs batch truth in tests/test_streaming.py."
    ),
    "text_compression_ratio": (
        "zlib runs only in the Python workers — no DuckDB twin. Exact "
        "equality with a driver-side pure-Python zlib replay asserted in "
        "tests/test_llm_ops.py."
    ),
}


def main() -> None:
    reg = load_all()
    rows_only = {n for n, s in reg.items() if s.oracle is None}
    assert rows_only == set(ROWS_ONLY_WHY), (
        f"ROWS_ONLY_WHY drift: missing={sorted(rows_only - set(ROWS_ONLY_WHY))} "
        f"stale={sorted(set(ROWS_ONLY_WHY) - rows_only)}"
    )
    by_family: dict[str, list] = {}
    for name, spec in sorted(reg.items()):
        by_family.setdefault(family_of(name), []).append(spec)

    # "Other" catches any prefix not mapped above — emitted, never dropped
    ordered_titles = [t for _, t in FAMILIES if t is not None] + ["Other"]
    lines = [
        "# OPERATORS — live query inventory",
        "",
        "Generated from `covid_data_pipeline_spark/registry.py` by "
        "`gen_operators_md.py`; do not edit by hand.",
        "",
        f"**{len(reg)} registered queries** — "
        f"{sum(1 for s in reg.values() if s.oracle)} DuckDB-oracle-checked, "
        f"{sum(1 for s in reg.values() if not s.oracle)} rows-only "
        "(approximate / filesystem side effect / true streaming).",
        "",
    ]
    for title in ordered_titles:
        specs = by_family.get(title)
        if not specs:
            continue
        lines += [f"## {title}", "", "| query | oracle | summary |", "| --- | --- | --- |"]
        for s in specs:
            first = (s.doc or "").split(". ")[0].split(".\n")[0].replace("\n", " ")
            first = " ".join(first.split())[:160]
            lines.append(
                f"| `{s.name}` | {'SQL-checked' if s.oracle else 'rows-only'} | {first} |"
            )
        lines.append("")
    lines += [
        "## Rows-only queries: why no SQL oracle, and what checks them instead",
        "",
        "The 'driver sees' column is what the external driver CAN record for",
        "these ids (row count + schema at sf0.01) — extracted from each",
        "docstring's `Driver sees (sf0.01):` line, which the oracle harness",
        "verifies against the materialized frame on every preflight run.",
        "",
        "| query | justification | driver sees (sf0.01) |",
        "| --- | --- | --- |",
    ]
    import re as _re

    for name in sorted(ROWS_ONLY_WHY):
        # same pattern as oracle_harness._check_driver_sees, so both
        # extractors parse the line identically (a greedy [^.]*\) here
        # would mis-capture a second parenthesized clause — r6 ADVICE)
        m = _re.search(
            r"Driver sees \(sf0\.01\): (\d+ rows?; columns \([^)]*\))",
            reg[name].doc or "",
        )
        assert m, (
            f"{name}: rows-only docstring missing the "
            "'Driver sees (sf0.01): N rows; columns (...)' line"
        )
        sees = " ".join(m.group(1).split())  # collapse wrapped-line indent
        lines.append(f"| `{name}` | {ROWS_ONLY_WHY[name]} | {sees} |")
    lines.append("")
    with open("OPERATORS.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote OPERATORS.md ({len(reg)} queries)")


if __name__ == "__main__":
    main()
