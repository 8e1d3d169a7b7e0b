#!/usr/bin/env python3
"""Generate PLANS.md — formatted physical plans for representative
queries, with the scale property each plan is expected to exhibit.
Rerun after plan-affecting changes: python gen_plans_md.py

This is the audit trail for the 100 TB design claims in SCALE.md: the
properties asserted programmatically in tests/test_plans.py are shown
here as the actual Catalyst output so a reviewer can read them without
running Spark.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from covid_data_pipeline_spark.registry import load_all  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

# (query, what the plan must show, execute-first?)
SHOWN = (
    (
        "agg_groupby",
        "Partial+final HashAggregate inside WholeStageCodegen; shipdate "
        "predicate pushed to the parquet scan; AQE finalizes partitions.",
        True,
    ),
    (
        "scan_projected",
        "ReadSchema carries only the 2 projected columns of lineitem's 11 "
        "— column pruning reaches the reader.",
        False,
    ),
    (
        "join_multikey_chain",
        "nation/region broadcast (no shuffle); the two fact joins shuffle "
        "once each on their keys.",
        False,
    ),
    (
        "join_bloom_runtime",
        "bloom_filter_agg on filtered orders + might_contain on the "
        "lineitem scan: fact rows pruned BEFORE the shuffle.",
        False,
    ),
    (
        "join_bucketed",
        "SortMergeJoin with NO Exchange below it — both sides pre-bucketed "
        "on the join key (the recurring-join amortization).",
        False,
    ),
    (
        "join_asof",
        "One shuffle on user_id + one sort: the window formulation of "
        "as-of, no self-join blow-up.",
        False,
    ),
    (
        "analytics_forecast_revenue",
        "All three predicates in PushedFilters; single scan + one-row "
        "aggregate: scan-bandwidth bound.",
        False,
    ),
    (
        "analytics_small_qty_revenue",
        "Correlated scalar subquery decorrelated to ONE window over "
        "l_partkey; part dim broadcast after its filter.",
        False,
    ),
    (
        "dedup_minhash_lsh",
        "Banded-signature equi-join (Exchange on band key) — candidate "
        "generation is never a cartesian product.",
        False,
    ),
    (
        "corpus_contamination_check",
        "Eval shingle set broadcast (BroadcastHashJoin on gram) — the "
        "corpus side never shuffles by shingle; only hit pairs shuffle.",
        False,
    ),
    (
        "dedup_paragraph_exact",
        "Segment fan-out map-side (sequence+explode inside codegen); one "
        "shuffle on the segment hash carries 3 skinny columns.",
        False,
    ),
    (
        "analytics_late_orders",
        "EXISTS plans as LeftSemi with the correlated non-equi lateness "
        "predicate inside the join — no duplication, no Distinct.",
        False,
    ),
    (
        "sort_multi_nulls",
        "Two-phase global rank: the Window is PARTITIONED by the "
        "deterministic (priority, price-band) bucket (no single-task "
        "WindowExec); bucket offsets come back as a BroadcastHashJoin.",
        False,
    ),
    (
        "text_tf",
        "Global top-20 terms via TakeOrderedAndProject (per-partition "
        "partial top-k) — the growing vocabulary is never globally "
        "sorted; ranking happens on one collected 20-element array.",
        False,
    ),
    (
        "ts_resample_ohlc",
        "OHLC bars in ONE aggregate with map-side partials (struct "
        "min/max plans as SortAggregate, but each task still ships one "
        "4-scalar bar per group) — no window, no per-user sort of "
        "observations through the shuffle.",
        False,
    ),
    (
        "win_sessionize",
        "Batch sessionization: lag-window, running-sum window and the "
        "per-session aggregate ALL share one hashpartitioning(user_id) "
        "— a single Exchange for the whole gaps-and-islands chain.",
        False,
    ),
    (
        "dedup_incremental_exact",
        "Increment anti-joins the corpus HASH INDEX (not the corpus), "
        "then first-occurrence window + per-lang audit — the shuffles "
        "key on uniform sha256, skew-free by construction.",
        False,
    ),
    (
        "sim_maxsim_rerank",
        "Query token set broadcast against the token table (corpus never "
        "shuffles); per-(doc, q) MAX partial-aggregates map-side; top-10 "
        "is TakeOrderedAndProject — MaxSim as a rerank, not a corpus "
        "scan per query.",
        False,
    ),
    (
        "win_rolling_bitmap_distinct",
        "Raw events aggregate ONCE into persisted (day, bucket) bitmaps "
        "(3x InMemoryTableScan — the spine reads the cache, never "
        "re-scans events); the OR-window partitions by bucket; every "
        "window row is a fixed 4 KB blob.  Shown from the lazy inner "
        "plan (the registered query localizes its day-grain result to "
        "release the cache).",
        False,
    ),
    (
        "udf_cogroup_merge",
        "FlatMapCoGroupsInPandas over exactly two hash exchanges (one "
        "per cogrouped side), no Join node — and NO AQE coalescing: "
        "partition count must track GROUP count for per-key Python "
        "stages (measured 6.4x, SCALE.md).",
        False,
    ),
    (
        "sink_positional_delete",
        "Merge-on-read deletion vectors: scan + BroadcastHashJoin "
        "LeftAnti on (_metadata.file_path, row_index) — positions "
        "subtract without touching data files.",
        False,
    ),
    (
        "graph_pagerank",
        "3 statically-unrolled PageRank iterations in ONE plan — no "
        "driver round trips; quantized-integer decimal sums make the "
        "iterative float algorithm hash-exact; top-20 is TakeOrdered.",
        False,
    ),
    (
        "text_phrase_search",
        "Index-shaped phrase search: term filter BELOW the aggregate "
        "(only probed terms' postings shuffle), partial_collect_list "
        "map-side, ONE Exchange, adjacency as an in-array intersection "
        "— never a token self-join.",
        False,
    ),
    (
        "ts_interpolate_linear",
        "Backward and forward context frames FUSED into one Window node "
        "over one sort (shared partition+order); day spine broadcast; "
        "two hash exchanges total, both on small aggregates.",
        False,
    ),
    (
        "analytics_copurchase_lift",
        "Basket-key self-equi-join pair generation (a-priori fan-out "
        "bound), part totals + basket count broadcast, lift top-20 via "
        "TakeOrderedAndProject; the 4-consumer distinct is lineage-"
        "truncated so it executes once.",
        False,
    ),
    (
        "text_bpe_encode",
        "Tokenizer APPLY as a broadcast join against the pre-merged "
        "vocabulary (checkpointed model state): one corpus explode, "
        "BroadcastHashJoin on the word, ONE per-doc hash aggregate — "
        "the corpus is touched once and no merge re-runs at encode "
        "time.",
        False,
    ),
    (
        "agg_histogram_quantile",
        "Mergeable-quantile shape: partial+final HashAggregate builds "
        "the (group, bin) table map-side; both Windows and the final "
        "aggregate operate on the BIN table (bounded by value-range / "
        "bin-width), never on lineitem rows.",
        False,
    ),
    (
        "agg_mad_anomaly",
        "Exact robust statistics: two ranked median passes (Window sort "
        "per group) whose scalar results rejoin via BroadcastHashJoin; "
        "every value integer (cents / doubled order statistics), so the "
        "3-MAD gate is an integer comparison — no interpolation node "
        "anywhere in the plan.",
        False,
    ),
    (
        "sql_lateral_topk",
        "LATERAL ORDER BY..LIMIT decorrelated: WindowGroupLimit runs "
        "Partial BEFORE the exchange (each map task keeps <=2 orders "
        "per customer) then Final after it — the shuffle carries "
        "2·|customers| rows, not |orders|; customer side broadcasts.",
        False,
    ),
    (
        "analytics_skyline_pareto",
        "Dominance via the broadcast size-histogram sweep "
        "(BroadcastHashJoin back to the catalog, map-only filter) — the "
        "catalog never self-joins; the quadratic NOT EXISTS lives only "
        "in the DuckDB oracle.",
        False,
    ),
    (
        "join_spatial_grid",
        "Radius self-join through the grid-cell equi-join (9x map-side "
        "neighbor explode, exact distance filter on co-located "
        "candidates only) — no cartesian, no theta-join.",
        False,
    ),
    (
        "ts_lttb_downsample",
        "8 statically-unrolled bucket argmaxes as array folds over one "
        "calendar-bounded array per key — the sequential LTTB "
        "dependency never becomes a window or a driver loop; all "
        "selection arithmetic is exact integer.",
        False,
    ),
    (
        "sim_mmr_diversify",
        "Greedy MMR statically unrolled: ONE broadcast scoring pass is "
        "the only corpus-sized stage (localCheckpoint truncates the "
        "candidate pool), then each pick is an anti-join + bounded "
        "pairwise penalty + WindowGroupLimit argmax over 8-row tables.",
        False,
    ),
    (
        "join_scd2_point_in_time",
        "Temporal lookup as TWO windows over ONE "
        "hashpartitioning(user_id) exchange — the change detector and "
        "the version carry-forward share the sort; no range join, no "
        "interval-table hot-key explosion.",
        False,
    ),
    (
        "text_ngram_novelty",
        "Inverted-index novelty: explode distinct 5-grams, partial_min "
        "map-side combine per shingle, re-join on the SAME shingle key — "
        "never a doc-pair join.",
        False,
    ),
    (
        "text_bigram_lm_crossentropy",
        "Held-out bigram LM: two (lang, gram) count shuffles with "
        "map-side combine, vocab dim broadcast onto the corpus-sized "
        "probability join; per-bigram log-probs quantized before the "
        "per-lang sum.",
        False,
    ),
    (
        "agg_survival_kaplan_meier",
        "Kaplan-Meier: ONE rank window per (type, user) is the only "
        "corpus-sized stage; at-risk sets come from a DESCENDING "
        "cumulative window over the calendar-bounded risk table, and "
        "the product-limit form is a SUM of quantized hazard logs — "
        "never a windowed float product.",
        False,
    ),
    (
        "sim_silhouette_labels",
        "Panel-bounded silhouette: the 10% panel BROADCASTS into the "
        "pair join (BroadcastNestedLoopJoin — the corpus is never "
        "shuffled for pairing); norms are hoisted to one fold per row, "
        "one dot fold per pair.",
        False,
    ),
    (
        "pipeline_corpus_build",
        "The whole pretraining build is ONE Union DAG with no "
        "intermediate action: the clean/langid/quality gates collapse "
        "into scan-side filters, the exact-dedup window and the PPJoin "
        "candidate join appear once, and AQE deduplicates the shared "
        "shuffle subtrees at runtime (16 ReusedExchange in the final "
        "adaptive plan).",
        True,
    ),
    (
        "pipeline_quality_report",
        "Each table's checks EXPLODE from one wide-aggregate row "
        "(events/documents scanned exactly once; orders/lineitem twice "
        "— own agg + FK-orphan anti-join probe).  The branch-per-check "
        "union it replaced re-instantiated the aggregate subtree per "
        "check: 4 events scans, zero runtime reuse.",
        False,
    ),
    (
        "pipeline_incremental_ingest",
        "Round-9 flagship: stage gates are PER-ROW FLAGS folded by ONE "
        "wide conditional aggregate and exploded into the 9 report rows "
        "— documents scanned exactly 4x (two increment feed branches + "
        "corpus hash index + corpus count), one intra-dedup window, the "
        "DISTINCT corpus index broadcast into the hash join, no driver "
        "action and no Python between stages.",
        False,
    ),
    (
        "pipeline_decontaminate",
        "The TEST split's distinct shingles broadcast into the train-"
        "side join (the corpus never shuffles by shingle — the eval "
        "split is fixed-size at any corpus scale); the kill list is "
        "doc_id-distinct and left-joined into one 3-row split report.",
        False,
    ),
    (
        "pipeline_daily_series_report",
        "ONE events scan feeds the daily rollup; the cumulative, "
        "difference, and 7-day RANGE-frame stages are three Window "
        "passes sharing the (event_type, day-index) sort on the "
        "calendar-bounded table — no second shuffle after the rollup.",
        False,
    ),
    (
        "pipeline_merged_snapshot",
        "Round-10: the corpus-sized serving rewrite downstream of the "
        "increment-sized localCheckpoint (which truncates the admitted "
        "subtree so window + increment scans run once, not once per "
        "merge arm) is exactly ONE corpus parquet scan + ONE broadcast "
        "hash join + union — the corpus is never shuffled or windowed.",
        False,
    ),
)
# queries whose registered fn eagerly localizes (cache-release pattern):
# show the lazy inner plan instead
def _rolling_lazy_df(spark):
    from covid_data_pipeline_spark.io import load
    from covid_data_pipeline_spark.queries.windows import _rolling_bitmap_lazy

    daily, out = _rolling_bitmap_lazy(load(spark, SF, "events"))
    _DEFERRED_UNPERSIST.append(daily)
    return out


_DEFERRED_UNPERSIST = []

LAZY_OVERRIDES = {"win_rolling_bitmap_distinct": _rolling_lazy_df}


def main() -> None:
    spark = get_spark("plans-md")
    reg = load_all()
    out = [
        "# PLANS — Catalyst physical plans for representative operators",
        "",
        "Generated by `gen_plans_md.py` at sf0.01 (plans are scale-independent",
        "in shape; AQE-finalized where noted). The per-plan claims are asserted",
        "programmatically in `tests/test_plans.py`; SCALE.md explains why each",
        "property is the one that matters at 100 TB.",
        "",
    ]
    for name, claim, execute in SHOWN:
        if name in LAZY_OVERRIDES:
            df = LAZY_OVERRIDES[name](spark)
        else:
            df = reg[name].fn(spark, SF)
        if execute:
            df.write.format("noop").mode("overwrite").save()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the tree; from the verbose detail sections keep only the
        # scan evidence lines (pushdown + pruned read schema)
        tree = plan.split("\n\n")[0]
        evidence = [
            ln.strip()
            for ln in plan.splitlines()
            if ln.strip().startswith(("PushedFilters:", "ReadSchema:"))
        ]
        out += [f"## {name}", "", claim, "", "```", tree]
        if evidence:
            out += [""] + evidence
        out += ["```", ""]
    for cached in _DEFERRED_UNPERSIST:
        cached.unpersist()
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWN)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
