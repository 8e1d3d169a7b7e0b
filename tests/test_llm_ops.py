"""Semantic tests for the approximate / rows-only LLM operators: the
oracle can't hash-check these, so we assert their quality contracts
against the exact twins."""

from __future__ import annotations

import pytest

from covid_data_pipeline_spark.registry import load_all

from .conftest import SF_ORACLE, SF_SMOKE


def _pairs(df, a="a_id", b="b_id"):
    return {(r[a], r[b]) for r in df.collect()}


def test_minhash_recall_vs_exact_jaccard(spark):
    reg = load_all()
    exact = _pairs(reg["dedup_near_jaccard"].fn(spark, SF_ORACLE))
    approx = _pairs(reg["dedup_minhash_lsh"].fn(spark, SF_ORACLE))
    assert exact, "exact Jaccard found no pairs — fixture drift?"
    recall = len(exact & approx) / len(exact)
    # 8 hash tables at threshold 0.7 -> high recall expected
    assert recall >= 0.8, f"minhash LSH recall {recall:.3f} < 0.8"


def test_ann_recall_vs_brute_force(spark):
    reg = load_all()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in reg["sim_topk_neighbors"].fn(spark, SF_ORACLE).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in reg["sim_ann_bucketed"].fn(spark, SF_ORACLE).collect()
    }
    assert len(exact) == 50  # 10 queries x top-5
    recall = len(exact & approx) / len(exact)
    # one 6-bit table + radius-1 multi-probe (7 of 64 buckets probed):
    # measured recall@5 0.40-0.42 on the weak-signal fixture (round 11
    # — the pre-fix "0.2" floor was an artifact of the collapsed-plane
    # bug that put half the corpus in each query's bucket); more tables
    # / wider probes raise it at scale
    assert recall >= 0.3, f"bucketed ANN recall {recall:.3f} < 0.3"


def test_ann_is_deterministic(spark):
    reg = load_all()
    r1 = sorted(map(tuple, reg["sim_ann_bucketed"].fn(spark, SF_ORACLE).collect()))
    r2 = sorted(map(tuple, reg["sim_ann_bucketed"].fn(spark, SF_ORACLE).collect()))
    assert r1 == r2


def test_approx_distinct_accuracy(spark):
    reg = load_all()
    approx = {
        r["event_type"]: r["approx_users"]
        for r in reg["agg_approx_distinct"].fn(spark, SF_ORACLE).collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in reg["agg_count_distinct"].fn(spark, SF_ORACLE).collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) / n <= 0.1, (et, approx[et], n)


def test_decode_stub_contract(spark):
    from covid_data_pipeline_spark.queries.llm_multimodal import decode_image_stub

    w, h, mode = decode_image_stub(b"some bytes")
    assert 64 <= w < 256 and 64 <= h < 256 and mode in ("RGB", "L")
    assert decode_image_stub(b"some bytes") == (w, h, mode)  # deterministic
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"x", real_decode=True)


def test_decode_pipeline_schema_and_rows(spark):
    reg = load_all()
    df = reg["multimodal_decode_pipeline"].fn(spark, SF_ORACLE)
    rows = df.collect()
    assert len(rows) == 500  # one metadata row per document
    assert df.columns == [
        "doc_id", "source", "n_bytes", "width", "height", "mode", "thumb_bytes",
    ]
    for r in rows[:20]:
        assert r["n_bytes"] > 0 and r["thumb_bytes"] == (r["width"] // 4) * (
            r["height"] // 4
        )


def test_csv_roundtrip_counts_match_parquet(spark):
    from covid_data_pipeline_spark.io import load as load_table

    reg = load_all()
    via_csv = {
        r["event_type"]: r["n"]
        for r in reg["scan_csv_roundtrip"].fn(spark, SF_ORACLE).collect()
    }
    direct = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert via_csv == direct


def test_sink_partitioned_prunes_and_counts(spark):
    reg = load_all()
    rows = reg["sink_parquet_partitioned"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 1 and rows[0]["event_type"] == "purchase"
    assert rows[0]["n"] > 0


def test_framesample_fanout_contract(spark):
    from covid_data_pipeline_spark.queries.llm_multimodal import frame_count_stub

    reg = load_all()
    df = reg["multimodal_framesample"].fn(spark, SF_ORACLE)
    rows = df.collect()
    assert df.columns == ["doc_id", "frame_idx", "n_frames", "frame_digest"]
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 500  # every document fans out
    for doc_rows in list(by_doc.values())[:20]:
        n = doc_rows[0]["n_frames"]
        # every 4th frame, deterministic count
        assert sorted(r["frame_idx"] for r in doc_rows) == list(range(0, n, 4))
        assert all(len(r["frame_digest"]) == 64 for r in doc_rows)
    with pytest.raises(NotImplementedError):
        frame_count_stub(b"x", real_decode=True)


def test_ivf_recall_and_determinism(spark):
    reg = load_all()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in reg["sim_topk_neighbors"].fn(spark, SF_ORACLE).collect()
    }
    runs = [
        sorted(map(tuple, reg["sim_ann_ivf"].fn(spark, SF_ORACLE).collect()))
        for _ in range(2)
    ]
    assert runs[0] == runs[1], "IVF ANN must be deterministic"
    approx = {(q, n) for q, n, _, _ in runs[0]}
    recall = len(exact & approx) / len(exact)
    # nprobe=2 of 10 cells; recall depends on label-cluster alignment
    assert recall >= 0.2, f"IVF ANN recall {recall:.3f} < 0.2"


def test_approx_percentile_accuracy(spark):
    """The 100 TB SKETCH regime of agg_approx_percentile: accuracy=1000
    (well below group cardinality, so genuinely approximate) must agree
    with the exact percentiles to 1%.  The registered query itself runs
    the same operator in exact mode (accuracy >= cardinality) and is
    hash-checked against DuckDB quantile_disc; this test covers the
    low-accuracy path the registered query documents."""
    from pyspark.sql import functions as F

    reg = load_all()
    exact = {
        r["l_returnflag"]: (r["p50"], r["p90"], r["p99"])
        for r in reg["agg_quantiles"].fn(spark, SF_ORACLE).collect()
    }
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    pcts = F.approx_percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(1000)
    )
    approx = {
        r["l_returnflag"]: (r["p50_approx"], r["p90_approx"], r["p99_approx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.element_at(pcts, 1).alias("p50_approx"),
            F.element_at(pcts, 2).alias("p90_approx"),
            F.element_at(pcts, 3).alias("p99_approx"),
        )
        .collect()
    }
    assert set(exact) == set(approx)
    for flag, (p50, p90, p99) in exact.items():
        for got, want in zip(approx[flag], (p50, p90, p99)):
            assert abs(got - want) / want <= 0.01, (flag, got, want)


def test_approx_percentile_exact_mode_bound(spark):
    """agg_approx_percentile's hash-checkability rests on accuracy
    (1,000,000) >= max group cardinality; pin that margin so a fixture
    regen can't silently push a group past the exact-mode threshold.
    The 10x factor is the sf0.01 -> sf0.1 scale-up: passing here means
    the bench/driver scale is still inside exact mode."""
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    max_group = li.groupBy("l_returnflag").count().agg({"count": "max"}).collect()[0][0]
    assert max_group * 10 <= 1000000, (
        f"group cardinality {max_group} within 10x of the exact-mode "
        "accuracy bound — raise the accuracy literal in agg_approx_percentile"
    )


def test_cluster_cc_matches_union_find(spark):
    """dedup_cluster_cc == driver-side union-find over the same edges:
    same partition of doc_ids, and every label is its cluster's min."""
    reg = load_all()
    rows = reg["dedup_cluster_cc"].fn(spark, SF_ORACLE).collect()
    got = {r["doc_id"]: r["cluster_id"] for r in rows}
    sh = {
        r["doc_id"]: (r["lang"], r["simhash"])
        for r in reg["dedup_simhash"].fn(spark, SF_ORACLE).collect()
    }
    assert set(got) == set(sh)  # one label per document, singletons included
    # rebuild the band-collision graph and union-find it
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    groups: dict[tuple, list[int]] = {}
    for doc, (lang, s) in sh.items():
        groups.setdefault((lang, 0, s & 0x1FFF), []).append(doc)
        groups.setdefault((lang, 1, s >> 13), []).append(doc)
    for members in groups.values():
        root = min(members)
        for m in members:
            ra, rb = find(root), find(m)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = {doc: find(doc) for doc in sh}
    assert got == want
    # labels are cluster minima
    from collections import defaultdict

    members = defaultdict(list)
    for doc, c in got.items():
        members[c].append(doc)
    for c, docs in members.items():
        assert c == min(docs)


def test_sketch_estimates_and_merge(spark):
    """Daily HLL estimates within 5% of exact; the global estimate from
    MERGED daily sketches matches a direct global sketch (mergeability
    = the property that buys 100 TB rollups)."""
    from pyspark.sql import functions as F

    from covid_data_pipeline_spark.io import load

    reg = load_all()
    got = {
        r["scope"]: r["est_users"]
        for r in reg["agg_sketch_mergeable"].fn(spark, SF_ORACLE).collect()
    }
    ev = load(spark, SF_ORACLE, "events")
    exact_daily = {
        r["scope"]: r["n"]
        for r in ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("scope")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact_daily["global"] = ev.select("user_id").distinct().count()
    assert set(got) == set(exact_daily)
    for scope, est in got.items():
        exact = exact_daily[scope]
        assert abs(est - exact) / exact <= 0.05, (scope, est, exact)
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
    ).collect()[0]["e"]
    assert got["global"] == direct


def test_kmeans_cost_monotone_and_exact_partition(spark):
    """Lloyd's algorithm guarantee: per-iteration cost never increases;
    the summary's per-cluster costs sum exactly (decimal agg) to the
    last assignment cost, and every vector lands in exactly one
    cluster."""
    from covid_data_pipeline_spark.io import load
    from covid_data_pipeline_spark.queries.training import kmeans_lloyd

    summary, costs = kmeans_lloyd(spark, SF_ORACLE, iters=3, k=10)
    assert len(costs) == 3
    # 1e-6 slack: the assignment step minimizes the QUANTIZED objective
    # (integer 1e-12 units — the round-9 oracle promotion), whose wobble
    # vs the true objective is bounded by 0.5e-12 per dimension term
    assert all(costs[i + 1] <= costs[i] + 1e-6 for i in range(len(costs) - 1)), costs
    rows = summary.collect()
    n_vecs = load(spark, SF_ORACLE, "embeddings").count()
    assert sum(r["n_members"] for r in rows) == n_vecs
    assert abs(sum(r["cost"] for r in rows) - costs[-1]) < 1e-6


def test_quantize_int8_contract(spark):
    """Quantized values stay in [-127, 127], the extreme element hits
    +/-127 exactly (that's what the scale is for), and per-element
    reconstruction error is bounded by half a quantization step."""
    reg = load_all()
    rows = reg["embed_quantize_int8"].fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert -127 <= r["q_min"] <= r["q_max"] <= 127
        assert r["q_max"] == 127 or r["q_min"] == -127
        assert 0.0 <= r["sq_err"] <= 64 * (0.5 / r["scale"]) ** 2 + 1e-12


def test_pca_components_ordered_and_centered(spark):
    """PCA contract: per-component projection variance is the
    descending eigenvalue sequence, and projections are centered
    (mean ~ 0) because the mean vector was subtracted."""
    import statistics

    reg = load_all()
    rows = reg["sim_pca_project"].fn(spark, SF_ORACLE).collect()
    by_pc: dict[int, list[float]] = {}
    for r in rows:
        by_pc.setdefault(r["pc"], []).append(r["value"])
    assert sorted(by_pc) == list(range(8))
    variances = [statistics.pvariance(by_pc[k]) for k in sorted(by_pc)]
    for a, b in zip(variances, variances[1:]):
        assert a >= b - 1e-9, f"variance not descending: {variances}"
    for k, vals in by_pc.items():
        assert abs(statistics.fmean(vals)) < 1e-6, (k, statistics.fmean(vals))


def test_sliding_sketch_union_accuracy(spark):
    """The 7-day sketch-union estimate must track exact sliding distinct
    within HLL tolerance, day by day."""
    from covid_data_pipeline_spark.io import load as load_table
    from pyspark.sql import functions as F

    reg = load_all()
    est = {
        r["day"]: r["users_7d"]
        for r in reg["agg_sliding_sketch_union"].fn(spark, SF_ORACLE).collect()
    }
    ev = load_table(spark, SF_ORACLE, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    days = ev.select("day").distinct()
    exact = {
        r["day"]: r["n"]
        for r in days.alias("d")
        .join(
            ev.alias("e"),
            (F.col("e.day") <= F.col("d.day"))
            & (F.col("e.day") >= F.date_sub(F.col("d.day"), 6)),
        )
        .groupBy("d.day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for day, n in exact.items():
        assert abs(est[day] - n) / n <= 0.05, (day, est[day], n)


def test_countmin_guarantees_and_merge(spark):
    """Count-min estimates must satisfy the one-sided sketch guarantee
    per scope (exact <= est <= exact + eps*N_scope), the absent probe
    must read ~0, and the merged sketch must agree with the sum of
    per-scope exact counts within the same bound — all recomputed
    independently with plain aggregation."""
    from pyspark.sql import functions as F

    from covid_data_pipeline_spark.io import load as load_table
    from covid_data_pipeline_spark.queries.aggregates import (
        _CMS_EPS,
        _CMS_PROBES,
    )

    reg = load_all()
    est = {
        (r["scope"], r["token"]): r["est_count"]
        for r in reg["agg_countmin_mergeable"].fn(spark, SF_ORACLE).collect()
    }
    tok = (
        load_table(spark, SF_ORACLE, "documents")
        .select("lang", F.explode(F.split("text", " ")).alias("token"))
        .cache()
    )
    try:
        n_by_lang = {
            r["lang"]: r["n"]
            for r in tok.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        exact = {
            (r["lang"], r["token"]): r["c"]
            for r in tok.filter(F.col("token").isin(list(_CMS_PROBES)))
            .groupBy("lang", "token")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
    finally:
        tok.unpersist()
    n_total = sum(n_by_lang.values())
    for lang, n_scope in n_by_lang.items():
        for t in _CMS_PROBES:
            e, x = est[(lang, t)], exact.get((lang, t), 0)
            assert x <= e <= x + _CMS_EPS * n_scope + 1, (lang, t, e, x)
    for t in _CMS_PROBES:
        x_glob = sum(exact.get((lang, t), 0) for lang in n_by_lang)
        e = est[("merged", t)]
        assert x_glob <= e <= x_glob + _CMS_EPS * n_total + 1, (t, e, x_glob)
    assert est[("merged", "zz_absent_token")] <= _CMS_EPS * n_total + 1


def test_containment_catches_subdocuments_jaccard_misses(spark):
    """dedup_containment's reason to exist: at least one reported pair
    must FAIL symmetric Jaccard at the same threshold (the sub-document
    relation).  The seeded half-docs guarantee such pairs at every sf —
    if this goes vacuous the operator is just Jaccard again."""
    from covid_data_pipeline_spark.queries.llm_dedup import CONTAIN_THRESHOLD

    reg = load_all()
    rows = reg["dedup_containment"].fn(spark, SF_ORACLE).collect()
    assert rows, "containment produced no pairs at all"
    seeded = [r for r in rows if r["b_id"] >= 10_000_000]
    assert seeded, "no seeded half-doc pair — the seeding is broken"
    # recompute both sides' shingle sets for one seeded pair and show
    # symmetric Jaccard < threshold while containment >= threshold
    import duckdb

    pair = seeded[0]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_ORACLE}/documents.parquet'"
    )
    j = con.sql(f"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        base AS (
            SELECT doc_id, w FROM w
            UNION ALL
            SELECT doc_id + 10000000, w[1:len(w)//2] FROM w
            WHERE doc_id % 20 = 0 AND len(w) >= 6
        ),
        s AS (SELECT doc_id,
                     list_distinct([w[i]||'_'||w[i+1]||'_'||w[i+2]
                                    FOR i IN range(1, len(w)-1)]) AS sh
              FROM base WHERE len(w) >= 3)
        SELECT CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        FROM s a, s b WHERE a.doc_id = {pair["a_id"]} AND b.doc_id = {pair["b_id"]}
    """).fetchone()[0]
    assert j < CONTAIN_THRESHOLD, (
        f"seeded pair has symmetric Jaccard {j:.3f} >= {CONTAIN_THRESHOLD} — "
        "not a containment-only pair"
    )
    assert pair["containment"] >= CONTAIN_THRESHOLD


def test_containment_lsh_recall_vs_exact(spark):
    """The asymmetric-banded LSH twin must recover nearly all exact
    containment pairs at fixture size ratios (<= 2, the banding's
    design cap): recall >= 0.9 against dedup_containment."""
    reg = load_all()
    exact = {
        (r["a_id"], r["b_id"])
        for r in reg["dedup_containment"].fn(spark, SF_ORACLE).collect()
    }
    approx = {
        (r["a_id"], r["b_id"])
        for r in reg["dedup_containment_lsh"].fn(spark, SF_ORACLE).collect()
    }
    assert exact, "exact containment twin returned no pairs"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"containment LSH recall {recall:.3f} < 0.9"
    # precision is exact by construction (candidates are verified), so
    # every reported pair must also be an exact pair
    assert approx <= exact


def test_pq_adc_recall_and_determinism(spark):
    reg = load_all()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in reg["sim_topk_neighbors"].fn(spark, SF_ORACLE).collect()
    }
    runs = [
        sorted(map(tuple, reg["sim_pq_adc_rerank"].fn(spark, SF_ORACLE).collect()))
        for _ in range(2)
    ]
    assert runs[0] == runs[1], "PQ-ADC ANN must be deterministic"
    approx = {(q, n) for q, n, _, _ in runs[0]}
    recall = len(exact & approx) / len(exact)
    # 16x4-dim codebooks, 10% ADC shortlist, exact re-rank: measured
    # mean recall@5 is 0.88/0.88/0.98 at sf0.001/0.01/0.1 — the 0.7
    # floor is honest headroom, and far above the 0.1 a random
    # shortlist of the same size would score.
    assert recall >= 0.7, f"PQ-ADC recall {recall:.3f} < 0.7"


def test_semdedup_deterministic_and_matches_label_twin(spark):
    """SemDeDup's learned-cluster blocking must (a) be bit-deterministic
    and (b) on this fixture reproduce the label-blocked exact twin's
    output EXACTLY: each seeded duplicate group {k, k+1M, k+2M} shares a
    nearest centroid (scaled copies are cosine-1.0 with their source),
    and no unseeded pair reaches the 0.9 threshold in any block."""
    reg = load_all()
    runs = [
        sorted(map(tuple, reg["dedup_semdedup_kmeans"].fn(spark, SF_ORACLE).collect()))
        for _ in range(2)
    ]
    assert runs[0] == runs[1], "SemDeDup must be deterministic"
    twin = sorted(
        map(tuple, reg["dedup_embedding_cosine"].fn(spark, SF_ORACLE).collect())
    )
    assert runs[0] == twin, (
        f"semdedup {len(runs[0])} rows != label twin {len(twin)} rows"
    )


def test_bpe_train_matches_pure_python_replay(spark):
    """The learned merge table must exactly equal an independent
    pure-Python BPE run over the same word frequencies — same pairs,
    same order, same weighted counts (tie-break: count desc, then
    lexicographic pair)."""
    from pyspark.sql import functions as F

    from covid_data_pipeline_spark.io import load as load_table

    reg = load_all()
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["wcount"])
        for r in reg["text_bpe_train"].fn(spark, SF_ORACLE)
        .orderBy("rank").collect()
    ]
    wf = {
        r["w"]: r["freq"]
        for r in load_table(spark, SF_ORACLE, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w").count()
        .withColumnRenamed("count", "freq").collect()
    }
    seqs = {w: list(w) for w in wf}
    want = []
    for rank in range(1, len(got) + 1):
        cnt = {}
        for w, s in seqs.items():
            f = wf[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] = cnt.get((s[i], s[i + 1]), 0) + f
        (a, b), n = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rank, a, b, a + b, n))
        for w, s in seqs.items():
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            seqs[w] = ns
    assert got == want
    # the compression-curve twin must match the same replay's counts
    curve = {
        r["round"]: (r["corpus_tokens"], r["tokens_saved"])
        for r in reg["text_bpe_compression"].fn(spark, SF_ORACLE).collect()
    }
    seqs2 = {w: list(w) for w in wf}
    toks_at = [sum(wf[w] * len(s) for w, s in seqs2.items())]
    for rank, a, b, _m, _n in want:
        for w, s in seqs2.items():
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            seqs2[w] = ns
        toks_at.append(sum(wf[w] * len(s) for w, s in seqs2.items()))
    for rnd, total in enumerate(toks_at):
        saved = 0 if rnd == 0 else toks_at[rnd - 1] - total
        assert curve[rnd] == (total, saved), (rnd, curve[rnd], (total, saved))


def test_random_projection_is_unbiased_jl(spark):
    """JL contract: the sign projection preserves pairwise squared
    distances IN EXPECTATION — over sampled pairs the mean squared
    distance ratio must sit near 1, and the median ratio inside a loose
    band (k=16 is deliberately aggressive; measured median 0.89)."""
    import itertools
    import math
    import random

    from collections import defaultdict

    reg = load_all()
    proj = defaultdict(dict)
    for r in reg["embed_random_projection"].fn(spark, SF_ORACLE).collect():
        proj[r["vec_id"]][r["j"]] = r["pj"]
    from covid_data_pipeline_spark.io import load as load_table

    orig = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, SF_ORACLE, "embeddings")
        .orderBy("vec_id").limit(60).collect()
    }
    rng = random.Random(7)
    pairs = rng.sample(list(itertools.combinations(sorted(orig), 2)), 300)
    ratios = []
    for a, b in pairs:
        d0 = math.dist(orig[a], orig[b])
        pa = [proj[a][j] for j in range(16)]
        pb = [proj[b][j] for j in range(16)]
        ratios.append(math.dist(pa, pb) / d0)
    ratios.sort()
    mean_sq = sum(r * r for r in ratios) / len(ratios)
    assert 0.7 <= mean_sq <= 1.4, f"E[ratio^2] {mean_sq:.3f} not ~1"
    med = ratios[len(ratios) // 2]
    assert 0.6 <= med <= 1.3, f"median ratio {med:.3f} outside band"


def test_bpe_encode_matches_pure_python_replay(spark):
    """Per-doc token counts from text_bpe_encode must exactly equal an
    INDEPENDENT pure-Python pipeline: train the merges in plain Python
    from the raw texts (same tie-breaks — no second distributed trainer
    run), greedily apply them to each word, and count — the full
    train+apply lifecycle checked end to end against the op.  Documents
    with no non-empty words must appear as (0, 0, 0), not go missing."""
    from covid_data_pipeline_spark.io import load as load_table
    from covid_data_pipeline_spark.queries.llm_text import _BPE_MERGES

    reg = load_all()
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["n_chars"])
        for r in reg["text_bpe_encode"].fn(spark, SF_ORACLE).collect()
    }

    docs = (
        load_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "text").collect()
    )
    # pure-Python training from raw texts (mirrors the replay in
    # test_bpe_train_matches_pure_python_replay, which separately pins
    # it equal to the distributed trainer)
    wf: dict[str, int] = {}
    for r in docs:
        for w in r["text"].split(" "):
            if w != "":
                wf[w] = wf.get(w, 0) + 1
    seqs = {w: list(w) for w in wf}
    merges = []
    for _rank in range(_BPE_MERGES):
        cnt: dict[tuple[str, str], int] = {}
        for w, s in seqs.items():
            f = wf[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] = cnt.get((s[i], s[i + 1]), 0) + f
        (a, b), _n = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        for w, s in seqs.items():
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            seqs[w] = ns

    # apply = the final seqs table (every merge already applied)
    want = {}
    for r in docs:
        ws = [w for w in r["text"].split(" ") if w != ""]
        want[r["doc_id"]] = (
            len(ws),
            sum(len(seqs[w]) for w in ws),
            sum(len(w) for w in ws),
        )
    assert got == want


def test_bpe_encode_zero_token_documents_not_dropped(spark, tmp_path):
    """The (0, 0, 0) path is unwitnessed by the fixture (every sf0.001
    doc has words) — exercise it with a doctored corpus: an empty-text
    doc and a whitespace-only doc must appear as zero-token rows, not
    vanish from the billing output."""
    import os

    from pyspark.sql import functions as F

    from covid_data_pipeline_spark.io import load as load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    extra = spark.createDataFrame(
        [
            (1_000_001, "", "en", "synthetic", 0),
            (1_000_002, "   ", "en", "synthetic", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / "doctored")
    os.makedirs(sf_dir)
    d.unionByName(extra).coalesce(1).write.parquet(
        os.path.join(sf_dir, "documents.parquet")
    )

    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["n_chars"])
        for r in load_all()["text_bpe_encode"].fn(spark, sf_dir)
        .filter(F.col("doc_id") > 1_000_000)
        .collect()
    }
    assert got == {1_000_001: (0, 0, 0), 1_000_002: (0, 0, 0)}


def test_quality_buckets_are_ordered_near_terciles(spark):
    """CCNet-tercile contract: every language has all three buckets,
    score ranges are strictly ordered head > middle > tail (the
    cutoffs partition the milli-score axis), the head bucket holds at
    least ceil(n/3) docs (boundary ties land head-side by definition),
    and bucket totals reconstruct the per-lang doc count."""
    import math

    reg = load_all()
    rows = reg["quality_percentile_buckets"].fn(spark, SF_ORACLE).collect()
    langs: dict[str, dict[str, tuple[int, int, int]]] = {}
    for r in rows:
        langs.setdefault(r["lang"], {})[r["bucket"]] = (
            r["n_docs"], r["min_score_milli"], r["max_score_milli"]
        )
    docs = load_all()["text_lang_profile"].fn(spark, SF_ORACLE).collect()
    n_by_lang = {r["lang"]: r["n_docs"] for r in docs}
    assert set(langs) == set(n_by_lang)
    for lang, b in langs.items():
        assert set(b) == {"head", "middle", "tail"}, (lang, b)
        n = n_by_lang[lang]
        assert sum(v[0] for v in b.values()) == n
        assert b["head"][0] >= math.ceil(n / 3), (lang, b, n)
        # strict score-range ordering: the cutoffs PARTITION the axis
        assert b["head"][1] > b["middle"][2], (lang, b)
        assert b["middle"][1] > b["tail"][2], (lang, b)


def test_span_dedup_not_degenerate(spark):
    """Granule-collapse guard (the dedup_near_jaccard candidate-count
    pattern): the measured sweep (SCALE.md) shows granule 3 marks
    92-99.9% of this closed-vocabulary fixture by CHANCE n-gram
    recurrence, while the shipped granule 5 removes ~9-13%.  If a
    fixture regen (bigger vocab shrink, shorter docs) pushes the shipped
    granule into the degenerate regime, span-removal quietly guts the
    corpus — fail loudly instead."""
    reg = load_all()
    rows = reg["dedup_span_removal"].fn(spark, SF_ORACLE).collect()
    total = sum(r["n_tokens"] for r in rows)
    removed = sum(r["n_removed"] for r in rows)
    assert total > 0 and 0 < removed < 0.3 * total, (
        f"span dedup degenerate or vacuous: {removed}/{total} tokens marked"
    )


def test_compression_ratio_pure_python_replay(spark):
    """text_compression_ratio == driver-side zlib on the same docs:
    the UDF path adds nothing beyond zlib.compress(text, 6)."""
    import zlib

    reg = load_all()
    rows = reg["text_compression_ratio"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 500
    got = {r["doc_id"]: r for r in rows}
    d = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    sample_ids = sorted(got)[:25]
    for s in d.filter(d.doc_id.isin(sample_ids)).collect():
        raw = s["text"].encode("utf-8")
        want = len(zlib.compress(raw, 6))
        r = got[s["doc_id"]]
        assert r["comp_bytes"] == want
        assert r["n_bytes"] == len(raw)
        # repetitive fixture text must actually compress once past
        # zlib's fixed header overhead (short docs can exceed 1.0)
        if r["n_bytes"] >= 200:
            assert r["ratio_micro"] < 1_000_000, dict(r.asDict())


def test_corpus_build_funnel_invariants(spark):
    """pipeline_corpus_build's funnel must be internally consistent:
    docs surviving each gate stage never increase (0..5 monotone
    non-increasing in both units and tokens), the packer reorders but
    never drops tokens (stage 6 tokens == stage 5 tokens), and the
    three splits partition the near-dedup survivors exactly."""
    from covid_data_pipeline_spark.registry import load_all

    rows = {
        int(r["stage_idx"]): r
        for r in load_all()["pipeline_corpus_build"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    for i in range(1, 6):
        assert rows[i]["n_units"] <= rows[i - 1]["n_units"], (i, rows)
        assert rows[i]["n_tokens"] <= rows[i - 1]["n_tokens"], (i, rows)
    assert rows[6]["n_tokens"] == rows[5]["n_tokens"]  # packer never drops
    assert rows[6]["n_units"] >= 1  # at least one bin exists
    split_units = sum(rows[i]["n_units"] for i in (7, 8, 9) if i in rows)
    split_tokens = sum(rows[i]["n_tokens"] for i in (7, 8, 9) if i in rows)
    assert split_units == rows[5]["n_units"]
    assert split_tokens == rows[5]["n_tokens"]


def test_quality_report_clean_on_pristine_fixture(spark):
    """pipeline_quality_report must read all-zeros for the integrity
    checks on the pristine fixtures (dups, orphans, negatives, empty
    text) while the row counts match the tables — the report's value
    is that any nonzero is actionable."""
    from covid_data_pipeline_spark.io import load as _load
    from covid_data_pipeline_spark.registry import load_all

    rows = {
        (r["checked"], r["entity"]): r["n"]
        for r in load_all()["pipeline_quality_report"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert rows[("row_count", "events")] == _load(spark, SF_SMOKE, "events").count()
    assert rows[("dup_primary_key", "events")] == 0
    assert rows[("dup_primary_key", "orders")] == 0
    assert rows[("orphan_fk", "orders->customer")] == 0
    assert rows[("orphan_fk", "lineitem->orders")] == 0
    assert rows[("negative_value", "events")] == 0
    assert rows[("empty_text", "documents")] == 0
    assert rows[("calendar_gap_days", "events")] == 0


def test_multitable_ann_recall_dominates_single_table(spark):
    """The table-count dial (round 11): two independent signature tables
    must not lose to one — their candidate union is a superset family,
    so recall@5 must be >= the single-table run on the same fixture,
    and above an absolute floor."""
    reg = load_all()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in reg["sim_topk_neighbors"].fn(spark, SF_ORACLE).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in reg["sim_ann_bucketed"].fn(spark, SF_ORACLE).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in reg["sim_ann_multitable"].fn(spark, SF_ORACLE).collect()
    }
    r1 = len(exact & single) / len(exact)
    r2 = len(exact & multi) / len(exact)
    assert r2 >= 0.35, f"multitable recall {r2:.3f} < 0.35"
    assert r2 >= r1, f"multitable {r2:.3f} lost to single-table {r1:.3f}"
