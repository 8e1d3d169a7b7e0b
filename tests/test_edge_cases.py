"""Edge-case unit tests (SURVEY §5.2.2): the operator patterns the
engine is built from, exercised on literal DataFrames at the boundaries
— empty inputs, all-NULL keys, top-k ties, empty arrays, unicode text,
single-element groups."""

from __future__ import annotations

from pyspark.sql import Row, Window, functions as F
from pyspark.testing import assertDataFrameEqual

from .conftest import SF_ORACLE


def test_change_detect_on_empty_and_single_snapshot(spark):
    empty = spark.createDataFrame([], "src int, ts long, content string")
    w = Window.partitionBy("src").orderBy("ts")
    out = empty.withColumn("prev", F.lag(F.sha2("content", 256)).over(w))
    assert out.count() == 0
    one = spark.createDataFrame([(1, 10, "x")], "src int, ts long, content string")
    row = one.withColumn("prev", F.lag(F.sha2("content", 256)).over(w)).first()
    assert row["prev"] is None  # first snapshot of a source = 'new'


def test_join_null_keys_never_match(spark):
    left = spark.createDataFrame([(None, "l1"), (1, "l2")], "k int, v string")
    right = spark.createDataFrame([(None, "r1"), (1, "r2")], "k int, w string")
    assert left.join(right, on="k").count() == 1  # NULL != NULL in joins
    # null-safe comparator is the explicit opt-in
    eq = left.join(right, on=left["k"].eqNullSafe(right["k"]))
    assert eq.count() == 2


def test_groupby_treats_null_as_one_group(spark):
    df = spark.createDataFrame(
        [(None, 1), (None, 2), (1, 3)], "k int, v int"
    )
    got = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert got == {None: 2, 1: 1}  # unlike joins, grouping keeps NULLs


def test_topk_tie_determinism_requires_tiebreaker(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0)], "id int, score double"
    )
    w = Window.orderBy(F.col("score").desc(), F.col("id"))
    top2 = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    assert [r["id"] for r in top2.orderBy("rn").collect()] == [1, 2]


def test_array_ops_on_empty_arrays(spark):
    df = spark.createDataFrame(
        [([], [1, 2])], "xs array<int>, ys array<int>"
    )
    row = df.select(
        F.size("xs").alias("n"),
        F.array_intersect("xs", "ys").alias("inter"),
        F.array_distinct("xs").alias("dist"),
        F.sort_array("xs").alias("sorted"),
    ).first()
    assert row["n"] == 0 and row["inter"] == [] and row["dist"] == []


def test_jaccard_of_identical_and_disjoint_sets(spark):
    df = spark.createDataFrame(
        [Row(a=[1, 2, 3], b=[1, 2, 3]), Row(a=[1, 2], b=[3, 4])]
    )
    inter = F.size(F.array_intersect("a", "b"))
    union = F.size("a") + F.size("b") - inter
    got = [r["j"] for r in df.select((inter / union).alias("j")).collect()]
    assert got == [1.0, 0.0]


def test_unicode_text_ops(spark):
    df = spark.createDataFrame(
        [("héllo wörld 北京 données",)], "text string"
    )
    row = df.select(
        F.length("text").alias("chars"),
        F.size(F.split("text", " ")).alias("toks"),
        F.upper("text").alias("up"),
        F.sha2("text", 256).alias("h"),
    ).first()
    assert row["chars"] == 22  # characters, not bytes
    assert row["toks"] == 4
    assert "WÖRLD" in row["up"]
    assert len(row["h"]) == 64


def test_window_single_element_groups(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k int, v double")
    w = Window.partitionBy("k").orderBy("v")
    out = df.select(
        "k",
        F.row_number().over(w).alias("rn"),
        F.lag("v").over(w).alias("prev"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("run"),
    )
    for r in out.collect():
        assert r["rn"] == 1 and r["prev"] is None and r["run"] == float(r["k"])


def test_agg_on_empty_input_global_vs_grouped(spark):
    empty = spark.createDataFrame([], "k int, v double")
    # ungrouped agg over empty input: one row, NULL sum / 0 count
    row = empty.agg(F.sum("v").alias("s"), F.count("v").alias("n")).first()
    assert row["s"] is None and row["n"] == 0
    # grouped agg over empty input: zero rows
    assert empty.groupBy("k").agg(F.sum("v")).count() == 0


def test_set_ops_bag_vs_set_semantics(spark):
    a = spark.createDataFrame([(1,), (1,), (2,)], "x int")
    b = spark.createDataFrame([(1,), (3,)], "x int")
    assert a.unionByName(b).count() == 5
    assert a.union(b).distinct().count() == 3
    assert a.exceptAll(b).count() == 2  # one 1 survives (bag except)
    assert a.subtract(b).count() == 1  # set except
    assert a.intersect(b).count() == 1
    assert a.intersectAll(b).count() == 1


def test_try_cast_invalid_strings_yield_null(spark):
    df = spark.createDataFrame([("12",), ("x12",), ("",)], "s string")
    got = [
        r["n"]
        for r in df.select(F.col("s").try_cast("int").alias("n")).collect()
    ]
    assert got == [12, None, None]


def test_assert_dataframe_equal_roundtrip(spark):
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    assertDataFrameEqual(df, spark.createDataFrame([(1, "a")], "id int, s string"))


def test_orc_roundtrip_equals_parquet_source(spark):
    from covid_data_pipeline_spark.io import load
    from covid_data_pipeline_spark.registry import load_all
    from pyspark.sql import functions as F

    reg = load_all()
    orc = {
        (r["event_type"]): (r["n"], r["n_users"])
        for r in reg["sink_orc_roundtrip"].fn(spark, SF_ORACLE).collect()
    }
    pq = {
        (r["event_type"]): (r["n"], r["n_users"])
        for r in load(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("n_users"))
        .collect()
    }
    assert orc == pq


def test_bpe_merge_fold_is_left_to_right_greedy(spark):
    """The in-codegen merge fold must consume overlapping pairs left to
    right: merging (a,a) in 'aaa' yields [aa, a] — never [a, aa], and
    never the double-count [aa, aa]; 'aaaa' yields [aa, aa]."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("aaa",), ("aaaa",), ("aba",), ("",)], "w string"
    )
    merged = df.select(
        "w",
        F.expr(
            """aggregate(split(w, ''), CAST(array() AS array<string>),
               (acc, x) -> CASE WHEN size(acc) > 0
                                AND element_at(acc, -1) = 'a' AND x = 'a'
                           THEN concat(slice(acc, 1, size(acc)-1), array('aa'))
                           ELSE concat(acc, array(x)) END)"""
        ).alias("seq"),
    ).collect()
    got = {r["w"]: r["seq"] for r in merged}
    assert got["aaa"] == ["aa", "a"]
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aba"] == ["a", "b", "a"]
    # split('', '') is [''] in Spark — the trainer never sees it because
    # words are filtered non-empty upstream; pinned here as documentation
    assert got[""] == [""]


def test_phrase_adjacency_counts_overlapping_repeats(spark):
    """The posting-list intersection must count OVERLAPPING matches of a
    repeated-token phrase exactly like the positional self-join the SQL
    oracle spells: 'x x' in 'x x x' hits twice (positions 1 and 2)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "x x x"), (2, "x y x"), (3, "y x x")],
                               "doc_id int, text string")
    tok = df.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).filter(F.col("tok") == "x")
    postings = tok.groupBy("doc_id").agg(
        F.collect_list(F.col("pos0") + 1).alias("p1")
    )
    matched = F.filter("p1", lambda x: F.array_contains(F.col("p1"), x + 1))
    out = {
        r["doc_id"]: (r["n"], r["first"])
        for r in postings.select(
            "doc_id",
            F.size(matched).alias("n"),
            F.array_min(matched).alias("first"),
        ).collect()
    }
    assert out[1] == (2, 1)   # overlapping pair counted at pos 1 and 2
    assert out[2] == (0, None)
    assert out[3] == (1, 2)
