"""§2.9 Streaming operators — oracle-checkable batch formulations.

Reference analogue: the reference's run loop IS a stream consumer — each
scan cycle aggregates per-run, sessionizes scans, and skips pages whose
content hash was already seen (SURVEY.md §2.9, §3.1).  Strategy per
SURVEY: the event-time logic lives once in ``streaming.transforms`` and
runs here on a batch scan (DuckDB hash-checks the semantics); the true
Structured Streaming twins execute the same transforms incrementally
(tests/test_streaming.py asserts stream == batch).

Scale notes: tumbling/sliding aggregate with bounded (window, type)
state and map-side partial aggregation; sessionization shuffles once on
user_id; the watermark batch twin's global arrival-order window exists
only to make watermark semantics hash-checkable at test scale — the
production path is the streaming engine's own watermark tracking, which
keeps no global order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load, tune
from ..registry import query
from ..streaming import transforms as TR
from ..streaming.runner import scratch_dir
from ._helpers import DEC, sql_dsum


@query(
    "stream_tumbling",
    oracle=f"""
    SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ws_us,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling count+sum by event_type (reference: per-scan-cycle
    aggregation).  Same transform the streaming twin runs incrementally;
    window start surfaced as epoch-µs for cross-engine stability."""
    tune(spark)
    return TR.tumbling_hourly(load(spark, sf_dir, "events"))


@query(
    "stream_sliding",
    oracle=f"""
    SELECT (epoch_us(ts) // 900000000) * 900000000
               - CAST(k AS BIGINT) * 900000000 AS ws_us,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
    GROUP BY 1, 2
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 min — each event belongs to exactly
    4 windows (floor-to-15min start minus k*15min, k=0..3, always within
    the hour), which is how the oracle enumerates Spark's window
    assignment without a window function."""
    tune(spark)
    return TR.sliding_1h_15m(load(spark, sf_dir, "events"))


@query(
    "stream_session",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, value,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
        FROM seq
    )
    SELECT user_id,
           MIN(epoch_us(ts)) AS session_start_us,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM sess
    GROUP BY user_id, session_no
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows, 30-min gap, via gaps-and-islands (pure
    ANSI, hash-checkable).  A new session starts when the gap is >= 30
    min — exactly the native ``session_window`` overlap rule ([ts,
    ts+gap) windows merge iff gap < 30 min), so the streaming twin is
    provably equivalent (asserted in tests/test_streaming.py)."""
    tune(spark)
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap_us.isNull() | (gap_us >= TR.GAP_US), 1).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.withColumn("session_no", F.sum(new_s).over(wrun))
    return sess.groupBy("user_id", "session_no").agg(
        F.min(F.unix_micros("ts")).alias("session_start_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    ).drop("session_no")


@query(
    "stream_watermark_late",
    oracle="""
    WITH arrival AS (
        SELECT ts,
               MAX(ts) OVER (ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS max_prior
        FROM events
    )
    SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ws_us,
           COUNT(*) FILTER (WHERE max_prior IS NULL
                            OR epoch_us(ts) >= epoch_us(max_prior) - 600000000)
               AS n_kept,
           COUNT(*) FILTER (WHERE max_prior IS NOT NULL
                            AND epoch_us(ts) < epoch_us(max_prior) - 600000000)
               AS n_late
    FROM arrival
    GROUP BY 1
    """,
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-min watermark semantics as a deterministic batch computation:
    arrival order = event_id, watermark before each row = max event time
    seen so far minus 10 min, rows older than the watermark are late.
    Hash-checkable twin of ``withWatermark('ts','10 minutes')`` (true
    drop behavior asserted in tests/test_streaming.py).  The global
    arrival-order window is single-task by construction — test-scale
    oracle only; the streaming engine tracks its watermark without any
    global sort."""
    tune(spark)
    ev = load(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
    max_prior = F.max("ts").over(w)
    on_time = max_prior.isNull() | (
        F.unix_micros("ts") >= F.unix_micros(max_prior) - 600_000_000
    )
    flagged = ev.select(
        ((F.unix_micros("ts") - F.unix_micros("ts") % TR.HOUR_US)).alias("ws_us"),
        on_time.alias("on_time"),
    )
    return flagged.groupBy("ws_us").agg(
        F.count(F.when(F.col("on_time"), 1)).alias("n_kept"),
        F.count(F.when(~F.col("on_time"), 1)).alias("n_late"),
    )


@query(
    "stream_dedup_state",
    oracle="""
    SELECT event_id, user_id, content_hash FROM (
        SELECT event_id, user_id, sha256(props) AS content_hash,
               ROW_NUMBER() OVER (PARTITION BY user_id, sha256(props)
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def stream_dedup_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup on (source, content-hash) — the reference's
    don't-re-process-an-unchanged-page rule.  Batch twin keeps the
    earliest occurrence deterministically; the streaming twin is
    ``dropDuplicates`` (first ARRIVAL wins — same key set, asserted
    set-equal in tests).  State per distinct key; on a real stream,
    ``dropDuplicatesWithinWatermark`` bounds it."""
    tune(spark)
    ev = load(spark, sf_dir, "events")
    keyed = ev.select(
        "event_id", "user_id", F.sha2("props", 256).alias("content_hash"), "ts"
    )
    w = Window.partitionBy("user_id", "content_hash").orderBy("ts", "event_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "content_hash")
    )


@query(
    "stream_foreach_sink",
    oracle=f"""
    SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ws_us,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)  # oracle-checked: complete-mode final batch == full batch aggregate
def stream_foreach_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch incremental archive: a TRUE Structured Streaming run
    (availableNow trigger, checkpoint) draining the event stream through
    the tumbling aggregation, each micro-batch appended to a parquet
    sink stamped with its batch id — the reference's per-run archive
    write.  Returns the final batch's snapshot read back from the
    sink; in complete output mode that snapshot IS the full aggregate,
    so this true streaming run hash-checks against the batch oracle."""
    from ..streaming import read_events_stream
    from ..streaming.runner import run_foreach_parquet
    import os

    tune(spark)
    # narrow state/output sharding: the complete-mode snapshot is
    # windows x types rows (~3.6k at sf0.1), so 32 shuffle partitions
    # meant 32 state-store instances AND 32 near-empty parquet files
    # per batch snapshot — the stream_static_join "narrow sharding"
    # rationale (r12 A/B: 1.81 -> 1.24 s warm, identical rows)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    stream = TR.tumbling_hourly(read_events_stream(spark, sf_dir))
    out = run_foreach_parquet(stream)
    sunk = spark.read.parquet(os.path.join(out, "data"))
    last = sunk.agg(F.max("batch_id").alias("m")).collect()[0]["m"]
    return sunk.filter(F.col("batch_id") == last).drop("batch_id")


@query(
    "stream_static_join",
    oracle=f"""
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*) AS n_events,
           {sql_dsum('e.value')} AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)  # oracle-checked: complete-mode final batch == full batch join+aggregate
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-STATIC join — the dimension-enrichment pattern every
    event pipeline runs (reference: tagging each scan with its source
    registry row): the streaming events join a static customer dim
    per micro-batch, then aggregate per market segment in complete mode.

    Stream-static inner joins are STATELESS on the stream side — no
    watermark, no join state, the static side is simply (broadcast)
    joined inside every micro-batch — so unlike stream_stream_join this
    costs no state store and tolerates any stream length; the dim is
    re-resolvable between batches, which is how slowly-refreshing
    dimension tables stay current mid-stream.  The availableNow drain
    makes the run deterministic: its final complete-mode snapshot equals
    the batch join, so a genuine streaming execution hash-checks against
    the DuckDB oracle.  At 100 TB: keep the dim broadcast-sized or
    pre-bucket both sides; the aggregation state is bounded by segment
    cardinality."""
    from ..streaming import read_events_stream, run_available_now

    tune(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    ev = read_events_stream(spark, sf_dir)
    dim = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    agg = (
        ev.join(F.broadcast(dim), "user_id")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
    )
    return run_available_now(agg, output_mode="complete")


@query(
    "stream_stateful_totals",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                     AS BIGINT) AS DOUBLE) / 1000000 AS sum_value
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming run of the applyInPandasWithState custom operator
    (per-user running totals in GroupState, update mode): drain the
    event stream with availableNow into a memory sink, then reduce each
    user's emissions to the final (= max event count) update.  Agreement
    with the plain batch aggregation is asserted in
    tests/test_streaming.py.

    ORACLE-BACKED (round-9 promotion from rows-only, the
    stream_change_detect precedent): the state carries the value total
    as EXACT integer micro-units (order-free addition — see
    streaming/transforms.py), so the final per-user emission equals the
    batch SUM over quantized values bit-for-bit regardless of
    micro-batch split, and a genuine streaming run hash-checks against
    plain batch SQL at every sf.  Multi-batch state carry is witnessed
    separately by test_stateful_totals_carry_state_across_batches."""
    from ..streaming import read_events_stream, run_available_now

    tune(spark)
    # one state-store instance per shuffle partition — few state groups,
    # so per-instance commit overhead dominates and narrow (8) wins;
    # the many-group regime (stream_dedup_simhash) wants 32.  Full
    # sizing policy: SCALE.md "Streaming state sizing policy".
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    sunk = run_available_now(
        TR.stateful_user_totals(read_events_stream(spark, sf_dir)),
        output_mode="update",
    )
    return sunk.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("sum_value", "n_events").alias("sum_value"),
    )


@query(
    "stream_change_detect",
    oracle="""
    WITH h AS (
        SELECT user_id AS source_key, event_id, ts,
               sha256(props) AS content_hash
        FROM events
    )
    SELECT source_key, event_id, content_hash,
           CASE WHEN prev IS NULL THEN 'new'
                WHEN content_hash <> prev THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM (
        SELECT source_key, event_id, content_hash,
               LAG(content_hash) OVER (PARTITION BY source_key
                                       ORDER BY ts, event_id) AS prev
        FROM h
    )
    """,
)
def stream_change_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's change-detection loop as a TRUE incremental
    stream: per-source last-hash in GroupState (applyInPandasWithState),
    each snapshot classified new/changed/unchanged as it arrives.
    Exact per-row equivalence with the windowed batch formulation
    (win_lag_change_detect) is asserted in tests/test_streaming.py.

    ORACLE-BACKED (round-8 promotion from rows-only): the availableNow
    drain sees the single events parquet as ONE micro-batch, the
    transform sorts each batch by (ts, event_id), and every output
    column is a string/integer (sha2 hex digests — DuckDB sha256 over
    the same VARCHAR yields the identical hex), so a genuine streaming
    run hash-checks against the batch LAG-window SQL at every sf.  The
    multi-batch case (the production shape) keeps determinism via the
    carried GroupState hash — witnessed separately by
    test_stateful_change_detect_carries_hash_across_batches."""
    from ..streaming import read_events_stream, run_available_now

    tune(spark)
    # narrow state-store sharding, same rationale as stream_stateful_totals
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    return run_available_now(
        TR.stateful_change_detect(read_events_stream(spark, sf_dir)),
        output_mode="append",
        # one emitted row per input event (100k at sf0.1) — keep them
        # off the driver (see run_available_now's sink note)
        sink="parquet",
    )


@query(
    "stream_stream_join",
    oracle="""
    SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id,
           epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
    FROM events p JOIN events v
      ON p.user_id = v.user_id
     AND p.event_type = 'purchase' AND v.event_type = 'view'
     AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-stream join: each purchase joined to the same user's
    views in the preceding hour, both sides streaming with 2-hour
    watermarks and an event-time range condition — the attribution-join
    shape (reference: correlating a capture with the scans that led to
    it).  Inner join + time bound means Spark can emit matches
    incrementally and EVICT view state older than watermark + range —
    bounded state at any stream length.  availableNow drains the fixture
    in one deterministic pass, so the result equals the batch interval
    join and the DuckDB oracle can hash-check a genuine streaming run
    (rare for streaming ops).  State is keyed by user_id — at 100 TB the
    same salting guidance as the batch interval join applies to hot
    users."""
    from ..streaming import read_events_stream, run_available_now

    tune(spark)
    # one state-store instance per shuffle partition: at this scale the
    # per-instance commit overhead dominates, so run the join narrower
    # than the batch default (on a cluster: size to cores as usual)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    ev = read_events_stream(spark, sf_dir)
    return run_available_now(purchase_view_join(ev), output_mode="append")


def purchase_view_join(ev: DataFrame) -> DataFrame:
    """stream_stream_join's join topology over an events frame (batch OR
    streaming — same logical plan either way): purchases x same-user
    views in the preceding hour, both sides under 2-hour watermarks.
    Module-level so the split-feed multi-batch test can drive the
    IDENTICAL expressions through a time-ordered multi-file drain."""
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    return purchases.join(
        views,
        F.expr(
            """v_user = user_id
               AND v_ts <= p_ts
               AND v_ts >= p_ts - interval 1 hour"""
        ),
        "inner",
    ).select(
        "user_id",
        "purchase_id",
        "view_id",
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("gap_us"),
    )


def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming run of the ``transformWithStateInPandas`` operator
    (Spark 4's named-typed-state successor to applyInPandasWithState):
    per-user running totals in a ValueState, drained with availableNow in
    update mode, then reduced to each user's final update.

    NOT REGISTERED as a driver query: the transformWithState runtime
    spawns a Python state server that requires the ``protobuf`` package,
    which this container does not ship (and installs are off-limits) —
    the operator crashes at runtime with "cannot import google.protobuf"
    however correct the plan is.  The implementation is real and
    complete (streaming/transforms.py: tws_user_totals); the equivalence
    test in tests/test_streaming.py runs it wherever protobuf exists and
    SKIPS here, so the gate is explicit rather than a silent fallback to
    the old API.

    The transformWithState runtime also requires the RocksDB state-store
    provider (its state layout is column-family based) — set here and
    restored, since RocksDB is the 100 TB state backend recommendation
    regardless (bounded executor memory at any key cardinality)."""
    from ..streaming import read_events_stream, run_available_now

    tune(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        sunk = run_available_now(
            TR.tws_user_totals(read_events_stream(spark, sf_dir)),
            output_mode="update",
        )
        # materialize while the provider conf is still in force
        sunk = sunk.cache()
        sunk.count()
    finally:
        if saved is not None:
            spark.conf.set(key, saved)
        else:
            spark.conf.unset(key)
    out = sunk.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("sum_value", "n_events").alias("sum_value"),
    )
    # materialize the (per-user, bounded) aggregate on executors and cut
    # its lineage off the cached microbatch output, so the cache can be
    # released NOW instead of leaking into the shared session (ADVICE r4)
    out = out.localCheckpoint(eager=True)
    sunk.unpersist()
    return out


@query(
    "stream_bitmap_partials",
    oracle="""
    SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
           CAST(floor((user_id - 1.0) / 32768.0) AS BIGINT) + 1 AS bucket,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_bitmap_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest-time half of the bitmap-distinct story: stream events
    into per-(day, bucket) exact-distinct bitmap partials — the
    persisted table agg_bitmap_distinct / win_rolling_bitmap_distinct /
    agg_bitmap_overlap all roll up from without re-touching raw data.
    Structured Streaming allows one aggregation per query, and this IS
    one aggregation with bounded state (days x buckets groups, 4 KB
    each); coarser rollups happen batch-side over the sink, which is
    exactly the partial-persistence architecture.  The streaming twin
    (tests/test_streaming.py) runs this same transform incrementally
    and must emit identical rows, including the md5 of the bitmap
    BYTES — pinning that incremental construction builds the same
    blobs as batch.  The oracle checks the popcount column via
    COUNT(DISTINCT) with the bucket function spelled as floor
    division (truncating division misbuckets id 0)."""
    tune(spark)
    return TR.daily_bitmap_partials(load(spark, sf_dir, "events")).drop(
        "bm_md5"
    )


@query(
    "stream_stream_left_join",
    oracle="""
    WITH bound AS (SELECT MAX(ts) - INTERVAL 3 HOUR AS closable FROM events)
    SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id,
           epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
    FROM events p
    LEFT JOIN events v
      ON p.user_id = v.user_id
     AND v.event_type = 'view'
     AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
    CROSS JOIN bound
    WHERE p.event_type = 'purchase' AND p.ts <= bound.closable
    """,
)
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-stream LEFT OUTER join: every purchase emits — padded
    with NULLs when no view preceded it within the hour — which is the
    attribution join's honest production form (an inner join silently
    drops unattributed conversions).  Semantics the inner twin doesn't
    exercise: an unmatched left row is NOT emittable when first seen; it
    parks in the state store until the WATERMARK proves no matching view
    can still arrive (wm > p_ts), at which point the no-data batch that
    availableNow appends after the drain evicts-and-emits it.

    The CLOSABLE-REGION bound (p_ts <= max_ts - 3h = 2h watermark + 1h
    range margin, computed batch-side as one scalar) is what makes a
    genuine streaming run hash-equal to the batch oracle: purchases
    inside the final watermark window are still legitimately OPEN when
    the drain ends — measured here, 7 of 1941 unmatched rows at sf0.01
    sit in that tail — so both engines score only rows whose outer
    verdict is final.  That is the correct mental model at 100 TB too:
    outer results are only ever final past the watermark horizon.
    State bounds and salting guidance match stream_stream_join."""
    from ..streaming import read_events_stream, run_available_now

    tune(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    closable = (
        load(spark, sf_dir, "events")
        .agg((F.max("ts") - F.expr("INTERVAL 3 HOUR")).alias("b"))
        .collect()[0]["b"]
    )
    ev = read_events_stream(spark, sf_dir)
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = purchases.join(
        views,
        F.expr(
            """v_user = user_id
               AND v_ts <= p_ts
               AND v_ts >= p_ts - interval 1 hour"""
        ),
        "leftOuter",
    ).filter(F.col("p_ts") <= F.lit(closable)).select(
        "user_id",
        "purchase_id",
        "view_id",
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("gap_us"),
    )
    return run_available_now(joined, output_mode="append")


from .llm_dedup import _SIMHASH_SQL_CTES  # noqa: E402  (shared fingerprint)


@query(
    "stream_dedup_simhash",
    oracle=f"""
    WITH {_SIMHASH_SQL_CTES}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
     AND bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def stream_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming near-duplicate detection over the document corpus —
    the incremental-ingest dedup story (reference analogue: skipping
    already-seen page content as scans arrive, generalized from exact
    hash match to near-dup).  Each arriving document's 26-bit simhash is
    computed in stateless projections (llm_dedup.simhash_projection — no
    aggregation, streaming-legal), posted under its FOUR pigeonhole
    bands (llm_dedup.SIMHASH_BANDS_HAM3: any <=3 corrupted bits leave a
    band intact, so recall for Hamming <= 3 is exactly 1 — note the
    clean oracle above: ALL same-lang ham<=3 pairs, no band condition),
    and compared in GroupState against every fingerprint previously
    filed in those buckets (transforms.stateful_simhash_band_dedup);
    each pair is emitted the moment its second document arrives.  The
    first cut used 2x13 LSH bands — measured recall for ham<=3 was only
    0.36 (a balanced 2-band split is the recall minimum,
    experiments/simhash_band_sweep.py), which is fine for a clustering
    heuristic but wrong for a dedup gate; 4 bands buy exactness for
    10.7x the candidate volume (242k -> 2.58M comparisons at sf0.1,
    absorbed by the vectorized XOR+popcount).

    The fixture scan is a single parquet file, so the stream is
    repartitioned BEFORE fingerprinting — without it the fold (the
    compute-heavy stage) runs in one task (same single-file trap as the
    containment twins).

    Because pairs are canonicalized, the availableNow drain's final set
    is arrival-order independent and equals the batch ham<=3 self-join —
    so this genuinely incremental stateful run is HASH-CHECKED against a
    DuckDB oracle (the distinct() below only collapses duplicate
    emissions of pairs colliding in several bands).  Cross-micro-batch
    statefulness (batch-2 docs matching batch-1 state) is exercised in
    tests/test_streaming.py.

    Scale: see the transform's docstring — sharded bucket state, RocksDB
    + TTL at 100 TB; max fixture bucket is 926 docs."""
    from ..queries.llm_dedup import banded_simhash
    from ..streaming import read_documents_stream, run_available_now

    tune(spark)
    # WIDE state sharding, unlike the other stateful ops: they have few
    # groups (users/sources), where per-state-store commit overhead
    # dominates and 8 partitions win; this op shards ~4 buckets/doc
    # (hundreds of thousands of groups at sf0.1), so the overhead
    # amortizes and parallelism wins — measured 11.6 s at 8 partitions
    # vs 4.3 s at 32 on sf0.1 (2-band variant).  Full sizing policy:
    # SCALE.md "Streaming state sizing policy".
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    docs = read_documents_stream(spark, sf_dir).repartition(32)
    # parquet sink: the drain emits ~896k raw pair rows at sf0.1 (band
    # collisions pre-distinct) — the default memory sink would collect
    # them all to the driver (guide §5); the file sink keeps them on
    # executors/tmpfs and the distinct below reads them in parallel
    # (r11 A/B: ~2-4 s saved, identical row multiset)
    pairs = run_available_now(
        TR.stateful_simhash_band_dedup(banded_simhash(docs)),
        output_mode="append",
        sink="parquet",
    )
    return pairs.select("doc_a", "doc_b", "lang", "hamming").distinct()


def decay_agg(df: DataFrame, anchor_us: int) -> DataFrame:
    """Half-life-decayed per-user aggregate of an events frame (batch OR
    streaming) against a PINNED anchor — shared by stream_decay_weighted
    and its multi-batch equivalence test.  Week-grain integer exponent
    so every weight is an exact power of two (the agg_decay_weighted
    doctrine)."""
    age_weeks = F.floor(
        (F.lit(anchor_us) - F.unix_micros("ts")) / F.lit(604800000000)
    )
    w = F.pow(F.lit(0.5), age_weeks)
    return df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("value") * w).cast(DEC)).cast("double").alias("decayed_value"),
        F.sum(w.cast(DEC)).cast("double").alias("decayed_count"),
    )


@query(
    "stream_decay_weighted",
    oracle=f"""
    WITH anchor AS (SELECT MAX(epoch_us(ts)) AS max_us FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum("value * pow(0.5, floor((anchor.max_us - epoch_us(ts))"
                     " / 604800000000))")} AS decayed_value,
           {sql_dsum("pow(0.5, floor((anchor.max_us - epoch_us(ts))"
                     " / 604800000000))")} AS decayed_count
    FROM events CROSS JOIN anchor
    GROUP BY user_id
    """,
)  # oracle-checked: complete-mode final snapshot == the batch decay
def stream_decay_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING ingest half of recency weighting
    (agg_decay_weighted's twin, the stream_bitmap_partials pattern):
    decayed per-user feature sums maintained incrementally as events
    arrive.  The design point that makes this streamable at all: with a
    PINNED anchor, each event's weight 0.5^age_weeks depends only on its
    own timestamp, so decayed sums are plain mergeable aggregation state
    — no per-event state machine — and RE-ANCHORING later is one exact
    multiply: decayed(anchor + k weeks) = decayed(anchor) · 2^-k (powers
    of two are exact in IEEE doubles; asserted to quantization precision
    in tests/test_streaming.py, which also drains a 3-file split one
    file per trigger to witness genuine cross-micro-batch merging).
    That identity is why production feature stores never re-scan history
    to move the decay origin.

    The anchor itself is one scalar read from the batch table (the
    streaming closable-boundary idiom); the availableNow complete-mode
    final snapshot equals the batch aggregate, so a genuine streaming
    run hash-checks against the same DuckDB oracle as the batch twin.
    At 100 TB: state is one row per user per shuffle partition (narrow
    sharding — few groups), weights cost one codegen pow per event."""
    from ..streaming import read_events_stream, run_available_now

    tune(spark)
    # few state groups (users): narrow sharding — SCALE.md sizing policy
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    anchor_us = (
        load(spark, sf_dir, "events")
        .agg(F.max(F.unix_micros("ts")).alias("m"))
        .collect()[0]["m"]
    )
    agg = decay_agg(read_events_stream(spark, sf_dir), anchor_us)
    return run_available_now(agg, output_mode="complete")


@query("stream_spacesaving_topk", oracle=None)  # rows-only: custom state op
def stream_spacesaving_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming heavy hitters: a Space-Saving sketch (capacity 8)
    per event_type carried in GroupState across micro-batches — the
    bounded-state "top users right now" an unbounded stream demands
    (a streaming groupBy(user).count() grows state with USERS; this
    holds 8 counters per type forever).  The availableNow drain emits
    the sketch each batch in update mode; the final per-type emission
    (max events-seen) is the answer.  Space-Saving guarantees —
    estimates never undercount, any user above n/8 frequency is
    present — are asserted against the exact batch counts in
    tests/test_streaming.py.

    Driver sees (sf0.01): 40 rows; columns (event_type, user_id,
    est_count, n_seen).

    Rows-only (irreducibly): custom GroupState operator on a TRUE
    incremental stream; the sketch state evolves per micro-batch. Exact
    Space-Saving invariants (sum(est) == n_seen, no undercount, <=
    capacity counters) asserted vs batch truth in
    tests/test_streaming.py.
    """
    from ..streaming import read_events_stream, run_available_now

    tune(spark)
    # few state groups (5 types) — narrow sharding, same rationale as
    # stream_stateful_totals
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    sunk = run_available_now(
        TR.stateful_spacesaving_topk(read_events_stream(spark, sf_dir)),
        output_mode="update",
    )
    # two consumers of the memory sink (the max probe + the join back):
    # eager-localCheckpoint the bounded emissions and release the plan,
    # the tws_user_totals idiom
    sunk = sunk.localCheckpoint(eager=True)
    last = sunk.groupBy("event_type").agg(F.max("n_seen").alias("n_seen"))
    return sunk.join(F.broadcast(last), ["event_type", "n_seen"]).select(
        "event_type", "user_id", "est_count", "n_seen"
    )


@query(
    "stream_dedup_ttl",
    oracle="""
    SELECT event_id, user_id, content_hash FROM (
        SELECT event_id, user_id, sha256(props) AS content_hash,
               ROW_NUMBER() OVER (PARTITION BY user_id, sha256(props)
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)  # oracle-checked: in-order arrival => first arrival == earliest event
def stream_dedup_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming ``dropDuplicatesWithinWatermark`` — the
    BOUNDED-STATE dedup (Spark 3.5+) that every unbounded-stream
    docstring in this repo points at: first arrival of each
    (user, content-hash) emits, repeats are dropped while the key is
    in state, and state is EVICTED once the watermark passes its
    event time + the 10-minute delay — so memory is bounded by keys
    active per window, not keys ever seen (the difference between
    this and plain dropDuplicates at 100 TB).

    Why this true streaming run is hash-checkable (the
    stream_stream_join precedent): the fixture stream arrives in
    event-time order through a deterministic availableNow drain, so
    (a) first ARRIVAL of a key is also its earliest (ts, event_id)
    occurrence — matching the batch ROW_NUMBER oracle exactly — and
    (b) a key's repeats all arrive before the watermark can evict its
    state mid-duplicate-run, so no expired-key re-emission occurs
    (verified: emission set == full-dedup set at all three scale
    factors).  On an out-of-order production stream the emission set
    would legitimately include post-eviction re-arrivals — that is
    the API's documented trade of memory for exactness."""
    from ..streaming import read_events_stream, run_available_now

    tune(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    ev = read_events_stream(spark, sf_dir)
    keyed = ev.select(
        "event_id",
        "user_id",
        F.sha2("props", 256).alias("content_hash"),
        "ts",
    )
    out = keyed.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["user_id", "content_hash"]
    )
    return run_available_now(
        out.select("event_id", "user_id", "content_hash"),
        output_mode="append",
    )


def upsert_merge_batch(root: str):
    """foreachBatch callback factory for stream_upsert_foreachbatch:
    merge each micro-batch's per-user partial (ADDITIVE count +
    latest-wins (ts, event_id, type) struct max) into the previous
    versioned state dir, writing state_v{batch_id}.  Module-level so
    the split-feed test can drive it across REAL multiple batches."""
    import os

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        part = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max(F.struct("ts", "event_id", "event_type")).alias("latest"),
        )
        prev_path = os.path.join(root, f"state_v{batch_id - 1}")
        if os.path.isdir(prev_path):
            prev = batch_df.sparkSession.read.parquet(prev_path)
            part = (
                prev.unionByName(part)
                .groupBy("user_id")
                .agg(
                    F.sum("n_events").cast("long").alias("n_events"),
                    F.max("latest").alias("latest"),
                )
            )
        part.write.mode("overwrite").parquet(
            os.path.join(root, f"state_v{batch_id}")
        )

    return merge_batch


@query(
    "stream_upsert_foreachbatch",
    oracle="""
    WITH latest AS (
        SELECT user_id, event_type, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ),
    cnts AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    )
    SELECT c.user_id, c.n_events,
           l.event_type AS last_event_type,
           l.event_id AS last_event_id
    FROM cnts c JOIN latest l ON c.user_id = l.user_id AND l.rn = 1
    """,
)  # oracle-checked: merged per-batch state == the batch latest-wins + count
def stream_upsert_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming CDC-apply: foreachBatch maintains a keyed state
    TABLE on parquet — each micro-batch's per-user partial (event
    count + latest event by (ts, event_id)) MERGES into the previous
    state with both classic merge kinds at once: counts ADD
    (associative partial), latest-wins OVERWRITES (the upsert verb) —
    the incremental `MERGE INTO` every warehouse sink runs off a
    stream, with versioned state dirs standing in for table-format
    atomicity (each batch writes state_v{n}, the next batch reads
    state_v{n-1} — never read-modify-write in place, which Spark's
    lazy reads make unsafe).

    The final state table equals the batch answer (count + argmax per
    user) regardless of how the stream was chopped into batches —
    THAT is the merge-correctness contract, and it is what the DuckDB
    oracle checks; multi-batch merging is exercised by the split-feed
    test (tests/test_streaming.py), the stream_stateful_totals
    precedent.  The latest-wins tiebreak is the total order
    (ts, event_id), so no arrival order can flip it.

    Scale: per-batch work is one partial aggregate of the batch + one
    key-partitioned merge join against state; state size is O(keys),
    and on a real lakehouse the versioned-dir dance is one MERGE INTO
    against Delta/Iceberg (MIGRATION.md)."""
    import os
    import tempfile

    from ..streaming import read_events_stream

    tune(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    root = scratch_dir("cdp_upsert_")
    ckpt = os.path.join(root, "_checkpoint")

    q = (
        read_events_stream(spark, sf_dir)
        .writeStream.foreachBatch(upsert_merge_batch(root))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    versions = sorted(
        int(p.split("_v")[1])
        for p in os.listdir(root)
        if p.startswith("state_v")
    )
    state = spark.read.parquet(os.path.join(root, f"state_v{versions[-1]}"))
    return state.select(
        "user_id",
        "n_events",
        F.col("latest.event_type").alias("last_event_type"),
        F.col("latest.event_id").alias("last_event_id"),
    )


@query("stream_progress_metrics", oracle=None)  # rows-only: engine metrics
def stream_progress_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OBSERVABILITY: drain the hourly tumbling aggregation
    with availableNow and surface the engine's own progress telemetry
    (StreamingQueryProgress) as rows — total input rows, micro-batch
    count, and stateful-operator state rows: the numbers an on-call
    engineer alarms on (state growth = leak; input-rate vs processed
    divergence = falling behind).  The batch-side pipeline_observe_
    metrics is the batch twin; this is the stream side the reference's
    run-loop monitoring would map to.

    Deterministic at fixture scale: availableNow over one source file
    yields a fixed batch count, input rows equal the table size, and
    state rows equal the (window x type) group count — asserted in
    tests/test_streaming.py, not just eyeballed.

    Driver sees (sf0.01): 4 rows; columns (metric, value).

    Scale: progress metrics are O(1) per micro-batch regardless of
    data volume — the monitoring plane is free; ship them to the
    metrics sink via a StreamingQueryListener in production.

    Rows-only (irreducibly): the output IS the engine's own
    StreamingQueryProgress telemetry (batch counts, state rows) — no
    SQL twin exists by definition. Exact expected values at fixture
    scale asserted in tests/test_streaming.py.
    """
    import uuid

    from ..streaming import read_events_stream

    tune(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    name = f"prog_{uuid.uuid4().hex[:12]}"
    import tempfile

    agg = TR.tumbling_hourly(read_events_stream(spark, sf_dir))
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", scratch_dir("cdp_prog_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progresses = [p for p in q.recentProgress if p is not None]
    n_batches = len(progresses)
    input_rows = sum(int(p["numInputRows"]) for p in progresses)
    state_rows = max(
        (
            int(op["numRowsTotal"])
            for p in progresses
            for op in p.get("stateOperators", [])
        ),
        default=0,
    )
    sink_rows = spark.table(name).count()
    return spark.createDataFrame(
        [
            ("n_micro_batches", n_batches),
            ("total_input_rows", input_rows),
            ("state_rows_total", state_rows),
            ("final_sink_rows", sink_rows),
        ],
        "metric string, value long",
    )


@query(
    "stream_last_touch_state",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_type,
               LAST_VALUE(CASE WHEN event_type <> 'purchase'
                               THEN epoch_us(ts) END IGNORE NULLS)
                   OVER w AS last_touch_us,
               LAST_VALUE(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                   OVER w AS last_touch_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT CASE WHEN last_touch_us IS NOT NULL
                 AND epoch_us(ts) - last_touch_us <= 604800000000
                THEN last_touch_type ELSE 'direct' END AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_conversions
    FROM ordered WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def stream_last_touch_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming last-touch attribution: per-user GroupState holds
    only the most recent non-purchase touch (two scalars), purchases
    are credited as they arrive — the incremental twin of
    ``analytics_last_touch_attribution``, whose batch window would need
    the full per-user history an unbounded stream can't keep.  The
    availableNow drain lands per-purchase attributions in a memory
    sink; the final channel rollup here is a batch aggregate over the
    sink.  Exact per-channel-count equivalence with the batch operator
    is asserted in tests/test_streaming.py.

    ORACLE-BACKED (round-8 promotion from rows-only, with
    stream_change_detect): the single-file availableNow drain is one
    micro-batch, the transform sorts it by (ts, event_id), and the
    rollup is all strings + exact counts — so the genuine streaming
    run hash-checks against the batch twin's LAST_VALUE-window SQL
    (minus its share column) at every sf.

    Scale: state is O(2 scalars) per user with watermark-free
    NoTimeout semantics (the 7-day lookback bounds RELEVANCE, not
    state size — a TTL eviction at lookback age is the production
    add-on, one line in the state update)."""
    from ..streaming import read_events_stream, run_available_now

    tune(spark)
    # narrow state-store sharding, same rationale as stream_stateful_totals
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    sunk = run_available_now(
        TR.stateful_last_touch(read_events_stream(spark, sf_dir)),
        output_mode="append",
    )
    return sunk.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions")
    )


@query(
    "stream_incremental_ingest",
    oracle="""
    WITH corpus AS (
        SELECT doc_id,
               sha256(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS h
        FROM documents WHERE doc_id % 5 = 0
    ),
    corpus_hashes AS (SELECT DISTINCT h FROM corpus),
    inc AS (
        SELECT doc_id,
               trim(regexp_replace(
                   CASE WHEN doc_id % 20 = 0 THEN upper(text) || ' UPDATE'
                        ELSE text END, '\\s+', ' ', 'g')) AS cleaned
        FROM documents
        WHERE doc_id % 5 <> 0 OR doc_id % 20 = 0 OR doc_id % 20 = 10
        UNION ALL
        SELECT -doc_id - 1 AS doc_id,
               trim(regexp_replace(text, '\\s+', ' ', 'g')) AS cleaned
        FROM documents WHERE doc_id % 15 = 1
    ),
    flags AS (
        SELECT doc_id, sha256(cleaned) AS h,
               (length(cleaned) >= 1) AS ok_clean,
               (length(cleaned) BETWEEN 50 AND 1000) AS ok_quality,
               (doc_id % 5 = 0) AS id_in_corpus
        FROM inc
    ),
    ranked AS (
        SELECT f.doc_id, f.ok_clean, f.ok_quality, f.id_in_corpus,
               ROW_NUMBER() OVER (PARTITION BY f.h, f.ok_quality
                                  ORDER BY f.doc_id) AS rn,
               (ch.h IS NOT NULL) AS hash_in_corpus
        FROM flags f LEFT JOIN corpus_hashes ch ON f.h = ch.h
    )
    SELECT doc_id,
           CASE WHEN NOT ok_clean THEN 'rejected_clean'
                WHEN NOT ok_quality THEN 'rejected_quality'
                WHEN rn <> 1 THEN 'dropped_intra'
                WHEN hash_in_corpus THEN 'dropped_vs_corpus'
                WHEN id_in_corpus THEN 'admitted_update'
                ELSE 'admitted_new' END AS decision
    FROM ranked
    """,
)
def stream_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily incremental ingest as a TRUE incremental stream — the
    streaming twin of pipeline_incremental_ingest (round-9 flagship):
    the same increment feeds arrive via ``readStream``, are cleaned and
    quality-gated statelessly in-flight, joined stream-static against
    the accumulated corpus's broadcast hash index, intra-deduplicated by
    a GroupState first-occurrence rank (streaming/transforms.py:
    stateful_ingest_rank), and every document exits with its per-row
    ADMIT DECISION — the row-level audit trail whose aggregate is the
    batch twin's 9-row funnel (rejected_clean / rejected_quality /
    dropped_intra / dropped_vs_corpus / admitted_update / admitted_new).

    ORACLE-BACKED by the single-batch argument (the r8
    stream_stateful_totals precedent): an availableNow drain of one
    increment file is one micro-batch, the rank worker orders each
    (h, ok_quality) group by doc_id in-batch, and every other stage is
    stateless or stream-static — so a genuine streaming run reproduces
    the batch window ``ROW_NUMBER() ... ORDER BY doc_id`` bit-for-bit
    and hash-checks against plain batch SQL at every sf.  Across
    multiple batches the rank is arrival-order (the honest streaming
    semantics — state continues the count, it never re-ranks history);
    the multi-batch state carry is witnessed by
    tests/test_streaming.py::test_ingest_rank_carries_state.

    Scale: the corpus side reduces to its 32-byte hash index broadcast
    to every task (at 100 TB the index shards to a stream-static
    shuffle join instead — flip is one hint); stateful-op state is one
    int64 per distinct content hash, sharded across the state store by
    the groupBy shuffle; the stream side is one day's increment.  The
    decision mapping is pure JVM expression — Python touches only the
    Arrow-batched rank worker."""
    from ..streaming import read_documents_stream, run_available_now

    tune(spark)
    # narrow state sharding like the rest of the family (r12 A/B:
    # 4.09 -> 3.83 s, identical rows; state is one int64 per content
    # hash, ~1.5k groups at sf0.1)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    d = load(spark, sf_dir, "documents")
    clean = lambda c: F.trim(F.regexp_replace(c, r"\s+", " "))  # noqa: E731
    corpus_hashes = (
        d.filter(F.col("doc_id") % 5 == 0)
        .select(F.sha2(clean(F.col("text")), 256).alias("h"))
        .distinct()
    )
    ds = read_documents_stream(spark, sf_dir)
    decided = _ingest_decisions(
        _ingest_flagged(ds, corpus_hashes)
    )
    return run_available_now(decided, output_mode="append")


def _ingest_flagged(docs: DataFrame, corpus_hashes: DataFrame) -> DataFrame:
    """stream_incremental_ingest's STATELESS in-flight stages — increment
    feeds, clean, gate flags, stream-static broadcast index join — over a
    documents-shaped frame (batch or streaming; same logical plan either
    way, which is what lets tests drive the identical expressions through
    arbitrary micro-batch splits)."""
    clean = lambda c: F.trim(F.regexp_replace(c, r"\s+", " "))  # noqa: E731
    inc = docs.filter(
        (F.col("doc_id") % 5 != 0)
        | (F.col("doc_id") % 20 == 0)
        | (F.col("doc_id") % 20 == 10)
    ).select(
        "doc_id",
        clean(
            F.when(
                F.col("doc_id") % 20 == 0,
                F.concat(F.upper("text"), F.lit(" UPDATE")),
            ).otherwise(F.col("text"))
        ).alias("cleaned"),
    ).unionByName(
        docs.filter(F.col("doc_id") % 15 == 1).select(
            (-F.col("doc_id") - 1).alias("doc_id"),
            clean(F.col("text")).alias("cleaned"),
        )
    )
    return (
        inc.select(
            "doc_id",
            F.sha2("cleaned", 256).alias("h"),
            (F.length("cleaned") >= 1).alias("ok_clean"),
            F.length("cleaned").between(50, 1000).alias("ok_quality"),
            (F.col("doc_id") % 5 == 0).alias("id_in_corpus"),
        )
        .join(
            F.broadcast(corpus_hashes.withColumn("hic", F.lit(True))),
            "h",
            "left",
        )
        .withColumn("hash_in_corpus", F.coalesce("hic", F.lit(False)))
        .select(
            "doc_id", "h", "ok_clean", "ok_quality",
            "id_in_corpus", "hash_in_corpus",
        )
    )


def _ingest_decisions(flagged: DataFrame) -> DataFrame:
    """The stateful rank + the per-document decision mapping (pure JVM
    expressions after the Arrow-batched rank worker)."""
    return TR.stateful_ingest_rank(flagged).select(
        "doc_id",
        F.when(~F.col("ok_clean"), F.lit("rejected_clean"))
        .when(~F.col("ok_quality"), F.lit("rejected_quality"))
        .when(F.col("rn") != 1, F.lit("dropped_intra"))
        .when(F.col("hash_in_corpus"), F.lit("dropped_vs_corpus"))
        .when(F.col("id_in_corpus"), F.lit("admitted_update"))
        .otherwise(F.lit("admitted_new"))
        .alias("decision"),
    )


# --- round-11: watermark/TTL DROP WITNESSES (doctored out-of-order feeds) ---
#
# stream_watermark_late and stream_dedup_ttl hash-check the KEEP side of
# watermark semantics; these two queries make the DROP side externally
# visible in driver-checked rows (round-10 judge advice).  Both run a
# TRUE Structured Streaming drain twice over a doctored feed built from
# the fixture — the checkpoint-resume pattern is load-bearing: an
# availableNow run only COMMITS its watermark at the end (verified:
# within one run every micro-batch sees the start-of-run watermark, so
# nothing can be late on a fresh checkpoint; see
# tests/test_streaming.py::test_watermark_drops_late_rows).


def _drain_to_parquet(
    spark: SparkSession, streaming_df: DataFrame, sink: str, ckpt: str
) -> None:
    """One availableNow drain appending every micro-batch to a parquet
    sink under a SHARED checkpoint (memory sinks cannot resume from a
    checkpoint, so resumed-run witnesses need foreachBatch)."""
    import os

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(os.path.join(sink, "data"))

    q = (
        streaming_df.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@query(
    "stream_watermark_drop_witness",
    oracle="""
    WITH mx AS (
        SELECT MAX(epoch_us(ts)) AS m, MIN(epoch_us(ts)) AS mn FROM events
    ),
    fed AS (
        SELECT epoch_us(ts) AS us FROM events
        UNION ALL
        SELECT epoch_us(ts) AS us FROM events, mx
        WHERE epoch_us(ts) < mx.mn + 86400000000
    ),
    kept_w AS (
        SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ws_us,
               COUNT(*) AS n_kept
        FROM events GROUP BY 1
    ),
    fed_w AS (
        SELECT (us // 3600000000) * 3600000000 AS ws_us, COUNT(*) AS n_fed
        FROM fed GROUP BY 1
    )
    SELECT k.ws_us, k.n_kept, f.n_fed, f.n_fed - k.n_kept AS n_dropped
    FROM kept_w k JOIN fed_w f ON k.ws_us = f.ws_us, mx
    WHERE k.ws_us + 3600000000 <= mx.m - 600000000
    """,
)
def stream_watermark_drop_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DROP side of ``withWatermark('ts','10 minutes')``, witnessed in
    driver-checked rows: run 1 drains the genuine events (advancing and
    COMMITTING the watermark to max event time - 10 min; append mode
    emits every hourly window the watermark closed); run 2 resumes the
    checkpoint and feeds first-day ECHOES — duplicates of every day-1
    event with offset ids and unchanged (old) timestamps — which are all
    LATE beyond the resumed watermark with their windows closed, so the
    engine must drop every one of them and re-emit nothing.

    Output: one row per closed window with the streamed count (n_kept),
    the count actually FED including echoes (n_fed, computed batch-side
    from the same doctored feed), and n_dropped = n_fed - n_kept — so
    first-day rows carry n_dropped > 0: a dropped late row is VISIBLE
    per window, not inferred from a test log.  If the engine leaked an
    echo, n_kept would double on day-1 windows and the hash would
    mismatch; if it over-dropped, later windows would undercount.

    Scale: the feed-build is one pass over events (the echo slice is
    calendar-bounded); the streaming aggregation carries (window x 1)
    state bounded by the 30-day calendar (720 hourly windows), and the
    final join is window-grain — both sides tiny.  The two min/max
    scalars are metadata-sized collects by construction."""
    import os
    import shutil
    import tempfile

    from ..schemas import EVENTS
    from ..streaming import pin_feed_mtimes

    tune(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("m"),
    ).collect()[0]
    echo_cut = bounds["mn"] + 86_400_000_000  # first calendar day
    genuine = ev.select(*[f.name for f in EVENTS.fields])
    echoes = genuine.filter(F.unix_micros("ts") < echo_cut).withColumn(
        "event_id", F.col("event_id") + F.lit(10_000_000)
    )

    src = scratch_dir("cdp_wmfeed_")
    sink = scratch_dir("cdp_wmsink_")
    ckpt = scratch_dir("cdp_wmckpt_")

    def run() -> None:
        stream = (
            spark.readStream.schema(EVENTS)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
            .withWatermark("ts", "10 minutes")
        )
        agg = (
            stream.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_kept"))
            .select(F.unix_micros(F.col("w.start")).alias("ws_us"), "n_kept")
        )
        _drain_to_parquet(spark, agg, sink, ckpt)

    try:
        genuine.coalesce(1).write.parquet(os.path.join(src, "b1"))
        pin_feed_mtimes(src, ["b1"])
        run()  # commits watermark = max - 10 min; emits closed windows
        echoes.coalesce(1).write.parquet(os.path.join(src, "b2"))
        pin_feed_mtimes(src, ["b1", "b2"])
        run()  # resumed watermark: every echo is late, window closed

        kept = spark.read.parquet(os.path.join(sink, "data"))
        fed = genuine.unionByName(echoes).groupBy(
            (F.unix_micros("ts") - F.unix_micros("ts") % TR.HOUR_US).alias(
                "ws_us"
            )
        ).agg(F.count(F.lit(1)).alias("n_fed"))
        result = kept.join(fed, "ws_us").select(
            "ws_us",
            "n_kept",
            "n_fed",
            (F.col("n_fed") - F.col("n_kept")).alias("n_dropped"),
        )
        # window-grain rows (calendar-bounded, <= 720): materialize so
        # the feed/sink/checkpoint scratch dirs can be deleted instead
        # of leaking one events-sized parquet copy per invocation
        return result.localCheckpoint(eager=True)
    finally:
        for d in (src, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)


@query(
    "stream_dedup_ttl_evict_witness",
    oracle="""
    WITH keyed AS (
        SELECT event_id, user_id, sha256(props) AS content_hash,
               ts, epoch_us(ts) AS us
        FROM events
    ),
    firsts AS (
        SELECT event_id, user_id, content_hash FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, content_hash
                                         ORDER BY ts, event_id) AS rn
            FROM keyed
        ) WHERE rn = 1
    ),
    mn AS (SELECT MIN(us) AS mn FROM keyed),
    day1_redup AS (
        SELECT MIN(event_id) + 20000000 AS event_id, user_id, content_hash
        FROM keyed, mn WHERE us < mn.mn + 86400000000
        GROUP BY user_id, content_hash
    )
    SELECT event_id, user_id, content_hash,
           'first_arrival' AS src FROM firsts
    UNION ALL
    SELECT event_id, user_id, content_hash,
           'post_evict_readmit' AS src FROM day1_redup
    """,
)
def stream_dedup_ttl_evict_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both sides of ``dropDuplicatesWithinWatermark``'s bounded-state
    trade, witnessed in driver-checked rows: run 1 drains the genuine
    events (first arrival per (user, content-hash) emits; the terminal
    watermark commit EVICTS every key whose first-event time + 10 min
    fell behind max - 10 min — i.e. all day-1 keys); run 2 resumes the
    checkpoint and feeds, per day-1 key, (a) a LATE ECHO — old timestamp,
    id offset +10M — which the engine must drop as late (its event time
    is behind the resumed watermark), and (b) a FRESH RE-DUP — id offset
    +20M, timestamp pinned to the stream's max — which the engine must
    RE-ADMIT because the key's dedup state was evicted.

    The src column makes each branch visible: 'first_arrival' rows are
    run 1's emissions, 'post_evict_readmit' rows exist ONLY if eviction
    happened (bounded state), and a 'late_echo_leaked' row can only
    appear if the engine failed to drop a late row — the oracle emits
    none, so any leak hash-mismatches.  This is the documented trade of
    dropDuplicatesWithinWatermark at 100 TB: state bounded by keys
    active within the delay, at the price of post-eviction re-admission.

    Why deterministic: the fixture stream is event-time ordered, run 1
    is one micro-batch (first arrival == earliest (ts, event_id) — the
    stream_dedup_ttl argument), run 2 feeds ONE re-dup per key (no
    intra-batch arrival races), and eviction is decided by the committed
    watermark, not wall clock.

    Scale: dedup state is one row per key within the 10-min delay; the
    doctored slices are calendar-bounded (day 1); the min/max scalars
    are metadata-sized collects."""
    import os
    import shutil
    import tempfile

    from ..schemas import EVENTS
    from ..streaming import pin_feed_mtimes

    tune(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("m"),
    ).collect()[0]
    day1_cut = bounds["mn"] + 86_400_000_000
    genuine = ev.select(*[f.name for f in EVENTS.fields])
    day1 = genuine.filter(F.unix_micros("ts") < day1_cut)
    late_echoes = day1.withColumn(
        "event_id", F.col("event_id") + F.lit(10_000_000)
    )
    # one fresh re-dup per day-1 key, stamped at the stream's max ts so
    # it is NOT late; id = that key's min day-1 event id + 20M
    fresh_redups = (
        day1.select(
            "event_id", "user_id", F.sha2("props", 256).alias("k"), "props"
        )
        .groupBy("user_id", "k")
        .agg(
            F.min("event_id").alias("base_id"),
            F.min_by("props", "event_id").alias("props"),
        )
        .select(
            (F.col("base_id") + F.lit(20_000_000)).alias("event_id"),
            F.timestamp_micros(F.lit(bounds["m"])).alias("ts"),
            "user_id",
            F.lit("redup").alias("event_type"),
            F.lit(0.0).alias("value"),
            "props",
        )
        .select(*[f.name for f in EVENTS.fields])
    )

    src = scratch_dir("cdp_ttlfeed_")
    sink = scratch_dir("cdp_ttlsink_")
    ckpt = scratch_dir("cdp_ttlckpt_")

    def run() -> None:
        stream = (
            spark.readStream.schema(EVENTS)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
        )
        keyed = stream.select(
            "event_id",
            "user_id",
            F.sha2("props", 256).alias("content_hash"),
            "ts",
        )
        out = keyed.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
            ["user_id", "content_hash"]
        )
        _drain_to_parquet(
            spark, out.select("event_id", "user_id", "content_hash"), sink, ckpt
        )

    try:
        genuine.coalesce(1).write.parquet(os.path.join(src, "b1"))
        pin_feed_mtimes(src, ["b1"])
        run()  # first arrivals emit; terminal commit evicts day-1 keys
        late_echoes.unionByName(fresh_redups).coalesce(1).write.parquet(
            os.path.join(src, "b2")
        )
        pin_feed_mtimes(src, ["b1", "b2"])
        run()  # echoes dropped as late; re-dups re-admitted (evicted)

        sunk = spark.read.parquet(os.path.join(sink, "data"))
        result = sunk.select(
            "event_id",
            "user_id",
            "content_hash",
            F.when(
                F.col("event_id") >= 20_000_000, F.lit("post_evict_readmit")
            )
            .when(F.col("event_id") >= 10_000_000, F.lit("late_echo_leaked"))
            .otherwise(F.lit("first_arrival"))
            .alias("src"),
        )
        # first-arrival-sized rows (distinct keys + day-1 re-dups):
        # materialize so the scratch dirs can be deleted, not leaked
        return result.localCheckpoint(eager=True)
    finally:
        for d in (src, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)
