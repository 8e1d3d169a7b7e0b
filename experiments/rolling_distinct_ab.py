#!/usr/bin/env python3
"""A/B the exact rolling-7-day-distinct-users formulations, to put a
measured number on the SCALE.md claim that the windowed-bitmap plan
beats the naive range self-join (what people actually write) while
producing identical results.

  arm A (ship):  win_rolling_bitmap_distinct — one scan into (day,
                 bucket) bitmaps, windowed bitmap_or_agg over the day
                 spine, popcount + per-day sum.
  arm B (naive): day spine range-joined back to raw (day, user) pairs
                 (every event day lands in up to 7 frames — a 7x
                 fan-out of the distinct pairs), then per-day
                 COUNT(DISTINCT).

The fixture's 30-day window keeps both cheap; the structural gap is
the point: arm B re-shuffles the fanned-out PAIRS (data-sized x 7)
where arm A shuffles fixed 4 KB blobs per (day, bucket).  To show the
trend the user-id space is widened by salting each user into W
synthetic ids (more distinct users per day => pair fan-out grows,
bitmap cost stays ~flat until bucket count grows).

Run: python experiments/rolling_distinct_ab.py   (~2 min, local[32])
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402

from covid_data_pipeline_spark.queries.windows import (  # noqa: E402
    _rolling_bitmap_lazy,
)
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WIDENINGS = (1, 20, 100)


def widen(ev: DataFrame, w: int) -> DataFrame:
    """Salt each user into w synthetic ids (deterministic), keeping the
    day structure — scales the distinct-user volume without changing
    the calendar shape."""
    if w == 1:
        return ev.select("ts", "user_id")
    return (
        ev.select("ts", "user_id")
        .crossJoin(F.broadcast(
            get_spark("rolling-ab").range(w).select(F.col("id").alias("salt"))
        ))
        .select("ts", (F.col("user_id") * w + F.col("salt")).alias("user_id"))
    )


def arm_bitmap(ev: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The SHIPPED formulation — imported from the query module so this
    A/B can never drift from what win_rolling_bitmap_distinct runs."""
    return _rolling_bitmap_lazy(ev)


def arm_naive(ev: DataFrame) -> DataFrame:
    du = ev.select(
        F.col("ts").cast("date").alias("day_d"), "user_id"
    ).distinct()
    days = du.select(F.col("day_d").alias("frame_day")).distinct()
    fan = du.join(
        F.broadcast(days),
        (F.col("day_d") <= F.col("frame_day"))
        & (F.col("day_d") >= F.date_sub("frame_day", 6)),
    )
    return fan.groupBy(F.col("frame_day").alias("day_d")).agg(
        F.countDistinct("user_id").alias("users_7d")
    )


def timed(df: DataFrame) -> tuple[float, list]:
    t0 = time.perf_counter()
    rows = df.collect()
    return time.perf_counter() - t0, rows


def main() -> None:
    spark = get_spark("rolling-ab")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    print(f"# rolling-distinct A/B at {SF_DIR}")
    print(f"{'widen':>6} {'users/day':>10} {'bitmap_s':>9} {'naive_s':>8} {'equal':>6}")
    for w in WIDENINGS:
        wide = widen(ev, w).cache()
        wide.count()
        daily, out = arm_bitmap(wide)
        try:
            tb, rows_b = timed(out)
        finally:
            daily.unpersist()
        tn, rows_n = timed(arm_naive(wide))
        # the shipped arm emits day as a string; align for the compare
        a = {(str(r[0]), r[1]) for r in rows_b}
        b = {(str(r[0]), r[1]) for r in rows_n}
        users = wide.select("user_id").distinct().count()
        print(f"{w:>6} {users:>10} {tb:>9.2f} {tn:>8.2f} {a == b!s:>6}")
        assert a == b, f"arms disagree at widen={w}"
        wide.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
