#!/usr/bin/env python3
"""sql_recursive_hierarchy anchor-materialization A/B at sf0.1.

The recursive CTE's step query joins the FRONTIER against the temp
view `rc_users` — a LOGICAL view over scan(events)+distinct, so every
recursion level (~11 at 2k users) replays the 600k-row scan and the
distinct exchange.  Arm `ckpt` materializes the distinct user set once
(localCheckpoint) before registering the view; the recursion then
joins against an in-memory 2k-row RDD per level.  Result set is the
distinct user ids either way — identical rows.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covid_data_pipeline_spark.io import load, tune  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 9

SQL = """
WITH RECURSIVE org AS (
    SELECT CAST(0 AS BIGINT) AS user_id, CAST(0 AS INT) AS depth,
           '0' AS path
    UNION ALL
    SELECT u.user_id, org.depth + 1,
           CONCAT(org.path, '/', CAST(u.user_id AS STRING))
    FROM rc_users u
    JOIN org ON u.user_id DIV 2 = org.user_id
    WHERE u.user_id != 0
)
SELECT user_id, depth, path FROM org
"""


def hierarchy(spark, ckpt: bool):
    ev = load(spark, SF_DIR, "events")
    users = ev.select("user_id").distinct()
    if ckpt:
        users = users.localCheckpoint(eager=False)
    users.createOrReplaceTempView("rc_users")
    return spark.sql(SQL)


def main():
    spark = get_spark("opt-r12-recursive-ab")
    tune(spark)
    print(f"# load1m: {os.getloadavg()[0]:.2f}", file=sys.stderr)

    ref = sorted(tuple(r) for r in hierarchy(spark, False).collect())
    got = sorted(tuple(r) for r in hierarchy(spark, True).collect())
    assert got == ref, "ckpt arm diverged"
    print(f"# exactness: ckpt == plain on all {len(ref)} rows")

    t = {False: [], True: []}
    for r in range(ROUNDS):
        for arm in (False, True):
            spark.sparkContext.setJobDescription(
                f"hierarchy {'ckpt' if arm else 'plain'} r{r}"
            )
            t0 = time.perf_counter()
            hierarchy(spark, arm).write.format("noop").mode("overwrite").save()
            t[arm].append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    for arm in (False, True):
        xs = sorted(t[arm])
        print(
            f"{'ckpt ' if arm else 'plain':5s} med={statistics.median(xs):6.3f}"
            f" min={xs[0]:6.3f} max={xs[-1]:6.3f}  all={[round(x, 2) for x in t[arm]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
