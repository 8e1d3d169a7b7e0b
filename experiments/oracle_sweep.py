#!/usr/bin/env python3
"""FULL Spark-vs-DuckDB oracle sweep at an arbitrary scale factor — the
cap-free version of the driver's correctness check, at whatever scale
you point it at (default sf0.1, the bench scale the driver never
hash-checks; the per-round driver and the preflight suite check
sf0.01).  Every oracle-backed query runs on BOTH engines and the
canonicalized frames must match row-for-row; rows-only queries just
materialize.  The round-4 runs of this sweep found the ROUND(double, 6)
half-boundary divergence (SCALE.md) and, after that fix, came back
clean: 236/236 at sf0.1.

Run: python experiments/oracle_sweep.py            (~16 min at sf0.1)
     SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python experiments/oracle_sweep.py
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from covid_data_pipeline_spark.registry import load_all
    from covid_data_pipeline_spark.session import get_spark
    from tests.conftest import make_duck
    from tests.oracle_harness import run_compare

    spark = get_spark("oracle-sweep")
    con = make_duck(SF_DIR)
    reg = load_all()
    npass = nfail = 0
    t0 = time.time()
    for i, (name, spec) in enumerate(reg.items()):
        try:
            run_compare(name, spec, spark, con, SF_DIR)
            npass += 1
        except Exception:
            nfail += 1
            print(f"FAIL {name}", flush=True)
            traceback.print_exc(limit=3)
        if (i + 1) % 25 == 0:
            print(f"  ...{i + 1}/{len(reg)} ({time.time() - t0:.0f}s)", flush=True)
    print(
        f"sweep {os.path.basename(SF_DIR)}: {npass} pass, {nfail} fail"
        f" of {len(reg)} in {time.time() - t0:.0f}s",
        flush=True,
    )
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main())
