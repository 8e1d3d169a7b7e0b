#!/usr/bin/env python3
"""Verify named queries against the DuckDB oracle at sf0.01 (the
driver's hash compare) and optionally sf0.1 (cap-free), exactly as
driversim does.  Usage:

    python experiments/opt_r11_verify_one.py [--sf01] name [name ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

args = [a for a in sys.argv[1:] if not a.startswith("--")]
do_sf01 = "--sf01" in sys.argv

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .appName("opt-verify-one")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from tests.conftest import make_duck, SF_ORACLE
from tests.oracle_harness import run_compare
from covid_data_pipeline_spark.registry import load_all

reg = load_all()
fail = 0
for sf_dir in [SF_ORACLE] + (["/root/testdata/sf0.1"] if do_sf01 else []):
    con = make_duck(sf_dir)
    for name in args:
        t0 = time.time()
        try:
            run_compare(name, reg[name], spark, con, sf_dir)
            print(f"PASS {name} @ {sf_dir} ({time.time()-t0:.1f}s)", flush=True)
        except Exception as exc:
            fail += 1
            print(f"FAIL {name} @ {sf_dir}: {exc}", flush=True)
spark.stop()
sys.exit(1 if fail else 0)
