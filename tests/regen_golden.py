"""Regenerate the golden sf0.001 digests: python -m tests.regen_golden"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covid_data_pipeline_spark.registry import load_all  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402
from tests.conftest import SF_SMOKE  # noqa: E402
from tests.golden_utils import GOLDEN_PATH, digest  # noqa: E402


def main() -> None:
    spark = get_spark("golden-regen")
    out = {}
    for name, spec in sorted(load_all().items()):
        out[name] = digest(spec.fn(spark, SF_SMOKE))
        print(f"{name}: {out[name]['rows']} rows {out[name]['sha256'][:12]}")
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN_PATH} ({len(out)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
