"""Golden-digest helpers (SURVEY §5.2.5): freeze a canonical digest of
every query's sf0.001 result so regressions surface without DuckDB in
the loop.

Digest = sha256 over the order-insensitive canonical rowset, using the
LOOSE (1e-9-rounded) float canonicalization from the oracle harness —
strict-hex would couple the digest to partial-aggregation merge order
for the few non-decimal float aggregates.

Regenerate after an intentional semantics change with:
    python -m tests.regen_golden
"""

from __future__ import annotations

import hashlib
import json
import os

from .oracle_harness import _rowset

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "sf0001.json")


def digest(spark_df, strict: bool = False) -> dict:
    """Row digest for regression compare.  strict=False rounds floats to
    1e-9 (the golden tier, which compares across regenerations);
    strict=True hashes floats via float.hex() — bit-identical or bust
    (the partitioning-invariance tier, whose claim is literal
    bit-stability)."""
    pdf = spark_df.toPandas()
    rows = _rowset(pdf, strict=strict)
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return {
        "rows": len(pdf),
        "cols": sorted(pdf.columns),
        "sha256": h.hexdigest(),
    }


def strict_digest(spark_df) -> dict:
    return digest(spark_df, strict=True)


def load_golden() -> dict[str, dict]:
    with open(GOLDEN_PATH) as f:
        return json.load(f)
