"""Reusable distributed operators that Spark lacks natively.

Library-level primitives (not registered queries): queries/ modules
compose these into oracle-checked entries.  Everything here is pure
DataFrame — no RDDs, no Python in the row path.
"""

from .graph import connected_components

__all__ = ["connected_components"]
