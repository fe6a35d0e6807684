"""Plan inspection & policy audit helpers.

Two jobs:
* ``explain_str`` / assertions — verify the physical plans we rely on at
  scale actually materialize (filter pushdown into parquet scans,
  broadcast for small join sides, whole-stage codegen in hot paths).
* ``find_slow_path_violations`` — the per-row-Python ban (input hint:
  vectorized pandas/Arrow UDFs only).  The reference's row-wise
  ``DataFrame.apply`` (analytics/etl_dim_analytics.py:102) is exactly
  the anti-pattern this guards against.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame

# Row-at-a-time constructs that must not appear in the engine:
_SLOW_PATTERNS = [
    re.compile(r"\bF\.udf\("),
    re.compile(r"@udf\b"),
    re.compile(r"\budf\(\s*lambda"),
    re.compile(r"\.rdd\b"),
    re.compile(r"\bsc\.parallelize\b"),
    re.compile(r"\.foreach\(\s*lambda"),
    re.compile(r"\.toLocalIterator\b"),
]


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def scan_pushes_filters(df: DataFrame) -> bool:
    """True if at least one scan in the plan pushed a non-empty filter
    (a multi-table plan legitimately contains full scans too)."""
    ex = explain_str(df)
    return bool(re.search(r"PushedFilters: \[(?!\])", ex))


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_whole_stage_codegen(df: DataFrame) -> bool:
    # simple mode marks codegen stages as `*(n) Op`; formatted mode under
    # AQE hides the annotation
    simple = explain_str(df, "simple")
    return "*(" in simple or "WholeStageCodegen" in simple


def find_slow_path_violations(package_root: str | None = None) -> list[str]:
    """Scan the engine package for row-at-a-time Python constructs.
    Returns 'path:lineno: line' strings (empty == clean)."""
    this_file = os.path.abspath(__file__)
    if package_root is None:
        # plans/__init__.py lives at <pkg>/plans/ -> <pkg> is two levels up
        package_root = os.path.dirname(os.path.dirname(this_file))
    hits: list[str] = []
    for root, _dirs, files in os.walk(package_root):
        for name in files:
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            if os.path.abspath(path) == this_file:
                continue  # the pattern definitions would match themselves
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    stripped = line.strip()
                    if stripped.startswith("#"):
                        continue
                    for pat in _SLOW_PATTERNS:
                        if pat.search(line):
                            hits.append(f"{os.path.relpath(path, package_root)}:{i}: {stripped}")
    return hits
