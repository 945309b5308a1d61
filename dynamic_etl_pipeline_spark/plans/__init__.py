"""Physical-plan inspection (SURVEY §4).

The engine writes no optimizer — Catalyst does — but it is accountable
for HANDING Catalyst plans it can optimize. These helpers make that
checkable: tests assert that filters reach the parquet scan, that scans
prune columns, that star-dimension joins broadcast, that no operator
degenerates into a cartesian/BNLJ product, and that hot paths stay
inside whole-stage codegen. A plan regression fails CI instead of
surfacing as a 100x slowdown at deployment scale.
"""

from .inspect import (  # noqa: F401
    data_sized_nested_loops,
    exchange_count,
    formatted_plan,
    has_operator,
    plan_stats,
    pushed_filters,
    python_eval_count,
    read_schema_columns,
)
