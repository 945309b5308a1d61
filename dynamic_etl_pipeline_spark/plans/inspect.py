"""Parse Spark's formatted explain output into assertable facts."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The full ``explain('formatted')`` text of a DataFrame."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def data_sized_nested_loops(df: DataFrame) -> int:
    """Count nested-loop/cartesian joins that could be data-sized —
    the O(n^2) shape plan tests forbid — EXCLUDING known scalar
    gates: 1-row broadcast stat frames whose BNLJ condition references
    a marker column (``_stop_nd`` for the stop-shingle corpus count,
    ``_scalar_gate`` prefix for any other deliberate 1-row gate; an
    inner join against one row is O(n); Spark folds any synthetic equi
    key out of it, so BNLJ is the only plan shape it can take)."""
    return _nested_loops_in(formatted_plan(df))


def _nested_loops_in(plan: str) -> int:
    bad = len(re.findall(r"^\(\d+\) CartesianProduct", plan, re.MULTILINE))
    # Each node's detail block runs from its "(N) OpName" header to the
    # next header (ADVICE r5: a fixed 3-line window misclassified BNLJ
    # blocks whose "Join condition:" sat below extra detail lines as
    # condition-less cross joins).
    headers = list(re.finditer(r"^\(\d+\) (\S+)", plan, re.MULTILINE))
    for i, m in enumerate(headers):
        if not m.group(1).startswith("BroadcastNestedLoopJoin"):
            continue
        end = headers[i + 1].start() if i + 1 < len(headers) else len(plan)
        block = plan[m.start():end]
        cond = re.search(r"^Join condition: (.*)$", block, re.MULTILINE)
        allowed = cond is not None and (
            "_stop_nd" in cond.group(1) or "_scalar_gate" in cond.group(1)
        )
        if not allowed:
            bad += 1
    return bad


def has_operator(df: DataFrame, name: str) -> bool:
    """True if the physical plan contains an operator node whose name
    matches ``name`` (substring, e.g. 'BroadcastHashJoin',
    'CartesianProduct', 'TakeOrderedAndProject')."""
    return name in formatted_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (ReadSchema) —
    the ground truth for column-pruning assertions."""
    scans: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        body = m.group(1)
        cols = [f.split(":")[0].strip() for f in body.split(",") if ":" in f]
        scans.append(cols)
    return scans


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (broadcast exchanges are
    counted separately by has_operator('BroadcastExchange'))."""
    plan = formatted_plan(df)
    # formatted mode puts the partitioning on the node's own
    # "Arguments:" line; simple mode inlines it after "Exchange".
    inline = len(re.findall(r"\bExchange (hash|range)partitioning", plan))
    detail = len(re.findall(r"Arguments: (hash|range)partitioning", plan))
    return inline + detail


def python_eval_count(df: DataFrame) -> int:
    """Number of Python-evaluation operators (BatchEvalPython /
    ArrowEvalPython / MapInPandas / MapInArrow...) — 0 means the plan
    is fully JVM-side."""
    return len(
        re.findall(
            r"BatchEvalPython|ArrowEvalPython|MapInPandas"
            r"|FlatMapGroupsInPandas|MapInArrow",
            formatted_plan(df),
        )
    )


def plan_stats(df: DataFrame) -> dict:
    """Catalyst's own cost estimates for the optimized plan: size in
    bytes and (when CBO has one) a row-count estimate. This is the
    number the broadcast-vs-shuffle decision reads — exposing it makes
    'why did this join broadcast?' answerable from a test instead of
    from plan archaeology."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    row_count = stats.rowCount()
    return {
        "size_bytes": int(str(stats.sizeInBytes())),
        "row_count": (
            int(str(row_count.get())) if not row_count.isEmpty() else None
        ),
    }
