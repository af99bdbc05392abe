"""Physical-plan audit: assert the plans we want, not just the results.

The engine's scale contract (SURVEY.md §4) is carried by physical-design
choices — broadcast the dims, keep Python off the fact path, prune scans,
bound shuffles. This module turns those choices into testable properties by
parsing `df.explain("formatted")` output:

- ``n_shuffles``           count of Exchange operators (AQE reuse excluded)
- ``n_broadcast_joins``    BroadcastHashJoin / BroadcastNestedLoopJoin
- ``n_sortmerge_joins``    SortMergeJoin occurrences
- ``has_batch_eval_python``row-at-a-time Python (the slow path — should be 0)
- ``n_arrow_eval``         Arrow-batched Python stages (refine UDFs only)
- ``wholestage_codegen``   whether any WholeStageCodegen span exists
- ``pushed_filters``       parquet scans with non-empty PushedFilters
- ``read_schemas``         column lists actually read per parquet scan
  (column-pruning evidence: a 2-column projection must not read 16 columns)
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def simple_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def _top_level_fields(schema_body: str) -> list[str]:
    """Top-level column names of a ``struct<...>`` body, bracket-aware: a
    naive comma split would fabricate names from NESTED struct fields
    (``w:struct<start:timestamp,end:timestamp>,x:int`` → ['w','end','x'])."""
    cols, depth, start = [], 0, 0
    for i, ch in enumerate(schema_body):
        if ch in "<([":
            depth += 1
        elif ch in ">)]":
            depth -= 1
        elif ch == "," and depth == 0:
            cols.append(schema_body[start:i])
            start = i + 1
    tail = schema_body[start:]
    if tail:
        cols.append(tail)
    return [c.split(":", 1)[0].strip() for c in cols if c.strip()]


def _read_schema_bodies(plan: str) -> list[str]:
    """The balanced ``struct<...>`` body of every ReadSchema line (the
    regex ``[^>]*`` would truncate at a nested struct's first '>')."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<", plan):
        i, depth = m.end(), 1
        while i < len(plan) and depth:
            if plan[i] == "<":
                depth += 1
            elif plan[i] == ">":
                depth -= 1
            i += 1
        out.append(plan[m.end():i - 1])
    return out


def audit_plan(df: DataFrame) -> dict:
    plan = formatted_plan(df)
    simple = simple_plan(df)
    read_schemas = _read_schema_bodies(plan)
    pushed = [
        m.group(1).strip()
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan)
    ]
    # formatted mode prints each node twice (tree line '+- Op (4)' and
    # detail header '(4) Op') — count only the numbered detail headers
    def n_ops(pattern: str) -> int:
        return len(re.findall(rf"(?m)^\(\d+\) (?:{pattern})", plan))

    return {
        "n_shuffles": n_ops("Exchange"),
        "n_broadcast_joins": n_ops("Broadcast(?:Hash|NestedLoop)Join"),
        "n_sortmerge_joins": n_ops("SortMergeJoin"),
        "has_batch_eval_python": "BatchEvalPython" in plan,
        "n_arrow_eval": n_ops("ArrowEvalPython|MapInPandas"),
        # simple mode prints codegen'd operators as "*(n) Op"
        "wholestage_codegen": "WholeStageCodegen" in plan or "*(" in simple,
        "pushed_filters": [p for p in pushed if p],
        "read_schemas": [_top_level_fields(s) for s in read_schemas],
        "plan": plan,
    }
