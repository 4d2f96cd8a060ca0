"""Physical-plan inspection helpers."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans in the plan."""
    txt = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", txt):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column sets actually read from each scan (column-pruning witness)."""
    txt = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", txt):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def n_broadcast_hints(df: DataFrame) -> int:
    """Count of user-forced broadcast hints in the analyzed logical plan
    (AQE-chosen broadcasts don't show up here — only explicit hints do)."""
    analyzed = df._jdf.queryExecution().analyzed().toString()
    return analyzed.count("ResolvedHint")
