"""Physical-plan inspection (SURVEY.md §4 — "the plan you'd want, not
the first one that passed").

``plan_text(df)`` captures ``df.explain("formatted")`` output so tests
can assert the physical properties that matter at 100 TB:
- column pruning reached the scan (ReadSchema lists only needed columns)
- predicates pushed into parquet (PushedFilters non-empty)
- dimension joins broadcast (BroadcastHashJoin)
- global top-k runs as TakeOrderedAndProject (no global sort)
- aggregations are partial+final (two HashAggregate nodes)
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()
