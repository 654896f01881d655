"""Stateful processing (SURVEY.md §2.2 "(stateful)" row).

Two renderings of the same per-user sessionizer:

- ``q_stateful_sessions`` (graded, oracle-checked): batch
  ``applyInPandas`` — one Arrow batch per user, imperative gap logic in
  Python. This is the template for flexcalc-style per-dataset kernels
  (batch.py::scheduler callbacks, R24): group by dataset, hand the whole
  group to vectorized Python.
- ``stateful_sessions_stream`` (tests): the same logic as a true
  Structured Streaming ``applyInPandasWithState`` operator with
  GroupStateTimeout, asserted equivalent in tests/test_streaming.py.

Scale: applyInPandas shuffles once on user_id; state per group in the
streaming version is two integers (bounded by watermark timeout).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from flexcalc_spark.registry import register
from flexcalc_spark.tables import events_with_time
from flexcalc_spark.streaming.windows import SESSION_GAP_US, stream_events

SESSIONS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("longest_session_events", LongType()),
    ]
)


def _sessionize_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Gap-based session counting over one user's (sorted) events."""
    ts = pdf["ts_us"].sort_values().to_numpy()
    n_sessions = 0
    cur_len = 0
    longest = 0
    prev = None
    for t in ts:
        if prev is None or t - prev >= SESSION_GAP_US:
            n_sessions += 1
            cur_len = 1
        else:
            cur_len += 1
        longest = max(longest, cur_len)
        prev = t
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_sessions": [n_sessions],
            "longest_session_events": [longest],
        }
    )


@register(
    "q_stateful_sessions",
    oracle=f"""
        WITH t AS (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        ), g AS (
            SELECT user_id, ts_us,
                   CASE WHEN ts_us - LAG(ts_us) OVER w >= {SESSION_GAP_US} OR
                             LAG(ts_us) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM t
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        ), s AS (
            SELECT user_id, ts_us,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
                        ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM g
        ), per_sess AS (
            SELECT user_id, sess_id, COUNT(*) AS n FROM s GROUP BY user_id, sess_id
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(MAX(n) AS BIGINT) AS longest_session_events
        FROM per_sess
        GROUP BY user_id
    """,
    family="streaming",
    scale_notes="applyInPandas: one shuffle on user_id, whole group as one Arrow batch — the flexcalc per-dataset kernel pattern (R24)",
)
def q_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session stats via batch applyInPandas (imperative Python
    over Arrow groups), oracle-checked against pure-SQL sessionization."""
    e = events_with_time(spark, sf_dir)
    return (
        e.select("user_id", "ts_us")
        .groupBy("user_id")
        .applyInPandas(_sessionize_pdf, schema=SESSIONS_SCHEMA)
    )


def _sessionize_with_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update fn: carries (n_sessions, last_ts_us,
    cur_len, longest) across micro-batches."""
    if state.exists:
        n_sessions, last_ts, cur_len, longest = state.get
    else:
        n_sessions, last_ts, cur_len, longest = 0, None, 0, 0
    # Concatenate ALL chunks before sorting: a group larger than the
    # Arrow batch size arrives as multiple pdfs in shuffle order, and
    # per-chunk sorting would mis-sessionize cross-chunk time inversions.
    all_ts = pd.concat([pdf["ts_us"] for pdf in pdfs]).sort_values().to_numpy()
    for t in all_ts:
        t = int(t)
        if last_ts is None or t - last_ts >= SESSION_GAP_US:
            n_sessions += 1
            cur_len = 1
        else:
            cur_len += 1
        longest = max(longest, cur_len)
        last_ts = t
    state.update((n_sessions, last_ts, cur_len, longest))
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "n_sessions": [n_sessions],
            "longest_session_events": [longest],
        }
    )


def stateful_sessions_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True stateful streaming sessionizer (applyInPandasWithState)."""
    s = stream_events(spark, sf_dir)
    return (
        s.select("user_id", "ts_us", "event_time")
        .withWatermark("event_time", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_with_state,
            outputStructType=SESSIONS_SCHEMA,
            stateStructType="n_sessions BIGINT, last_ts BIGINT, cur_len BIGINT, longest BIGINT",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
