"""Stateful processing (SURVEY.md §2.2 "(stateful)" row).

Two renderings of the same per-user sessionizer:

- ``q_stateful_sessions`` (graded, oracle-checked): secondary-sort
  ``mapInPandas`` — repartition(user_id) + sortWithinPartitions +
  vectorized numpy census over whole Arrow chunks with a user-boundary
  carry (the r7 q_debounce_anchor pattern; moved off per-group
  ``applyInPandas`` in r14 because ~1.5 ms pandas overhead PER GROUP
  dominated at fixture group sizes). This is the template for
  flexcalc-style per-dataset kernels (batch.py::scheduler callbacks,
  R24) when groups are small and numerous.
- ``stateful_sessions_stream`` (tests): the same logic as a true
  Structured Streaming ``applyInPandasWithState`` operator with
  GroupStateTimeout, asserted equivalent in tests/test_streaming.py.
  The per-group imperative kernel (``_sessionize_pdf``/``_session_fold``)
  remains as its shared reference fold and as the vectorized path's
  equivalence baseline.

Scale: one shuffle on user_id either way; state per group in the
streaming version is four BIGINTs (n_sessions, last_ts, cur_len,
longest) with GroupStateTimeout.NoTimeout — state lives for the
stream's lifetime, one tiny tuple per user; switch to EventTimeTimeout
if per-user eviction ever matters.
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


def _session_fold(ts_values, n_sessions, last_ts, cur_len, longest):
    """The gap-session decision, shared by the batch kernel and the
    streaming twin so the two renderings cannot desynchronize (r13
    review). A new session opens when the gap from the session ANCHOR
    (the latest timestamp seen so far) reaches SESSION_GAP_US; the
    anchor only advances — an in-watermark late event (t < last_ts,
    possible only across micro-batches) joins the current session and
    never regresses the anchor, mirroring the debounce twin's
    documented advance-only semantics (pinned by
    tests/test_streaming.py::
    test_stateful_sessions_multibatch_anchor_never_regresses)."""
    for t in ts_values:
        t = int(t)
        if last_ts is None or t - last_ts >= SESSION_GAP_US:
            n_sessions += 1
            cur_len = 1
        else:
            cur_len += 1
        longest = max(longest, cur_len)
        last_ts = t if last_ts is None else max(last_ts, t)
    return n_sessions, last_ts, cur_len, longest


def _sessionize_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Gap-based session counting over one user's (sorted) events."""
    ts = pdf["ts_us"].sort_values().to_numpy()
    n_sessions, _last, _cur, longest = _session_fold(ts, 0, None, 0, 0)
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_sessions": [n_sessions],
            "longest_session_events": [longest],
        }
    )


def _sessionize_sorted_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized session census over a (user_id, ts_us)-sorted frame
    spanning many complete user groups.

    Equivalence with _session_fold (pinned by tests/test_streaming.py::
    test_vectorized_sessionizer_matches_reference_fold): over ASCENDING
    per-user timestamps the advance-only anchor is always the previous
    element, so a session opens exactly where ts[i] - ts[i-1] >=
    SESSION_GAP_US (or at the user boundary); session lengths are the
    distances between session starts and the longest is a segmented
    max (np.maximum.reduceat)."""
    import numpy as np

    uid = pdf["user_id"].to_numpy(dtype="int64")
    ts = pdf["ts_us"].to_numpy(dtype="int64")
    n = len(uid)
    if n == 0:
        return pd.DataFrame(
            {
                "user_id": np.zeros(0, dtype="int64"),
                "n_sessions": np.zeros(0, dtype="int64"),
                "longest_session_events": np.zeros(0, dtype="int64"),
            }
        )
    new_user = np.ones(n, dtype=bool)
    new_user[1:] = uid[1:] != uid[:-1]
    new_sess = new_user.copy()
    new_sess[1:] |= (ts[1:] - ts[:-1]) >= SESSION_GAP_US
    starts = np.flatnonzero(new_sess)
    lens = np.diff(np.append(starts, n))
    ustarts = np.flatnonzero(new_user)
    first_sess = np.searchsorted(starts, ustarts)
    n_sessions = np.diff(np.append(first_sess, len(starts)))
    longest = np.maximum.reduceat(lens, first_sess)
    return pd.DataFrame(
        {
            "user_id": uid[ustarts],
            "n_sessions": n_sessions.astype("int64"),
            "longest_session_events": longest.astype("int64"),
        }
    )


def _sessionize_batches(batches: Iterator[pd.DataFrame]):
    """Partition-local session census over (user_id, ts_us)-sorted
    Arrow chunks; the trailing user of each chunk may continue in the
    next one, so it is carried forward and prepended (the
    _debounce_anchor_batches template)."""
    carry: pd.DataFrame | None = None
    for pdf in batches:
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if not len(pdf):
            continue
        uid = pdf["user_id"].to_numpy()
        earlier_users = uid != uid[-1]
        if not earlier_users.any():
            carry = pdf  # whole chunk is one (possibly continuing) user
            continue
        import numpy as np

        split = int(np.flatnonzero(earlier_users)[-1]) + 1
        complete, carry = pdf.iloc[:split], pdf.iloc[split:]
        yield _sessionize_sorted_frame(complete)
    if carry is not None and len(carry):
        yield _sessionize_sorted_frame(carry)


@register(
    "q_stateful_sessions",
    oracle=f"""
        WITH t AS (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        ), g AS (
            SELECT user_id, ts_us, event_id,
                   CASE WHEN ts_us - LAG(ts_us) OVER w >= {SESSION_GAP_US} OR
                             LAG(ts_us) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM t
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        ), s AS (
            SELECT user_id, ts_us,
                   SUM(new_sess) OVER (PARTITION BY user_id
                        ORDER BY ts_us, event_id
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
    scale_notes=(
        "secondary-sort sessionizer: ONE shuffle on user_id, "
        "sortWithinPartitions, mapInPandas over whole Arrow chunks "
        "with a user-boundary carry, vectorized numpy session census "
        "inside — the r7 q_debounce_anchor pattern. Moved off "
        "per-group applyInPandas in r14: ~1.5 ms pandas overhead PER "
        "GROUP dominated at fixture group sizes (~67 events/user; "
        "measured 2.9 -> ~0.9 s at sf0.1) and grows with |users| at "
        "100 TB. The grouped-state rendering survives as the "
        "applyInPandasWithState streaming twin, equivalence-tested "
        "beside it"
    ),
)
def q_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session stats via the secondary-sort mapInPandas
    pattern (vectorized numpy census over sorted Arrow chunks),
    oracle-checked against pure-SQL sessionization."""
    e = events_with_time(spark, sf_dir)
    part = (
        e.select("user_id", "ts_us")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts_us")
    )
    return part.mapInPandas(_sessionize_batches, schema=SESSIONS_SCHEMA)


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
    n_sessions, last_ts, cur_len, longest = _session_fold(
        all_ts, n_sessions, last_ts, cur_len, longest
    )
    state.update((n_sessions, last_ts, cur_len, longest))
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "n_sessions": [n_sessions],
            "longest_session_events": [longest],
        }
    )


def stateful_sessions_stateful(
    s: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Apply the stateful sessionizer to a prepared event stream (needs
    user_id/ts_us/event_time columns). Factored like
    debounce_anchor_stateful so tests can drive a multi-micro-batch
    source and pin the cross-batch advance-only-anchor semantics
    (_session_fold docstring)."""
    return (
        s.select("user_id", "ts_us", "event_time")
        .withWatermark("event_time", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_with_state,
            outputStructType=SESSIONS_SCHEMA,
            stateStructType="n_sessions BIGINT, last_ts BIGINT, cur_len BIGINT, longest BIGINT",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stateful_sessions_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True stateful streaming sessionizer (applyInPandasWithState)."""
    return stateful_sessions_stateful(stream_events(spark, sf_dir))


# --- anchor-based debounce -------------------------------------------
# q_debounce (timeseries.py) is LAG-based: gap from the previous event,
# kept or not — one window pass. The anchor-based variant (gap from the
# last KEPT event) is a sequential greedy fold: whether event i is kept
# depends on the kept/dropped decision at i-1, so no fixed number of
# window passes expresses it (and a recursive-CTE unroll is
# depth = max anchors per group — data-dependent). This is exactly the
# shape applyInPandas / applyInPandasWithState exist for.

def _debounce_anchor_mask(pdf: pd.DataFrame):
    """Vectorized anchor fold over a (user, type, ts, event_id)-sorted
    frame spanning many groups. Key fact: a row whose gap from its
    PREDECESSOR exceeds the threshold is always anchor-kept (the last
    kept event is no later than the predecessor), so the sequential
    fold only touches 'dense' runs — rows within DEBOUNCE_US of their
    predecessor — which are a tiny fraction of real telemetry."""
    import numpy as np

    from flexcalc_spark.operators.timeseries import DEBOUNCE_US

    ts = pdf["ts_us"].to_numpy(dtype="int64")
    uid = pdf["user_id"].to_numpy(dtype="int64")
    et = pdf["event_type"].to_numpy()
    n = len(ts)
    if n == 0:
        return np.zeros(0, dtype=bool)
    new_group = np.ones(n, dtype=bool)
    new_group[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
    gap = np.empty(n, dtype="int64")
    gap[0] = DEBOUNCE_US + 1
    gap[1:] = ts[1:] - ts[:-1]
    keep = new_group | (gap > DEBOUNCE_US)
    dense_idx = np.flatnonzero(~keep)
    # resolve dense runs sequentially; each run starts right after a
    # kept row (its predecessor has gap > threshold or starts a group)
    i = 0
    while i < len(dense_idx):
        j = dense_idx[i]
        anchor = ts[j - 1]  # predecessor is kept (proof above)
        while i < len(dense_idx) and dense_idx[i] == j:
            if ts[j] - anchor > DEBOUNCE_US:
                keep[j] = True
                anchor = ts[j]
            i += 1
            j += 1
    return keep


@register(
    "q_debounce_anchor",
    oracle=None,  # greedy sequential fold: each keep/drop decision
    # depends on the previous DECISION, not the previous row — no
    # fixed-pass SQL twin (and the recursive unroll depth is
    # data-dependent). Equivalence evidence: tests/test_streaming.py
    # checks applyInPandas == pure-Python reference == the
    # applyInPandasWithState streaming twin, and that anchor-kept is
    # a subset of lag-kept (q_debounce) with first-per-group always
    # kept.
    family="streaming",
    scale_notes=(
        "anchor-based debounce (drop events within 60 s of the last "
        "KEPT event — the rate-limiter semantic, stricter than "
        "q_debounce's lag-based gap): a greedy sequential fold where "
        "each decision depends on the previous DECISION. Rendered as "
        "the secondary-sort pattern — ONE shuffle on (user_id, "
        "event_type), sortWithinPartitions, then mapInPandas "
        "iterating whole Arrow chunks with a chunk-boundary carry — "
        "because per-group applyInPandas paid ~1.5 ms of pandas "
        "overhead per group (measured 5.7x probe ratio). The fold "
        "itself is vectorized on the proof that any row > threshold "
        "from its PREDECESSOR is always anchor-kept, so Python loops "
        "only over dense runs (~0.05% of telemetry rows). A true "
        "applyInPandasWithState streaming twin (state = one BIGINT "
        "anchor per group) is batch-equivalence-tested beside it"
    ),
)
def q_debounce_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-based debounce: per (user, event_type), keep events
    arriving > 60 s after the last kept event; returns kept rows
    (event_id, user_id, event_type, ts_us)."""
    e = events_with_time(spark, sf_dir)
    part = (
        e.select("event_id", "user_id", "event_type", "ts_us")
        .repartition("user_id", "event_type")
        .sortWithinPartitions("user_id", "event_type", "ts_us", "event_id")
    )
    return part.mapInPandas(
        _debounce_anchor_batches,
        schema="event_id long, user_id long, event_type string, ts_us long",
    )


def _debounce_anchor_batches(batches: Iterator[pd.DataFrame]):
    """Partition-local anchor debounce over sorted chunks. The trailing
    (user, type) group of each chunk may continue in the next chunk, so
    it is carried forward and prepended; the final carry flushes last."""
    import numpy as np

    carry: pd.DataFrame | None = None
    for pdf in batches:
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if not len(pdf):
            continue
        uid = pdf["user_id"].to_numpy()
        et = pdf["event_type"].to_numpy()
        earlier = np.flatnonzero((uid != uid[-1]) | (et != et[-1]))
        if len(earlier) == 0:
            carry = pdf  # whole chunk is one (possibly continuing) group
            continue
        split = int(earlier[-1]) + 1
        complete, carry = pdf.iloc[:split], pdf.iloc[split:]
        yield complete[_debounce_anchor_mask(complete)]
    if carry is not None and len(carry):
        yield carry[_debounce_anchor_mask(carry)]


def _debounce_anchor_with_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update fn: one BIGINT of state per
    (user, type) group — the last kept anchor timestamp.

    Equivalence scope (ADVICE r7): the fold sorts WITHIN each
    micro-batch and the stored anchor only advances, so the output
    equals the batch q_debounce_anchor fold exactly when each group's
    events arrive time-ordered ACROSS micro-batches (true for the
    file-replay source here, which feeds one availableNow batch —
    tests/test_streaming.py::test_debounce_anchor_batch_reference_and_stream
    pins that scope). With multiple micro-batches, an
    in-watermark late event older than the stored anchor is evaluated
    against that newer anchor (it may be dropped where the batch fold
    would keep it and re-anchor). That is the standard streaming
    debounce semantics — state cannot retract emitted rows in update
    mode; an application needing batch-identical late-data folds should
    widen the watermark and re-run the batch key over the closed
    window instead. The multi-batch behavior is itself pinned by
    tests/test_streaming.py::test_debounce_anchor_multibatch_semantics
    (two interleaved micro-batches vs a carried-anchor reference fold)."""
    from flexcalc_spark.operators.timeseries import DEBOUNCE_US

    last = state.get[0] if state.exists else None
    # concatenate all chunks before sorting (large-group chunking
    # arrives in shuffle order — the q_stateful_sessions lesson)
    pdf = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    kept_eid: list[int] = []
    kept_ts: list[int] = []
    for eid, t in zip(
        pdf["event_id"].to_numpy(), pdf["ts_us"].to_numpy()
    ):
        t = int(t)
        if last is None or t - last > DEBOUNCE_US:
            kept_eid.append(int(eid))
            kept_ts.append(t)
            last = t
    state.update((int(last),))
    yield pd.DataFrame(
        {
            "event_id": kept_eid,
            "user_id": [int(key[0])] * len(kept_eid),
            "event_type": [str(key[1])] * len(kept_eid),
            "ts_us": kept_ts,
        }
    )


def debounce_anchor_stateful(
    s: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Apply the stateful anchor-debouncer to a prepared event stream
    (needs event_id/user_id/event_type/ts_us/event_time columns).
    Factored so tests can drive a multi-micro-batch source
    (maxFilesPerTrigger=1) with a wide watermark and pin the
    cross-batch anchor semantics documented above."""
    return (
        s.select("event_id", "user_id", "event_type", "ts_us", "event_time")
        .withWatermark("event_time", watermark)
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _debounce_anchor_with_state,
            outputStructType=(
                "event_id long, user_id long, event_type string,"
                " ts_us long"
            ),
            stateStructType="last_ts BIGINT",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def debounce_anchor_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True stateful streaming anchor-debouncer (applyInPandasWithState):
    emits kept events per micro-batch; state is one anchor per group."""
    return debounce_anchor_stateful(stream_events(spark, sf_dir))
