"""Custom stateful streaming operator: conversation sessionization.

``applyInPandasWithState`` maintains per-``conv_id`` state across
micro-batches — running turn/matched counts and the first/last event
times — emitting an updated session row every time a batch touches the
conversation. This is the Structured-Streaming-native form of the
reference's "carry the current logcode context forward across the
page stream" pattern (``ultra_light_parser.py:197-219``, W5), lifted
from a single ordered scan to keyed state that survives micro-batch
boundaries and restarts (state lives in the checkpoint).

Scale notes: state is O(active conversations), a few counters each —
no per-turn retention (SURVEY §7.4 risk 6); the grouping shuffle is
the same conv_id hash partitioning the batch pipeline uses, so a hot
conversation lands on one state store but carries only counters, not
rows.

Timeout semantics: ``idle_timeout_ms`` enables ProcessingTimeTimeout —
an idle conversation is closed (``closed=True`` row) and its state
dropped. Use it ONLY with a continuous trigger: under
``trigger(availableNow=True)`` Spark keeps issuing state-cleanup
batches until every pending processing-time timeout has fired, so a
drain-and-stop run with timeouts enabled spins for minutes instead of
terminating (observed empirically; default is therefore NoTimeout).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "conv_id string, n_turns long, n_matched long, "
    "first_ts timestamp, last_ts timestamp, closed boolean"
)
_STATE_SCHEMA = "n_turns long, n_matched long, first_ts timestamp, last_ts timestamp"


def _make_update_fn(idle_timeout_ms: int | None):
    def update_session(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle conversation: emit the closing row and drop the state
            n_turns, n_matched, first_ts, last_ts = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "conv_id": key[0],
                        "n_turns": n_turns,
                        "n_matched": n_matched,
                        "first_ts": first_ts,
                        "last_ts": last_ts,
                        "closed": True,
                    }
                ]
            )
            return

        n_turns, n_matched, first_ts, last_ts = (
            state.get if state.exists else (0, 0, None, None)
        )
        for pdf in pdfs:
            n_turns += len(pdf)
            n_matched += int(pdf["pattern_class"].notna().sum())
            batch_min = pdf["ts"].min()
            batch_max = pdf["ts"].max()
            first_ts = batch_min if first_ts is None else min(first_ts, batch_min)
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
        state.update((n_turns, n_matched, first_ts, last_ts))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [
                {
                    "conv_id": key[0],
                    "n_turns": n_turns,
                    "n_matched": n_matched,
                    "first_ts": first_ts,
                    "last_ts": last_ts,
                    "closed": False,
                }
            ]
        )

    return update_session


def sessionize(
    classified_stream: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-conversation running session summaries over a *streaming*
    DataFrame that already carries ``pattern_class`` (the classify
    stage runs unchanged under micro-batching). Emits one updated row
    per touched conversation per micro-batch; with ``idle_timeout_ms``
    set (continuous triggers only — see module docstring) also a
    ``closed=True`` row when a conversation times out idle."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return classified_stream.groupBy("conv_id").applyInPandasWithState(
        _make_update_fn(idle_timeout_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
