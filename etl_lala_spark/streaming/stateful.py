"""Custom stateful streaming operators (SURVEY.md §2.12:
applyInPandasWithState).

The reference's only stateful behavior is a running record counter with
progress emission every 50k records (A6/T4, NDJSON_IMPLEMENTADO.md:113-117)
and per-month load bookkeeping (T5). Both are per-key running state →
``applyInPandasWithState`` with a tiny numeric state tuple (bounded state,
no matter the stream length).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROGRESS_OUTPUT_SCHEMA = "user_id long, total_events long, total_value double, emitted long"
PROGRESS_STATE_SCHEMA = "total_events long, total_value double, emitted long"


def running_progress(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Per-key running count/sum with stride-based progress emission: emits a
    row whenever the running count crosses another stride boundary (the
    reference logs every 50k records; here the stride is carried in the
    state)."""
    stride = 50
    if state.exists:
        total, value, emitted = state.get
    else:
        total, value, emitted = 0, 0.0, 0
    for pdf in pdfs:
        total += len(pdf)
        value += float(pdf["value"].sum())
    out = []
    while total >= (emitted + 1) * stride:
        emitted += 1
        out.append((key[0], total, round(value, 2), emitted))
    state.update((total, value, emitted))
    if out:
        yield pd.DataFrame(out, columns=["user_id", "total_events", "total_value", "emitted"])


def attach_progress(events):
    """Wire the running-progress operator onto a streaming events DataFrame
    (grouped per user)."""
    return events.groupBy("user_id").applyInPandasWithState(
        running_progress,
        outputStructType=PROGRESS_OUTPUT_SCHEMA,
        stateStructType=PROGRESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_SCHEMA = "user_id long, n_events long, ewma_value double"
EWMA_STATE_SCHEMA = "s double, n long"
EWMA_ALPHA = 0.3


def ewma_update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Streaming EWMA — the graduation path of the batch
    ``events_ewma_smoothing`` fold when per-key history is unbounded: state
    is exactly TWO scalars per key (current smoothed value + count), not
    the value sequence, so memory is O(active keys) for any stream length.

    Rows inside a micro-batch are folded in (ts, event_id) order; batches
    are assumed time-ordered across triggers (a file stream fed in arrival
    order — the reference's competência-ordered ingest). Python floats are
    IEEE doubles folding the same sequence as the batch JVM fold, so the
    smoothed values agree exactly (asserted in tests)."""
    if state.exists:
        s, n = state.get
    else:
        s, n = None, 0
    for pdf in pdfs:
        for v in pdf.sort_values(["ts", "event_id"])["value"]:
            x = float(v)
            s = x if n == 0 else s * (1.0 - EWMA_ALPHA) + x * EWMA_ALPHA
            n += 1
    state.update((s, n))
    yield pd.DataFrame(
        [(key[0], n, s)], columns=["user_id", "n_events", "ewma_value"]
    )


def attach_ewma(events):
    """Wire the streaming EWMA onto a streaming events DataFrame (grouped per
    user); each trigger emits the current per-user smoothed value."""
    return events.groupBy("user_id").applyInPandasWithState(
        ewma_update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
