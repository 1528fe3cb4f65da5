"""Arbitrary stateful streaming on the Spark 4 ``transformWithState`` API
(SURVEY.md §2.12: `applyInPandasWithState / transformWithState`).

Same running-progress semantics as :mod:`etl_lala_spark.streaming.stateful`
(reference A6/T4: stride-based progress emission,
NDJSON_IMPLEMENTADO.md:113-117), expressed as a ``StatefulProcessor`` with a
typed ``ValueState`` — the successor API: explicit state variables with
per-variable schemas and TTL support instead of a single state tuple, so new
state fields don't break checkpoint compatibility of unrelated ones.

Runtime note: Spark's transformWithState driver worker imports
``google.protobuf`` for its state-server protocol; environments without
protobuf can still import this module (pure pandas processor) but must run
the legacy ``stateful.attach_progress`` form instead. The agreement test in
``tests/test_streaming.py`` self-skips on missing protobuf.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("total_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("emitted", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("total_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("emitted", LongType()),
    ]
)

STRIDE = 50


class RunningProgressProcessor(StatefulProcessor):
    """Per-key running count/sum; emits one row per crossed stride boundary."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("progress", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            total, value, emitted = self._state.get()
        else:
            total, value, emitted = 0, 0.0, 0
        for pdf in rows:
            total += len(pdf)
            value += float(pdf["value"].sum())
        out = []
        while total >= (emitted + 1) * STRIDE:
            emitted += 1
            out.append((key[0], total, round(value, 2), emitted))
        self._state.update((total, value, emitted))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "total_events", "total_value", "emitted"]
            )

    def close(self) -> None:
        pass


def attach_progress_tws(events):
    """Wire the processor onto a streaming events DataFrame (per-user keys)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningProgressProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ewma_value", DoubleType()),
    ]
)

_EWMA_STATE_SCHEMA = StructType(
    [StructField("s", DoubleType()), StructField("n", LongType())]
)

EWMA_ALPHA = 0.3


class EwmaProcessor(StatefulProcessor):
    """transformWithState twin of ``stateful.ewma_update``: two scalars of
    ValueState per key, same (ts, event_id)-ordered fold, same doubles."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("ewma", _EWMA_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            s, n = self._state.get()
        else:
            s, n = None, 0
        for pdf in rows:
            for v in pdf.sort_values(["ts", "event_id"])["value"]:
                x = float(v)
                s = x if n == 0 else s * (1.0 - EWMA_ALPHA) + x * EWMA_ALPHA
                n += 1
        self._state.update((s, n))
        yield pd.DataFrame(
            [(key[0], n, s)], columns=["user_id", "n_events", "ewma_value"]
        )

    def close(self) -> None:
        pass


def attach_ewma_tws(events):
    """Wire the EWMA processor onto a streaming events DataFrame."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=EwmaProcessor(),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
