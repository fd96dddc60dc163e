"""Custom stateful streaming operator: turn-level conversation reassembly.

`incremental.py` assumes whole conversations arrive per micro-batch. When
the feed is raw turn events (out of order, split across micro-batches), the
engine needs the reference's canonicalization invariant — per-turn text
equality under stable (conv_id, turn_idx) ordering (BASELINE.json
input_hint) — maintained *statefully*: buffer each conversation's turns in
group state, and emit the canonical record (n_turns, fingerprint) once the
event-time watermark has passed the conversation's quiet period.

Implemented with `applyInPandasWithState` (Arrow-batched per-group pandas,
GroupState for the buffer, event-time timeout for the flush) — the Spark
primitive for operators the built-in windowed aggregations can't express.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..config import FINGERPRINT_SEP

__all__ = ["assemble_conversations", "ASSEMBLED_SCHEMA"]

ASSEMBLED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("n_turns", IntegerType(), False),
        StructField("fingerprint", StringType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("turn_idxs", ArrayType(IntegerType()), False),
        StructField("texts", ArrayType(StringType()), False),
        StructField("last_ts_ms", LongType(), False),
    ]
)


def _make_assembler(gap_ms: int, sep: str):
    def assemble(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            idxs, texts, _ = state.get
            order = sorted(range(len(idxs)), key=lambda i: (idxs[i], i))
            fp = sep.join(texts[i] if texts[i] is not None else "" for i in order)
            state.remove()
            yield pd.DataFrame(
                {"conv_id": [key[0]], "n_turns": [len(idxs)], "fingerprint": [fp]}
            )
            return

        idxs: list = []
        texts: list = []
        last_ms = 0
        if state.exists:
            old_idxs, old_texts, last_ms = state.get
            idxs.extend(old_idxs)
            texts.extend(old_texts)
        for pdf in pdfs:
            idxs.extend(int(v) for v in pdf["turn_idx"])
            texts.extend(None if pd.isna(t) else str(t) for t in pdf["text"])
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).max()
            last_ms = max(last_ms, int(ts_ms))
        state.update((idxs, texts, last_ms))
        # flush when the watermark passes the conversation's quiet period
        state.setTimeoutTimestamp(last_ms + gap_ms)
        # no output until the timeout fires (the fn is a generator via the
        # timed-out branch's yield)

    return assemble


def assemble_conversations(
    turns: DataFrame,
    watermark_delay: str = "2 minutes",
    gap_ms: int = 60_000,
    sep: str = FINGERPRINT_SEP,
) -> DataFrame:
    """Streaming turns (conv_id, turn_idx, text, ts) -> canonical records
    (conv_id, n_turns, fingerprint), emitted per conversation once no turn
    has arrived (in event time) for `gap_ms`.

    Late turns inside the watermark are merged regardless of arrival order
    or micro-batch placement; the fingerprint is built under stable
    (turn_idx, arrival) ordering, preserving the per-turn-equality invariant."""
    return (
        turns.withWatermark("ts", watermark_delay)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_assembler(gap_ms, sep),
            outputStructType=ASSEMBLED_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
