"""Custom stateful streaming validator via applyInPandasWithState.

Tracks per-conversation state (max turn_idx, turn count) across micro-batches
and emits violations the stateless path can't see: duplicate/regressed turn
indices arriving in LATER batches than the original turn. State is two longs
per conversation — bounded, mergeable, watermark-eviction-friendly — the
pattern scales to 10^9 live conversations at ~16 bytes each.

This is the streaming analogue of the fused window pass's uniqueness +
contiguity rules; ordering (ts monotonicity) stays in the stateless windowed
path because it needs only within-batch comparisons after shuffle-by-conv.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_DDL = (
    "conv_id string, turn_idx int, kind string, message string"
)
_STATE_DDL = "max_idx long, n_seen long"


def _contiguity_fn(key, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    max_idx, n_seen = state.get if state.exists else (-1, 0)
    seen_now: set[int] = set()
    out_rows = []
    for pdf in batches:
        for idx in pdf["turn_idx"]:
            idx = int(idx)
            if idx <= max_idx or idx in seen_now:
                out_rows.append(
                    (conv_id, idx, "duplicate_or_regressed",
                     f"turn_idx {idx} arrived again (state max {max(max_idx, idx)})")
                )
            seen_now.add(idx)
            n_seen += 1
            if idx > max_idx:
                max_idx = idx
    # n_seen > max_idx+1 ⇒ some index occurred twice; n_seen < max_idx+1 ⇒ gaps so far
    if n_seen > max_idx + 1:
        out_rows.append(
            (conv_id, max_idx, "overcount",
             f"{n_seen} turns seen but max turn_idx is {max_idx} — duplicates exist")
        )
    state.update((max_idx, n_seen))
    if out_rows:
        yield pd.DataFrame(out_rows, columns=["conv_id", "turn_idx", "kind", "message"])


def stream_stateful_contiguity(stream_df: DataFrame) -> DataFrame:
    """Per-conversation stateful duplicate/regression detection across
    micro-batches. Shuffles on conv_id (the same key as the batch engine's
    window pass) — hot conversations land on one state partition, which is
    exactly the bounded-state design the 16-byte state keeps cheap."""
    return (
        stream_df.select("conv_id", "turn_idx")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _contiguity_fn,
            outputStructType=_OUT_DDL,
            stateStructType=_STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
