"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.10 extension — the reference's only state is the
consumer-side ``seen_ids`` dict, main.py:663-700, which dies with the
process; here state lives in the checkpointed state store and survives
restarts).

Used where built-in windowed aggregation can't express the semantics:
arbitrary per-key accumulators, custom eviction, cross-batch dedup.
State is partitioned by key (scales horizontally) and bounded by
timeouts where configured.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = "user_id long, n_events long, total_value double"
RUNNING_TOTALS_STATE = "n long, s double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running event counts/value totals across ALL
    micro-batches — the streaming analogue of the reference's
    accumulating pipeline stats (A4), but per-key, distributed, and
    restart-safe. Emits the updated total for every user seen in the
    batch (update semantics)."""

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [s]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        RUNNING_TOTALS_OUTPUT,
        RUNNING_TOTALS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


SEEN_KEYS_OUTPUT = "k string, first_seen_batch long, n_occurrences long, is_new boolean"
SEEN_KEYS_STATE = "first_batch long, n long"


def stateful_first_wins(keys: DataFrame, key_col: str = "k") -> DataFrame:
    """Cross-batch first-wins dedup: the streaming version of V2's
    ``seen_ids`` — a key's FIRST occurrence (earliest batch) marks
    ``is_new = true``; later occurrences in any batch report the
    original batch and the running occurrence count. State per key is
    two longs — at web scale add a TTL timeout to bound the store."""

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = sum(len(p) for p in pdfs)
        if state.exists:
            first_batch, n = state.get
            is_new = False
        else:
            # opaque first-seen marker (processing-time ms — usable
            # without a watermark; callers compare, not interpret)
            first_batch, n = state.getCurrentProcessingTimeMs(), 0
            is_new = True
        n += rows
        state.update((first_batch, n))
        yield pd.DataFrame(
            {
                "k": [key[0]],
                "first_seen_batch": [first_batch],
                "n_occurrences": [n],
                "is_new": [is_new],
            }
        )

    return keys.groupBy(key_col).applyInPandasWithState(
        fn,
        SEEN_KEYS_OUTPUT,
        SEEN_KEYS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )
