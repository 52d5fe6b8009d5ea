"""Custom stateful streaming operators via applyInPandasWithState.

The reference's closest analog is the re-runnable batch dedup
(EntryBatchProcess skipping done records, tagging-etl.Rmd:116-130); on a
stream that becomes first-seen-wins dedup with explicit keyed state and a
timeout, which Spark's built-in dropDuplicates covers only with unbounded
state. The operator here keeps (per key) only first-seen ids with an
event-count, emitting new keys once."""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, first_event_id long, n_events long"
STATE_SCHEMA = "first_event_id long, n_events long"


def _dedup_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    # Timeout ticks (state.hasTimedOut with ProcessingTimeTimeout — the
    # production eviction mode the docstring below recommends) invoke this
    # with an EMPTY batch iterator: pd.concat([]) raises, so guard first
    # and evict the idle key's state instead (r04 review).
    batches = [b for b in pdfs if len(b)]
    if not batches:
        if state.hasTimedOut:
            state.remove()
        return iter(())
    rows = pd.concat(batches)
    n_new = len(rows)
    if state.exists:
        first_id, n = state.get
        state.update((int(first_id), int(n + n_new)))
        return iter(())  # known key: state updated, nothing emitted
    first_id = int(rows["event_id"].min())
    state.update((first_id, n_new))
    return iter([pd.DataFrame({"key": [key[0]], "first_event_id": [first_id], "n_events": [n_new]})])


def first_seen_dedup_stream(events: DataFrame, key_col: str = "event_type") -> DataFrame:
    """First-seen-wins keyed dedup over a stream: emits one row per NEW key
    (its first event id), while keyed state tracks the running count.
    ProcessingTimeTimeout would evict idle keys in production; NoTimeout
    keeps the test deterministic."""
    import pyspark.sql.functions as F

    keyed = events.select(F.col(key_col).cast("string").alias("key"), "event_id")
    return keyed.groupBy("key").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
