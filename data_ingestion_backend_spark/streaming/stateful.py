"""Custom stateful streaming operators via applyInPandasWithState.

For stateful logic Spark's built-ins can't express (native windows cover
tumbling/sliding/session; dropDuplicates covers dedup), Structured
Streaming exposes arbitrary per-key state through Arrow-batched pandas
functions.  The operator here maintains **cumulative per-user statistics
across micro-batches** — the streaming analogue of the reference's
forever-running job progress counters (`job_processed_rows`), generalized
to any running aggregate a pipeline wants to serve continuously.

State design for scale: one tiny tuple per key, updated incrementally —
state size is O(active users), independent of event volume; a timeout
(event-time based in production) can expire idle keys to bound it.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_value double"
)
STATE_SCHEMA = "n bigint, total double, mx double"


def _update_user_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one user into the running state."""
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Cumulative per-user stats, updated every micro-batch.

    Emits one row per user per batch with the lifetime-to-date aggregate —
    state carries across batches (and restarts, via the checkpoint).
    """
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
