"""Custom keyed-state operator: per-key running count.

This is WordCount.Count's actual semantics (WordCount.java:74-100): an
unwindowed HashMap of cumulative counts, updated per input and emitted
as it grows — state that never expires. Built-in streaming aggregation
gives the same *final* state; this operator exists to cover the
arbitrary-keyed-state capability (flightMap-style upserts —
RollingFlightDist.java:154,216-218) via ``applyInPandasWithState``:
Arrow-batched, partitioned by key, state store local to each task.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [StructField("key", StringType()), StructField("cnt", LongType())]
)
STATE_SCHEMA = StructType([StructField("cnt", LongType())])


def _update_running_count(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    current = state.get[0] if state.exists else 0
    added = sum(len(p) for p in pdfs)
    total = current + added
    state.update((total,))
    yield pd.DataFrame({"key": [key[0]], "cnt": [total]})


def running_count(keyed: DataFrame, key_col: str) -> DataFrame:
    """Cumulative count per key, emitted once per micro-batch.

    ``keyed`` must be a streaming DataFrame; emissions are per-batch
    (the documented per-tuple → per-trigger semantic mapping,
    SURVEY.md §4.3.1), so the cumulative count is monotone per key and
    the final value per key equals the batch groupBy count.
    """
    renamed = keyed.select(F.col(key_col).alias("key"))
    return renamed.groupBy("key").applyInPandasWithState(
        _update_running_count,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
