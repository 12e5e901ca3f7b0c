"""Custom stateful streaming operators via ``applyInPandasWithState``.

For stateful logic beyond what ``dropDuplicates`` / windowed aggregation
express, Structured Streaming exposes arbitrary per-key state with Arrow-
batched pandas UDFs. The operator here — running per-key totals that
survive across micro-batches — is the canonical shape: read state, fold
the batch, write state, emit. Swap the fold for TTL dedup, session
assembly, or model-feature accumulation without changing the topology.

Scale contract: state is per-key and O(1) per key (two numbers), stored in
the state store (RocksDB on a real cluster); each micro-batch shuffles on
the key once. Pair with a timeout (``GroupStateTimeout``) when the key
space is unbounded so idle state is reclaimed.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def running_totals(
    stream: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Per-key running (count, sum) maintained across micro-batches.

    Emits one row per key per micro-batch in which the key appears, with
    the totals as of that batch (update semantics); the final emission per
    key equals the batch-world aggregate.
    """
    out_schema = f"{key_col} long, n long, total double"
    state_schema = "n long, total double"

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd  # executor-side import

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
