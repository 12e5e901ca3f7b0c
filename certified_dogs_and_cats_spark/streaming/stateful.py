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


def stateful_topk(
    stream: DataFrame, key_col: str, value_col: str, k: int = 3
) -> DataFrame:
    """Per-key running top-k values maintained across micro-batches, on
    the Spark-4 ``transformWithStateInPandas`` API (the successor to
    ``applyInPandasWithState``): state lives in NAMED TYPED variables on a
    ``StatefulProcessorHandle`` (here one ValueState holding the current
    top-k list) instead of a single untyped tuple, and the same processor
    shape extends to ListState/MapState, per-variable TTL, timers, and
    initial state without re-plumbing the operator.

    Emits one row per key per micro-batch in which the key appears, with
    the top-k as of that batch (update semantics); the final emission per
    key equals the batch-world top-k.

    Scale contract: state is O(k) per key in the state store (RocksDB —
    this API REQUIRES the RocksDB state-store provider; set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...state.RocksDBStateStoreProvider``), one key-shuffle per
    micro-batch, Arrow-batched transfer either side of the fold.

    Dependency gate: the transformWithState protocol talks protobuf
    between the JVM and the Python driver worker, so the ``protobuf``
    package must be importable where Spark runs Python workers; without
    it the STREAM fails at initialization (the pytest covering this
    operator importorskips on it, same pattern as the Pillow-gated image
    codec).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = f"{key_col} long, topk array<double>"

    class TopK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._vals = handle.getValueState("vals", "vals array<double>")

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd  # executor-side import

            cur = list(self._vals.get()[0]) if self._vals.exists() else []
            for pdf in rows:
                cur.extend(float(x) for x in pdf[value_col].dropna())
            cur = sorted(cur, reverse=True)[:k]
            self._vals.update((cur,))
            yield pd.DataFrame({key_col: [key[0]], "topk": [cur]})

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=TopK(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
