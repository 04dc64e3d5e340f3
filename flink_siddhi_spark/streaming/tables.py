"""Streaming event tables: apply table DML continuously from a stream.

The batch layer (operators/tables.py) defines the per-statement semantics;
here each micro-batch is one replay unit applied in arrival order via
``foreachBatch`` — exactly the contract documented in operators/tables.py
("each statement applies its whole input ... before the next sees it"),
with micro-batches as the statement boundaries. Reference behavior: Siddhi
event tables mutate per event inside the embedded runtime
(README.md:26 "Event Tables"); micro-batched keyed replay converges to the
same state for the distributable set shapes (last-writer / additive fold).

State handling: the table lives as a DataFrame; ``localCheckpoint`` after
every batch truncates lineage so the plan doesn't grow unboundedly. For a
durable, cluster-grade table swap the in-memory state for a Delta/iceberg
MERGE in the same ``foreachBatch`` hook — the DML -> MERGE mapping is 1:1.
"""

from __future__ import annotations

import threading
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.tables import ORD_COL, apply_dml
from ..siddhiql import ast as A
from ..siddhiql.parser import parse_query


class StreamingTable:
    """Mutable table state fed by streaming DML statements."""

    def __init__(self, initial: DataFrame):
        if initial.isStreaming:
            raise ValueError("initial table state must be a batch DataFrame")
        self._state = initial
        self._lock = threading.Lock()
        self._queries = []

    @property
    def state(self) -> DataFrame:
        """Current table contents (batch DataFrame, safe to join/collect)."""
        with self._lock:
            return self._state

    def attach(
        self,
        stream_df: DataFrame,
        dml: A.TableDML | str,
        ts_col: Optional[str] = None,
        extensions: Optional[dict] = None,
        checkpoint: Optional[str] = None,
        trigger_available_now: bool = False,
    ):
        """Start a StreamingQuery applying ``dml`` (an AST node or a full
        `from ... update/delete/upsert ...` statement's DML clause) for every
        micro-batch of ``stream_df``. ``ts_col`` names the event-time column
        used for in-batch last-writer ordering."""
        if isinstance(dml, str):
            q = parse_query(dml)
            if q.dml is None:
                raise ValueError("statement has no table DML clause")
            dml = q.dml

        def process(batch_df: DataFrame, batch_id: int) -> None:
            b = batch_df
            if ts_col is not None and ts_col in b.columns:
                b = b.withColumn(ORD_COL, F.col(ts_col).cast("bigint"))
            with self._lock:
                new_state = apply_dml(self._state, b, dml, extensions)
                # localCheckpoint: truncate lineage so state doesn't re-derive
                # the whole history every batch
                self._state = new_state.localCheckpoint(eager=True)

        w = stream_df.writeStream.foreachBatch(process).outputMode("update")
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        if trigger_available_now:
            w = w.trigger(availableNow=True)
        sq = w.start()
        self._queries.append(sq)
        return sq

    def stop(self) -> None:
        import logging

        for q in self._queries:
            try:
                q.stop()
            except Exception:  # best-effort teardown; surface, don't swallow
                logging.getLogger(__name__).warning(
                    "stopping continuous table query %s failed", q.id, exc_info=True
                )
        self._queries.clear()
