"""Distributed global prefix sums / row numbers.

A global ``Window.orderBy`` (no partitionBy) funnels the entire dataset
through ONE task — the classic single-partition Exchange that stops scaling
long before 100 TB. These helpers compute the same totals distributively:

1. range-repartition on the order keys (ordered partitions: every row in
   partition i sorts before every row in partition i+1),
2. per-partition running value (a keyed window over ``spark_partition_id``),
3. per-partition totals -> exclusive cumulative offsets (an aggregate over
   *n_partitions* rows, broadcast back onto the data).

The only globally-ordered step runs over n_partitions rows, not n rows.
Used by count-window joins (operators/joins.py) and ``output first|last
every N events`` (plans/planner.py) — the reference's equivalents are
single-feed by construction (AbstractSiddhiOperator.java:237-247), so this
is strictly more scalable than semantic parity requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "__pfx_pid"
_VAL = "__pfx_val"
_LOC = "__pfx_loc"
_OFF = "__pfx_off"
_TOT = "__pfx_tot"


def running_sum(df: DataFrame, ord_cols: list, value: Column, out: str) -> DataFrame:
    """Inclusive running sum of ``value`` in the total order given by
    ``ord_cols`` (column names or Column sort expressions), distributed."""
    cols = [F.col(c) if isinstance(c, str) else c for c in ord_cols]
    part = (
        df.repartitionByRange(*cols)
        .withColumn(_PID, F.spark_partition_id())
        .withColumn(_VAL, value)
    )
    w = (
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    part = part.withColumn(_LOC, F.sum(_VAL).over(w))
    totals = part.groupBy(_PID).agg(F.sum(_VAL).alias(_TOT))
    # exclusive cumsum over n_partitions rows — single-task but tiny
    woff = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        _OFF, F.coalesce(F.sum(_TOT).over(woff), F.lit(0))
    ).select(_PID, _OFF)
    res = part.join(F.broadcast(offsets), _PID)
    return res.withColumn(out, F.col(_LOC) + F.col(_OFF)).drop(_PID, _VAL, _LOC, _OFF)


def global_row_number(df: DataFrame, ord_cols: list, out: str) -> DataFrame:
    """1-based global row number in the total order of ``ord_cols`` (which
    must be a deterministic total order for stable results), distributed."""
    return running_sum(df, ord_cols, F.lit(1), out)
