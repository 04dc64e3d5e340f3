"""Window semantics (batch mode).

SiddhiQL windows (SURVEY.md §2.B "Windows"; reference exercises
``#window.length`` / ``#window.time`` in SiddhiCEPITCase.java:315-316,427-429)
re-expressed over DataFrames. Batch-mode semantics (the oracle-checked
contract; streaming adds watermarks on the same shapes):

- Batch ("tumbling") windows — ``timeBatch/lengthBatch/session/externalTimeBatch``
  -> one output row per (window bucket x group key): implemented as a derived
  bucket column + groupBy. Scales: bucket derivation is narrow, the aggregation
  is a single hash-shuffle with map-side partial aggregation.
- Sliding windows — ``length/time/externalTime`` + aggregation -> one output
  row per arriving event, aggregate over the trailing frame: implemented with
  window functions (ROWS/RANGE BETWEEN). Partitioned by the query's group-by
  keys; ordering is (event-time, declared fields) for a deterministic total
  order under timestamp ties.
- Windows with no aggregation in the query are pass-through in batch (every
  event enters and is selected on arrival), matching per-arrival emission.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec

from ..errors import SiddhiPlannerException, UnsupportedFeatureException
from ..siddhiql import ast as A

BATCH_WINDOWS = {"timebatch", "lengthbatch", "session", "externaltimebatch"}
SLIDING_WINDOWS = {"length", "time", "externaltime"}

BUCKET_COL = "__w"


def _arg_ms(spec: A.WindowSpec, i: int) -> int:
    a = spec.args[i]
    if isinstance(a, A.Literal) and a.kind in ("int", "long", "time"):
        return int(a.value)
    raise SiddhiPlannerException(f"#window.{spec.name}: arg {i} must be an int/time literal")


def _arg_field(spec: A.WindowSpec, i: int) -> str:
    a = spec.args[i]
    if isinstance(a, A.Ref):
        return a.name
    raise SiddhiPlannerException(f"#window.{spec.name}: arg {i} must be an attribute")


@dataclass
class BucketedWindow:
    df: DataFrame
    win_start: Column  # epoch-ms start of the bucket (windowStart())
    win_end: Column


def add_bucket(
    df: DataFrame,
    spec: A.WindowSpec,
    ts_col: str,
    group_cols: list[str],
    ord_cols: list[str],
) -> BucketedWindow:
    """Assign each row a window-bucket id column ``__w`` for batch windows."""
    name = spec.name.lower()
    if name in ("timebatch", "externaltimebatch"):
        if name == "externaltimebatch":
            ts = F.col(_arg_field(spec, 0)).cast("bigint")
            size = _arg_ms(spec, 1)
        else:
            ts = F.col(ts_col)
            size = _arg_ms(spec, 0)
        out = df.withColumn(BUCKET_COL, F.floor(ts / F.lit(size)))
        return BucketedWindow(
            out,
            (F.col(BUCKET_COL) * size).cast("bigint"),
            (F.col(BUCKET_COL) * size + size).cast("bigint"),
        )
    if name == "lengthbatch":
        n = _arg_ms(spec, 0)
        part = Window.partitionBy(*[F.col(c) for c in group_cols]) if group_cols else Window.partitionBy(F.lit(1))
        w = part.orderBy(*[F.col(c) for c in ord_cols])
        out = df.withColumn(BUCKET_COL, F.floor((F.row_number().over(w) - 1) / F.lit(n)))
        return BucketedWindow(out, F.lit(None).cast("bigint"), F.lit(None).cast("bigint"))
    if name == "session":
        gap = _arg_ms(spec, 0)
        part = Window.partitionBy(*[F.col(c) for c in group_cols]) if group_cols else Window.partitionBy(F.lit(1))
        w = part.orderBy(*[F.col(c) for c in ord_cols])
        prev_ts = F.lag(F.col(ts_col)).over(w)
        is_new = F.when(prev_ts.isNull() | ((F.col(ts_col) - prev_ts) > gap), 1).otherwise(0)
        out = df.withColumn("__new_sess", is_new).withColumn(
            BUCKET_COL, F.sum("__new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
        ).drop("__new_sess")
        return BucketedWindow(out, F.lit(None).cast("bigint"), F.lit(None).cast("bigint"))
    raise UnsupportedFeatureException(f"#window.{name} is not a batch window")


def sliding_frame(
    spec: A.WindowSpec,
    ts_col: str,
    group_cols: list[str],
    ord_cols: list[str],
) -> WindowSpec:
    """WindowSpec for the trailing frame of a sliding window."""
    name = spec.name.lower()
    part = Window.partitionBy(*[F.col(c) for c in group_cols]) if group_cols else Window.partitionBy(F.lit(1))
    if name == "length":
        n = _arg_ms(spec, 0)
        return part.orderBy(*[F.col(c) for c in ord_cols]).rowsBetween(-(n - 1), 0)
    if name == "time":
        t = _arg_ms(spec, 0)
        return part.orderBy(F.col(ts_col)).rangeBetween(-t, 0)
    if name == "externaltime":
        field = _arg_field(spec, 0)
        t = _arg_ms(spec, 1)
        return part.orderBy(F.col(field).cast("bigint")).rangeBetween(-t, 0)
    raise UnsupportedFeatureException(f"#window.{name} is not a sliding window")


def classify(spec: Optional[A.WindowSpec]) -> str:
    """'none' | 'batch' | 'sliding'."""
    if spec is None:
        return "none"
    n = spec.name.lower()
    if n in BATCH_WINDOWS:
        return "batch"
    if n in SLIDING_WINDOWS:
        return "sliding"
    raise UnsupportedFeatureException(f"window #window.{spec.name} not implemented")
