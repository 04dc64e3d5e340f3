"""As-of join: for each left row, the single most recent right row at or
before the left row's timestamp, per key.

Spark has no ASOF JOIN primitive (DuckDB/Pandas do); the naive lowerings —
a per-row correlated subquery, or an inequality range join — are O(n*m) per
key or devolve to BroadcastNestedLoop. The scale shape used here is the
union + ordered carry-forward:

1. tag both sides and union them by name (right rows carry their payload
   as ONE non-null struct, left rows carry a null struct — a single struct,
   not per-column carries, so the carried payload always comes from one
   right row even when payload columns contain nulls),
2. ONE hash shuffle on the join key, per-key sort by (ts, side, payload)
   with right sorting before left at equal timestamps (so a right row AT
   the left ts is visible to it — 'backward' as-of semantics; equal-ts
   right rows resolve to the struct-max, a deterministic total-order pick),
3. ``last(struct, ignorenulls=True)`` over the unbounded-preceding frame
   carries the latest right payload forward onto every left row,
4. keep only left rows and unpack the struct.

Cost: one shuffle + one per-key sort over |L| + |R| rows — the same shape
as any keyed window aggregation, independent of time-gap density (a range
join's candidate count grows with gap width; this does not).

Not part of the reference surface (SiddhiQL has no as-of join); included as
a first-class training-data/analytics operator (feature backfill,
point-in-time correctness for label joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SIDE = "__asof_side"  # 0 = right (sorts first at equal ts), 1 = left
_PAY = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the payload of the latest
    ``right`` row with ``right_ts <= left_ts`` for the same ``on`` key
    (null payload columns when no such row exists).

    ``payload``: right columns to carry (default: all except key + ts).
    Ties among right rows sharing (key, ts) resolve to the struct-wise
    maximum payload — deterministic regardless of partitioning."""
    keys = [on] if isinstance(on, str) else list(on)
    if payload is None:
        payload = [c for c in right.columns if c not in keys + [right_ts]]

    pay_struct = F.struct(*[F.col(c) for c in payload])
    pay_type = right.select(pay_struct.alias(_PAY)).schema[_PAY].dataType

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(pay_type).alias(_PAY),
    )
    r_tagged = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in keys
        ],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_SIDE),
        pay_struct.alias(_PAY),
    ).select(*l_tagged.columns)  # align column order for the union

    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(
            F.col("__asof_ts").asc(),
            F.col(_SIDE).asc(),
            F.col(_PAY).asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("__c", F.last(F.col(_PAY), ignorenulls=True).over(w))
    return carried.filter(F.col(_SIDE) == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__c.{c}").alias(c) for c in payload],
    )
