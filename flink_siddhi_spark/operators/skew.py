"""Skew-salted equi-join: the manual escape hatch for hot join keys.

AQE's skew-join split handles most skew at runtime (enabled repo-wide),
but it cannot help when (a) the downstream stage needs the exact output
partitioning AQE would re-split, or (b) the skewed side feeds a stateful
operator keyed on the join key. Salting fixes the layout at plan time:
the big side gets a deterministic salt in [0, salt); the other side is
replicated `salt` times; the join key becomes (key, salt) so one monster
partition becomes `salt` even ones. Cost: the replicated side is scanned
`salt` times heavier — use when it is small-ish but above the broadcast
threshold (broadcast beats salting below it).
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` (skewed, big) with ``right`` (replicated) on
    ``on``, spreading each hot key over ``salt`` partitions. Semantics are
    identical to ``left.join(right, on, how)`` for ``inner`` and ``left``
    joins; right/full outer are rejected (an unmatched right row would be
    emitted once per salt replica)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join: how={how!r} not supported — replicating the right "
            "side duplicates unmatched right rows under right/full outer"
        )
    if salt <= 0:
        raise ValueError(f"salted_join: salt ({salt}) must be > 0")
    keys = [on] if isinstance(on, str) else list(on)
    # deterministic per-row spread: hash of the whole left row, NOT the join
    # key (hashing the key would put every copy of the hot key in ONE salt
    # bucket, defeating the point)
    l = left.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    r = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, keys + [SALT_COL], how)
    return out.drop(SALT_COL)
