"""Generic bucketed-key adapter for per-key stateful procs (round 9).

The pattern/funnel/attribution/transitions operators got bespoke bucketed
modes (their per-key state formats are hot paths worth hand-packing); the
remaining per-key stateful operators — the CQL count/time window lowerings
— share one adapter instead: the UNCHANGED per-key ``proc`` runs against a
:class:`_KeyState` shim whose backing store is one pickled blob per member
key inside the bucket's real GroupState. One Arrow group + GroupState
visit then serves ~keys/N keys, amortizing the fixed ~280µs per-key-visit
machinery exactly as the bespoke modes do (SCALE.md §Round-9), at the
price of a generic pickle round-trip per VISITED key (untouched keys'
blobs pass through untouched).

The blob format was json through round 10's probes; the window/ring procs
store their rows as json STRINGS inside the state tuple, so the outer
json encode re-escaped every inner character (a full scan per visited key
per batch — at full key-density that scan ate the whole visit-amortization
win: 140.3k vs 134.2k ev/s at 10M, SCALE.md §Round-10). Pickle protocol 5
writes the inner strings length-prefixed with no escaping, and carries the
as-of join's bytes history natively (no base64 wrapper).

Semantics-invisible per PARITY.md deviation 18; the bucket count is
stored in the state and validated on load (a changed count re-routes keys
away from their state — fail loudly, never silently).
"""

from __future__ import annotations

import json as _json
import pickle as _pickle
from typing import Callable, Iterator

import pandas as pd
from pyspark.errors import PySparkRuntimeError
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..errors import UnsupportedFeatureException

# "no timer" sentinel in the fires array (NoTimeout ops, or a key whose
# proc kept state without arming a timer)
NO_FIRE = 1 << 62

_KEYABLE = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.StringType, T.BooleanType,
)

BUCKET_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("pks", T.ArrayType(T.StringType())),
        T.StructField("blobs", T.ArrayType(T.BinaryType())),
        T.StructField("fires", T.ArrayType(T.LongType())),
    ]
)


class _KeyState:
    """GroupState shim for ONE member key of a bucket.

    Mirrors the pyspark GroupState surface the per-key procs use:
    ``exists`` / ``get`` / ``update`` / ``remove`` / ``hasTimedOut`` /
    ``getCurrentWatermarkMs`` / ``setTimeoutTimestamp``. State rides as a
    pickled blob (the procs' state tuples are plain-data by construction —
    strings, string arrays, ints, bytes)."""

    __slots__ = ("exists", "blob", "fire", "dirty", "removed",
                 "_wm", "_timed_out")

    def __init__(self, blob, wm, timed_out):
        self.exists = blob is not None
        self.blob = blob
        self.fire = None
        self.dirty = False
        self.removed = False
        self._wm = wm
        self._timed_out = timed_out

    @property
    def get(self):
        return _pickle.loads(self.blob)

    @property
    def hasTimedOut(self):
        return self._timed_out

    def getCurrentWatermarkMs(self):
        return self._wm

    def update(self, t):
        self.blob = _pickle.dumps(tuple(t), protocol=5)
        self.exists = True
        self.dirty = True
        self.removed = False

    def remove(self):
        self.exists = False
        self.removed = True
        self.dirty = True

    def setTimeoutTimestamp(self, ms):
        self.fire = int(ms)


def bucketed_stateful(
    df: DataFrame,
    key_cols: list,
    n_buckets: int,
    proc: Callable,
    out_schema: T.StructType,
    timeout,
) -> DataFrame:
    """``groupBy(pmod(xxhash64(keys), N)).applyInPandasWithState`` running
    the unchanged per-key ``proc`` for every member key with new rows —
    plus, under EventTimeTimeout, stored keys whose own fire time passed
    the watermark (``hasTimedOut=True``, empty pdfs), mirroring the
    per-key visit discipline exactly."""
    for k in key_cols:
        t = df.schema[k].dataType
        if not isinstance(t, _KEYABLE):
            raise UnsupportedFeatureException(
                f"key_buckets: key column '{k}' of type {t.simpleString()} "
                "— bucketed keys must be numeric/string/boolean"
            )
    event_time = timeout == GroupStateTimeout.EventTimeTimeout
    out_names = [f.name for f in out_schema.fields]

    def proc_bucket(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            stored_n, pks, blobs, fires = state.get
            if stored_n != n_buckets:
                raise RuntimeError(
                    f"key_buckets changed across restart (checkpoint has "
                    f"{stored_n}, query asks {n_buckets}); bucket count is "
                    "fixed at the checkpoint's creation — use a new "
                    "checkpoint"
                )
            st = {k_: [b, f] for k_, b, f in zip(pks, blobs, fires)}
        else:
            st = {}
        # demultiplex arriving rows by their true key (pandas groupby
        # preserves intra-group arrival order; the procs re-sort anyway)
        per_key: dict = {}
        gb = key_cols if len(key_cols) > 1 else key_cols[0]
        for pdf in pdfs:
            if not len(pdf):
                continue
            for kv, sub in pdf.groupby(gb, sort=False, dropna=False):
                kt = kv if isinstance(kv, tuple) else (kv,)
                kt = tuple(
                    v.item() if hasattr(v, "item") else v for v in kt
                )
                kenc = _json.dumps(list(kt))
                prev = per_key.get(kenc)
                if prev is None:
                    per_key[kenc] = (kt, [sub])
                else:
                    prev[1].append(sub)
        try:
            wm = state.getCurrentWatermarkMs()
        except PySparkRuntimeError:
            # stream has no watermark (NoTimeout procs that never read the
            # clock, e.g. the as-of join) — expose 0 like Spark does pre-wm
            wm = 0
        due = (
            [k_ for k_, v in st.items()
             if v[1] <= wm and k_ not in per_key]
            if event_time else []
        )
        outs = []
        for kenc in [*per_key, *due]:
            prev = st.get(kenc)
            timed_out = kenc not in per_key
            kt, subs = per_key.get(
                kenc, (tuple(_json.loads(kenc)), [])
            )
            shim = _KeyState(prev[0] if prev else None, wm, timed_out)
            gen = proc(kt, iter(subs), shim)
            if gen is not None:
                for opdf in gen:
                    if opdf is not None and len(opdf):
                        outs.append(opdf)
            if shim.removed or (shim.dirty and not shim.exists):
                st.pop(kenc, None)
            elif shim.dirty:
                st[kenc] = [
                    shim.blob,
                    NO_FIRE if shim.fire is None else shim.fire,
                ]
            elif prev is not None and shim.fire is not None:
                st[kenc][1] = shim.fire
        if st:
            ks = list(st)
            state.update((
                n_buckets,
                ks,
                [st[k_][0] for k_ in ks],
                [st[k_][1] for k_ in ks],
            ))
            if event_time:
                real = [st[k_][1] for k_ in ks if st[k_][1] != NO_FIRE]
                if real:
                    state.setTimeoutTimestamp(max(min(real), wm + 1))
        elif state.exists:
            state.remove()
        if outs:
            yield pd.concat(outs, ignore_index=True)[out_names]

    bucket_col = F.pmod(
        F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(n_buckets)
    )
    return (
        df.withColumn("__bucket", bucket_col)
        .groupBy("__bucket")
        .applyInPandasWithState(
            proc_bucket, out_schema, BUCKET_STATE_SCHEMA, "append", timeout
        )
    )
