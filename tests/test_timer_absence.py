"""Timer-fired absence confirmation (round 10, VERDICT r9 ask #1).

Siddhi fires ``A -> not B for t`` from its scheduler (the engine inside the
reference's ``io.siddhi:siddhi-core`` dependency; the shim at
core/src/main/java/.../AbstractSiddhiOperator.java feeds it events but the
timer is the engine's own) — a key whose stream goes silent still confirms
its pending absences. Before round 10 this engine only confirmed on the
key's (or bucket's) next data visit; the CQL pattern operator now runs under
``EventTimeTimeout`` with the timer armed at the earliest pending absence
deadline, so the WATERMARK (advanced by other keys' traffic) is the clock.
"""

import os
import shutil
import tempfile

import pytest

from .test_patterns_r8 import ABSENCE_CQL, _batch_collect
from .test_property_patterns_r7 import _run_streaming

# key 1 arms at ts=1000 (deadline 4500) then goes SILENT; key 2's traffic
# drives the watermark (delay 10s) far past the deadline. No key-1 row ever
# arrives after the arm — only the event-time timer can confirm.
QUIET_ROWS = [
    (0, "x", 1_000, 1),     # key 1 arms; no key-1 row ever again
    (1, "z", 2_000, 2),
    (2, "z", 30_000, 2),    # after this batch wm = 20s > deadline 4.5s
    (3, "z", 31_000, 2),
    (4, "z", 60_000, 2),
    (5, "z", 61_000, 2),
]
QUIET_BATCHES = [QUIET_ROWS[:2], QUIET_ROWS[2:4], QUIET_ROWS[4:]]


@pytest.mark.parametrize("kwargs", [{}, {"pattern_key_buckets": 4}],
                         ids=["per_key", "bucketed"])
def test_quiescent_key_absence_confirms(spark, kwargs):
    root = tempfile.mkdtemp(prefix="timerabs_")
    try:
        got = sorted(
            (int(r.u), r.a_id)
            for r in _run_streaming(spark, QUIET_BATCHES, ABSENCE_CQL, root,
                                    **kwargs)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    assert got == [(1, 0)]


def test_quiescent_confirm_exactly_once(spark):
    """The timer confirmation must not re-emit when later traffic on the
    same key triggers the full-rerun path (content-hash dedup) — key 1 gets
    a very late row AFTER the timer already confirmed."""
    rows = [
        (0, "x", 1_000, 1),
        (1, "z", 2_000, 2),
        (2, "z", 30_000, 2),   # wm -> 20s: timer confirms key 1
        (3, "z", 31_000, 2),
        (4, "z", 40_000, 1),   # key 1 revisited after the timer confirm
        (5, "z", 60_000, 2),
    ]
    batches = [rows[:2], rows[2:4], rows[4:]]
    root = tempfile.mkdtemp(prefix="timerabs1x_")
    try:
        got = sorted(
            (int(r.u), r.a_id)
            for r in _run_streaming(spark, batches, ABSENCE_CQL, root)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    assert got == [(1, 0)]


@pytest.mark.slow
def test_quiescent_absence_parity_fuzz(spark):
    """12 randomized 2-key feeds with NO per-key tail sentinels — every
    pending absence must resolve from the TIMER (the pre-round-10 engine
    emitted nothing for these keys). A single far-future sentinel on a
    third key in the last batch pushes the final watermark past every
    deadline, and Spark's final no-data batch fires the due timers, so
    streaming == batch (whose at_close confirms the same partials)
    row-for-row."""
    import random

    rng = random.Random(104)
    for trial in range(12):
        n = rng.randint(8, 16)
        rows, ts = [], 0
        for i in range(n):
            ts += rng.randint(2, 6) * 1000
            rows.append((i, rng.choice("xyzz"), ts, rng.randint(1, 2)))
        gmax = rows[-1][2]
        # one sentinel on key 3 only: wm_final = gmax + 30s - 10s delay
        # > every deadline (a.ts + 3.5s); keys 1/2 stay QUIESCENT
        sentinel = [(900, "z", gmax + 30_000, 3)]
        batches = [
            rows[: n // 2],
            rows[n // 2: 3 * n // 4],
            rows[3 * n // 4:] + sentinel,
        ]
        all_rows = rows + sentinel
        root = tempfile.mkdtemp(prefix="quietfuzz_")
        try:
            got = sorted(
                (int(r.u), r.a_id)
                for r in _run_streaming(spark, batches, ABSENCE_CQL, root)
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
        want = sorted(
            (int(r.u), r.a_id)
            for r in _batch_collect(spark, all_rows, ABSENCE_CQL)
        )
        assert got == want, (trial, all_rows)


def _state_rows(progress):
    rows = []
    for p in progress:
        ops = p.get("stateOperators") or []
        if isinstance(p, dict):
            rows.append(sum(o.get("numRowsTotal", 0) for o in ops))
    return rows


@pytest.mark.parametrize(
    "kwargs",
    [{"pattern_state_purge": True},
     {"pattern_state_purge": True, "pattern_key_buckets": 4},
     {}],
    ids=["per_key", "bucketed", "default_off"],
)
def test_evictable_pattern_state_gc(spark, kwargs):
    """Round-10 OPT-IN state GC (`pattern_state_purge=True` — Siddhi's
    partition state likewise lives forever unless @purge enables purging):
    an `every A -> B within t` key whose buffer and partials drain past
    the eviction horizon is REMOVED from the state store (state rows track
    ACTIVE keys, not lifetime keys — the session-id churn bound at scale).
    Key 1 speaks only in batch 1; key 2's later traffic advances the
    watermark past key 1's horizon; with purge the total state row count
    must DROP after the GC timer fires; with the default (off) it must
    NOT. Output parity is pinned by the unchanged fuzz suites; this test
    pins the state-size contract."""
    import json as _json
    import uuid

    from flink_siddhi_spark import SiddhiCEP

    from .test_property_patterns_r7 import SCHEMA

    rows_b1 = [(0, "x", 1.0, 1_000), (1, "y", 1.0, 1_500)]  # key 1: match
    rows_b2 = [(2, "z", 2.0, 40_000)]
    rows_b3 = [(3, "z", 2.0, 80_000), (4, "z", 2.0, 81_000)]
    cql = (
        "partition with (price of s) begin "
        "from every a = s[name == 'x'] -> b = s[name == 'y'] "
        "within 2000 milliseconds "
        "select a.id as a_id, b.id as b_id insert into Out; end"
    )
    root = tempfile.mkdtemp(prefix="gc_")
    try:
        d = os.path.join(root, "in")
        for b in (rows_b1, rows_b2, rows_b3):
            spark.createDataFrame(b, SCHEMA).coalesce(1) \
                .write.mode("append").parquet(d)
        stream = (
            spark.readStream.format("parquet").schema(
                spark.read.parquet(d).schema
            ).option("maxFilesPerTrigger", 1).load(d)
        )
        cep = SiddhiCEP(spark, **kwargs)
        cep.register_stream(
            "s", stream, "id", "name", "price", "timestamp",
            ts_field="timestamp",
        )
        name = f"m_gc_{uuid.uuid4().hex[:8]}"
        q = (
            cep.from_("s").cql(cql).returns("Out")
            .writeStream.format("memory").queryName(name)
            .option("checkpointLocation", os.path.join(root, "ck"))
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r.a_id, r.b_id)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )
        assert got == [(0, 1)]
        prog = [_json.loads(p.json) for p in q.recentProgress]
        counts = _state_rows(prog)
        if kwargs.get("pattern_state_purge"):
            # key 1's state existed after batch 1 and is GONE at the end:
            # the final row count must drop below the peak (key 2's own
            # live state may remain — strictly fewer rows than the peak)
            assert max(counts) >= 2 and counts[-1] < max(counts), counts
        else:
            # default: no purge timers — lifetime keys keep their row
            assert counts[-1] == max(counts) >= 2, counts
        spark.catalog.dropTempView(name)
    finally:
        shutil.rmtree(root, ignore_errors=True)
