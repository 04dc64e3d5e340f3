"""Pure-python equivalence pin: ``run_kernel2`` (the vectorized streaming
kernel for ``every A (->|,) B [within t]``) must produce EXACTLY the same
matches and the same serialized partial state as the general ``_run_nfa``
row loop — including across simulated micro-batch continuations, where one
engine's saved state seeds the other. No SparkSession: this is the fast
diagnosis layer under the end-to-end streaming parity fuzz."""

import random

import numpy as np
import pandas as pd

from flink_siddhi_spark.operators.pattern import (
    TS_COL,
    _run_nfa,
    kernel2_applicable,
    kernel2_shape,
    run_kernel2,
    run_kernel2_absence,
    run_kernel2_nonevery,
    run_kernel2_quant,
    run_kernel3,
)
from flink_siddhi_spark.siddhiql import ast as A


def _elems():
    return [
        A.PatternElem(stream="s", alias="a"),
        A.PatternElem(stream="s", alias="b"),
    ]


def _abs_elems(for_ms):
    return [
        A.PatternElem(stream="s", alias="a"),
        A.PatternElem(stream="s", alias="b", negated=True, for_ms=for_ms),
    ]


def _state_key(st):
    # canonical form for comparing NFA state dicts
    return (
        sorted(
            (d["pos"], tuple(map(tuple, d["captured"])), d["first_ts"])
            for d in st["partials"]
        ),
        st["done"],
    )


def _state_key_full(st):
    # strict form: every serialized field, incl. pos/neg_deadline/started
    return (
        sorted(
            (
                d["pos"], tuple(map(tuple, d["captured"])),
                d["first_ts"], d["last_ts"], d["neg_deadline"],
            )
            for d in st["partials"]
        ),
        st["started"],
        st["done"],
    )


def _run_general(ts, ma, mb, start, init, within, strict):
    rows = pd.DataFrame({TS_COL: ts})
    return _run_nfa(
        rows, [ma, mb], _elems(), [strict], True, within,
        at_close=False, start_idx=start, init=init, return_state=True,
    )


def test_kernel2_matches_general_nfa_randomized():
    rng = random.Random(7)
    elems = _elems()
    assert kernel2_applicable(elems, True, None, [False])
    assert kernel2_applicable(elems, True, None, [True])
    for trial in range(300):
        n = rng.randint(0, 30)
        ts = np.sort(
            np.array([rng.randint(0, 40) * 100 for _ in range(n)], np.int64)
        )
        ma = np.array([rng.random() < 0.3 for _ in range(n)], bool)
        mb = np.array([rng.random() < 0.3 for _ in range(n)], bool)
        within = rng.choice([None, 550, 1250])
        strict = rng.random() < 0.4
        got_m, got_st = run_kernel2(ts, ma, mb, 0, None, within, strict)
        want_m, want_st = _run_general(ts, ma, mb, 0, None, within, strict)
        assert sorted(map(tuple, (map(tuple, m) for m in got_m))) == sorted(
            map(tuple, (map(tuple, m) for m in want_m))
        ), (trial, ts.tolist(), ma.tolist(), mb.tolist(), within, strict)
        assert _state_key(got_st) == _state_key(want_st), (trial, within, strict)


def test_kernel2_state_interops_with_general_nfa():
    """Batch 1 through one engine, batch 2 through the OTHER — the shared
    partial format must continue identically (this is what lets the
    streaming path fall back to the general loop on out-of-order input)."""
    rng = random.Random(21)
    for trial in range(150):
        n1, n2 = rng.randint(1, 15), rng.randint(1, 15)
        t1 = np.sort(np.array([rng.randint(0, 20) * 100 for _ in range(n1)], np.int64))
        t2 = np.sort(np.array(
            [int(t1[-1]) + 100 + rng.randint(0, 20) * 100 for _ in range(n2)],
            np.int64,
        ))
        ts = np.concatenate([t1, t2])
        ma = np.array([rng.random() < 0.35 for _ in range(n1 + n2)], bool)
        mb = np.array([rng.random() < 0.35 for _ in range(n1 + n2)], bool)
        within = rng.choice([None, 750])
        strict = rng.random() < 0.4
        # batch 1 on each engine
        k1, k_st = run_kernel2(ts[:n1], ma[:n1], mb[:n1], 0, None, within, strict)
        g1, g_st = _run_general(ts[:n1], ma[:n1], mb[:n1], 0, None, within, strict)
        assert _state_key(k_st) == _state_key(g_st)
        # batch 2: kernel continues the GENERAL engine's state and vice versa
        k2, _ = run_kernel2(ts, ma, mb, n1, g_st, within, strict)
        g2, _ = _run_general(ts, ma, mb, n1, k_st, within, strict)
        norm = lambda ms: sorted(map(tuple, (map(tuple, m) for m in ms)))
        assert norm(k1) == norm(g1) and norm(k2) == norm(g2), (
            trial, ts.tolist(), ma.tolist(), mb.tolist(), within, strict,
        )


# ------------------------------------------------- round-8 kernel shapes
def test_kernel2_shape_classifier():
    e2 = _elems()
    assert kernel2_shape(e2, True, None, [False]) == "every2"
    assert kernel2_shape(e2, True, None, [True]) == "every2"
    assert kernel2_shape(e2, False, None, [False]) == "plain2"
    assert kernel2_shape(e2, False, None, [True]) == "plain2"
    ab = _abs_elems(500)
    assert kernel2_shape(ab, True, None, [False]) == "absence2"
    # not kernelizable: strict absence, no for_ms, non-every absence,
    # mid-every, quantifiers
    assert kernel2_shape(ab, True, None, [True]) is None
    assert kernel2_shape(_abs_elems(None), True, None, [False]) is None
    assert kernel2_shape(ab, False, None, [False]) is None
    assert kernel2_shape(e2, True, 1, [False]) is None
    # quantified first element = quant2 (round 10): every + relaxed only,
    # min_count >= 1; strict / non-every / a* / a? keep the general NFA
    q = [A.PatternElem(stream="s", alias="a", min_count=1, max_count=2),
         A.PatternElem(stream="s", alias="b")]
    assert kernel2_shape(q, True, None, [False]) == "quant2"
    qp = [A.PatternElem(stream="s", alias="a", min_count=2, max_count=None),
          A.PatternElem(stream="s", alias="b")]
    assert kernel2_shape(qp, True, None, [False]) == "quant2"
    assert kernel2_shape(q, True, None, [True]) is None
    assert kernel2_shape(q, False, None, [False]) is None
    q0 = [A.PatternElem(stream="s", alias="a", min_count=0, max_count=2),
          A.PatternElem(stream="s", alias="b")]
    assert kernel2_shape(q0, True, None, [False]) is None
    qopt = [A.PatternElem(stream="s", alias="a", min_count=0, max_count=1),
            A.PatternElem(stream="s", alias="b")]
    assert kernel2_shape(qopt, True, None, [False]) is None
    # quantified a with a QUANTIFIED or negated b stays on the NFA
    qq = [A.PatternElem(stream="s", alias="a", min_count=1, max_count=2),
          A.PatternElem(stream="s", alias="b", min_count=1, max_count=2)]
    assert kernel2_shape(qq, True, None, [False]) is None
    qn = [A.PatternElem(stream="s", alias="a", min_count=1, max_count=2),
          A.PatternElem(stream="s", alias="b", negated=True, for_ms=500)]
    assert kernel2_shape(qn, True, None, [False]) is None
    # k-step relaxed every = chain (late round 8); strict / non-every /
    # negated / quantified chains still fall to the general NFA
    e3 = e2 + [A.PatternElem(stream="s", alias="c")]
    assert kernel2_shape(e3, True, None, [False, False]) == "chain"
    e4 = e3 + [A.PatternElem(stream="s", alias="d")]
    assert kernel2_shape(e4, True, None, [False] * 3) == "chain"
    assert kernel2_shape(e3, True, None, [True, False]) is None
    assert kernel2_shape(e3, True, None, [False, True]) is None
    # arm-once relaxed chain = plain_chain (late round 8)
    assert kernel2_shape(e3, False, None, [False, False]) == "plain_chain"
    assert kernel2_shape(e4, False, None, [False] * 3) == "plain_chain"
    assert kernel2_shape(e3, False, None, [True, False]) is None
    assert kernel2_shape(e3, True, 1, [False, False]) is None
    # chain ending in `not X for t` = chain_absence (funnel abandonment);
    # without for_ms, or quantified, still the general NFA
    n3 = e2 + [A.PatternElem(stream="s", alias="c", negated=True, for_ms=500)]
    assert kernel2_shape(n3, True, None, [False, False]) == "chain_absence"
    n3b = e2 + [A.PatternElem(stream="s", alias="c", negated=True)]
    assert kernel2_shape(n3b, True, None, [False, False]) is None
    assert kernel2_shape(n3, False, None, [False, False]) is None
    # a TRAILING quantifier still falls to the general NFA (its completion
    # waits on stream close), but one quantified INTERIOR element in a
    # k>=3 relaxed every-chain = chain_quant (late round 10)
    q3 = e2 + [A.PatternElem(stream="s", alias="c", min_count=1, max_count=2)]
    assert kernel2_shape(q3, True, None, [False, False]) is None
    cq_mid = [
        A.PatternElem(stream="s", alias="a"),
        A.PatternElem(stream="s", alias="b", min_count=1, max_count=2),
        A.PatternElem(stream="s", alias="c"),
    ]
    assert kernel2_shape(cq_mid, True, None, [False, False]) == "chain_quant"
    cq_first = [
        A.PatternElem(stream="s", alias="a", min_count=2, max_count=None),
        A.PatternElem(stream="s", alias="b"),
        A.PatternElem(stream="s", alias="c"),
    ]
    assert kernel2_shape(cq_first, True, None, [False, False]) == "chain_quant"
    cq4 = [
        A.PatternElem(stream="s", alias="a"),
        A.PatternElem(stream="s", alias="b"),
        A.PatternElem(stream="s", alias="q", min_count=1, max_count=3),
        A.PatternElem(stream="s", alias="d"),
    ]
    assert kernel2_shape(cq4, True, None, [False] * 3) == "chain_quant"
    # strict / non-every / min 0 / two quantified / mid-every keep the NFA
    assert kernel2_shape(cq_mid, True, None, [True, False]) is None
    assert kernel2_shape(cq_mid, False, None, [False, False]) is None
    cq_opt = [
        A.PatternElem(stream="s", alias="a"),
        A.PatternElem(stream="s", alias="b", min_count=0, max_count=2),
        A.PatternElem(stream="s", alias="c"),
    ]
    assert kernel2_shape(cq_opt, True, None, [False, False]) is None
    cq_two = [
        A.PatternElem(stream="s", alias="a", min_count=1, max_count=2),
        A.PatternElem(stream="s", alias="b", min_count=1, max_count=2),
        A.PatternElem(stream="s", alias="c"),
    ]
    assert kernel2_shape(cq_two, True, None, [False, False]) is None
    assert kernel2_shape(cq_mid, True, 1, [False, False]) is None
    # multiple NON-adjacent quants = chain_quant too (multi-quant kernel);
    # adjacency (cq_two above) keeps the NFA
    cq_multi = [
        A.PatternElem(stream="s", alias="a", min_count=1, max_count=2),
        A.PatternElem(stream="s", alias="b"),
        A.PatternElem(stream="s", alias="c", min_count=2, max_count=None),
        A.PatternElem(stream="s", alias="d"),
    ]
    assert kernel2_shape(cq_multi, True, None, [False] * 3) == "chain_quant"


def _run_general_ne(ts, ma, mb, start, init, within, strict):
    rows = pd.DataFrame({TS_COL: ts})
    return _run_nfa(
        rows, [ma, mb], _elems(), [strict], False, within,
        at_close=False, start_idx=start, init=init, return_state=True,
    )


def test_kernel2_nonevery_matches_general_nfa_randomized():
    """plain2: the arm-once first-attempt contract (the round-7 fuzz-found
    shape) — kernel vs general NFA on 450 randomized feeds, full state
    equality including started/done."""
    rng = random.Random(8)
    for trial in range(450):
        n = rng.randint(0, 30)
        ts = np.sort(
            np.array([rng.randint(0, 40) * 100 for _ in range(n)], np.int64)
        )
        ma = np.array([rng.random() < 0.3 for _ in range(n)], bool)
        mb = np.array([rng.random() < 0.3 for _ in range(n)], bool)
        within = rng.choice([None, 550, 1250])
        strict = rng.random() < 0.4
        got_m, got_st = run_kernel2_nonevery(ts, ma, mb, 0, None, within, strict)
        want_m, want_st = _run_general_ne(ts, ma, mb, 0, None, within, strict)
        assert got_m == want_m, (trial, ts.tolist(), ma.tolist(), mb.tolist(),
                                 within, strict)
        assert _state_key_full(got_st) == _state_key_full(want_st), (
            trial, ts.tolist(), ma.tolist(), mb.tolist(), within, strict,
        )


def test_kernel2_nonevery_state_interops_with_general_nfa():
    rng = random.Random(22)
    for trial in range(200):
        n1, n2 = rng.randint(1, 15), rng.randint(1, 15)
        t1 = np.sort(np.array([rng.randint(0, 20) * 100 for _ in range(n1)], np.int64))
        t2 = np.sort(np.array(
            [int(t1[-1]) + 100 + rng.randint(0, 20) * 100 for _ in range(n2)],
            np.int64,
        ))
        ts = np.concatenate([t1, t2])
        ma = np.array([rng.random() < 0.35 for _ in range(n1 + n2)], bool)
        mb = np.array([rng.random() < 0.35 for _ in range(n1 + n2)], bool)
        within = rng.choice([None, 750])
        strict = rng.random() < 0.4
        k1, k_st = run_kernel2_nonevery(ts[:n1], ma[:n1], mb[:n1], 0, None, within, strict)
        g1, g_st = _run_general_ne(ts[:n1], ma[:n1], mb[:n1], 0, None, within, strict)
        assert _state_key_full(k_st) == _state_key_full(g_st), (trial,)
        # batch 2: each engine continues the OTHER's state
        k2, k_st2 = run_kernel2_nonevery(ts, ma, mb, n1, g_st, within, strict)
        g2, g_st2 = _run_general_ne(ts, ma, mb, n1, k_st, within, strict)
        assert k1 == g1 and k2 == g2, (
            trial, ts.tolist(), ma.tolist(), mb.tolist(), within, strict,
        )
        assert _state_key_full(k_st2) == _state_key_full(g_st2), (trial,)


def _run_general_abs(ts, ma, mb, start, init, within, for_ms):
    rows = pd.DataFrame({TS_COL: ts})
    return _run_nfa(
        rows, [ma, mb], _abs_elems(for_ms), [False], True, within,
        at_close=False, start_idx=start, init=init, return_state=True,
    )


def test_kernel2_absence_matches_general_nfa_randomized():
    """absence2: ``every a=A -> not B for t [within w]`` — kernel vs general
    NFA on 450 randomized feeds, matches in emission order and full state
    equality (pos / neg_deadline / captured / first_ts)."""
    rng = random.Random(9)
    for trial in range(450):
        n = rng.randint(0, 30)
        ts = np.sort(
            np.array([rng.randint(0, 40) * 100 for _ in range(n)], np.int64)
        )
        ma = np.array([rng.random() < 0.3 for _ in range(n)], bool)
        mb = np.array([rng.random() < 0.3 for _ in range(n)], bool)
        within = rng.choice([None, 550, 1250, 2050])
        for_ms = rng.choice([0, 250, 750, 1500])
        got_m, got_st = run_kernel2_absence(ts, ma, mb, 0, None, within, for_ms)
        want_m, want_st = _run_general_abs(ts, ma, mb, 0, None, within, for_ms)
        assert got_m == want_m, (trial, ts.tolist(), ma.tolist(), mb.tolist(),
                                 within, for_ms)
        assert _state_key_full(got_st) == _state_key_full(want_st), (
            trial, ts.tolist(), ma.tolist(), mb.tolist(), within, for_ms,
        )


def test_kernel2_absence_state_interops_with_general_nfa():
    rng = random.Random(23)
    for trial in range(200):
        n1, n2 = rng.randint(1, 15), rng.randint(1, 15)
        t1 = np.sort(np.array([rng.randint(0, 20) * 100 for _ in range(n1)], np.int64))
        t2 = np.sort(np.array(
            [int(t1[-1]) + 100 + rng.randint(0, 20) * 100 for _ in range(n2)],
            np.int64,
        ))
        ts = np.concatenate([t1, t2])
        ma = np.array([rng.random() < 0.35 for _ in range(n1 + n2)], bool)
        mb = np.array([rng.random() < 0.25 for _ in range(n1 + n2)], bool)
        within = rng.choice([None, 950])
        for_ms = rng.choice([250, 750])
        k1, k_st = run_kernel2_absence(ts[:n1], ma[:n1], mb[:n1], 0, None, within, for_ms)
        g1, g_st = _run_general_abs(ts[:n1], ma[:n1], mb[:n1], 0, None, within, for_ms)
        assert _state_key_full(k_st) == _state_key_full(g_st), (trial,)
        k2, k_st2 = run_kernel2_absence(ts, ma, mb, n1, g_st, within, for_ms)
        g2, g_st2 = _run_general_abs(ts, ma, mb, n1, k_st, within, for_ms)
        assert k1 == g1 and k2 == g2, (
            trial, ts.tolist(), ma.tolist(), mb.tolist(), within, for_ms,
        )
        assert _state_key_full(k_st2) == _state_key_full(g_st2), (trial,)


def _elems3():
    return [
        A.PatternElem(stream="s", alias="a"),
        A.PatternElem(stream="s", alias="b"),
        A.PatternElem(stream="s", alias="c"),
    ]


def _run_general3(ts, ma, mb, mc, start, init, within):
    rows = pd.DataFrame({TS_COL: ts})
    return _run_nfa(
        rows, [ma, mb, mc], _elems3(), [False, False], True, within,
        at_close=False, start_idx=start, init=init, return_state=True,
    )


def test_kernel3_matches_general_nfa_randomized():
    """every3: ``every a=A -> b=B -> c=C [within t]`` (late round 8) —
    kernel vs general NFA on 450 randomized feeds, matches in exact
    emission order and full state equality (pos / captured / first_ts /
    last_ts / started)."""
    rng = random.Random(38)
    assert kernel2_shape(_elems3(), True, None, [False, False]) == "chain"
    for trial in range(450):
        n = rng.randint(0, 30)
        ts = np.sort(
            np.array([rng.randint(0, 40) * 100 for _ in range(n)], np.int64)
        )
        ma = np.array([rng.random() < 0.3 for _ in range(n)], bool)
        mb = np.array([rng.random() < 0.3 for _ in range(n)], bool)
        mc = np.array([rng.random() < 0.3 for _ in range(n)], bool)
        within = rng.choice([None, 550, 1250, 2050])
        got_m, got_st = run_kernel3(ts, ma, mb, mc, 0, None, within)
        want_m, want_st = _run_general3(ts, ma, mb, mc, 0, None, within)
        assert got_m == want_m, (trial, ts.tolist(), ma.tolist(), mb.tolist(),
                                 mc.tolist(), within)
        assert _state_key_full(got_st) == _state_key_full(want_st), (
            trial, ts.tolist(), ma.tolist(), mb.tolist(), mc.tolist(), within,
        )


def test_kernel3_state_interops_with_general_nfa():
    """Batch 1 through one engine, batch 2 through the OTHER — stage-1 AND
    stage-2 partials must resume identically across the engine boundary
    (the streaming out-of-order fallback relies on this)."""
    rng = random.Random(39)
    for trial in range(250):
        n1, n2 = rng.randint(1, 15), rng.randint(1, 15)
        t1 = np.sort(np.array([rng.randint(0, 20) * 100 for _ in range(n1)], np.int64))
        t2 = np.sort(np.array(
            [int(t1[-1]) + 100 + rng.randint(0, 20) * 100 for _ in range(n2)],
            np.int64,
        ))
        ts = np.concatenate([t1, t2])
        ma = np.array([rng.random() < 0.35 for _ in range(n1 + n2)], bool)
        mb = np.array([rng.random() < 0.35 for _ in range(n1 + n2)], bool)
        mc = np.array([rng.random() < 0.35 for _ in range(n1 + n2)], bool)
        within = rng.choice([None, 750, 1550])
        k1, k_st = run_kernel3(ts[:n1], ma[:n1], mb[:n1], mc[:n1], 0, None, within)
        g1, g_st = _run_general3(ts[:n1], ma[:n1], mb[:n1], mc[:n1], 0, None, within)
        assert k1 == g1, (trial,)
        assert _state_key_full(k_st) == _state_key_full(g_st), (trial,)
        # batch 2: each engine continues the OTHER's state
        k2, k_st2 = run_kernel3(ts, ma, mb, mc, n1, g_st, within)
        g2, g_st2 = _run_general3(ts, ma, mb, mc, n1, k_st, within)
        assert k2 == g2, (
            trial, ts.tolist(), ma.tolist(), mb.tolist(), mc.tolist(), within,
        )
        assert _state_key_full(k_st2) == _state_key_full(g_st2), (trial,)


def _elems_k(k):
    return [A.PatternElem(stream="s", alias=f"e{i}") for i in range(k)]


def _run_general_k(ts, masks, k, start, init, within):
    rows = pd.DataFrame({TS_COL: ts})
    return _run_nfa(
        rows, masks, _elems_k(k), [False] * (k - 1), True, within,
        at_close=False, start_idx=start, init=init, return_state=True,
    )


def test_kernel_chain_matches_general_nfa_randomized():
    """chain: the generalized k-step relaxed funnel (k=4 and k=5) — kernel
    vs general NFA on randomized feeds, exact emission order and full
    state equality across every stage of pending partials."""
    from flink_siddhi_spark.operators.pattern import run_kernel_chain

    rng = random.Random(41)
    for trial in range(300):
        k = rng.choice([4, 5])
        n = rng.randint(0, 34)
        ts = np.sort(
            np.array([rng.randint(0, 40) * 100 for _ in range(n)], np.int64)
        )
        masks = [
            np.array([rng.random() < 0.35 for _ in range(n)], bool)
            for _ in range(k)
        ]
        within = rng.choice([None, 850, 1650, 2850])
        got_m, got_st = run_kernel_chain(ts, masks, 0, None, within)
        want_m, want_st = _run_general_k(ts, masks, k, 0, None, within)
        assert got_m == want_m, (trial, k, ts.tolist(),
                                 [m.tolist() for m in masks], within)
        assert _state_key_full(got_st) == _state_key_full(want_st), (
            trial, k, ts.tolist(), [m.tolist() for m in masks], within,
        )


def test_kernel_chain_state_interops_with_general_nfa():
    from flink_siddhi_spark.operators.pattern import run_kernel_chain

    rng = random.Random(42)
    for trial in range(150):
        k = rng.choice([4, 5])
        n1, n2 = rng.randint(1, 15), rng.randint(1, 15)
        t1 = np.sort(np.array([rng.randint(0, 20) * 100 for _ in range(n1)], np.int64))
        t2 = np.sort(np.array(
            [int(t1[-1]) + 100 + rng.randint(0, 20) * 100 for _ in range(n2)],
            np.int64,
        ))
        ts = np.concatenate([t1, t2])
        masks = [
            np.array([rng.random() < 0.4 for _ in range(n1 + n2)], bool)
            for _ in range(k)
        ]
        within = rng.choice([None, 1050, 2250])
        m1 = [m[:n1] for m in masks]
        k1, k_st = run_kernel_chain(ts[:n1], m1, 0, None, within)
        g1, g_st = _run_general_k(ts[:n1], m1, k, 0, None, within)
        assert k1 == g1, (trial, k)
        assert _state_key_full(k_st) == _state_key_full(g_st), (trial, k)
        # batch 2: each engine continues the OTHER's state
        k2, k_st2 = run_kernel_chain(ts, masks, n1, g_st, within)
        g2, g_st2 = _run_general_k(ts, masks, k, n1, k_st, within)
        assert k2 == g2, (
            trial, k, ts.tolist(), [m.tolist() for m in masks], within,
        )
        assert _state_key_full(k_st2) == _state_key_full(g_st2), (trial, k)


def _elems_abs_k(k, for_ms):
    return [A.PatternElem(stream="s", alias=f"e{i}") for i in range(k - 1)] + [
        A.PatternElem(stream="s", alias="nx", negated=True, for_ms=for_ms)
    ]


def _run_general_abs_k(ts, masks, k, for_ms, start, init, within):
    rows = pd.DataFrame({TS_COL: ts})
    return _run_nfa(
        rows, masks, _elems_abs_k(k, for_ms), [False] * (k - 1), True,
        within, at_close=False, start_idx=start, init=init,
        return_state=True,
    )


def test_kernel_chain_absence_matches_general_nfa_randomized():
    """chain_absence: ``every A -> B [-> C] -> not X for t [within w]`` —
    the funnel-abandonment shape. Kernel vs general NFA on randomized
    feeds (k=3 and k=4), exact emission order and full state equality
    across chain-stage AND armed-absence partials."""
    from flink_siddhi_spark.operators.pattern import run_kernel_chain_absence

    rng = random.Random(43)
    for trial in range(400):
        k = rng.choice([3, 4])
        n = rng.randint(0, 32)
        ts = np.sort(
            np.array([rng.randint(0, 40) * 100 for _ in range(n)], np.int64)
        )
        masks = [
            np.array([rng.random() < 0.35 for _ in range(n)], bool)
            for _ in range(k)
        ]
        within = rng.choice([None, 850, 1650])
        for_ms = rng.choice([0, 250, 750, 1500])
        got_m, got_st = run_kernel_chain_absence(
            ts, masks, 0, None, within, for_ms
        )
        want_m, want_st = _run_general_abs_k(
            ts, masks, k, for_ms, 0, None, within
        )
        assert got_m == want_m, (trial, k, for_ms, within, ts.tolist(),
                                 [m.tolist() for m in masks])
        assert _state_key_full(got_st) == _state_key_full(want_st), (
            trial, k, for_ms, within, ts.tolist(),
            [m.tolist() for m in masks],
        )


def test_kernel_chain_absence_state_interops_with_general_nfa():
    from flink_siddhi_spark.operators.pattern import run_kernel_chain_absence

    rng = random.Random(44)
    for trial in range(200):
        k = rng.choice([3, 4])
        n1, n2 = rng.randint(1, 14), rng.randint(1, 14)
        t1 = np.sort(np.array([rng.randint(0, 20) * 100 for _ in range(n1)], np.int64))
        t2 = np.sort(np.array(
            [int(t1[-1]) + 100 + rng.randint(0, 20) * 100 for _ in range(n2)],
            np.int64,
        ))
        ts = np.concatenate([t1, t2])
        masks = [
            np.array([rng.random() < 0.4 for _ in range(n1 + n2)], bool)
            for _ in range(k)
        ]
        within = rng.choice([None, 1050])
        for_ms = rng.choice([0, 350, 950])
        m1 = [m[:n1] for m in masks]
        k1, k_st = run_kernel_chain_absence(ts[:n1], m1, 0, None, within, for_ms)
        g1, g_st = _run_general_abs_k(ts[:n1], m1, k, for_ms, 0, None, within)
        assert k1 == g1, (trial, k, for_ms)
        assert _state_key_full(k_st) == _state_key_full(g_st), (trial, k, for_ms)
        # batch 2: each engine continues the OTHER's state
        k2, k_st2 = run_kernel_chain_absence(ts, masks, n1, g_st, within, for_ms)
        g2, g_st2 = _run_general_abs_k(ts, masks, k, for_ms, n1, k_st, within)
        assert k2 == g2, (
            trial, k, for_ms, within, ts.tolist(),
            [m.tolist() for m in masks],
        )
        assert _state_key_full(k_st2) == _state_key_full(g_st2), (
            trial, k, for_ms,
        )


def _run_general_plain_k(ts, masks, k, start, init, within):
    rows = pd.DataFrame({TS_COL: ts})
    return _run_nfa(
        rows, masks, _elems_k(k), [False] * (k - 1), False, within,
        at_close=False, start_idx=start, init=init, return_state=True,
    )


def test_kernel_chain_nonevery_matches_general_nfa_randomized():
    """plain_chain: the arm-once first-attempt contract generalized to
    k-step chains (k=3/4) — kernel vs general NFA, full state equality
    incl. started/done and the dead state (failed attempt, no re-arm)."""
    from flink_siddhi_spark.operators.pattern import run_kernel_chain_nonevery

    rng = random.Random(45)
    for trial in range(400):
        k = rng.choice([3, 4])
        n = rng.randint(0, 30)
        ts = np.sort(
            np.array([rng.randint(0, 40) * 100 for _ in range(n)], np.int64)
        )
        masks = [
            np.array([rng.random() < 0.35 for _ in range(n)], bool)
            for _ in range(k)
        ]
        within = rng.choice([None, 850, 1650])
        got_m, got_st = run_kernel_chain_nonevery(ts, masks, 0, None, within)
        want_m, want_st = _run_general_plain_k(ts, masks, k, 0, None, within)
        assert got_m == want_m, (trial, k, within, ts.tolist(),
                                 [m.tolist() for m in masks])
        assert _state_key_full(got_st) == _state_key_full(want_st), (
            trial, k, within, ts.tolist(), [m.tolist() for m in masks],
        )


def test_kernel_chain_nonevery_state_interops_with_general_nfa():
    from flink_siddhi_spark.operators.pattern import run_kernel_chain_nonevery

    rng = random.Random(46)
    for trial in range(200):
        k = rng.choice([3, 4])
        n1, n2 = rng.randint(1, 14), rng.randint(1, 14)
        t1 = np.sort(np.array([rng.randint(0, 20) * 100 for _ in range(n1)], np.int64))
        t2 = np.sort(np.array(
            [int(t1[-1]) + 100 + rng.randint(0, 20) * 100 for _ in range(n2)],
            np.int64,
        ))
        ts = np.concatenate([t1, t2])
        masks = [
            np.array([rng.random() < 0.4 for _ in range(n1 + n2)], bool)
            for _ in range(k)
        ]
        within = rng.choice([None, 1050])
        m1 = [m[:n1] for m in masks]
        k1, k_st = run_kernel_chain_nonevery(ts[:n1], m1, 0, None, within)
        g1, g_st = _run_general_plain_k(ts[:n1], m1, k, 0, None, within)
        assert k1 == g1, (trial, k)
        assert _state_key_full(k_st) == _state_key_full(g_st), (trial, k)
        k2, k_st2 = run_kernel_chain_nonevery(ts, masks, n1, g_st, within)
        g2, g_st2 = _run_general_plain_k(ts, masks, k, n1, k_st, within)
        assert k2 == g2, (
            trial, k, within, ts.tolist(), [m.tolist() for m in masks],
        )
        assert _state_key_full(k_st2) == _state_key_full(g_st2), (trial, k)


# ------------------------------------------------- round-10 quant2 shape
def _q_elems(n, m):
    return [
        A.PatternElem(stream="s", alias="a", min_count=n, max_count=m),
        A.PatternElem(stream="s", alias="b"),
    ]


def _run_general_quant(ts, ma, mb, start, init, within, n, m):
    rows = pd.DataFrame({TS_COL: ts})
    return _run_nfa(
        rows, [ma, mb], _q_elems(n, m), [False], True, within,
        at_close=False, start_idx=start, init=init, return_state=True,
    )


def test_kernel2_quant_matches_general_nfa_randomized():
    """quant2 (`every a<n:m> -> b [within t]`, round 10): kernel vs general
    NFA on 600 randomized feeds with OVERLAPPING a/b masks (greedy
    extension beats completion when one row matches both), full state
    equality including last_ts. Exact match lists, not sorted — emission
    order is part of the contract."""
    rng = random.Random(11)
    for trial in range(600):
        nr = rng.randint(0, 28)
        ts = np.sort(
            np.array([rng.randint(0, 40) * 100 for _ in range(nr)], np.int64)
        )
        ma = np.array([rng.random() < 0.35 for _ in range(nr)], bool)
        mb = np.array([rng.random() < 0.35 for _ in range(nr)], bool)
        within = rng.choice([None, 550, 1250])
        n = rng.randint(1, 3)
        m = rng.choice([n, n + 1, n + 2, None])
        got_m, got_st = run_kernel2_quant(ts, ma, mb, 0, None, within, n, m)
        want_m, want_st = _run_general_quant(ts, ma, mb, 0, None, within, n, m)
        assert got_m == want_m, (
            trial, n, m, within, ts.tolist(), ma.tolist(), mb.tolist(),
        )
        assert _state_key_full(got_st) == _state_key_full(want_st), (
            trial, n, m, within,
        )


def test_kernel2_quant_state_interops_with_general_nfa():
    """Batch 1 through one engine, batch 2 through the OTHER — the shared
    partial format continues identically (the streaming out-of-order
    fallback relies on it)."""
    rng = random.Random(23)
    for trial in range(400):
        n1, n2 = rng.randint(1, 14), rng.randint(1, 14)
        t1 = np.sort(
            np.array([rng.randint(0, 20) * 100 for _ in range(n1)], np.int64)
        )
        t2 = np.sort(np.array(
            [int(t1[-1]) + 100 + rng.randint(0, 20) * 100 for _ in range(n2)],
            np.int64,
        ))
        ts = np.concatenate([t1, t2])
        ma = np.array([rng.random() < 0.4 for _ in range(n1 + n2)], bool)
        mb = np.array([rng.random() < 0.4 for _ in range(n1 + n2)], bool)
        within = rng.choice([None, 750, 1500])
        n = rng.randint(1, 3)
        m = rng.choice([n, n + 2, None])
        k1, k_st = run_kernel2_quant(ts[:n1], ma[:n1], mb[:n1], 0, None,
                                     within, n, m)
        g1, g_st = _run_general_quant(ts[:n1], ma[:n1], mb[:n1], 0, None,
                                      within, n, m)
        assert k1 == g1, (trial, n, m)
        assert _state_key_full(k_st) == _state_key_full(g_st), (trial, n, m)
        k2, k_st2 = run_kernel2_quant(ts, ma, mb, n1, g_st, within, n, m)
        g2, g_st2 = _run_general_quant(ts, ma, mb, n1, k_st, within, n, m)
        assert k2 == g2, (
            trial, n, m, within, ts.tolist(), ma.tolist(), mb.tolist(),
        )
        assert _state_key_full(k_st2) == _state_key_full(g_st2), (trial, n, m)


# -------------------------------------------- late-round-10 chain_quant
def _cq_elems(k, qpos, n, m):
    elems = [A.PatternElem(stream="s", alias=f"e{i}") for i in range(k)]
    elems[qpos] = A.PatternElem(
        stream="s", alias=f"e{qpos}", min_count=n, max_count=m
    )
    return elems


def _run_general_chainq(ts, masks, k, qpos, n, m, start, init, within):
    rows = pd.DataFrame({TS_COL: ts})
    return _run_nfa(
        rows, masks, _cq_elems(k, qpos, n, m), [False] * (k - 1), True,
        within, at_close=False, start_idx=start, init=init,
        return_state=True,
    )


def test_kernel_chain_quant_matches_general_nfa_randomized():
    """chain_quant (`every e1 -> ... -> q<n:m> -> ... -> ek [within t]`,
    late round 10): kernel vs general NFA on 600 randomized feeds with
    OVERLAPPING masks (extension beats advancing when a row matches both
    the quant stage and the next), every qpos in [0, k-2], full state
    equality including last_ts. Exact match lists — emission order is
    part of the contract."""
    from flink_siddhi_spark.operators.pattern import run_kernel_chain_quant

    rng = random.Random(61)
    for trial in range(600):
        k = rng.choice([3, 3, 4])
        qpos = rng.randint(0, k - 2)
        nr = rng.randint(0, 30)
        ts = np.sort(
            np.array([rng.randint(0, 40) * 100 for _ in range(nr)], np.int64)
        )
        masks = [
            np.array([rng.random() < 0.35 for _ in range(nr)], bool)
            for _ in range(k)
        ]
        within = rng.choice([None, 850, 1650])
        n = rng.randint(1, 3)
        m = rng.choice([n, n + 1, n + 2, None])
        got_m, got_st = run_kernel_chain_quant(
            ts, masks, qpos, 0, None, within, n, m
        )
        want_m, want_st = _run_general_chainq(
            ts, masks, k, qpos, n, m, 0, None, within
        )
        assert got_m == want_m, (
            trial, k, qpos, n, m, within, ts.tolist(),
            [mk.tolist() for mk in masks],
        )
        assert _state_key_full(got_st) == _state_key_full(want_st), (
            trial, k, qpos, n, m, within, ts.tolist(),
            [mk.tolist() for mk in masks],
        )


def test_kernel_chain_quant_state_interops_with_general_nfa():
    """Batch 1 through one engine, batch 2 through the OTHER — the shared
    partial format continues identically across resumed prefix-stage,
    mid-quant, and suffix-stage partials."""
    from flink_siddhi_spark.operators.pattern import run_kernel_chain_quant

    rng = random.Random(62)
    for trial in range(400):
        k = rng.choice([3, 3, 4])
        qpos = rng.randint(0, k - 2)
        n1, n2 = rng.randint(1, 14), rng.randint(1, 14)
        t1 = np.sort(
            np.array([rng.randint(0, 20) * 100 for _ in range(n1)], np.int64)
        )
        t2 = np.sort(np.array(
            [int(t1[-1]) + 100 + rng.randint(0, 20) * 100 for _ in range(n2)],
            np.int64,
        ))
        ts = np.concatenate([t1, t2])
        masks = [
            np.array([rng.random() < 0.4 for _ in range(n1 + n2)], bool)
            for _ in range(k)
        ]
        within = rng.choice([None, 1050, 2250])
        n = rng.randint(1, 3)
        m = rng.choice([n, n + 2, None])
        m1 = [mk[:n1] for mk in masks]
        k1, k_st = run_kernel_chain_quant(
            ts[:n1], m1, qpos, 0, None, within, n, m
        )
        g1, g_st = _run_general_chainq(
            ts[:n1], m1, k, qpos, n, m, 0, None, within
        )
        assert k1 == g1, (trial, k, qpos, n, m)
        assert _state_key_full(k_st) == _state_key_full(g_st), (
            trial, k, qpos, n, m,
        )
        k2, k_st2 = run_kernel_chain_quant(
            ts, masks, qpos, n1, g_st, within, n, m
        )
        g2, g_st2 = _run_general_chainq(
            ts, masks, k, qpos, n, m, n1, k_st, within
        )
        assert k2 == g2, (
            trial, k, qpos, n, m, within, ts.tolist(),
            [mk.tolist() for mk in masks],
        )
        assert _state_key_full(k_st2) == _state_key_full(g_st2), (
            trial, k, qpos, n, m,
        )


# ----------------------------------------- late-round-10 multi-quant chain
def _mq_elems(k, quants):
    elems = [A.PatternElem(stream="s", alias=f"e{i}") for i in range(k)]
    for qpos, n, m in quants:
        elems[qpos] = A.PatternElem(
            stream="s", alias=f"e{qpos}", min_count=n, max_count=m
        )
    return elems


def _run_general_mq(ts, masks, k, quants, start, init, within):
    rows = pd.DataFrame({TS_COL: ts})
    return _run_nfa(
        rows, masks, _mq_elems(k, quants), [False] * (k - 1), True,
        within, at_close=False, start_idx=start, init=init,
        return_state=True,
    )


def _rand_quants(rng, k):
    """1-2 quantified interior stages, no two adjacent, none last."""
    qpos1 = rng.randint(0, k - 2)
    quants = [(qpos1, rng.randint(1, 2),
               rng.choice([1, 2, 3, None]) or None)]
    if quants[0][2] is not None and quants[0][2] < quants[0][1]:
        quants[0] = (qpos1, quants[0][1], quants[0][1])
    others = [p for p in range(k - 1) if abs(p - qpos1) >= 2]
    if others and rng.random() < 0.7:
        qpos2 = rng.choice(others)
        n2 = rng.randint(1, 2)
        m2 = rng.choice([n2, n2 + 1, None])
        quants.append((qpos2, n2, m2))
    return sorted(quants)


def test_kernel_chain_multiquant_matches_general_nfa_randomized():
    """Multi-quant chains (`a<1:2> -> b -> c<1:2> -> d` and friends):
    kernel vs general NFA on 600 randomized feeds with overlapping
    masks, 1-2 non-adjacent quant stages over k in {4,5}, full state
    equality including last_ts."""
    from flink_siddhi_spark.operators.pattern import run_kernel_chain_quants

    rng = random.Random(71)
    for trial in range(600):
        k = rng.choice([4, 4, 5])
        quants = _rand_quants(rng, k)
        nr = rng.randint(0, 30)
        ts = np.sort(
            np.array([rng.randint(0, 40) * 100 for _ in range(nr)], np.int64)
        )
        masks = [
            np.array([rng.random() < 0.35 for _ in range(nr)], bool)
            for _ in range(k)
        ]
        within = rng.choice([None, 1250, 2450])
        got_m, got_st = run_kernel_chain_quants(
            ts, masks, quants, 0, None, within
        )
        want_m, want_st = _run_general_mq(
            ts, masks, k, quants, 0, None, within
        )
        assert got_m == want_m, (
            trial, k, quants, within, ts.tolist(),
            [mk.tolist() for mk in masks],
        )
        assert _state_key_full(got_st) == _state_key_full(want_st), (
            trial, k, quants, within, ts.tolist(),
            [mk.tolist() for mk in masks],
        )


def test_kernel_chain_multiquant_state_interops_with_general_nfa():
    """Batch 1 through one engine, batch 2 through the OTHER, across
    resumed prefix / mid-quant-1 / between-quants / mid-quant-2 / suffix
    partial states."""
    from flink_siddhi_spark.operators.pattern import run_kernel_chain_quants

    rng = random.Random(72)
    for trial in range(400):
        k = rng.choice([4, 4, 5])
        quants = _rand_quants(rng, k)
        n1, n2 = rng.randint(1, 14), rng.randint(1, 14)
        t1 = np.sort(
            np.array([rng.randint(0, 20) * 100 for _ in range(n1)], np.int64)
        )
        t2 = np.sort(np.array(
            [int(t1[-1]) + 100 + rng.randint(0, 20) * 100 for _ in range(n2)],
            np.int64,
        ))
        ts = np.concatenate([t1, t2])
        masks = [
            np.array([rng.random() < 0.4 for _ in range(n1 + n2)], bool)
            for _ in range(k)
        ]
        within = rng.choice([None, 1450, 2850])
        m1 = [mk[:n1] for mk in masks]
        k1, k_st = run_kernel_chain_quants(
            ts[:n1], m1, quants, 0, None, within
        )
        g1, g_st = _run_general_mq(
            ts[:n1], m1, k, quants, 0, None, within
        )
        assert k1 == g1, (trial, k, quants)
        assert _state_key_full(k_st) == _state_key_full(g_st), (
            trial, k, quants,
        )
        k2, k_st2 = run_kernel_chain_quants(
            ts, masks, quants, n1, g_st, within
        )
        g2, g_st2 = _run_general_mq(
            ts, masks, k, quants, n1, k_st, within
        )
        assert k2 == g2, (
            trial, k, quants, within, ts.tolist(),
            [mk.tolist() for mk in masks],
        )
        assert _state_key_full(k_st2) == _state_key_full(g_st2), (
            trial, k, quants,
        )
