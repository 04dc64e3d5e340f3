"""Probabilistic sketch operators: HyperLogLog distinct counting and
count-min heavy-hitter estimation.

Both sketches are built on md5 so the SAME sketch is computable in any
engine (md5 hex is engine-portable; Spark's xxhash64/hash are not) — that is
what makes an inherently approximate operator exactly oracle-checkable: the
estimate is a deterministic function of the input multiset, so two engines
agree bit-for-bit even though the estimate differs from the true count.

Scale shape:
- HLL: one hash-aggregate onto (group, register) — at most ``m`` rows per
  group survive the map-side combine — then one k×m-row aggregate per group.
  Register values are small ints; nothing quadratic, nothing on the driver.
- CMS: counts are aggregated per key FIRST (one vocab-bounded shuffle with
  map-side combine), and the d×width sketch is built from the key-count
  table, so the d-fold hashing cost scales with |vocab|, not corpus size.

Determinism notes: registers hold integer rhos; ``pow(2, -rho)`` is an exact
power of two, rounded to 12 decimals and summed through DECIMAL(38,12) so the
harmonic sum is partitioning- and engine-independent (same contract as
llm/text.textrank_keywords). The only transcendental is ``ln`` in HLL's
small-range (linear-counting) branch; its argument and the surrounding
arithmetic are engine-exact and the result is rounded to a BIGINT, so a
last-ulp libm difference would need the pre-round value within ~1e-10 of a
.5 boundary to surface (pinned green against DuckDB at sf0.01 and sf0.1).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _check_prefix(prefix_hex: int) -> int:
    p = int(prefix_hex)
    if not 1 <= p <= 8:
        raise ValueError("prefix_hex must be in [1, 8]")
    return p


def _hll_hash(value_col: str):
    """The md5 hex digest column both register and rho derive from.
    Materialized ONCE in a projection by the callers (optimization round):
    the register (grouping key) and rho (aggregate input) sit in different
    operator slots, so codegen's subexpression elimination cannot share the
    digest between them — computing it in a Project beforehand halves the
    md5 work per row with identical results."""
    return F.md5(F.col(value_col).cast("string").cast("binary"))


def _reg_and_rho(hash_col: str, p: int):
    """(register, rho) column pair reading a precomputed md5-hex column
    (see :func:`_hll_hash`): register = first ``p`` hex chars; rho = 1 +
    leading-zero-bits of the remaining 128-4p bits, via portable string ops
    (4 bits per leading '0' char + the intra-nibble zeros of the first
    non-zero char)."""
    tail_len = 32 - p
    h = F.col(hash_col)
    reg = F.substring(h, 1, p)
    trimmed = F.expr(
        f"trim(LEADING '0' FROM substring({hash_col}, {p + 1}, {tail_len}))"
    )
    first = F.substring(trimmed, 1, 1)
    intra = (
        F.when(first == "1", F.lit(3))
        .when(first.isin("2", "3"), F.lit(2))
        .when(first.isin("4", "5", "6", "7"), F.lit(1))
        .otherwise(F.lit(0))
    )
    rho = F.when(F.length(trimmed) == 0, F.lit(4 * tail_len + 1)).otherwise(
        (F.lit(tail_len) - F.length(trimmed)) * 4 + intra + 1
    )
    return reg, rho


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: Sequence[str] = (),
    prefix_hex: int = 2,
) -> DataFrame:
    """Finish an HLL estimate from a ``(group..., __reg, __rho)`` register
    table — the shared tail of :func:`hll_distinct` and the batch reader of
    :func:`hll_register_stream`'s streamed register sink. Mergeability is
    HLL's whole point: register tables from different partitions, batches,
    or days combine by ``max(__rho)`` per register before this finisher."""
    p = _check_prefix(prefix_hex)
    m = 16 ** p
    gcols = list(group_cols)
    z_present = F.sum(
        F.round(F.pow(F.lit(2.0), -F.col("__rho")), 12).cast("decimal(38,12)")
    ).cast("double")
    agg = regs.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("hll_registers_used"),
        z_present.alias("__zp"),
    )
    v_used = F.col("hll_registers_used")
    # empty (ungrouped) input: SUM over zero rows is NULL -> coalesce to 0,
    # after which linear counting gives m*ln(m/m) = 0, the right answer
    z = F.coalesce(F.col("__zp"), F.lit(0.0)) + (F.lit(float(m)) - v_used)
    e_raw = F.lit(_hll_alpha(m)) * F.lit(float(m)) * F.lit(float(m)) / z
    zeros = F.lit(float(m)) - v_used
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(e_raw)
    return agg.withColumn("hll_estimate", F.round(est, 0).cast("bigint")).drop(
        "__zp"
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    prefix_hex: int = 2,
) -> DataFrame:
    """HyperLogLog distinct-count estimate of ``value_col`` per group.

    ``prefix_hex`` hex chars of md5 pick the register (m = 16^prefix_hex);
    the register value is 1 + leading-zero-bits of the remaining 128-4p bits.
    Small-range (linear counting) and raw-HLL branches follow Flajolet et
    al. 2007. NULL values are ignored (COUNT DISTINCT semantics).

    Output: group cols + ``n_exact`` (true distinct, for error inspection —
    drop it at real scale) + ``hll_estimate`` (BIGINT) +
    ``hll_registers_used``.
    """
    p = _check_prefix(prefix_hex)
    gcols = [F.col(c) for c in group_cols]
    reg, rho = _reg_and_rho("__hll_h", p)
    # ONE corpus pass for both branches (optimization round): registers are
    # duplicate-insensitive (max-rho over a multiset == over its set) and
    # n_exact is a count over the same distinct table, so both branches
    # read the SAME distinct aggregate — its exchange subtree is identical
    # in the two branches and executes once via ReusedExchange (the old
    # shape scanned + exploded the input twice: once for the register
    # aggregate, once for countDistinct)
    dist = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, value_col)
        .distinct()
    )
    regs = (
        dist.withColumn("__hll_h", _hll_hash(value_col))
        .groupBy(*gcols, reg.alias("__reg"))
        .agg(F.max(rho).alias("__rho"))
    )
    # exact distinct for error inspection — a plain count over the shared
    # distinct table (== countDistinct on the raw input)
    exact = dist.groupBy(*gcols).agg(F.count(F.lit(1)).alias("n_exact"))
    out = hll_estimate_from_registers(regs, group_cols, prefix_hex=p)
    if group_cols:
        joined = out.join(exact, list(group_cols))
    else:
        joined = out.crossJoin(F.broadcast(exact))
    return joined.select(
        *group_cols, "n_exact", "hll_estimate", "hll_registers_used"
    )


def hll_register_stream(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    prefix_hex: int = 2,
    ts_col: str = "ts",
    window_duration: str = "1 day",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming HLL: per-(event-time window, group) register table as a
    watermark-bounded Structured Streaming aggregate.

    The production sketch shape: REGISTERS stream (state = one max-rho int
    per (window, group, register) — bounded by m per group per window, and
    EVICTED when the watermark closes the window); estimates materialize at
    read time via :func:`hll_estimate_from_registers` over the sunk register
    table. This sidesteps chaining two stateful aggregates inside one
    streaming query, and keeps the sink mergeable across days/backfills
    (max per register), which a materialized estimate would not be.

    Output (append mode once the watermark passes): ``window_start_ms,
    window_end_ms, group..., __reg, __rho``.
    """
    p = _check_prefix(prefix_hex)
    reg, rho = _reg_and_rho("__hll_h", p)
    win = F.window(F.col(ts_col), window_duration)
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("__hll_h", _hll_hash(value_col))
        .withWatermark(ts_col, watermark)
        .groupBy(win, *[F.col(c) for c in group_cols], reg.alias("__reg"))
        .agg(F.max(rho).alias("__rho"))
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start_ms"),
            F.unix_millis(F.col("window.end")).alias("window_end_ms"),
            *group_cols,
            "__reg",
            "__rho",
        )
    )


def hll_sql(
    value_expr: str,
    from_clause: str,
    group_cols: Sequence[str] = (),
    prefix_hex: int = 2,
) -> str:
    """DuckDB oracle for :func:`hll_distinct` — the identical sketch in
    portable SQL (same md5, same string-op rho, same decimal harmonic sum)."""
    p = int(prefix_hex)
    m = 16 ** p
    tail_len = 32 - p
    # explicit DOUBLE casts everywhere: DuckDB parses bare decimal literals
    # as DECIMAL and overflows multiplying alpha * m * m
    al = f"CAST({_hll_alpha(m)!r} AS DOUBLE)"
    md = f"CAST({m} AS DOUBLE)"
    gsel = ", ".join(group_cols)
    gpfx = f"{gsel}, " if group_cols else ""
    gby = f"GROUP BY {gsel}" if group_cols else ""
    join = f"JOIN ex USING ({gsel})" if group_cols else "CROSS JOIN ex"
    return (
        f"WITH src AS (SELECT {gpfx}CAST({value_expr} AS VARCHAR) v "
        f"FROM {from_clause} WHERE {value_expr} IS NOT NULL), "
        f"hx AS (SELECT {gpfx}md5(v) h FROM src), "
        f"rr AS (SELECT {gpfx}substring(h, 1, {p}) reg, "
        f"trim(LEADING '0' FROM substring(h, {p + 1}, {tail_len})) t FROM hx), "
        f"rho AS (SELECT {gpfx}reg, CASE WHEN length(t) = 0 THEN {4 * tail_len + 1} "
        f"ELSE ({tail_len} - length(t)) * 4 + 1 + "
        f"(CASE substring(t, 1, 1) WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 "
        f"WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1 "
        f"ELSE 0 END) END r FROM rr), "
        f"regs AS (SELECT {gpfx}reg, max(r) mr FROM rho GROUP BY {gpfx}reg), "
        f"agg AS (SELECT {gpfx}CAST(count(*) AS BIGINT) used, "
        f"CAST(sum(CAST(round(pow(2.0, -mr), 12) AS DECIMAL(38,12))) AS DOUBLE) zp "
        f"FROM regs {gby}), "
        f"ex AS (SELECT {gpfx}CAST(count(DISTINCT v) AS BIGINT) n_exact FROM src {gby}), "
        f"est AS (SELECT {gpfx}used, coalesce(zp, 0.0) + ({md} - used) z, "
        f"({md} - used) zeros FROM agg) "
        f"SELECT {gpfx}n_exact, CAST(round(CASE WHEN "
        f"{al} * {md} * {md} / z <= CAST({2.5 * m!r} AS DOUBLE) AND zeros > 0 "
        f"THEN {md} * ln({md} / zeros) "
        f"ELSE {al} * {md} * {md} / z END, 0) AS BIGINT) hll_estimate, "
        f"used hll_registers_used FROM est {join}"
    )


def _cms_cell(row, width_hex: int, key=None):
    """CMS cell key for hash-row ``row``: md5(row ':' key)[:width_hex]."""
    key = F.col("k") if key is None else key
    return F.substring(
        F.md5(
            F.concat_ws(":", row.cast("string"), key.cast("string")).cast("binary")
        ),
        1,
        width_hex,
    )


def cms_cell_stream(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width_hex: int = 3,
    ts_col: str = "ts",
    window_duration: str = "1 day",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming count-min sketch: per-(event-time window) cell totals as a
    watermark-bounded aggregate — the CMS analogue of
    :func:`hll_register_stream`. State is one count per (window, row, cell):
    bounded by depth·16^width_hex per window and evicted at window close.
    Cell sinks merge across windows/backfills by SUM (CMS cells are
    counters), and :func:`cms_estimate_from_cells` probes candidates at
    read time. Output: ``window_start_ms, window_end_ms, __row, __cell,
    __total``."""
    if depth < 1 or not 1 <= width_hex <= 8:
        raise ValueError("depth >= 1 and width_hex in [1, 8] required")
    rows = F.sequence(F.lit(0), F.lit(depth - 1))
    melted = (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(ts_col), F.col(key_col).alias("k"), F.explode(rows).alias("__row"))
        .withColumn("__cell", _cms_cell(F.col("__row"), width_hex))
    )
    return (
        melted.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), "__row", "__cell")
        .agg(F.count(F.lit(1)).alias("__total"))
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start_ms"),
            F.unix_millis(F.col("window.end")).alias("window_end_ms"),
            "__row",
            "__cell",
            "__total",
        )
    )


def cms_estimate_from_cells(
    cells: DataFrame,
    candidates: DataFrame,
    key_col: str,
    depth: int = 4,
    width_hex: int = 3,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Probe a (possibly streamed-and-sunk) CMS cell table for candidate
    keys: estimate = min over rows of the matching cell total, per group.
    ``cells`` must carry ``group..., __row, __cell, __total``; ``candidates``
    one key per row (join is |candidates|·depth vs the depth·width cell
    table — broadcastable)."""
    rows = F.sequence(F.lit(0), F.lit(depth - 1))
    probe = candidates.select(
        F.col(key_col).alias("k"), F.explode(rows).alias("__row")
    ).withColumn("__cell", _cms_cell(F.col("__row"), width_hex))
    gcols = list(group_cols)
    return (
        cells.join(F.broadcast(probe), ["__row", "__cell"])
        .groupBy(*gcols, "k")
        .agg(F.min("__total").alias("cms_estimate"))
        .select(*gcols, F.col("k").alias(key_col), "cms_estimate")
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width_hex: int = 3,
    top_n: int = 50,
) -> DataFrame:
    """Count-min-sketch frequency estimates for the ``top_n`` most frequent
    keys (one row per occurrence in ``df``).

    The sketch has ``depth`` rows × 16^width_hex cells; row r hashes key k
    to cell md5(r || ':' || k)[:width_hex]. estimate(k) = min over rows of
    the cell total — a pure-integer overestimate (collisions only ever add),
    so ``cms_estimate >= n_exact`` always holds and the operator output
    exposes both.

    Built from the aggregated (key, count) table, not the raw occurrences:
    CMS cells are sums, so sketching after the exact count-by-key aggregate
    is identical and makes the d-fold hashing vocab-bounded.
    """
    if depth < 1 or not 1 <= width_hex <= 8:
        raise ValueError("depth >= 1 and width_hex in [1, 8] required")
    counts = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("k"))
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    counts = counts.localCheckpoint()  # reused by sketch, candidates, and probe
    rows = F.sequence(F.lit(0), F.lit(depth - 1))
    cell = lambda r: F.substring(  # noqa: E731
        F.md5(
            F.concat_ws(":", r.cast("string"), F.col("k").cast("string")).cast(
                "binary"
            )
        ),
        1,
        width_hex,
    )
    melted = counts.select(
        "k", "n_exact", F.explode(rows).alias("__row")
    ).withColumn("__cell", cell(F.col("__row")))
    cells = melted.groupBy("__row", "__cell").agg(F.sum("n_exact").alias("__total"))
    cand = counts.orderBy(F.desc("n_exact"), "k").limit(top_n)
    probe = cand.select(
        "k", "n_exact", F.explode(rows).alias("__row")
    ).withColumn("__cell", cell(F.col("__row")))
    est = (
        probe.join(cells, ["__row", "__cell"])
        .groupBy("k", "n_exact")
        .agg(F.min("__total").alias("cms_estimate"))
    )
    return est.select(
        F.col("k").alias(key_col), "n_exact", "cms_estimate"
    ).orderBy(F.desc("n_exact"), key_col)


def cms_sql(
    key_expr_cte: str,
    depth: int = 4,
    width_hex: int = 3,
    top_n: int = 50,
    key_name: str = "k",
) -> str:
    """DuckDB oracle for :func:`cms_heavy_hitters`. ``key_expr_cte`` must be
    a CTE body producing one row per occurrence with a column ``k``."""
    w = width_hex
    return (
        f"WITH occ AS ({key_expr_cte}), "
        f"cnt AS (SELECT k, CAST(count(*) AS BIGINT) n_exact FROM occ "
        f"WHERE k IS NOT NULL GROUP BY k), "
        f"mel AS (SELECT k, n_exact, i __row, "
        f"substring(md5(CAST(i AS VARCHAR) || ':' || k), 1, {w}) __cell "
        f"FROM cnt, unnest(generate_series(0, {depth - 1})) t(i)), "
        f"cells AS (SELECT __row, __cell, sum(n_exact) __total FROM mel "
        f"GROUP BY __row, __cell), "
        f"cand AS (SELECT k, n_exact FROM cnt ORDER BY n_exact DESC, k LIMIT {top_n}), "
        f"probe AS (SELECT k, n_exact, i __row, "
        f"substring(md5(CAST(i AS VARCHAR) || ':' || k), 1, {w}) __cell "
        f"FROM cand, unnest(generate_series(0, {depth - 1})) t(i)) "
        f"SELECT probe.k {key_name}, probe.n_exact, "
        f"CAST(min(cells.__total) AS BIGINT) cms_estimate "
        f"FROM probe JOIN cells USING (__row, __cell) "
        f"GROUP BY probe.k, probe.n_exact "
        f"ORDER BY probe.n_exact DESC, probe.k"
    )
