"""Event-table DML: `insert into T`, `update T`, `delete T`, `update or insert
into T` (Siddhi event tables, reference README.md:26 "Event Tables"; declared
SiddhiQL 5.1 surface — the reference exposes them through `cql()`).

Batch-mode contract (the oracle-checked semantics; the streaming layer applies
the same shapes per micro-batch via foreachBatch):

- Statements apply in plan order; each statement applies its WHOLE input
  stream to the table before the next statement (or a later query) sees it.
- Within one statement, events replay in event-time order (ties broken by the
  full column tuple). The distributed translation is exact for the two set
  shapes that cover real tables:
    * value shape  `set T.c = <expr over stream>`  — last writer per key wins;
    * fold shape   `set T.c = T.c + <delta over stream>` (or `-`) — the old
      value plus the SUM of per-event deltas (associative, so a map-side
      partial-aggregated groupBy); on upsert-insert the first event seeds the
      column and the remaining deltas accumulate on top, exactly as a
      sequential replay would.
  Any other self-reference of table columns in `set` is rejected (a general
  per-event fold does not distribute).
- `on` must be a conjunction of equality comparisons `Table.col == <expr>`
  — the keyed form that scales (hash join on the key); sequential row-at-a-time
  semantics for arbitrary predicates would not distribute and are rejected.

Scale notes: ONE hash aggregation per statement computes last/first writers
(max_by/min_by over the order struct) and all fold sums; the table update is a
single equi-join against that keyed aggregate. Table state stays a DataFrame —
no driver-side loops.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import SiddhiPlannerException, UnsupportedFeatureException
from ..siddhiql import ast as A
from ..plans.expr import ExprCompiler

ORD_COL = "__ord"
MARK = "__m"


def _split_equi(on: A.Expr, table: str) -> list[tuple[str, A.Expr]]:
    """`on` -> [(table_col, stream_expr)]; reject non-equi shapes."""
    pairs: list[tuple[str, A.Expr]] = []

    def is_table_ref(e: A.Expr) -> bool:
        return isinstance(e, A.Ref) and e.stream == table

    def walk(e: A.Expr) -> None:
        if isinstance(e, A.Binary) and e.op == "and":
            walk(e.left)
            walk(e.right)
            return
        if isinstance(e, A.Binary) and e.op == "==":
            if is_table_ref(e.left) and not is_table_ref(e.right):
                pairs.append((e.left.name, e.right))
                return
            if is_table_ref(e.right) and not is_table_ref(e.left):
                pairs.append((e.right.name, e.left))
                return
        raise UnsupportedFeatureException(
            f"table DML 'on' must be AND-ed equality `{table}.col == expr` "
            f"(keyed form; arbitrary predicates don't distribute)"
        )

    walk(on)
    return pairs


def _has_table_ref(e: A.Expr, table: str) -> bool:
    if isinstance(e, A.Ref):
        return e.stream == table
    if isinstance(e, A.Binary):
        return _has_table_ref(e.left, table) or _has_table_ref(e.right, table)
    if isinstance(e, A.Unary):
        return _has_table_ref(e.expr, table)
    if isinstance(e, A.Call):
        return any(_has_table_ref(a, table) for a in e.args)
    if isinstance(e, A.IsNull):
        return _has_table_ref(e.expr, table)
    return False


def _fold_delta(expr: A.Expr, table: str, col: str) -> Optional[tuple[A.Expr, bool]]:
    """Match `T.col + delta` / `delta + T.col` / `T.col - delta` where delta
    has no table refs -> (delta, negate). None if not the fold shape."""
    if not isinstance(expr, A.Binary) or expr.op not in ("+", "-"):
        return None

    def is_self(e: A.Expr) -> bool:
        return isinstance(e, A.Ref) and e.stream == table and e.name == col

    if is_self(expr.left) and not _has_table_ref(expr.right, table):
        return expr.right, expr.op == "-"
    if expr.op == "+" and is_self(expr.right) and not _has_table_ref(expr.left, table):
        return expr.left, False
    return None


def apply_dml(
    table_df: DataFrame,
    stream_df: DataFrame,
    dml: A.TableDML,
    extensions: Optional[dict] = None,
) -> DataFrame:
    """Return the table's new state after applying `dml` fed by `stream_df`
    (the DML query's select output, plus an optional ``__ord`` event-time
    column used for replay ordering)."""
    extensions = extensions or {}
    pairs = _split_equi(dml.on, dml.table) if dml.on is not None else []
    if not pairs:
        raise SiddhiPlannerException(f"{dml.kind} {dml.table}: missing 'on' condition")

    plain = ExprCompiler(lambda r: F.col(r.name), extensions)
    key_cols = [f"__k{i}" for i in range(len(pairs))]
    s = stream_df
    for kc, (_, expr) in zip(key_cols, pairs):
        s = s.withColumn(kc, plain.compile(expr))

    t = table_df.alias("t")
    tcols = table_df.columns
    ttypes = dict(table_df.dtypes)

    if dml.kind == "delete":
        keys = s.select(*key_cols).distinct().alias("s")
        cond = [F.col(f"t.{tc}").eqNullSafe(F.col(f"s.{kc}")) for (tc, _), kc in zip(pairs, key_cols)]
        return t.join(keys, cond, "left_anti").select(*tcols)

    # classify the set clause: value columns (last writer) vs fold columns
    folds: dict[str, tuple[A.Expr, bool]] = {}
    values: dict[str, A.Expr] = {}
    if dml.set_items:
        for tgt, expr in dml.set_items:
            if tgt.stream != dml.table:
                raise SiddhiPlannerException(
                    f"set target {tgt.stream}.{tgt.name}: expected {dml.table}.<col>"
                )
            if tgt.name not in tcols:
                raise SiddhiPlannerException(f"set target {dml.table}.{tgt.name}: no such column")
            fd = _fold_delta(expr, dml.table, tgt.name)
            if fd is not None:
                folds[tgt.name] = fd
            elif _has_table_ref(expr, dml.table):
                raise UnsupportedFeatureException(
                    f"set {dml.table}.{tgt.name}: only `T.c = expr` (last-writer) or "
                    f"`T.c = T.c ± delta` (fold) set shapes distribute"
                )
            else:
                values[tgt.name] = expr
    else:
        for c in tcols:
            if c in stream_df.columns and c != ORD_COL:
                values[c] = A.Ref(None, c)

    # ONE keyed aggregation: last/first event struct + all fold sums
    scols = [c for c in s.columns if c not in key_cols]
    ord_cols = ([ORD_COL] if ORD_COL in s.columns else []) + [
        c for c in scols if c != ORD_COL
    ]
    ord_struct = F.struct(*[F.col(c) for c in ord_cols])
    row_struct = F.struct(*[F.col(c) for c in scols])
    aggs = [
        F.max_by(row_struct, ord_struct).alias("__last"),
        F.min_by(row_struct, ord_struct).alias("__first"),
        F.count(F.lit(1)).alias("__cnt"),
    ]
    fold_cols = list(folds)
    for i, c in enumerate(fold_cols):
        delta, neg = folds[c]
        d = plain.compile(delta)
        d = -d if neg else d
        aggs.append(F.sum(d).alias(f"__d{i}"))
        aggs.append(F.min_by(d, ord_struct).alias(f"__dfirst{i}"))
    s_agg = s.groupBy(*key_cols).agg(*aggs).withColumn(MARK, F.lit(1)).alias("s")

    # set/select exprs over "the stream" mean the last writer's row
    def last_resolver(r: A.Ref) -> Column:
        if r.stream == dml.table:
            return F.col(f"t.{r.name}")
        return F.col(f"s.__last.{r.name}")

    lcomp = ExprCompiler(last_resolver, extensions)

    cond = [F.col(f"t.{tc}").eqNullSafe(F.col(f"s.{kc}")) for (tc, _), kc in zip(pairs, key_cols)]
    matched = F.col(f"s.{MARK}").isNotNull()
    joined = t.join(s_agg, cond, "left")
    out_cols = []
    for c in tcols:
        if c in values:
            new_v = lcomp.compile(values[c]).cast(ttypes[c])
            out_cols.append(F.when(matched, new_v).otherwise(F.col(f"t.{c}")).alias(c))
        elif c in folds:
            i = fold_cols.index(c)
            new_v = (F.col(f"t.{c}") + F.col(f"s.__d{i}")).cast(ttypes[c])
            out_cols.append(F.when(matched, new_v).otherwise(F.col(f"t.{c}")).alias(c))
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    updated = joined.select(*out_cols)

    if dml.kind == "update":
        return updated

    # upsert-insert: keys with no table row. Sequential replay = the FIRST
    # event inserts (its column value seeds the row), later events update:
    #   value cols -> last writer;  fold cols -> seed + (sum - first delta).
    anti = s_agg.join(t, cond, "left_anti").alias("s")
    key_for = {tc: kc for (tc, _), kc in zip(pairs, key_cols)}
    ins_cols = []
    for c in tcols:
        col: Optional[Column] = None
        if c in folds:
            if c not in stream_df.columns:
                raise SiddhiPlannerException(
                    f"update or insert into {dml.table}: fold column '{c}' needs a "
                    f"same-named select-output column to seed inserted rows"
                )
            i = fold_cols.index(c)
            col = (
                F.col(f"s.__first.{c}")
                + F.col(f"s.__d{i}")
                - F.col(f"s.__dfirst{i}")
            )
        elif c in values:
            try:
                # last writer wins for value columns (seed then overwrite)
                col = lcompile_insert_last(values[c], dml.table, extensions)
            except SiddhiPlannerException:
                col = None  # expr needs the (absent) old row — fall back
        if col is None and c in stream_df.columns:
            col = F.col(f"s.__last.{c}")
        if col is None and c in key_for:
            col = F.col(f"s.{key_for[c]}")
        if col is None:
            raise SiddhiPlannerException(
                f"update or insert into {dml.table}: cannot derive column '{c}' "
                f"from the select output, set clause, or key condition"
            )
        ins_cols.append(col.cast(ttypes[c]).alias(c))
    inserts = anti.select(*ins_cols)
    return updated.unionByName(inserts)


def lcompile_insert_last(expr: A.Expr, table: str, extensions: dict) -> Column:
    """Value-shape set expr for inserted rows: last writer's stream values."""

    def resolve(r: A.Ref) -> Column:
        if r.stream == table:
            raise SiddhiPlannerException(f"unexpected table ref {table}.{r.name}")
        return F.col(f"s.__last.{r.name}")

    return ExprCompiler(resolve, extensions).compile(expr)
