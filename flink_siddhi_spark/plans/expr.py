"""Expression compiler: SiddhiQL AST expression -> Spark Column (Catalyst).

Everything stays JVM-side; custom extensions registered via
``SiddhiCEP.register_extension`` may be column-builders (preferred) or Python
callables (wrapped as UDFs — documented slow path).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import SiddhiPlannerException, UnsupportedFeatureException
from ..siddhiql import ast as A
from .functions import AGG_FNS, lookup_scalar

_BIN_OPS = {
    "or": lambda l, r: l | r,
    "and": lambda l, r: l & r,
    "==": lambda l, r: l == r,
    "!=": lambda l, r: l != r,
    "<": lambda l, r: l < r,
    "<=": lambda l, r: l <= r,
    ">": lambda l, r: l > r,
    ">=": lambda l, r: l >= r,
    "+": lambda l, r: l + r,
    "-": lambda l, r: l - r,
    "*": lambda l, r: l * r,
    "/": lambda l, r: l / r,
    "%": lambda l, r: l % r,
}


class AggregateExtension:
    """Marks a registered extension as an attribute AGGREGATOR (the reference
    forwards these to Siddhi's setExtension — SiddhiCEP.java:201-206,
    exercised for scalars by CustomPlusFunctionExtension.java:38-116).

    The builder receives compiled argument Columns and must return a Spark
    AGGREGATE Column, e.g. ``lambda c: F.exp(F.avg(F.log(c)))`` — composed of
    built-in aggregate functions so it stays JVM-side."""

    def __init__(self, fn):
        self.fn = fn


# names registered as aggregate extensions (module-level so the parser-side
# has_agg checks, which are static, can see them)
AGG_EXT_NAMES: set[str] = set()


def ext_key(e: A.Call) -> str:
    return f"{e.ns}:{e.name}" if e.ns else e.name


def contains_agg(e: A.Expr) -> bool:
    if isinstance(e, A.Call):
        if e.ns is None and e.name.lower() in AGG_FNS:
            return True
        if ext_key(e) in AGG_EXT_NAMES:
            return True
        return any(contains_agg(a) for a in e.args)
    if isinstance(e, A.Binary):
        return contains_agg(e.left) or contains_agg(e.right)
    if isinstance(e, (A.Unary, A.IsNull)):
        return contains_agg(e.expr)
    return False


def raw_literal(e: A.Expr):
    """Python value of a literal arg (for cast('type') style args)."""
    return e.value if isinstance(e, A.Literal) else None


class ExprCompiler:
    def __init__(
        self,
        resolver: Callable[[A.Ref], Column],
        extensions: Optional[dict] = None,
        agg_handler: Optional[Callable[[A.Call, "ExprCompiler"], Column]] = None,
        ts_col: Optional[Column] = None,
        in_table_handler: Optional[Callable[[A.InTable, "ExprCompiler"], Column]] = None,
    ):
        self.resolver = resolver
        self.extensions = extensions or {}
        self.agg_handler = agg_handler
        self.ts_col = ts_col
        self.in_table_handler = in_table_handler

    def compile(self, e: A.Expr) -> Column:
        if isinstance(e, A.Literal):
            if e.kind == "null":
                return F.lit(None)
            if e.kind == "time":
                return F.lit(int(e.value))
            if e.kind == "long":
                return F.lit(e.value).cast("bigint")
            if e.kind == "float":
                return F.lit(e.value).cast("float")
            return F.lit(e.value)
        if isinstance(e, A.Ref):
            return self.resolver(e)
        if isinstance(e, A.Unary):
            c = self.compile(e.expr)
            return ~c if e.op == "not" else -c
        if isinstance(e, A.Binary):
            return _BIN_OPS[e.op](self.compile(e.left), self.compile(e.right))
        if isinstance(e, A.IsNull):
            c = self.compile(e.expr)
            return c.isNotNull() if e.negated else c.isNull()
        if isinstance(e, A.InTable):
            if self.in_table_handler is None:
                raise UnsupportedFeatureException("'in <table>' not available here")
            return self.in_table_handler(e, self)
        if isinstance(e, A.Call):
            return self._call(e)
        raise SiddhiPlannerException(f"cannot compile expression: {e!r}")

    def _call(self, e: A.Call) -> Column:
        name = e.name.lower()
        if e.ns is None and name in AGG_FNS:
            if self.agg_handler is None:
                raise SiddhiPlannerException(
                    f"aggregate function {e.name}() not allowed in this clause"
                )
            return self.agg_handler(e, self)
        if e.ns is None and name == "eventtimestamp":
            if self.ts_col is None:
                raise SiddhiPlannerException("eventTimestamp() needs an event-time column")
            return self.ts_col
        ext = self.extensions.get(ext_key(e))
        if isinstance(ext, AggregateExtension):
            if self.agg_handler is None:
                raise SiddhiPlannerException(
                    f"aggregate extension {ext_key(e)}() not allowed in this clause"
                )
            return self.agg_handler(e, self)
        if ext is not None:
            return ext(*[self.compile(a) for a in e.args])
        fn = lookup_scalar(e.ns, e.name)
        if fn is None:
            raise UnsupportedFeatureException(
                f"unknown function {(e.ns + ':') if e.ns else ''}{e.name}"
            )
        cols = [self.compile(a) for a in e.args]
        raws = [raw_literal(a) for a in e.args]
        return fn(cols, raws)
