"""Siddhi built-in function surface -> native Spark SQL functions.

The reference exposes siddhi-core 5.1 built-ins through `cql()` (SURVEY.md §2.B
"Scalar functions"); its own code only exercises the custom-extension path
(reference: SiddhiCEPITCase.java:403, extension/CustomPlusFunctionExtension.java).
Everything here compiles to JVM-side Catalyst expressions — no Python UDFs in
the hot path.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import SiddhiPlannerException

# aggregate function names (lower-cased)
AGG_FNS = {
    "sum", "count", "avg", "min", "max", "distinctcount", "stddev",
    "minforever", "maxforever", "first", "last",
}

_TYPE_ALIASES = {
    "int": "int", "integer": "int", "long": "bigint", "float": "float",
    "double": "double", "string": "string", "bool": "boolean",
}


def _cast(args: list[Column], raw_args: list) -> Column:
    if len(args) != 2:
        raise SiddhiPlannerException("convert/cast take (value, 'type')")
    ty = raw_args[1]
    if not isinstance(ty, str):
        raise SiddhiPlannerException("cast type must be a string literal")
    return args[0].cast(_TYPE_ALIASES.get(ty.lower(), ty.lower()))


def _if_then_else(args: list[Column], _raw) -> Column:
    return F.when(args[0], args[1]).otherwise(args[2])


def _simple(fn: Callable[..., Column]):
    return lambda args, _raw: fn(*args)


# (ns, name) -> builder(cols, raw_literal_args) -> Column.  ns=None is the
# default namespace; Siddhi 4/5 namespaced exts math: str: time: included.
SCALAR_FNS: dict[tuple[str | None, str], Callable] = {
    (None, "coalesce"): _simple(F.coalesce),
    (None, "ifthenelse"): _if_then_else,
    (None, "convert"): _cast,
    (None, "cast"): _cast,
    (None, "uuid"): lambda a, r: F.expr("uuid()"),
    (None, "currenttimemillis"): lambda a, r: F.unix_millis(F.current_timestamp()),
    (None, "round"): _simple(F.round),
    (None, "abs"): _simple(F.abs),
    (None, "instanceofinteger"): lambda a, r: a[0].cast("int").isNotNull(),
    (None, "instanceofstring"): lambda a, r: a[0].cast("string").isNotNull(),
    (None, "instanceoflong"): lambda a, r: a[0].cast("bigint").isNotNull(),
    (None, "instanceofdouble"): lambda a, r: a[0].cast("double").isNotNull(),
    (None, "instanceoffloat"): lambda a, r: a[0].cast("float").isNotNull(),
    (None, "instanceofboolean"): lambda a, r: a[0].cast("boolean").isNotNull(),
    (None, "maximum"): _simple(F.greatest),
    (None, "minimum"): _simple(F.least),
    (None, "default"): lambda a, r: F.coalesce(a[0], a[1]),
    (None, "sizeofset"): _simple(F.size),
}

for _n in ("abs", "ceil", "floor", "sqrt", "exp", "sin", "cos", "tan",
           "asin", "acos", "atan", "signum", "log10", "log2"):
    SCALAR_FNS[("math", _n)] = _simple(getattr(F, _n if _n != "signum" else "signum"))
SCALAR_FNS[("math", "round")] = _simple(F.round)
SCALAR_FNS[("math", "ln")] = _simple(F.log)
SCALAR_FNS[("math", "log")] = _simple(F.log)  # math:log(x) natural log
SCALAR_FNS[("math", "power")] = _simple(F.pow)
SCALAR_FNS[("math", "rand")] = lambda a, r: F.rand()

SCALAR_FNS.update({
    ("str", "concat"): _simple(F.concat),
    ("str", "length"): _simple(F.length),
    ("str", "lower"): _simple(F.lower),
    ("str", "upper"): _simple(F.upper),
    ("str", "trim"): _simple(F.trim),
    ("str", "contains"): lambda a, r: a[0].contains(a[1]),
    ("str", "startswith"): lambda a, r: a[0].startswith(a[1]),
    ("str", "endswith"): lambda a, r: a[0].endswith(a[1]),
    ("str", "replaceall"): _simple(F.regexp_replace),
    ("str", "reverse"): _simple(F.reverse),
    ("str", "repeat"): _simple(F.repeat),
    # siddhi str:substr(value, begin_index_0_based, length)
    ("str", "substr"): lambda a, r: F.substring(a[0], a[1] + F.lit(1), a[2]),
    ("str", "equalsignorecase"): lambda a, r: F.lower(a[0]) == F.lower(a[1]),
    ("str", "charat"): lambda a, r: F.substring(a[0], a[1] + F.lit(1), 1),
    ("str", "ltrim"): _simple(F.ltrim),
    ("str", "rtrim"): _simple(F.rtrim),
    ("str", "hex"): _simple(F.hex),
    ("str", "unhex"): lambda a, r: F.unhex(a[0]).cast("string"),
    ("str", "regexp"): lambda a, r: _regexp(a, r),
    ("str", "replacefirst"): lambda a, r: _replace_first(a, r),
    # siddhi str:split(value, regex, index) -> the index-th token
    ("str", "split"): lambda a, r: _split_at(a, r),
    ("str", "strcmp"): lambda a, r: F.when(a[0] < a[1], -1).when(a[0] > a[1], 1).otherwise(0),
    ("str", "coalesce"): _simple(F.coalesce),
    ("str", "fillnull"): lambda a, r: F.coalesce(a[0], a[1]),
    ("time", "extract"): lambda a, r: F.date_part(a[0], a[1]),
    ("time", "currenttimestamp"): lambda a, r: F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss"),
    ("time", "currentdate"): lambda a, r: F.date_format(F.current_date(), "yyyy-MM-dd"),
    ("time", "timestampinmilliseconds"): lambda a, r: (
        F.unix_millis(F.current_timestamp()) if not a
        else F.unix_millis(F.to_timestamp(a[0], r[1] if len(r) > 1 and isinstance(r[1], str)
                                          else "yyyy-MM-dd HH:mm:ss"))
    ),
    ("time", "dayofweek"): lambda a, r: F.date_format(F.timestamp_millis(a[0].cast("bigint")), "EEEE"),
    ("time", "date"): lambda a, r: F.date_format(F.timestamp_millis(a[0].cast("bigint")), "yyyy-MM-dd"),
    ("time", "dateformat"): lambda a, r: F.date_format(
        F.timestamp_millis(a[0].cast("bigint")), r[1] if isinstance(r[1], str) else "yyyy-MM-dd HH:mm:ss"
    ),
    ("time", "dateadd"): lambda a, r: a[0].cast("bigint") + a[1].cast("bigint"),
    ("time", "datesub"): lambda a, r: a[0].cast("bigint") - a[1].cast("bigint"),
    ("time", "datediff"): lambda a, r: a[0].cast("bigint") - a[1].cast("bigint"),
    ("time", "utctimestamp"): lambda a, r: F.date_format(
        F.to_utc_timestamp(F.current_timestamp(), "UTC"), "yyyy-MM-dd HH:mm:ss"
    ),
    # siddhi-execution-json surface (json:getString/getInt/... (json, path));
    # '$.' prefix optional, matching the extension's path convention
    ("json", "getstring"): lambda a, r: F.get_json_object(a[0], _jpath(r[1])),
    ("json", "getint"): lambda a, r: F.get_json_object(a[0], _jpath(r[1])).cast("int"),
    ("json", "getlong"): lambda a, r: F.get_json_object(a[0], _jpath(r[1])).cast("bigint"),
    ("json", "getdouble"): lambda a, r: F.get_json_object(a[0], _jpath(r[1])).cast("double"),
    ("json", "getbool"): lambda a, r: F.get_json_object(a[0], _jpath(r[1])).cast("boolean"),
    ("json", "isexists"): lambda a, r: F.get_json_object(a[0], _jpath(r[1])).isNotNull(),
})


def _jpath(p) -> str:
    if not isinstance(p, str):
        raise SiddhiPlannerException("json: path must be a string literal")
    return p if p.startswith("$") else "$." + p


def _regexp(args: list[Column], raw: list) -> Column:
    if not isinstance(raw[1], str):
        raise SiddhiPlannerException("str:regexp needs a literal pattern")
    return args[0].rlike(raw[1])


def _replace_first(args: list[Column], raw: list) -> Column:
    """Replace only the first regex match (Spark's regexp_replace replaces
    all, so anchor the pattern to the earliest occurrence)."""
    pat, rep = raw[1], raw[2]
    if not isinstance(pat, str) or not isinstance(rep, str):
        raise SiddhiPlannerException("str:replaceFirst needs literal pattern/replacement")
    rep_esc = rep.replace("\\", "\\\\").replace("$", "\\$")
    return F.regexp_replace(args[0], "(?s)^(.*?)(?:" + pat + ")", "$1" + rep_esc)


def _split_at(args: list[Column], raw: list) -> Column:
    if not isinstance(raw[1], str):
        raise SiddhiPlannerException("str:split needs a literal regex")
    idx = raw[2] if len(raw) > 2 and isinstance(raw[2], int) else 0
    # F.get, not getItem: an index past the split count yields null instead
    # of an ANSI ArrayIndexOutOfBounds killing the whole scan on one bad
    # row (same decision as the pattern resolvers' indexed bindings)
    return F.get(F.split(args[0], raw[1]), idx)


def lookup_scalar(ns: str | None, name: str):
    return SCALAR_FNS.get((ns.lower() if ns else None, name.lower()))
