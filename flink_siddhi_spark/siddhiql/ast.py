"""Dataclass AST for the SiddhiQL subset (IR #1 of the compiler).

The grammar covers the language surface inventoried in SURVEY.md §2.B —
the SiddhiQL 5.1 constructs the reference exposes through ``cql(...)``
(reference: README.md:16-27, core/.../package-info.java:18-41).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union

# ---------------------------------------------------------------- expressions


@dataclass
class Literal:
    value: object
    kind: str  # 'int' | 'long' | 'float' | 'double' | 'string' | 'bool' | 'null' | 'time'


@dataclass
class Ref:
    """Attribute reference: ``name``, ``stream.name`` or ``stream[idx].name``."""

    stream: Optional[str]
    name: str
    index: Optional[int] = None  # pattern collection index: s1[0].name


@dataclass
class Call:
    ns: Optional[str]  # extension namespace 'math' in math:sin(...)
    name: str
    args: list["Expr"] = field(default_factory=list)
    distinct: bool = False  # count(distinct x) — not Siddhi syntax, kept for API


@dataclass
class Unary:
    op: str  # 'not' | '-'
    expr: "Expr"


@dataclass
class Binary:
    op: str  # 'or','and','==','!=','<','<=','>','>=','+','-','*','/','%'
    left: "Expr"
    right: "Expr"


@dataclass
class IsNull:
    expr: "Expr"
    negated: bool = False


@dataclass
class InTable:
    expr: "Expr"
    table: str


Expr = Union[Literal, Ref, Call, Unary, Binary, IsNull, InTable]

# --------------------------------------------------------------------- inputs


@dataclass
class WindowSpec:
    name: str  # length | lengthBatch | time | timeBatch | session | externalTime | sort | ...
    args: list[Expr] = field(default_factory=list)


@dataclass
class SingleInput:
    stream: str
    filter: Optional[Expr] = None
    window: Optional[WindowSpec] = None
    alias: Optional[str] = None
    # stream-function handlers (#ns:fn(args)) applied in order between the
    # filter and the window; reuses WindowSpec as the (name, args) carrier
    stream_fns: tuple = ()

    @property
    def name(self) -> str:
        return self.alias or self.stream


@dataclass
class JoinInput:
    left: SingleInput
    right: SingleInput
    join_type: str = "inner"  # inner | left | right | full
    on: Optional[Expr] = None
    within_ms: Optional[int] = None


@dataclass
class PatternElem:
    """One step of a pattern/sequence: ``alias = Stream[filter]<quantifier>``."""

    stream: str
    alias: Optional[str] = None
    filter: Optional[Expr] = None
    min_count: int = 1
    max_count: Optional[int] = 1  # None = unbounded (+ / *)
    negated: bool = False  # 'not Stream[filter]' absence (with for_ms or followed-by)
    for_ms: Optional[int] = None  # 'not X for 5 sec'

    @property
    def is_collection(self) -> bool:
        return self.max_count is None or self.max_count > 1


@dataclass
class PatternGroup:
    """Logical step: ``A and B`` (both, any order) / ``A or B`` (either)."""

    op: str  # 'and' | 'or'
    elems: list[PatternElem] = field(default_factory=list)


PatternStep = Union[PatternElem, PatternGroup]


@dataclass
class PatternInput:
    """steps joined by connectors: '->' (followed-by, relaxed) or ',' (strict)."""

    elems: list[PatternStep]
    connectors: list[str]  # len == len(elems) - 1
    every: bool = False
    within_ms: Optional[int] = None
    # mid-pattern 'every' (Siddhi suffix-restart): index of the step the
    # 'every' keyword prefixes — once the steps before it have matched, the
    # suffix starting here restarts for every qualifying event. None = no
    # mid-pattern every (leading 'every' is the boolean above).
    every_at: Optional[int] = None


InputSpec = Union[SingleInput, JoinInput, PatternInput]

# ------------------------------------------------------------------ queries


@dataclass
class SelectItem:
    expr: Expr
    alias: Optional[str] = None


@dataclass
class OrderItem:
    expr: Expr
    desc: bool = False


@dataclass
class TableDML:
    """Event-table mutation clause (Siddhi `update/delete/update or insert`).

    ``on`` references table columns as ``Table.col`` and stream (query output)
    columns unqualified; ``set_items`` are ``Table.col = <expr over output>``.
    """

    kind: str  # 'update' | 'delete' | 'upsert'
    table: str
    set_items: list[tuple["Ref", "Expr"]] = field(default_factory=list)
    on: Optional["Expr"] = None


@dataclass
class Query:
    input: InputSpec
    select: Optional[list[SelectItem]]  # None => select *
    group_by: list[Expr] = field(default_factory=list)
    having: Optional[Expr] = None
    order_by: list[OrderItem] = field(default_factory=list)
    limit: Optional[int] = None
    offset: Optional[int] = None
    insert_into: Optional[str] = None
    dml: Optional[TableDML] = None  # update/delete/upsert into an event table
    # aggregation reads: `from AggName within a[, b] per 'unit' select ...`
    agg_within: Optional[tuple[Expr, Optional[Expr]]] = None
    agg_per: Optional[str] = None
    # `output [first|last|all|snapshot] every N events | <duration>`:
    # (mode, 'events'|'ms', n)
    output_rate: Optional[tuple[str, str, int]] = None
    output_event_type: str = "current"  # current | all | expired
    partition_by: dict[str, str] = field(default_factory=dict)  # stream -> attr


@dataclass
class AttributeDef:
    name: str
    dtype: str


@dataclass
class StreamDef:
    name: str
    attrs: list[AttributeDef]
    is_table: bool = False


@dataclass
class AggregationDef:
    """`define aggregation N from S select ... group by ... aggregate by ts
    every sec...year` — Siddhi incremental aggregation (multi-granularity
    time rollup)."""

    name: str
    input: SingleInput
    select: list[SelectItem]
    group_by: list[Expr] = field(default_factory=list)
    ts_ref: Optional[Ref] = None  # `aggregate by <attr>`; None = event time
    granularities: list[str] = field(default_factory=list)  # 'sec'..'year'


@dataclass
@dataclass
class TriggerDef:
    """`define trigger T at every <t>` — synthetic tick stream with one
    column ``triggered_time`` (epoch ms)."""

    name: str
    period_ms: int


@dataclass
class Plan:
    definitions: list[StreamDef] = field(default_factory=list)
    aggregations: list[AggregationDef] = field(default_factory=list)
    triggers: list[TriggerDef] = field(default_factory=list)
    queries: list[Query] = field(default_factory=list)
