"""Recursive-descent parser: SiddhiQL subset text -> Plan AST.

Covers the language surface in SURVEY.md §2.B: define stream/table, filters,
windows (#window.*), joins (inner/left/right/full + within), group by / having /
order by / limit / offset, patterns (`every A -> B`, strict sequences with `,`,
quantifiers + ? * <n:m>, within, absence `not X for t`), partition blocks
(`partition with (k of S) begin ... end`), and `insert into`.

Example (reference SiddhiCEPITCase.java:344-347):
    from every s1 = inputStream1[id == 2] -> s2 = inputStream2[id == 3]
    select s1.id as id_1, s2.id as id_2 insert into outputStream
"""

from __future__ import annotations

from ..errors import SiddhiParserException, UnsupportedFeatureException
from . import ast as A
from .lexer import TIME_UNITS, Token, tokenize

_SELECT_END = {"group", "having", "order", "limit", "offset", "insert", "output", "delete", "update"}


class Parser:
    def __init__(self, text: str):
        self.toks: list[Token] = tokenize(text)
        self.i = 0

    # ------------------------------------------------------------- utilities
    @property
    def cur(self) -> Token:
        return self.toks[self.i]

    def peek(self, k: int = 1) -> Token:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def error(self, msg: str) -> SiddhiParserException:
        t = self.cur
        return SiddhiParserException(f"{msg} (got {t.kind} {t.text!r})", t.line, t.col)

    def at_kw(self, *words: str) -> bool:
        return self.cur.kind == "KEYWORD" and self.cur.text.lower() in words

    def accept_kw(self, *words: str) -> bool:
        if self.at_kw(*words):
            self.i += 1
            return True
        return False

    def expect_kw(self, word: str) -> None:
        if not self.accept_kw(word):
            raise self.error(f"expected '{word}'")

    def at(self, kind: str, text: str | None = None) -> bool:
        return self.cur.kind == kind and (text is None or self.cur.text == text)

    def accept(self, kind: str, text: str | None = None) -> bool:
        if self.at(kind, text):
            self.i += 1
            return True
        return False

    def expect(self, kind: str, text: str | None = None) -> Token:
        if not self.at(kind, text):
            raise self.error(f"expected {text or kind}")
        t = self.cur
        self.i += 1
        return t

    def ident(self) -> str:
        if self.cur.kind == "ID":
            t = self.cur
            self.i += 1
            return t.text
        raise self.error("expected identifier")

    # ------------------------------------------------------------------ plan
    def parse_plan(self) -> A.Plan:
        plan = A.Plan()
        while not self.at("EOF"):
            if self.accept("PUNCT", ";"):
                continue
            if self.at_kw("define"):
                nxt = self.peek().text.lower() if self.peek().kind == "ID" else ""
                if nxt == "aggregation":
                    plan.aggregations.append(self.parse_define_aggregation())
                elif nxt == "trigger":
                    plan.triggers.append(self.parse_define_trigger())
                else:
                    plan.definitions.append(self.parse_define())
            elif self.at_kw("partition"):
                plan.queries.extend(self.parse_partition_block())
            elif self.at_kw("from"):
                plan.queries.append(self.parse_query())
            else:
                raise self.error("expected 'define', 'partition' or 'from'")
        return plan

    def parse_define(self) -> A.StreamDef:
        self.expect_kw("define")
        is_table = self.at_kw("table")
        if not self.accept_kw("table"):
            self.expect_kw("stream")
        name = self.ident()
        self.expect("PUNCT", "(")
        attrs = []
        while True:
            an = self.ident()
            at = self.ident() if self.cur.kind == "ID" else self.expect("KEYWORD").text
            attrs.append(A.AttributeDef(an, at.lower()))
            if not self.accept("PUNCT", ","):
                break
        self.expect("PUNCT", ")")
        return A.StreamDef(name, attrs, is_table=is_table)

    _GRANS = ["sec", "min", "hour", "day", "month", "year"]
    _GRAN_ALIASES = {
        "sec": "sec", "second": "sec", "seconds": "sec",
        "min": "min", "minute": "min", "minutes": "min",
        "hour": "hour", "hours": "hour",
        "day": "day", "days": "day",
        "month": "month", "months": "month",
        "year": "year", "years": "year",
    }

    def _gran(self) -> str:
        t = self.cur
        if t.kind in ("ID", "KEYWORD") and t.text.lower() in self._GRAN_ALIASES:
            self.i += 1
            return self._GRAN_ALIASES[t.text.lower()]
        raise self.error("expected a granularity (sec/min/hour/day/month/year)")

    def parse_define_aggregation(self) -> A.AggregationDef:
        """`define aggregation N from S select ... group by ... aggregate
        [by ts] every sec...year` (Siddhi incremental aggregation)."""
        self.expect_kw("define")
        self.i += 1  # 'aggregation' (lexes as ID)
        name = self.ident()
        self.expect_kw("from")
        inp = self.parse_stream_ref()
        self.expect_kw("select")
        select = self.parse_select_list()
        group_by: list[A.Expr] = []
        if self.accept_kw("group"):
            self.expect_kw("by")
            group_by.append(self.parse_expr())
            while self.accept("PUNCT", ","):
                group_by.append(self.parse_expr())
        if not (self.cur.kind == "ID" and self.cur.text.lower() == "aggregate"):
            raise self.error("expected 'aggregate'")
        self.i += 1
        ts_ref = None
        if self.accept_kw("by"):
            e = self.parse_primary()
            if not isinstance(e, A.Ref):
                raise self.error("aggregate by: expected an attribute")
            ts_ref = e
        self.expect_kw("every")
        first = self._gran()
        grans = [first]
        if self.accept("PUNCT", "."):  # 'sec...year' range
            self.expect("PUNCT", ".")
            self.expect("PUNCT", ".")
            last = self._gran()
            lo, hi = self._GRANS.index(first), self._GRANS.index(last)
            if hi < lo:
                raise self.error("granularity range must be increasing")
            grans = self._GRANS[lo:hi + 1]
        else:
            while self.accept("PUNCT", ","):
                grans.append(self._gran())
        return A.AggregationDef(name, inp, select, group_by, ts_ref, grans)

    def parse_define_trigger(self) -> A.TriggerDef:
        """`define trigger T at every <t>` (Siddhi trigger — tick stream)."""
        self.expect_kw("define")
        self.i += 1  # 'trigger' (lexes as ID)
        name = self.ident()
        if not (self.cur.kind == "ID" and self.cur.text.lower() == "at"):
            raise self.error("expected 'at'")
        self.i += 1
        self.expect_kw("every")
        return A.TriggerDef(name, self.parse_time_duration())

    def parse_partition_block(self) -> list[A.Query]:
        self.expect_kw("partition")
        self.expect_kw("with")
        self.expect("PUNCT", "(")
        part: dict[str, str] = {}
        while True:
            attr = self.ident()
            self.expect_kw("of")
            stream = self.ident()
            part[stream] = attr
            if not self.accept("PUNCT", ","):
                break
        self.expect("PUNCT", ")")
        self.expect_kw("begin")
        queries = []
        while not self.at_kw("end"):
            if self.accept("PUNCT", ";"):
                continue
            q = self.parse_query()
            q.partition_by = dict(part)
            queries.append(q)
        self.expect_kw("end")
        return queries

    # ----------------------------------------------------------------- query
    def parse_query(self) -> A.Query:
        self.expect_kw("from")
        inp = self.parse_input()
        # aggregation read: `from AggName within a[, b] per 'unit'`
        agg_within = None
        agg_per = None
        if isinstance(inp, A.SingleInput) and self.at_kw("within"):
            self.i += 1
            lo = self.parse_expr()
            hi = None
            if self.accept("PUNCT", ","):
                hi = self.parse_expr()
            agg_within = (lo, hi)
        if isinstance(inp, A.SingleInput) and self.cur.kind == "ID" and self.cur.text.lower() == "per":
            self.i += 1
            lit = self.parse_primary()
            if not (isinstance(lit, A.Literal) and lit.kind == "string"):
                raise self.error("per: expected a granularity string literal")
            agg_per = str(lit.value)
        select = None
        if self.accept_kw("select"):
            select = self.parse_select_list()
        q = A.Query(input=inp, select=select, agg_within=agg_within, agg_per=agg_per)
        if self.accept_kw("group"):
            self.expect_kw("by")
            q.group_by.append(self.parse_expr())
            while self.accept("PUNCT", ","):
                q.group_by.append(self.parse_expr())
        if self.accept_kw("having"):
            q.having = self.parse_expr()
        if self.accept_kw("order"):
            self.expect_kw("by")
            while True:
                e = self.parse_expr()
                desc = bool(self.accept_kw("desc")) or (self.accept_kw("asc") and False)
                q.order_by.append(A.OrderItem(e, desc))
                if not self.accept("PUNCT", ","):
                    break
        if self.accept_kw("limit"):
            q.limit = int(self.expect("NUMBER").text)
        if self.accept_kw("offset"):
            q.offset = int(self.expect("NUMBER").text)
        if self.accept_kw("output"):
            mode = "all"
            if self.accept_kw("snapshot"):
                mode = "snapshot"
            elif self.accept_kw("all"):
                mode = "all"
            elif self.cur.kind == "ID" and self.cur.text.lower() in ("first", "last"):
                mode = self.cur.text.lower()
                self.i += 1
            self.expect_kw("every")
            n = int(self.expect("NUMBER").text)
            if self.cur.kind == "ID" and self.cur.text.lower() in ("event", "events"):
                self.i += 1
                q.output_rate = (mode, "events", n)
            else:
                t = self.cur
                if t.kind in ("ID", "KEYWORD") and t.text.lower() in TIME_UNITS:
                    self.i += 1
                    q.output_rate = (mode, "ms", n * TIME_UNITS[t.text.lower()])
                else:
                    raise self.error("expected 'events' or a time unit")
        if self.accept_kw("insert"):
            for kind in ("all", "current", "expired"):
                if self.accept_kw(kind):
                    if not (self.cur.kind == "ID" and self.cur.text.lower() == "events"):
                        raise self.error("expected 'events'")
                    self.i += 1
                    q.output_event_type = kind
                    break
            self.expect_kw("into")
            q.insert_into = self.ident()
        elif self.at_kw("update", "delete"):
            q.dml = self.parse_table_dml()
        else:
            # SiddhiQL requires an output action — fail at parse time, not
            # when returns() later misses the stream name
            raise self.error(
                "query needs an output action: 'insert into <stream>', "
                "'update ...' or 'delete ...'"
            )
        return q

    def parse_table_dml(self) -> A.TableDML:
        """`delete T on cond` | `update T [set T.c = e, ...] on cond` |
        `update or insert into T [set ...] on cond` (Siddhi event-table DML,
        reference README.md:26 "Event Tables")."""
        if self.accept_kw("delete"):
            table = self.ident()
            self.expect_kw("on")
            return A.TableDML("delete", table, on=self.parse_expr())
        self.expect_kw("update")
        kind = "update"
        if self.accept_kw("or"):
            self.expect_kw("insert")
            self.expect_kw("into")
            kind = "upsert"
        table = self.ident()
        set_items: list[tuple[A.Ref, A.Expr]] = []
        if self.accept_kw("set"):
            while True:
                tgt = self.parse_primary()
                if not isinstance(tgt, A.Ref):
                    raise self.error("set target must be Table.column")
                self.expect("OP", "=")
                set_items.append((tgt, self.parse_expr()))
                if not self.accept("PUNCT", ","):
                    break
        self.expect_kw("on")
        return A.TableDML(kind, table, set_items=set_items, on=self.parse_expr())

    # ----------------------------------------------------------------- input
    def parse_input(self) -> A.InputSpec:
        if self._looks_like_pattern():
            return self.parse_pattern()
        left = self.parse_stream_ref()
        if self.at_kw("join", "left", "right", "full", "inner", "unidirectional"):
            return self.parse_join(left)
        if self.at("ARROW") or self.at("PUNCT", ","):
            # un-aliased pattern: rewind is unnecessary — build from `left`
            elem = A.PatternElem(stream=left.stream, alias=left.alias, filter=left.filter)
            return self.parse_pattern_rest([elem], every=False)
        return left

    def _looks_like_pattern(self) -> bool:
        if self.at_kw("every", "not"):
            return True
        # alias '=' Stream
        return self.cur.kind == "ID" and self.peek().kind == "OP" and self.peek().text == "="

    def parse_stream_ref(self) -> A.SingleInput:
        stream = self.ident()
        filt = None
        if self.accept("PUNCT", "["):
            filt = self.parse_expr()
            self.expect("PUNCT", "]")
        win = None
        stream_fns: list[A.WindowSpec] = []

        def parse_args() -> list:
            args: list[A.Expr] = []
            self.expect("PUNCT", "(")
            if not self.at("PUNCT", ")"):
                args.append(self.parse_expr())
                while self.accept("PUNCT", ","):
                    args.append(self.parse_expr())
            self.expect("PUNCT", ")")
            return args

        while self.accept("PUNCT", "#"):
            if self.at_kw("window"):
                if win is not None:
                    raise self.error("at most one #window per stream")
                self.i += 1
                self.expect("PUNCT", ".")
                wname = self.ident()
                if self.accept("PUNCT", ":"):  # extension window  ns:name
                    wname = f"{wname}:{self.ident()}"
                win = A.WindowSpec(wname, parse_args())
            else:
                # stream-function handler  #ns:fn(args)
                ns = self.ident()
                self.expect("PUNCT", ":")
                stream_fns.append(A.WindowSpec(f"{ns}:{self.ident()}", parse_args()))
        alias = None
        if self.accept_kw("as"):
            alias = self.ident()
        return A.SingleInput(stream, filt, win, alias, tuple(stream_fns))

    def parse_join(self, left: A.SingleInput) -> A.JoinInput:
        self.accept_kw("unidirectional")
        jt = "inner"
        if self.accept_kw("left"):
            self.accept_kw("outer")
            jt = "left"
        elif self.accept_kw("right"):
            self.accept_kw("outer")
            jt = "right"
        elif self.accept_kw("full"):
            self.accept_kw("outer")
            jt = "full"
        elif self.accept_kw("inner"):
            jt = "inner"
        self.expect_kw("join")
        right = self.parse_stream_ref()
        on = None
        if self.accept_kw("on"):
            on = self.parse_expr()
        within = None
        if self.accept_kw("within"):
            within = self.parse_time_duration()
        return A.JoinInput(left, right, jt, on, within)

    # --------------------------------------------------------------- pattern
    def parse_pattern(self) -> A.PatternInput:
        every = self.accept_kw("every")
        first = self.parse_pattern_step()
        return self.parse_pattern_rest([first], every)

    def parse_pattern_step(self) -> "A.PatternStep":
        elem = self.parse_pattern_elem()
        if self.at_kw("and", "or"):
            op = self.cur.text.lower()
            self.i += 1
            other = self.parse_pattern_elem()
            return A.PatternGroup(op, [elem, other])
        return elem

    def parse_pattern_rest(self, elems: list[A.PatternElem], every: bool) -> A.PatternInput:
        connectors: list[str] = []
        every_at: int | None = None
        while True:
            if self.accept("ARROW"):
                connectors.append("->")
            elif self.at("PUNCT", ",") and not self._comma_is_pattern_connector():
                break
            elif self.accept("PUNCT", ","):
                connectors.append(",")
            else:
                break
            if self.accept_kw("every"):
                # Siddhi's mid-pattern 'every' (suffix restart): record the
                # step index it prefixes; the NFA re-arms the suffix from here
                # for every qualifying event once the prefix has matched.
                if every_at is not None:
                    raise UnsupportedFeatureException(
                        "only one mid-pattern 'every' is supported"
                    )
                if connectors[-1] != "->":
                    raise UnsupportedFeatureException(
                        "mid-pattern 'every' requires a preceding '->' "
                        "(a strict ',' admits exactly one suffix event, which "
                        "contradicts 'every')"
                    )
                every_at = len(elems)
            step = self.parse_pattern_step()
            if every_at == len(elems):
                bad = step.elems[0] if isinstance(step, A.PatternGroup) else step
                if bad.negated:
                    raise UnsupportedFeatureException(
                        "'every not ...' is not supported mid-pattern"
                    )
            elems.append(step)
        within = None
        if self.accept_kw("within"):
            within = self.parse_time_duration()
        return A.PatternInput(elems, connectors, every, within, every_at)

    def _comma_is_pattern_connector(self) -> bool:
        # lookahead after ',': pattern elem starts with [not|every] or ID ('='|'[')
        j = self.i + 1
        t = self.toks[j]
        if t.kind == "KEYWORD" and t.text.lower() in ("not", "every"):
            return True
        if t.kind == "ID":
            n = self.toks[min(j + 1, len(self.toks) - 1)]
            return (n.kind == "OP" and n.text == "=") or (n.kind == "PUNCT" and n.text == "[")
        return False

    def parse_pattern_elem(self) -> A.PatternElem:
        if self.accept_kw("not"):
            stream = self.ident()
            filt = None
            if self.accept("PUNCT", "["):
                filt = self.parse_expr()
                self.expect("PUNCT", "]")
            for_ms = None
            if self.accept_kw("for"):
                for_ms = self.parse_time_duration()
            return A.PatternElem(stream, None, filt, negated=True, for_ms=for_ms)
        alias = None
        if self.cur.kind == "ID" and self.peek().kind == "OP" and self.peek().text == "=":
            alias = self.ident()
            self.expect("OP", "=")
        stream = self.ident()
        filt = None
        if self.accept("PUNCT", "["):
            filt = self.parse_expr()
            self.expect("PUNCT", "]")
        mn, mx = 1, 1
        if self.accept("OP", "+"):
            mn, mx = 1, None
        elif self.accept("OP", "*"):
            mn, mx = 0, None
        elif self.accept("PUNCT", "?"):
            mn, mx = 0, 1
        elif self.at("OP", "<") and self.peek().kind == "NUMBER":
            self.expect("OP", "<")
            mn = int(self.expect("NUMBER").text)
            self.expect("PUNCT", ":")
            mx = int(self.expect("NUMBER").text)
            self.expect("OP", ">")
        return A.PatternElem(stream, alias, filt, mn, mx)

    # ----------------------------------------------------------- expressions
    def parse_time_duration(self) -> int:
        tok = self.expect("NUMBER")
        total = 0
        n = int(tok.text.rstrip("lL"))
        unit = self._accept_time_unit()
        if unit is None:
            return n  # bare number = milliseconds (Siddhi window.time(500))
        total += n * unit
        while self.cur.kind == "NUMBER":
            save = self.i
            n2 = int(self.expect("NUMBER").text.rstrip("lL"))
            u2 = self._accept_time_unit()
            if u2 is None:
                self.i = save
                break
            total += n2 * u2
        return total

    def _accept_time_unit(self) -> int | None:
        if self.cur.kind == "ID" and self.cur.text.lower() in TIME_UNITS:
            # not a function call like min(...)
            if not (self.peek().kind == "PUNCT" and self.peek().text == "("):
                u = TIME_UNITS[self.cur.text.lower()]
                self.i += 1
                return u
        return None

    def parse_select_list(self) -> list[A.SelectItem] | None:
        if self.accept("OP", "*"):
            return None
        items = [self.parse_select_item()]
        while self.accept("PUNCT", ","):
            items.append(self.parse_select_item())
        return items

    def parse_select_item(self) -> A.SelectItem:
        e = self.parse_expr()
        alias = None
        if self.accept_kw("as"):
            alias = self.ident()
        return A.SelectItem(e, alias)

    def parse_expr(self) -> A.Expr:
        return self.parse_or()

    def parse_or(self) -> A.Expr:
        e = self.parse_and()
        while self.accept_kw("or"):
            e = A.Binary("or", e, self.parse_and())
        return e

    def parse_and(self) -> A.Expr:
        e = self.parse_not()
        while self.accept_kw("and"):
            e = A.Binary("and", e, self.parse_not())
        return e

    def parse_not(self) -> A.Expr:
        if self.accept_kw("not"):
            return A.Unary("not", self.parse_not())
        return self.parse_cmp()

    def parse_cmp(self) -> A.Expr:
        e = self.parse_add()
        while True:
            if self.cur.kind == "OP" and self.cur.text in ("==", "!=", "<", "<=", ">", ">="):
                op = self.cur.text
                self.i += 1
                e = A.Binary(op, e, self.parse_add())
            elif self.at_kw("is"):
                self.i += 1
                neg = self.accept_kw("not")
                self.expect_kw("null")
                e = A.IsNull(e, neg)
            elif self.at_kw("in"):
                self.i += 1
                e = A.InTable(e, self.ident())
            else:
                return e

    def parse_add(self) -> A.Expr:
        e = self.parse_mul()
        while self.cur.kind == "OP" and self.cur.text in ("+", "-"):
            op = self.cur.text
            self.i += 1
            e = A.Binary(op, e, self.parse_mul())
        return e

    def parse_mul(self) -> A.Expr:
        e = self.parse_unary()
        while self.cur.kind == "OP" and self.cur.text in ("*", "/", "%"):
            op = self.cur.text
            self.i += 1
            e = A.Binary(op, e, self.parse_unary())
        return e

    def parse_unary(self) -> A.Expr:
        if self.accept("OP", "-"):
            return A.Unary("-", self.parse_unary())
        return self.parse_primary()

    def parse_primary(self) -> A.Expr:
        t = self.cur
        if t.kind == "NUMBER":
            self.i += 1
            unit = self._accept_time_unit()
            if unit is not None:
                total = int(t.text) * unit
                while self.cur.kind == "NUMBER":
                    save = self.i
                    n2 = int(self.expect("NUMBER").text)
                    u2 = self._accept_time_unit()
                    if u2 is None:
                        self.i = save
                        break
                    total += n2 * u2
                return A.Literal(total, "time")
            return self._num_literal(t.text)
        if t.kind == "STRING":
            self.i += 1
            raw = t.text[1:-1]
            return A.Literal(raw.replace("\\'", "'").replace('\\"', '"').replace("\\\\", "\\"), "string")
        if self.at_kw("true"):
            self.i += 1
            return A.Literal(True, "bool")
        if self.at_kw("false"):
            self.i += 1
            return A.Literal(False, "bool")
        if self.at_kw("null"):
            self.i += 1
            return A.Literal(None, "null")
        if self.accept("PUNCT", "("):
            e = self.parse_expr()
            self.expect("PUNCT", ")")
            return e
        if t.kind == "ID":
            name = self.ident()
            # namespaced call  ns:fn(...)
            if self.at("PUNCT", ":") and self.peek().kind == "ID":
                self.i += 1
                fn = self.ident()
                return self._call(name, fn)
            if self.at("PUNCT", "("):
                return self._call(None, name)
            # indexed pattern ref: s1[0].name
            if self.at("PUNCT", "[") and self.peek().kind == "NUMBER":
                self.i += 1
                idx = int(self.expect("NUMBER").text)
                self.expect("PUNCT", "]")
                self.expect("PUNCT", ".")
                field = self.ident()
                return A.Ref(name, field, idx)
            if self.accept("PUNCT", "."):
                field = self.ident()
                return A.Ref(name, field)
            return A.Ref(None, name)
        raise self.error("expected expression")

    def _call(self, ns: str | None, fn: str) -> A.Call:
        self.expect("PUNCT", "(")
        args: list[A.Expr] = []
        distinct = False
        if not self.at("PUNCT", ")"):
            if self.cur.kind == "ID" and self.cur.text.lower() == "distinct":
                distinct = True
                self.i += 1
            args.append(self.parse_expr())
            while self.accept("PUNCT", ","):
                args.append(self.parse_expr())
        self.expect("PUNCT", ")")
        return A.Call(ns, fn, args, distinct=distinct)

    @staticmethod
    def _num_literal(text: str) -> A.Literal:
        suffix = text[-1] if text[-1] in "lLfFdD" else ""
        core = text[:-1] if suffix else text
        if suffix in ("l", "L"):
            return A.Literal(int(core), "long")
        if suffix in ("f", "F"):
            return A.Literal(float(core), "float")
        if suffix in ("d", "D"):
            return A.Literal(float(core), "double")
        if "." in core or "e" in core or "E" in core:
            return A.Literal(float(core), "double")
        v = int(core)
        return A.Literal(v, "int" if -(2**31) <= v < 2**31 else "long")


def parse(text: str) -> A.Plan:
    return Parser(text).parse_plan()


def parse_query(text: str) -> A.Query:
    plan = parse(text)
    if len(plan.queries) != 1:
        raise SiddhiParserException(f"expected exactly one query, found {len(plan.queries)}")
    return plan.queries[0]
