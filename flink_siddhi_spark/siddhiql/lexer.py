"""Regex tokenizer for the SiddhiQL subset."""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..errors import SiddhiParserException

TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+)
  | (?P<COMMENT>--[^\n]*|/\*.*?\*/)
  | (?P<NUMBER>\d+\.\d+(?:[eE][+-]?\d+)?[fFdD]?|\d+(?:[eE][+-]?\d+)?[lLfFdD]?)
  | (?P<STRING>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<ARROW>->)
  | (?P<OP>==|!=|<=|>=|[<>+\-*/%=])
  | (?P<ID>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<PUNCT>[()\[\],;.#:?])
    """,
    re.VERBOSE | re.DOTALL,
)

# time-unit -> milliseconds (SiddhiQL time constants)
TIME_UNITS = {
    "millisecond": 1, "milliseconds": 1, "ms": 1, "millisec": 1,
    "second": 1000, "seconds": 1000, "sec": 1000,
    "minute": 60_000, "minutes": 60_000, "min": 60_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "day": 86_400_000, "days": 86_400_000,
    "week": 604_800_000, "weeks": 604_800_000,
    "month": 2_592_000_000, "months": 2_592_000_000,
    "year": 31_536_000_000, "years": 31_536_000_000,
}

KEYWORDS = {
    "define", "stream", "table", "from", "select", "insert", "into", "group",
    "by", "having", "order", "limit", "offset", "as", "on", "join", "left",
    "right", "full", "outer", "inner", "within", "every", "and", "or", "not",
    "in", "is", "null", "asc", "desc", "current", "expired", "all",
    "partition", "with", "begin", "end", "for", "of", "true", "false",
    "unidirectional", "window", "output", "snapshot", "delete", "update",
    "set",
}


@dataclass
class Token:
    kind: str  # NUMBER STRING ARROW OP ID PUNCT KEYWORD EOF
    text: str
    line: int
    col: int


def tokenize(text: str) -> list[Token]:
    toks: list[Token] = []
    pos, line, line_start = 0, 1, 0
    while pos < len(text):
        m = TOKEN_RE.match(text, pos)
        if not m:
            raise SiddhiParserException(
                f"unexpected character {text[pos]!r}", line, pos - line_start + 1
            )
        kind = m.lastgroup
        val = m.group()
        col = pos - line_start + 1
        if kind in ("WS", "COMMENT"):
            nl = val.count("\n")
            if nl:
                line += nl
                line_start = pos + val.rfind("\n") + 1
        elif kind == "ID":
            k = "KEYWORD" if val.lower() in KEYWORDS else "ID"
            toks.append(Token(k, val, line, col))
        else:
            toks.append(Token(kind, val, line, col))
        pos = m.end()
    toks.append(Token("EOF", "", line, pos - line_start + 1))
    return toks
