"""Error surface, mirroring the reference's exception types.

Reference: /root/reference/core/src/main/java/org/apache/flink/streaming/siddhi/
exception/UndefinedStreamException.java and DuplicatedStreamException.java,
raised from SiddhiCEP.java:101-106,178-180.
"""

from __future__ import annotations


class SiddhiError(Exception):
    """Base class for all engine errors."""


class UndefinedStreamException(SiddhiError):
    """A query references a stream that was never registered/defined."""


class DuplicatedStreamException(SiddhiError):
    """A stream id was registered twice with conflicting definitions."""


class SiddhiParserException(SiddhiError):
    """SiddhiQL text failed to parse."""

    def __init__(self, message: str, line: int | None = None, col: int | None = None):
        loc = f" at line {line}:{col}" if line is not None else ""
        super().__init__(f"{message}{loc}")
        self.line = line
        self.col = col


class SiddhiPlannerException(SiddhiError):
    """Parsed query cannot be compiled to a DataFrame plan."""


class UnsupportedFeatureException(SiddhiPlannerException):
    """Feature is recognized but not implemented yet."""
