"""flink_siddhi_spark: a PySpark-native CEP / streaming-analytics engine with
the query capabilities of haoch/flink-siddhi (SiddhiQL subset), re-architected
Spark-first: DataFrame/Catalyst for relational ops, Arrow-batched stateful
operators for patterns, Structured Streaming for streams.
"""

from .cep import ExecutionSiddhiStream, SiddhiCEP, SiddhiStream
from .errors import (
    DuplicatedStreamException,
    SiddhiError,
    SiddhiParserException,
    SiddhiPlannerException,
    UndefinedStreamException,
)
from .schema import StreamSchema

__version__ = "0.1.0"

__all__ = [
    "SiddhiCEP",
    "SiddhiStream",
    "ExecutionSiddhiStream",
    "StreamSchema",
    "SiddhiError",
    "SiddhiParserException",
    "SiddhiPlannerException",
    "UndefinedStreamException",
    "DuplicatedStreamException",
]
