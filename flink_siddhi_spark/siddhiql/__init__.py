from . import ast
from .parser import parse, parse_query

__all__ = ["ast", "parse", "parse_query"]
