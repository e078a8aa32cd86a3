"""slimsearch_spark — a PySpark-native distributed full-text index build +
BM25 query engine with the query surface of Mister-Hope/slimsearch.

Not a port: the reference is a single-process radix-tree engine; this is a
DataFrame-first pipeline (postings tables, broadcast term-expansion joins,
Catalyst-optimized BM25 column math, distributed top-k).
"""

from .config import (AND, AND_NOT, OR, WILDCARD, AutoSuggestOptions,
                     IndexConfig, IndexLayout, SearchOptions)

__all__ = [
    "AND", "AND_NOT", "OR", "WILDCARD",
    "AutoSuggestOptions", "IndexConfig", "IndexLayout", "SearchOptions",
]
__version__ = "0.1.0"
