from .build import IndexBuilder
from .incremental_index import IncrementalIndexReader, apply_incremental
from .query import IndexReader

__all__ = [
    "IndexBuilder",
    "IndexReader",
    "IncrementalIndexReader",
    "apply_incremental",
]
