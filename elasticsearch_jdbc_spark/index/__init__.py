from .build import IndexBuilder
from .query import IndexReader

__all__ = ["IndexBuilder", "IndexReader"]
