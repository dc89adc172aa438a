from . import dedup, fold, incremental, similarity

__all__ = ["fold", "dedup", "similarity", "incremental"]
