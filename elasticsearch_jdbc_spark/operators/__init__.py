from . import cc, dedup, fold, incremental, sampling, similarity

__all__ = ["fold", "dedup", "similarity", "incremental", "sampling", "cc"]
