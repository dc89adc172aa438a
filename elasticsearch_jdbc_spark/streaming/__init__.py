from .dedup import stream_exact_dedup, stream_key_dedup
from .incremental import incremental_index_stream, watermarked_event_counts
from .percolate import stream_percolate

__all__ = [
    "incremental_index_stream",
    "watermarked_event_counts",
    "stream_exact_dedup",
    "stream_key_dedup",
    "stream_percolate",
]
