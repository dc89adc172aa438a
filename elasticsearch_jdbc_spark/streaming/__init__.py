from .incremental import incremental_index_stream, watermarked_event_counts

__all__ = ["incremental_index_stream", "watermarked_event_counts"]
