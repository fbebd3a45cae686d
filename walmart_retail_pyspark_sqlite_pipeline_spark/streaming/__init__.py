from .events import asof_last_event, hourly_counts_stream, sessionize

__all__ = ["sessionize", "hourly_counts_stream", "asof_last_event"]
