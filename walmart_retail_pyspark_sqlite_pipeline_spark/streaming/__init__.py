from .events import hourly_counts_stream, sessionize

__all__ = ["sessionize", "hourly_counts_stream"]
