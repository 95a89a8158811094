from .sessionize import sessionize_batch_twin, sessionize_stream
from .stateful import dedup_batch_twin, dedup_stream
from .watch import watch_pages
from .windowed import events_windowed_stream, windowed_counts

__all__ = [
    "dedup_batch_twin",
    "dedup_stream",
    "events_windowed_stream",
    "sessionize_batch_twin",
    "sessionize_stream",
    "watch_pages",
    "windowed_counts",
]
