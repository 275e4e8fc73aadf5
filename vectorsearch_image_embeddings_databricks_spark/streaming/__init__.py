from .refresh import ContinuousRollup, IncrementalIndexer  # noqa: F401
from .windows import (  # noqa: F401
    dedup_stream,
    interval_join_streams,
    sessionize_stream,
    sliding_counts,
    tumbling_counts,
    with_event_time,
)
