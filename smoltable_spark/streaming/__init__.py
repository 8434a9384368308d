from smoltable_spark.streaming.ingest import (
    stream_events,
    events_to_cells_stream,
    hourly_rollup_stream,
    running_stats_stream,
)

__all__ = [
    "stream_events",
    "events_to_cells_stream",
    "hourly_rollup_stream",
    "running_stats_stream",
]
