from kadiyadb_spark.streaming.ingest import (
    compact_decisions,
    read_alerts,
    read_decisions,
    read_stream_rejects,
    stream_alerts,
    stream_dedup,
    stream_index_dedup,
    stream_interval_join,
    stream_track_agg,
    stream_track_agg_append,
    stream_track_raw,
)
from kadiyadb_spark.streaming.stateful import stream_sessionize

__all__ = [
    "stream_track_raw",
    "stream_track_agg",
    "stream_track_agg_append",
    "stream_dedup",
    "stream_alerts",
    "stream_index_dedup",
    "stream_interval_join",
    "stream_sessionize",
    "read_alerts",
    "read_decisions",
    "read_stream_rejects",
    "compact_decisions",
]
