from kadiyadb_spark.streaming.ingest import (
    read_alerts,
    stream_alerts,
    stream_dedup,
    stream_track_agg,
    stream_track_agg_append,
    stream_track_raw,
)

__all__ = [
    "stream_track_raw",
    "stream_track_agg",
    "stream_track_agg_append",
    "stream_dedup",
    "stream_alerts",
    "read_alerts",
]
