from plume_spark.streaming.ingest import (
    read_transcript_stream,
    stream_build,
    stream_turn_counts,
)

__all__ = ["read_transcript_stream", "stream_build", "stream_turn_counts"]
