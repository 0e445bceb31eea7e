from plume_spark.streaming.ingest import (
    read_transcript_stream,
    stream_build,
    stream_turn_counts,
)
from plume_spark.streaming.dedup import (
    DedupIndex,
    fold_batch,
    read_document_stream,
    stream_dedup,
)
from plume_spark.streaming.stateful import ordered_turn_release, stream_sessionize

__all__ = [
    "read_transcript_stream",
    "stream_build",
    "stream_turn_counts",
    "DedupIndex",
    "fold_batch",
    "read_document_stream",
    "stream_dedup",
    "ordered_turn_release",
    "stream_sessionize",
]
