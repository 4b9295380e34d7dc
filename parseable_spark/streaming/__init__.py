"""Streaming layer — Structured Streaming ingest + livetail push.

The reference has no stream-query engine (SURVEY.md §2.5): "streaming"
there means the 60 s staging flush cycle, the last-5-min staging union
at query time, and a livetail broadcast channel. This package maps those
onto Spark Structured Streaming and adds the watermarked windowed
aggregations Spark gives us for free.
"""

from .ingest import (
    foreach_batch_sink,
    json_file_stream,
    late_data_filter,
    parquet_sink,
    windowed_counts,
)
from .livetail import LIVETAIL, LiveTail, Message
from .sketches import (
    compact_sketch_cube,
    query_sketch_cube,
    sketch_cube_batch_writer,
)
from .curator import StreamingCurator
from .ann_index import StreamingEmbeddingIndex
from .dedup_index import StreamingBloomGate, StreamingDedupIndex
from .stateful import alert_state_machine

__all__ = [
    "LIVETAIL",
    "LiveTail",
    "Message",
    "StreamingBloomGate",
    "StreamingCurator",
    "StreamingDedupIndex",
    "StreamingEmbeddingIndex",
    "alert_state_machine",
    "compact_sketch_cube",
    "foreach_batch_sink",
    "json_file_stream",
    "late_data_filter",
    "parquet_sink",
    "query_sketch_cube",
    "sketch_cube_batch_writer",
    "windowed_counts",
]
