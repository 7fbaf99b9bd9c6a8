from graphscope_spark.streaming.dedup import dedup_stream, stream_docs
from graphscope_spark.streaming.events import stream_events, windowed_event_counts
from graphscope_spark.streaming.incremental import (
    IncrementalPageRank,
    IncrementalTriangles,
    IncrementalWCC,
    stream_edges,
    triangle_delta,
)
from graphscope_spark.streaming.neardup import IncrementalNearDup
from graphscope_spark.streaming.trending import (
    trending_from_registers,
    windowed_cms_registers,
)

__all__ = [
    "dedup_stream",
    "stream_docs",
    "stream_events",
    "windowed_event_counts",
    "IncrementalPageRank",
    "IncrementalTriangles",
    "IncrementalWCC",
    "IncrementalNearDup",
    "stream_edges",
    "triangle_delta",
    "trending_from_registers",
    "windowed_cms_registers",
]
