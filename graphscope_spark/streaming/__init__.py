from graphscope_spark.streaming.events import windowed_event_counts, stream_events

__all__ = ["windowed_event_counts", "stream_events"]
