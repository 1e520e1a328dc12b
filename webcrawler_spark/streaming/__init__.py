from webcrawler_spark.streaming.ingest import (  # noqa: F401
    drain_available_now,
    exact_dedup_counts_stream,
    stream_table,
    windowed_event_stats,
)
from webcrawler_spark.streaming.sessionize import (  # noqa: F401
    sessionize_stream,
)
