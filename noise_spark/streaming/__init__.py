from .ingest import stream_ingest_pages, windowed_event_counts  # noqa: F401
