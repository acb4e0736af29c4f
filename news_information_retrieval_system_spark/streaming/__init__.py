from .analytics import windowed_event_counts  # noqa: F401
from .ingest import hydrate_stream_index, stream_index  # noqa: F401
from .sessions import stream_sessionize  # noqa: F401
