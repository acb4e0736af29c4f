from .ingest import hydrate_stream_index, stream_index  # noqa: F401
