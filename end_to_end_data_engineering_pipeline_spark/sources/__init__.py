from .rest import (  # noqa: F401
    Fetcher,
    FetchResult,
    Location,
    ingest_batch,
    synthetic_fetcher,
)
