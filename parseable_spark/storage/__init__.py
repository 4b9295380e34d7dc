"""Storage: partitioned sorted Parquet sink + stream lifecycle."""

from .store import StreamStore
from .writer import write_stream_batch

__all__ = ["StreamStore", "write_stream_batch"]
