"""Sinks: backend abstraction (K1) + parquet/JDBC/memory implementations."""

from .base import Sink, SinkResult  # noqa: F401
from .parquet_sink import ParquetSink  # noqa: F401
from .memory_sink import MemorySink  # noqa: F401
