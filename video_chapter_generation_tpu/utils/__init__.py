"""Host utilities: memory tracking, caching, profiling."""

from .memory import (
    CacheManager,
    MemoryManager,
    SystemMemoryTracker,
    device_memory_mb,
    host_memory_mb,
)
from .profiling import Stopwatch, annotate, device_trace

__all__ = [
    "CacheManager",
    "MemoryManager",
    "SystemMemoryTracker",
    "device_memory_mb",
    "host_memory_mb",
    "Stopwatch",
    "annotate",
    "device_trace",
]
