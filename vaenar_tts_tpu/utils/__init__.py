from .checkpoint import CheckpointManager
from .logging import Logger, MetricsWriter, StepTimer
from .metrics import batch_summary, mcd, mel_l1, mel_l2
from .prefetch import prefetch
from .profiling import RetraceMonitor, profile_trace

__all__ = [
    "CheckpointManager",
    "Logger",
    "MetricsWriter",
    "StepTimer",
    "batch_summary",
    "mcd",
    "mel_l1",
    "mel_l2",
    "prefetch",
    "RetraceMonitor",
    "profile_trace",
]
