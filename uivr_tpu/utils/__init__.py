from .profiling import PhaseTimer, ThroughputMeter, xla_trace  # noqa: F401
