from acmil_tpu.utils.logging import MetricLogger, SmoothedValue, MetricsWriter
from acmil_tpu.utils.seed import set_seed
from acmil_tpu.utils.profiling import profile_trace, StepTimer

__all__ = [
    "MetricLogger",
    "SmoothedValue",
    "MetricsWriter",
    "set_seed",
    "profile_trace",
    "StepTimer",
]
