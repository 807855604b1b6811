from aid_tpu.schedulers.base import SchedulerConfig
from aid_tpu.schedulers.ddim import DDIMScheduler
from aid_tpu.schedulers.euler import EulerDiscreteScheduler
from aid_tpu.schedulers.unipc import UniPCScheduler

__all__ = [
    "SchedulerConfig",
    "DDIMScheduler",
    "EulerDiscreteScheduler",
    "UniPCScheduler",
]
