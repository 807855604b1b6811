from aid_tpu.schedulers.base import SchedulerConfig
from aid_tpu.schedulers.ddim import DDIMScheduler
from aid_tpu.schedulers.euler import EulerDiscreteScheduler
from aid_tpu.schedulers.pndm import PNDMScheduler
from aid_tpu.schedulers.unipc import UniPCScheduler
from aid_tpu.schedulers.edm_dpm import EDMDPMSolverScheduler

__all__ = [
    "SchedulerConfig",
    "DDIMScheduler",
    "EulerDiscreteScheduler",
    "PNDMScheduler",
    "UniPCScheduler",
    "EDMDPMSolverScheduler",
]
