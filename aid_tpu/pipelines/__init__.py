from aid_tpu.pipelines.interpolation import InterpolationPipeline
from aid_tpu.pipelines import engine

__all__ = ["InterpolationPipeline", "engine"]
