from aid_tpu.metrics.gini import (
    compute_gini,
    compute_smoothness_and_consistency,
    separate_source_and_interpolated_images,
)
from aid_tpu.metrics.lpips import LPIPS, VGG16Features, compute_lpips

__all__ = [
    "compute_gini",
    "compute_smoothness_and_consistency",
    "separate_source_and_interpolated_images",
    "LPIPS",
    "VGG16Features",
    "compute_lpips",
]
