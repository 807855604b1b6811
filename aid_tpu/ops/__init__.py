from aid_tpu.ops.interp import (
    lerp,
    slerp,
    linear_interpolation,
    spherical_interpolation,
    generate_beta_schedule,
    beta_ppf,
    beta_cdf,
)
from aid_tpu.ops.attention import (
    AttnMode,
    interpolated_attention,
    attention,
)

__all__ = [
    "lerp",
    "slerp",
    "linear_interpolation",
    "spherical_interpolation",
    "generate_beta_schedule",
    "beta_ppf",
    "beta_cdf",
    "AttnMode",
    "interpolated_attention",
    "attention",
]
