from aid_tpu.models import configs
from aid_tpu.models.configs import (
    UNetConfig,
    VAEConfig,
    CLIPTextConfig,
    CLIPVisionConfig,
)
from aid_tpu.models.layers import AidContext, AidMode
from aid_tpu.models.unet import UNet2DCondition
from aid_tpu.models.vae import AutoencoderKL
from aid_tpu.models.clip import CLIPTextModel, CLIPVisionModel

__all__ = [
    "configs",
    "UNetConfig",
    "VAEConfig",
    "CLIPTextConfig",
    "CLIPVisionConfig",
    "AidContext",
    "AidMode",
    "UNet2DCondition",
    "AutoencoderKL",
    "CLIPTextModel",
    "CLIPVisionModel",
]
