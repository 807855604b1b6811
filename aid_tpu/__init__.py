"""aid_tpu — TPU-native attention-interpolation diffusion (AID / PAID).

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
QY-H00/attention-interpolation-diffusion (NeurIPS 2024, arXiv:2403.17924):
training-free text-to-image interpolation for latent diffusion models via
interpolated attention, redesigned TPU-first.

Key differences from the torch reference:
  * The whole denoising loop for an N-frame interpolation sequence is ONE
    jitted device program (lax.scan over steps, frames batched), instead of a
    host loop that monkey-patches attention processors every step.
  * The early/late processor switch and the warmup cutoff are static loop
    splits / traced masks, never host round-trips.
  * Interpolated attention (inner/outer x pure/fused x ip) is a single
    batched primitive with a per-frame coefficient vector, backed by a
    Pallas flash-attention kernel on TPU.
  * Multi-chip scaling via jax.sharding.Mesh (frames on the data axis,
    attention heads / channels on the model axis).
"""

__version__ = "0.1.0"

from aid_tpu import ops, models, schedulers, pipelines, prior, metrics, parallel

__all__ = [
    "ops",
    "models",
    "schedulers",
    "pipelines",
    "prior",
    "metrics",
    "parallel",
]
