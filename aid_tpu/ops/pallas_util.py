"""Shared Pallas/Mosaic plumbing for the ops kernels."""

from __future__ import annotations

from typing import Optional

from jax.experimental.pallas import tpu as pltpu

# The default ~16-23 MB scoped-vmem budget rejects resident whole-stream
# attention blocks and (3,3,Cin,Cout) conv weights at the shapes these
# kernels run; a v5e core has 128 MB of VMEM, so every kernel raises the
# cap to the same proven value.
VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def compiler_params(*dimension_semantics: str) -> Optional[object]:
    """CompilerParams with the shared VMEM cap, or None on older pallas
    versions whose CompilerParams lacks the fields (TypeError)."""
    try:
        return pltpu.CompilerParams(
            dimension_semantics=dimension_semantics,
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        )
    except TypeError:
        return None
