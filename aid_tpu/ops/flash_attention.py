"""Pallas TPU flash kernel for the interpolated-attention family.

One kernel covers the whole AID family (reference interpolation.py:548-804)
without materializing attention logits in HBM:

  * ``self``        — vanilla flash attention (deactivated processors)
  * ``pure_outer``  — two online-softmax accumulator sets, one attending the
                      begin-endpoint K/V and one the end-endpoint K/V,
                      blended by the per-frame coefficient at the end
  * ``fused_outer`` — same, but the frame's own K/V blocks update BOTH
                      accumulator sets first (logical concat [K_i; K_*],
                      reference interpolation.py:643-649, with no
                      materialized concat; the shared self-block scores are
                      computed ONCE and reused for both endpoints)
  * ``pure_inner`` / ``fused_inner`` — endpoint K/V blocks lerped on the fly
                      in VMEM (K_x = (1-c) K_b + c K_e, interpolation.py:771-775)

Structure: grid (B, H, q_blocks, kv_steps) where kv_steps walks the frame's
own K/V blocks first (fused modes) and then the endpoint K/V blocks; the
online-softmax state (m, l, acc) lives in VMEM scratch persisted across the
sequential innermost grid dimension.

vs the jnp reference (ops.attention): fused-outer self-attention at SD1.5
512px materializes 2 x (B,H,4096,8192) float32 logit tensors (~6 GB HBM
traffic per layer); here scores never leave VMEM. Numerics: f32 scores on
the MXU, f32 online softmax, probabilities cast to input dtype for the PV
matmul, f32 accumulators.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aid_tpu.ops.attention import AttnMode

NEG_INF = -1e30
LANES = 128


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(
    # scalar-prefetch
    kv_len_ref,  # (1,) valid own-KV length
    ep_len_ref,  # (1,) valid endpoint-KV length
    coef_ref,  # (B,) f32
    # inputs
    q_ref,  # (1, 1, bq, Dp)
    k_ref,  # (1, 1, bk, Dp)  own-KV block (stale outside self phase)
    v_ref,
    kb_ref,  # (1, bk, Dp)    endpoint blocks (stale during self phase)
    vb_ref,
    ke_ref,
    ve_ref,
    # output
    o_ref,  # (1, 1, bq, Dp)
    # scratch
    m_ref,  # (2, bq, LANES) f32
    l_ref,  # (2, bq, LANES) f32
    acc_ref,  # (2, bq, Dp) f32
    *,
    mode: AttnMode,
    scale: float,
    block_k: int,
    n_self: int,
    n_steps: int,
):
    j = pl.program_id(3)
    b = pl.program_id(0)
    bq, Dp = q_ref.shape[2], q_ref.shape[3]
    n_sets = 2 if mode.is_outer else 1
    c = coef_ref[b]

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]
    is_self_phase = j < n_self  # traced; n_self is static (0 for pure modes)

    def scores(k_blk, base, valid):
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        return jnp.where(col + base < valid, s, NEG_INF)

    def update(idx, s, v_blk):
        m_old = m_ref[idx, :, :1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_ref[idx, :, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[idx] = acc_ref[idx] * alpha + pv
        m_ref[idx] = jnp.broadcast_to(m_new, (bq, LANES))
        l_ref[idx] = jnp.broadcast_to(l_new, (bq, LANES))

    if n_self > 0:
        @pl.when(is_self_phase)
        def _self_phase():
            base = j * block_k
            s = scores(k_ref[0, 0], base, kv_len_ref[0])
            v_blk = v_ref[0, 0]
            update(0, s, v_blk)
            if n_sets == 2:
                update(1, s, v_blk)  # reuses the same scores

    @pl.when(jnp.logical_not(is_self_phase))
    def _endpoint_phase():
        base = (j - n_self) * block_k
        valid = ep_len_ref[0]
        if mode.is_outer:
            update(0, scores(kb_ref[0], base, valid), vb_ref[0])
            update(1, scores(ke_ref[0], base, valid), ve_ref[0])
        else:  # inner (or the cross sweep of fused_inner)
            kx = ((1.0 - c) * kb_ref[0].astype(jnp.float32)
                  + c * ke_ref[0].astype(jnp.float32)).astype(q.dtype)
            vx = ((1.0 - c) * vb_ref[0].astype(jnp.float32)
                  + c * ve_ref[0].astype(jnp.float32)).astype(q.dtype)
            update(0, scores(kx, base, valid), vx)

    @pl.when(j == n_steps - 1)
    def _finalize():
        out0 = acc_ref[0] / l_ref[0, :, :1]
        if mode.is_outer:
            out1 = acc_ref[1] / l_ref[1, :, :1]
            out = (1.0 - c) * out0 + c * out1
        else:
            out = out0
        o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "scale", "block_q", "block_k", "interpret"),
)
def flash_interpolated_attention(
    q: jnp.ndarray,  # (B, H, Sq, D)
    k: jnp.ndarray,  # (B, H, Lk, D)
    v: jnp.ndarray,
    coef: Optional[jnp.ndarray] = None,  # (B,)
    mode: AttnMode | str = AttnMode.SELF,
    k_begin: Optional[jnp.ndarray] = None,  # (H, Le, D); default k[0]
    v_begin: Optional[jnp.ndarray] = None,
    k_end: Optional[jnp.ndarray] = None,  # default k[-1]
    v_end: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash interpolated attention (see module docstring).

    Endpoint tensors default to batch rows 0 / B-1 of k/v (reference
    interpolation.py:627-630).
    """
    mode = AttnMode(mode)
    B, H, Sq, D = q.shape
    Lk = k.shape[2]
    if scale is None:
        scale = D ** -0.5
    if coef is None:
        coef = jnp.zeros((B,), jnp.float32)
    if k_begin is None:
        k_begin, v_begin = k[0], v[0]
    elif k_begin.ndim == 4:  # (B,H,L,D) given; rows identical by construction
        k_begin, v_begin = k_begin[0], v_begin[0]
    if k_end is None:
        k_end, v_end = k[-1], v[-1]
    elif k_end.ndim == 4:
        k_end, v_end = k_end[-1], v_end[-1]
    Le = k_begin.shape[1]

    Dp = _ceil_to(D, LANES)
    block_q = min(block_q, _ceil_to(Sq, LANES))
    block_k = min(block_k, _ceil_to(max(Lk, Le), LANES))
    Sqp = _ceil_to(Sq, block_q)
    Lkp = _ceil_to(Lk, block_k)
    Lep = _ceil_to(Le, block_k)

    def pad(x, s_axis, target_s):
        pads = [(0, 0)] * x.ndim
        pads[s_axis] = (0, target_s - x.shape[s_axis])
        pads[-1] = (0, Dp - D)
        return jnp.pad(x, pads)

    qp = pad(q, 2, Sqp)
    kp, vp = pad(k, 2, Lkp), pad(v, 2, Lkp)
    kbp, vbp = pad(k_begin, 1, Lep), pad(v_begin, 1, Lep)
    kep, vep = pad(k_end, 1, Lep), pad(v_end, 1, Lep)

    n_self = 0 if mode in (AttnMode.PURE_OUTER, AttnMode.PURE_INNER) else Lkp // block_k
    n_ep = 0 if mode == AttnMode.SELF else Lep // block_k
    n_steps = n_self + n_ep

    kernel = functools.partial(
        _kernel,
        mode=mode,
        scale=float(scale),
        block_k=block_k,
        n_self=n_self,
        n_steps=n_steps,
    )

    def clamp(x, hi):
        return jnp.clip(x, 0, hi)

    n_self_m1 = max(n_self - 1, 0)
    n_ep_m1 = max(n_ep - 1, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, H, Sqp // block_q, n_steps),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, i, j, *_: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, Dp), lambda b, h, i, j, *_: (b, h, clamp(j, n_self_m1), 0)),
            pl.BlockSpec((1, 1, block_k, Dp), lambda b, h, i, j, *_: (b, h, clamp(j, n_self_m1), 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, h, i, j, *_: (h, clamp(j - n_self, n_ep_m1), 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, h, i, j, *_: (h, clamp(j - n_self, n_ep_m1), 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, h, i, j, *_: (h, clamp(j - n_self, n_ep_m1), 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, h, i, j, *_: (h, clamp(j - n_self, n_ep_m1), 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, i, j, *_: (b, h, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, block_q, LANES), jnp.float32),
            pltpu.VMEM((2, block_q, LANES), jnp.float32),
            pltpu.VMEM((2, block_q, Dp), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Sqp, Dp), q.dtype),
        interpret=interpret,
    )(
        jnp.array([Lk], jnp.int32),
        jnp.array([Le], jnp.int32),
        coef.astype(jnp.float32),
        qp, kp, vp, kbp, vbp, kep, vep,
    )
    return out[:, :, :Sq, :D]
