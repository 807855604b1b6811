"""Pallas TPU 3x3 stride-1 SAME convolution (shift-and-accumulate in VMEM).

Motivation (PERF.md round-2/3): XLA's implicit-GEMM conv reaches only
78-83 TF/s on the UNet's level-0 class (ch320 @ 128x128 spatial, the
SD/SDXL high-resolution resnets) and the one-shot im2col alternative ties
because it materializes a 9x patch tensor in HBM (~660 MB round trip per
conv). This kernel is the im2col GEMM *without the patch tensor*: each
(row-strip) block loads the input once into VMEM and accumulates the nine
shifted (TH*W, Cin) @ (Cin, Cout) products on the MXU in f32.

The dy row shifts are expressed as THREE non-overlapping row-strip views
of the padded input (top/mid/bottom), sidestepping Pallas' no-overlap
block indexing; the dx column shifts are in-VMEM sublane slices. Weights
(3,3,Cin,Cout) stay resident across the whole grid (constant index map —
the pipeline skips re-fetch). Param layout is HWIO like nn.Conv, so
checkpoint converters are untouched (used by models.layers.Conv3x3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from aid_tpu.ops.pallas_util import compiler_params


def _kernel(x0_ref, x1_ref, x2_ref, w_ref, b_ref, o_ref, *, TH: int, W: int):
    rows_by_dy = (x0_ref, x1_ref, x2_ref)
    cin = x0_ref.shape[-1]
    acc = None
    for dy in range(3):
        rows = rows_by_dy[dy][0]  # (TH, W+2, Cin)
        for dx in range(3):
            xs = rows[:, dx:dx + W, :].reshape(TH * W, cin)
            t = jax.lax.dot_general(
                xs, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
    out = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = out.reshape(TH, W, -1).astype(o_ref.dtype)


def _kernel_packed(x0_ref, x1_ref, x2_ref, w_ref, b_ref, o_ref, *, TH: int, W: int):
    """Packed-K variant: per dy, concatenate the three dx column-shifts along
    the channel (lane) dim in VMEM and issue ONE (TH*W, 3*Cin) @ (3*Cin, Cout)
    dot. vs the 9-dot kernel: K=3*Cin pads to one lane-tile boundary instead
    of three (e.g. Cin=320: 960->1024 = 8 tiles vs 3x384 = 9), and the MXU
    sees 3 long-K dots per block instead of 9 short ones (less pipeline
    drain). The concat is an in-VMEM copy of the x block (3x per dy).

    The dx slices are reshaped to 2D BEFORE the lane-dim concatenate:
    3D slices carry mismatched layout offsets from the column shift and
    Mosaic rejects tpu.concatenate on offset-mismatched non-concat dims
    ("result/input offset mismatch"); the 2D reshape normalizes each
    operand's layout first (verified compiling on v5e, 2026-08-18)."""
    rows_by_dy = (x0_ref, x1_ref, x2_ref)
    cin = x0_ref.shape[-1]
    acc = None
    for dy in range(3):
        rows = rows_by_dy[dy][0]  # (TH, W+2, Cin)
        xs = jnp.concatenate(
            [rows[:, dx:dx + W, :].reshape(TH * W, cin) for dx in range(3)],
            axis=-1,
        )
        t = jax.lax.dot_general(
            xs, w_ref[dy], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = t if acc is None else acc + t
    out = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = out.reshape(TH, W, -1).astype(o_ref.dtype)


def _kernel_packed_gnsilu(x0_ref, x1_ref, x2_ref, w_ref, b_ref, sc_ref, sh_ref,
                          o_ref, *, TH: int, W: int, H: int):
    """Packed-K kernel with a fused GroupNorm+SiLU prologue.

    The caller passes the RAW resnet input (zero-padded) plus per-(batch,
    channel) affine factors sc/sh folding the GN statistics and gamma/beta
    (scale = gamma * rsqrt(var+eps), shift = beta - mean*scale); the kernel
    applies ``silu(x*sc + sh)`` in VMEM before the shift-pack-dot. This
    skips the separate normalize+SiLU HBM round trip XLA pays because it
    cannot fuse elementwise work into its conv library call (PERF.md r3gn_*:
    0.40/0.23/0.06 ms per call at ch320/640/1280).

    SAME-padding correctness: conv pads AFTER norm+act, so pad positions
    must stay zero *after* the prologue (silu(shift) != 0). Each dy view's
    block row j is padded-tensor row i*TH + dy + j; rows 0 and H+1 and
    columns 0 and W+1 of the padded tensor are re-zeroed via iota masks.
    """
    rows_by_dy = (x0_ref, x1_ref, x2_ref)
    cin = x0_ref.shape[-1]
    i = pl.program_id(1)
    sc = sc_ref[0].astype(jnp.float32)  # (1, Cin)
    sh = sh_ref[0].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (TH, W + 2, 1), 1)
    col_ok = (col >= 1) & (col <= W)
    acc = None
    for dy in range(3):
        raw = rows_by_dy[dy][0]  # (TH, W+2, Cin)
        a = raw.astype(jnp.float32) * sc[None] + sh[None]
        a = a * jax.nn.sigmoid(a)
        row = jax.lax.broadcasted_iota(jnp.int32, (TH, W + 2, 1), 0) + i * TH + dy
        ok = col_ok & (row >= 1) & (row <= H)
        rows = jnp.where(ok, a, 0.0).astype(raw.dtype)
        # 2D reshape before the lane concat — see _kernel_packed
        xs = jnp.concatenate(
            [rows[:, dx:dx + W, :].reshape(TH * W, cin) for dx in range(3)],
            axis=-1,
        )
        t = jax.lax.dot_general(
            xs, w_ref[dy], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = t if acc is None else acc + t
    out = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = out.reshape(TH, W, -1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret", "packed"))
def conv3x3_same(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                 block_rows: int = 8, interpret: bool = False,
                 packed: bool = False) -> jnp.ndarray:
    """y = conv2d(x, w, stride 1, SAME) + b.

    x: (B, H, W, Cin); w: (3, 3, Cin, Cout) HWIO; b: (Cout,).
    H must be a multiple of ``block_rows``. Accumulates f32, returns x.dtype.
    ``packed`` selects the packed-K kernel (one K=3*Cin dot per dy).
    """
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, Cin), w.shape
    assert H % block_rows == 0, (H, block_rows)
    TH = block_rows

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # three non-overlapping row-strip views; view dy covers input rows
    # [i*TH + dy, i*TH + dy + TH) of the padded tensor for output strip i
    views = [jax.lax.slice_in_dim(xp, dy, dy + H, axis=1) for dy in range(3)]

    w = w.astype(x.dtype)
    b2 = b.reshape(1, Cout).astype(jnp.float32)

    strip_spec = pl.BlockSpec((1, TH, W + 2, Cin), lambda bb, i: (bb, i, 0, 0))
    if packed:
        # (3, 3*Cin, Cout): w_packed[dy] = [w[dy,0]; w[dy,1]; w[dy,2]] rows
        wp = w.reshape(3, 3 * Cin, Cout)
        kernel = functools.partial(_kernel_packed, TH=TH, W=W)
        cp = compiler_params("parallel", "parallel")
        return pl.pallas_call(
            kernel,
            grid=(B, H // TH),
            in_specs=[
                strip_spec, strip_spec, strip_spec,
                pl.BlockSpec((3, 3 * Cin, Cout), lambda bb, i: (0, 0, 0)),
                pl.BlockSpec((1, Cout), lambda bb, i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TH, W, Cout), lambda bb, i: (bb, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
            compiler_params=cp,
            interpret=interpret,
        )(views[0], views[1], views[2], wp, b2)
    kernel = functools.partial(_kernel, TH=TH, W=W)
    return _call_9dot(kernel, views, w, b2, B, H, W, TH, Cin, Cout, x.dtype,
                      interpret)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "block_rows",
                                              "interpret"))
def conv3x3_gnsilu(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                   gamma: jnp.ndarray, beta: jnp.ndarray,
                   num_groups: int = 32, eps: float = 1e-5,
                   block_rows: int = 8, interpret: bool = False) -> jnp.ndarray:
    """y = conv2d(silu(group_norm(x, gamma, beta)), w, SAME) + b, with the
    normalize+SiLU applied inside the packed-K conv kernel (no intermediate
    HBM tensor). GN statistics are a cheap XLA reduction; the per-(B,C)
    scale/shift fold gamma/beta with them. Replaces the reference resnet
    prologue (diffusers ResnetBlock2D norm1/act/conv1, norm2/act/conv2).
    """
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, Cin), w.shape
    assert H % block_rows == 0, (H, block_rows)
    assert Cin % num_groups == 0, (Cin, num_groups)
    TH = block_rows

    xf = x.astype(jnp.float32).reshape(B, H * W, num_groups, Cin // num_groups)
    mean = xf.mean(axis=(1, 3))                        # (B, G)
    var = jnp.square(xf).mean(axis=(1, 3)) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    gpc = jnp.repeat(jnp.arange(num_groups), Cin // num_groups)
    scale = gamma.astype(jnp.float32)[None] * rstd[:, gpc]          # (B, Cin)
    shift = beta.astype(jnp.float32)[None] - mean[:, gpc] * scale
    scale = scale[:, None, :]                                       # (B,1,Cin)
    shift = shift[:, None, :]

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    views = [jax.lax.slice_in_dim(xp, dy, dy + H, axis=1) for dy in range(3)]
    wp = w.astype(x.dtype).reshape(3, 3 * Cin, Cout)
    b2 = b.reshape(1, Cout).astype(jnp.float32)

    strip_spec = pl.BlockSpec((1, TH, W + 2, Cin), lambda bb, i: (bb, i, 0, 0))
    aff_spec = pl.BlockSpec((1, 1, Cin), lambda bb, i: (bb, 0, 0))
    kernel = functools.partial(_kernel_packed_gnsilu, TH=TH, W=W, H=H)
    cp = compiler_params("parallel", "parallel")
    return pl.pallas_call(
        kernel,
        grid=(B, H // TH),
        in_specs=[
            strip_spec, strip_spec, strip_spec,
            pl.BlockSpec((3, 3 * Cin, Cout), lambda bb, i: (0, 0, 0)),
            pl.BlockSpec((1, Cout), lambda bb, i: (0, 0)),
            aff_spec, aff_spec,
        ],
        out_specs=pl.BlockSpec((1, TH, W, Cout), lambda bb, i: (bb, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        compiler_params=cp,
        interpret=interpret,
    )(views[0], views[1], views[2], wp, b2, scale, shift)


def _call_9dot(kernel, views, w, b2, B, H, W, TH, Cin, Cout, dtype, interpret):
    strip_spec = pl.BlockSpec((1, TH, W + 2, Cin), lambda bb, i: (bb, i, 0, 0))
    # resident (3,3,Cin,Cout) weights at Cin>=512 exceed the default
    # scoped-vmem budget; compiler_params raises the shared cap
    cp = compiler_params("parallel", "parallel")
    return pl.pallas_call(
        kernel,
        grid=(B, H // TH),
        in_specs=[
            strip_spec, strip_spec, strip_spec,
            pl.BlockSpec((3, 3, Cin, Cout), lambda bb, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, Cout), lambda bb, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH, W, Cout), lambda bb, i: (bb, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), dtype),
        compiler_params=cp,
        interpret=interpret,
    )(views[0], views[1], views[2], w, b2)
