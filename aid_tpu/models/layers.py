"""UNet building blocks (flax.linen), TPU-first (NHWC, bf16-friendly).

Implements the architectural semantics of the diffusers modules the reference
relies on (reference pipeline_interpolated_sd.py:18-61 imports them from
diffusers): ResnetBlock2D, Transformer2DModel/BasicTransformerBlock,
Down/Upsample2D, timestep embeddings — written from scratch for XLA.

Every attention layer takes an optional :class:`AidContext`; the AID
processor family (reference interpolation.py) is a per-call static mode plus
a traced per-frame coefficient vector rather than monkey-patched module
state, so denoising loops compile once and never touch the host.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from aid_tpu.ops.attention import AttnMode, dispatch_attention


@dataclasses.dataclass(frozen=True)
class AidMode:
    """Static AID behavior for one UNet forward pass.

    ``text``: interpolation mode applied to the native (self/cross text)
    attention branch of every layer (reference load_aid,
    pipeline_interpolated_sd.py:950-970).
    ``ip``: image-prompt branch handling when IP-Adapter weights are loaded
    (reference load_aid_ip_adapter, pipeline_interpolated_sd.py:973-1010):
      * None          — no IP branch (no adapter loaded)
      * "own"         — vanilla per-frame IP attention (diffusers
                        IPAdapterAttnProcessor behavior; also the activated
                        ScaleControl branch, interpolation.py:186-196)
      * "pure_outer" / "fused_outer" / "pure_inner" / "fused_inner"
                      — interpolated IP attention (interpolation.py:328-367,
                        :500-530)
    ``ip_coef_scaled``: weight the IP branch by the per-frame coefficient
    (ScaleControlIPAttnProcessor, interpolation.py:146-150,196) instead of
    the global adapter scale.

    NOTE (deviation): the reference's activated InnerInterpolatedIP path
    (interpolation.py:525) calls attention with un-head-batched own IP keys,
    which raises a shape error in torch and is therefore unreachable; we
    implement the evidently intended inner-interpolated IP attention.
    """

    text: AttnMode = AttnMode.SELF
    ip: Optional[str] = None
    ip_coef_scaled: bool = False
    # Batched-CFG split point: when set to N, the batch is [N cond frames;
    # N uncond frames] in ONE forward. Cond rows take endpoints from cond
    # rows 0 / N-1; uncond rows use their OWN K/V as both endpoints, which
    # reduces every AID mode exactly to vanilla attention (duplicated-KV
    # softmax identity) — reproducing the reference's two-pass CFG
    # (sd:1859-1889) with half the weight HBM traffic.
    cfg_split: Optional[int] = None

    @staticmethod
    def vanilla(has_ip: bool = False, scale_control: bool = False) -> "AidMode":
        if scale_control:
            return AidMode(text=AttnMode.SELF, ip="own", ip_coef_scaled=True)
        return AidMode(text=AttnMode.SELF, ip="own" if has_ip else None)

    @staticmethod
    def from_name(name: str, has_ip: bool = False) -> "AidMode":
        """Map the reference's early/late strings to an AidMode."""
        if name == "self":
            return AidMode.vanilla(has_ip=has_ip)
        if name == "scale_control":
            return AidMode(text=AttnMode.FUSED_OUTER, ip="own", ip_coef_scaled=True)
        mode = AttnMode(name)
        return AidMode(text=mode, ip=name if has_ip else None)


@dataclasses.dataclass
class AidContext:
    """Traced AID inputs for one UNet forward pass.

    ``coef``: (B,) per-frame interpolation coefficients.
    ``mode``: static AidMode (hashable; participates in trace cache keys).
    ``ip_hidden_states``: (B, ip_tokens, ip_dim) image-prompt embeds for this
    pass (cond or uncond half), or None.
    ``ip_scale``: global IP-Adapter scale (reference ip_attn.scale[0]).
    """

    coef: jnp.ndarray
    mode: AidMode = AidMode()
    ip_hidden_states: Optional[jnp.ndarray] = None
    ip_scale: float = 1.0
    # Traced scalar bool: when True, every row's endpoint segments are
    # forced no-ops, reducing fused modes EXACTLY to vanilla attention.
    # Lets the denoise engine trace ONE UNet for both warmup and late
    # phases (the warmup cutoff becomes a traced predicate).
    force_vanilla: Optional[jnp.ndarray] = None


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, diffusers get_timestep_embedding semantics."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer MLP over the sinusoidal embedding (time_embedding.linear_1/2)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="linear_2")(x)
        return x


def conv_lowering(hw: int, cin: int) -> str:
    """Pick the 3x3-conv lowering for a (spatial-size, cin) shape class.

    Measured on v5e (tools/opt_results.jsonl, opt3_results.jsonl):
      * ``shift9``  — nine shifted full-tensor einsums; wins at deep levels
        (ch>=1280/hw<=32 ~1.6x lax, ch640/hw64 ~1.1x).
      * ``im2col``  — one 9x-patch GEMM; wins ~9% on the shallow narrow
        class (ch<=384 @ hw>4096) where the MXU is K-starved.
      * ``pallas``  — ops.conv shift-accumulate kernel (im2col GEMM without
        the HBM patch tensor); wins on wide-channel high-res classes
        (cin>=512 @ hw>4096, e.g. the SDXL up-block concat convs:
        7.6 vs 8.2 ms at ch640/hw128) where the patch tensor would be
        ~660 MB and lax.conv's halo overhead bites.
      * ``lax``     — XLA implicit-GEMM conv for everything else.

    Module-level and monkeypatchable so probe harnesses can A/B routings
    on a full forward (tools/opt_probe3.py fwdconv).
    """
    if hw <= 4096 and cin >= 640:
        return "shift9"
    if hw > 4096 and 64 <= cin <= 384:
        return "im2col"
    if hw > 4096 and cin >= 512 and _PALLAS_WIDE_CONV:
        return "pallas"
    return "lax"


# Routing flag for the wide-channel high-res Pallas conv class; default ON
# (measured faster on v5e, tools/opt3_results.jsonl r3conv_*_640_128), can
# be flipped by probe harnesses for A/B on a full forward.
_PALLAS_WIDE_CONV = True

# Routing flag for the fused GN+SiLU+packed-conv resnet prologue
# (ops.conv.conv3x3_gnsilu). Measured on v5e 2026-08-18 (PERF.md round-3b,
# r3gnpk_*): the fused kernel LOSES to the unfused chain at every class
# except a tie at ch640@128² — stays OFF; kept as a measured experiment.
_FUSED_GN_CONV = False


def gn_conv_fused(hw: int, cin: int) -> bool:
    """Classes where the resnet GN+SiLU prologue fuses into the packed-K
    Pallas conv (skipping the separate normalize+act HBM round trip,
    0.40/0.23 ms per call at ch320/ch640 — PERF.md r3gn_*). Capped at the
    UNet spatial range: VAE-decoder resnets run 256^2..1024^2 strips whose
    f32 row blocks would blow the VMEM envelope."""
    if not _FUSED_GN_CONV:
        return False
    return 1024 <= hw <= 16384 and cin >= 320


class _GNAffine(nn.Module):
    """Parameter container matching nn.GroupNorm's tree (scale, bias) for
    the fused GN+conv path: declares the same params without computing the
    normalization (the fused kernel consumes them directly), so checkpoints
    convert identically whichever branch ResnetBlock2D takes."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class Conv3x3(nn.Module):
    """3x3 same-padding conv; per-shape-class lowering (see conv_lowering).

    XLA's implicit-GEMM conv lowering reaches only ~45% of the chip's
    measured matmul rate at the UNet's deeper levels; shifted-GEMM
    formulations beat it everywhere except the shallow high-res classes.
    Param layout matches nn.Conv (HWIO kernel + bias), keeping every
    checkpoint converter unchanged.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    # "auto" = measured per-class lowering (may emit pallas_call, which is
    # opaque to the GSPMD partitioner); "xla" forces the lax.conv lowering
    # for GSPMD-partitioned programs — mirrors CrossAttention's
    # attention_backend escape hatch.
    conv_backend: str = "auto"

    @nn.compact
    def __call__(self, x, prologue=None):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        w = kernel.astype(self.dtype)
        b = bias.astype(self.dtype)
        _, H, W, _ = x.shape
        if prologue is not None:
            # fused GroupNorm+SiLU prologue (gamma, beta, groups): on TPU the
            # packed-K kernel applies it in VMEM; elsewhere apply it inline
            # (same one-pass-variance formula flax GroupNorm uses) and fall
            # through to the normal lowering dispatch.
            gamma, beta, groups = prologue
            if (self.conv_backend == "auto" and jax.default_backend() == "tpu"
                    and H % 8 == 0):
                from aid_tpu.ops.conv import conv3x3_gnsilu
                return conv3x3_gnsilu(x, kernel, bias, gamma, beta,
                                      num_groups=groups, block_rows=8)
            xf = x.astype(jnp.float32)
            g = xf.reshape(x.shape[:-1] + (groups, cin // groups))
            mean = g.mean(axis=(1, 2, 4), keepdims=True)
            var = jnp.square(g).mean(axis=(1, 2, 4), keepdims=True) - jnp.square(mean)
            g = (g - mean) * jax.lax.rsqrt(var + 1e-5)
            xf = g.reshape(x.shape) * gamma + beta
            x = nn.silu(xf).astype(self.dtype)
        impl = conv_lowering(H * W, cin)
        if self.conv_backend != "auto" and impl in ("pallas", "packed"):
            # "xla": keep the measured einsum lowerings (shift9/im2col are
            # plain jnp and partition fine) but never emit a pallas_call
            impl = "lax"
        if impl == "shift9":
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            out = None
            for dy in range(3):
                for dx in range(3):
                    t = jnp.einsum(
                        "bhwc,co->bhwo", xp[:, dy:dy + H, dx:dx + W, :], w[dy, dx],
                        preferred_element_type=jnp.float32)
                    out = t if out is None else out + t
            return (out + b.astype(jnp.float32)).astype(self.dtype)
        if impl == "im2col":
            # level-0 class (e.g. ch320 @ 128x128): one im2col GEMM beats
            # the implicit-GEMM conv by ~9% (67 -> 74 TF/s measured). The
            # MXU accumulates f32 internally and rounds once at the bf16
            # output — numerically the same as lax.conv with bf16 out.
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = jnp.concatenate([
                xp[:, dy:dy + H, dx:dx + W, :]
                for dy in range(3) for dx in range(3)
            ], axis=-1)
            out = jnp.einsum("bhwk,ko->bhwo", cols, w.reshape(9 * cin, -1))
            return out + b
        if impl in ("pallas", "packed") and H % 8 == 0 and jax.default_backend() == "tpu":
            from aid_tpu.ops.conv import conv3x3_same
            return conv3x3_same(x, w, b, block_rows=8, packed=impl == "packed")
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + b


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D: GN-SiLU-Conv x2 with timestep injection."""

    out_channels: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    conv_backend: str = "auto"  # see Conv3x3.conv_backend

    def _gn_silu_conv(self, h, norm_name, conv_name):
        """norm -> SiLU -> 3x3 conv, fused into one Pallas kernel on the
        measured classes (gn_conv_fused); the unfused branch is byte-
        identical to the original module chain. Both branches declare the
        same param tree (norm/scale, norm/bias via _GNAffine)."""
        _, H, W, cin = h.shape
        if (self.conv_backend == "auto" and gn_conv_fused(H * W, cin)
                and cin % self.norm_num_groups == 0):
            gamma, beta = _GNAffine(cin, name=norm_name)()
            return Conv3x3(self.out_channels, dtype=self.dtype, name=conv_name)(
                h, prologue=(gamma, beta, self.norm_num_groups))
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-5,
                         dtype=self.dtype, name=norm_name)(h)
        h = nn.silu(h)
        return Conv3x3(self.out_channels, dtype=self.dtype,
                       conv_backend=self.conv_backend, name=conv_name)(h)

    @nn.compact
    def __call__(self, x, temb):
        in_channels = x.shape[-1]
        h = self._gn_silu_conv(x, "norm1", "conv1")
        temb = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + temb[:, None, None, :]
        h = self._gn_silu_conv(h, "norm2", "conv2")
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv",
        )(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    conv_backend: str = "auto"  # see Conv3x3.conv_backend

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
        return Conv3x3(self.out_channels, dtype=self.dtype,
                       conv_backend=self.conv_backend, name="conv")(x)


class CrossAttention(nn.Module):
    """Multi-head attention with the AID interpolation family built in.

    Replaces the reference's processor monkey-patching
    (interpolation.py:548-679 etc.): the mode is a static argument and the
    per-frame coefficient a traced vector.
    """

    num_heads: int
    head_dim: int
    out_dim: int
    has_ip: bool = False
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"  # "auto" | "flash" (Pallas) | "xla" (jnp)
    # shard_map mode: name of the mesh axis the FRAME dimension is sharded
    # over. Endpoint K/V (global frames 0 / N-1) are fetched with an
    # all_gather of each shard's boundary rows — the tiny per-layer
    # collective mandated by SURVEY.md §5.8.
    frame_axis: Optional[object] = None  # str or tuple of mesh axis names

    @nn.compact
    def __call__(self, hidden, encoder_hidden=None, aid: Optional[AidContext] = None):
        inner = self.num_heads * self.head_dim
        is_cross = encoder_hidden is not None
        kv_src = encoder_hidden if is_cross else hidden

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(hidden)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(kv_src)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(kv_src)

        # NOTE: a no-transpose (B,S,H,D) kernel layout was evaluated and
        # rejected: Mosaic requires the last two block dims be (div 8, div
        # 128) or match the array, which forbids head-sliced blocks; see
        # PERF.md "Next optimization candidates".
        def heads(x):  # (B, S, H*D) -> (B, H, S, D)
            b, s, _ = x.shape
            return x.reshape(b, s, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

        def unheads(x):  # (B, H, S, D) -> (B, S, H*D)
            b, h, s, d = x.shape
            return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)

        q, k, v = heads(q), heads(k), heads(v)

        if aid is None:
            mode, coef = AttnMode.SELF, None
        else:
            mode, coef = aid.mode.text, aid.coef

        def per_row_endpoints(x, n):
            """Rows [0,n): endpoints = cond rows 0 / n-1; rows [n,2n): own."""
            b0 = jnp.broadcast_to(x[0:1], (n,) + x.shape[1:])
            e0 = jnp.broadcast_to(x[n - 1:n], (n,) + x.shape[1:])
            return (
                jnp.concatenate([b0, x[n:]], axis=0),
                jnp.concatenate([e0, x[n:]], axis=0),
            )

        def skip_mask(c, n_cond):
            """Rows whose endpoint attention segments are provably no-ops:
            coef-0/1 frames whose corresponding endpoint is their own K/V,
            and (batched CFG) uncond rows whose endpoints are their own."""
            B = c.shape[0]
            row = jnp.arange(B)
            cond_skip = ((row == 0) & (c == 0.0)) | ((row == n_cond - 1) & (c == 1.0))
            return jnp.where(row < n_cond, cond_skip, True)

        def global_endpoints(x):
            """Sharded frames: global row 0 lives on shard 0, row N-1 on the
            last shard; gather both boundary rows (2 x H x S x D per layer
            over ICI)."""
            first = jax.lax.all_gather(x[0:1], self.frame_axis)  # (dp, 1, ...)
            last = jax.lax.all_gather(x[-1:], self.frame_axis)
            return first[0, 0], last[-1, 0]  # 3D endpoints, shared across rows

        force = aid.force_vanilla if aid is not None else None

        def sharded_skip(b_local):
            """Endpoint-skip rows by GLOBAL frame index under frame sharding."""
            dp = jax.lax.psum(1, self.frame_axis)
            grow = jax.lax.axis_index(self.frame_axis) * b_local + jnp.arange(b_local)
            return ((grow == 0) & (coef == 0.0)) | ((grow == dp * b_local - 1) & (coef == 1.0))

        eps = {}
        skip = None
        if aid is not None and mode != AttnMode.SELF:
            if self.frame_axis is not None:
                assert not aid.mode.cfg_split, "batched CFG not supported under frame sharding"
                kb, ke = global_endpoints(k)
                vb, ve = global_endpoints(v)
                eps = dict(k_begin=kb, v_begin=vb, k_end=ke, v_end=ve)
                skip = sharded_skip(k.shape[0])
            elif aid.mode.cfg_split:
                n = aid.mode.cfg_split
                kb, ke = per_row_endpoints(k, n)
                vb, ve = per_row_endpoints(v, n)
                eps = dict(k_begin=kb, v_begin=vb, k_end=ke, v_end=ve)
                skip = skip_mask(coef, n)
            else:
                skip = skip_mask(coef, k.shape[0])
            if force is not None:
                skip = jnp.logical_or(skip, force)

        out = dispatch_attention(
            q, k, v, coef if coef is not None else jnp.zeros((q.shape[0],)),
            mode, backend=self.attention_backend, skip_endpoints=skip,
            force_vanilla=force if mode != AttnMode.SELF else None, **eps,
        )

        # IP-Adapter branch: cross-attention layers only
        # (reference interpolation.py:328-367 outer, :186-196 scale control).
        if self.has_ip and is_cross:
            # Instantiate unconditionally so params exist regardless of
            # whether init/apply passed IP states (flax creates lazily).
            to_k_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k_ip")
            to_v_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v_ip")
            dummy = jnp.zeros((hidden.shape[0], 1, kv_src.shape[-1]), self.dtype)
            probe = aid.ip_hidden_states if (aid is not None and aid.ip_hidden_states is not None) else dummy
            _ = (to_k_ip(probe), to_v_ip(probe))
        if self.has_ip and is_cross and aid is not None and aid.mode.ip is not None and aid.ip_hidden_states is not None:
            ip_k = to_k_ip(aid.ip_hidden_states)
            ip_v = to_v_ip(aid.ip_hidden_states)
            ip_k, ip_v = heads(ip_k), heads(ip_v)
            ip_mode = AttnMode.SELF if aid.mode.ip == "own" else AttnMode(aid.mode.ip)
            ip_eps = {}
            ip_skip = None
            if self.frame_axis is not None and ip_mode != AttnMode.SELF:
                # interpolated IP endpoints are GLOBAL frames 0 / N-1 too
                ikb, ike = global_endpoints(ip_k)
                ivb, ive = global_endpoints(ip_v)
                ip_eps = dict(k_begin=ikb, v_begin=ivb, k_end=ike, v_end=ive)
                ip_skip = sharded_skip(ip_k.shape[0])
            elif aid.mode.cfg_split and ip_mode != AttnMode.SELF:
                n = aid.mode.cfg_split
                ikb, ike = per_row_endpoints(ip_k, n)
                ivb, ive = per_row_endpoints(ip_v, n)
                ip_eps = dict(k_begin=ikb, v_begin=ivb, k_end=ike, v_end=ive)
            if force is not None and ip_mode != AttnMode.SELF:
                forced = jnp.broadcast_to(force, (q.shape[0],))
                ip_skip = forced if ip_skip is None else jnp.logical_or(ip_skip, forced)
            ip_out = dispatch_attention(q, ip_k, ip_v, aid.coef, ip_mode,
                                        backend=self.attention_backend,
                                        skip_endpoints=ip_skip,
                                        force_vanilla=force if ip_mode != AttnMode.SELF else None,
                                        **ip_eps)
            if aid.mode.ip_coef_scaled:
                w = aid.coef.astype(jnp.float32).reshape(-1, 1, 1, 1)
                out = (out.astype(jnp.float32) + w * ip_out.astype(jnp.float32)).astype(out.dtype)
            else:
                out = out + jnp.asarray(aid.ip_scale, out.dtype) * ip_out

        out = unheads(out)
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="to_out_0")(out)
        return out


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers FeedForward with geglu activation)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        proj = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        x_p, gate = jnp.split(proj, 2, axis=-1)
        x = x_p * nn.gelu(gate)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn, LN->GEGLU FF, all residual.

    AID applies to BOTH attn1 and attn2 — reference load_aid replaces every
    UNet processor (pipeline_interpolated_sd.py:953-970).
    """

    num_heads: int
    head_dim: int
    dim: int
    has_ip: bool = False
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"
    frame_axis: Optional[object] = None  # str or tuple of mesh axis names

    @nn.compact
    def __call__(self, x, encoder_hidden, aid: Optional[AidContext] = None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(self.num_heads, self.head_dim, self.dim, has_ip=False,
                               dtype=self.dtype, attention_backend=self.attention_backend,
                               frame_axis=self.frame_axis,
                               name="attn1")(h, None, aid)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(self.num_heads, self.head_dim, self.dim, has_ip=self.has_ip,
                               dtype=self.dtype, attention_backend=self.attention_backend,
                               frame_axis=self.frame_axis,
                               name="attn2")(h, encoder_hidden, aid)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    """diffusers Transformer2DModel: GN -> proj_in -> blocks -> proj_out + residual."""

    num_heads: int
    head_dim: int
    num_layers: int
    norm_num_groups: int = 32
    use_linear_projection: bool = False
    has_ip: bool = False
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"
    frame_axis: Optional[object] = None  # str or tuple of mesh axis names

    @nn.compact
    def __call__(self, x, encoder_hidden, aid: Optional[AidContext] = None):
        b, h, w, c = x.shape
        inner = self.num_heads * self.head_dim
        residual = x
        x = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        else:
            x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, inner)
        for i in range(self.num_layers):
            x = BasicTransformerBlock(
                self.num_heads, self.head_dim, inner, has_ip=self.has_ip,
                dtype=self.dtype, attention_backend=self.attention_backend,
                frame_axis=self.frame_axis,
                name=f"transformer_blocks_{i}",
            )(x, encoder_hidden, aid)
        if self.use_linear_projection:
            x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, inner)
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual
