"""Interpolated attention: the core AID/PAID primitive, TPU-first.

The reference implements this family as six torch ``AttnProcessor`` classes
monkey-patched into a diffusers UNet (reference interpolation.py:10-804).
Here it is a single pure function over batched multi-head tensors with a
per-frame coefficient vector, so the whole denoising loop stays inside one
XLA program. Modes:

  * ``outer``  (reference interpolation.py:548-679, OuterInterpolatedAttnProcessor):
        out_i = (1-c_i) * Attn(Q_i, K_b, V_b) + c_i * Attn(Q_i, K_e, V_e)
  * ``inner``  (reference interpolation.py:682-804, InnerInterpolatedAttnProcessor):
        K_x = (1-c_i) K_b + c_i K_e   (same for V), out_i = Attn(Q_i, K_x, V_x)
  * ``fused`` variants concatenate each frame's own K/V in front along the
    sequence axis (reference interpolation.py:643-649):
        Attn(Q_i, [K_i; K_*], [V_i; V_*])

where frame b (begin) and frame e (end) are batch rows 0 and B-1 unless
explicit endpoint tensors are supplied (IP-Adapter branches supply their
own). Softmax is computed in float32 regardless of input dtype (TPU
numerics best practice; diffusers' get_attention_scores with
upcast_attention behaves the same way).

Shapes use the multi-head layout (B, H, S, D): batch/frames, heads, sequence,
head dim.
"""

from __future__ import annotations

import enum
from typing import Optional

import jax
import jax.numpy as jnp


class AttnMode(str, enum.Enum):
    """Interpolated-attention mode names, matching the reference's
    early/late strings (gradio_src/pipeline_interpolated_stable_diffusion.py:262-268)."""

    SELF = "self"              # vanilla attention (deactivated processor)
    PURE_OUTER = "pure_outer"
    FUSED_OUTER = "fused_outer"
    PURE_INNER = "pure_inner"
    FUSED_INNER = "fused_inner"

    @property
    def is_outer(self) -> bool:
        return self in (AttnMode.PURE_OUTER, AttnMode.FUSED_OUTER)

    @property
    def is_inner(self) -> bool:
        return self in (AttnMode.PURE_INNER, AttnMode.FUSED_INNER)

    @property
    def is_fused(self) -> bool:
        return self in (AttnMode.FUSED_OUTER, AttnMode.FUSED_INNER)


def _softmax_attn(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Attention core: softmax(q k^T * scale) v with float32 softmax.

    q: (..., Sq, D), k/v: (..., Sk, D) -> (..., Sq, D).
    """
    dtype = q.dtype
    logits = jnp.einsum("...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32)
    logits = logits * jnp.float32(scale)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("...qk,...kd->...qd", probs.astype(dtype), v, preferred_element_type=jnp.float32)
    return out.astype(dtype)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Plain multi-head attention on (B, H, S, D) tensors."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _softmax_attn(q, k, v, scale)


def resolve_backend(backend: str = "auto") -> str:
    """'flash' (Pallas kernel) on TPU, 'xla' (jnp) elsewhere.

    The xla path is also the one to use under GSPMD sharding — pallas_call
    is opaque to the SPMD partitioner (parallel/mesh.py shards the jnp path).
    """
    if backend != "auto":
        return backend
    return "flash" if jax.default_backend() == "tpu" else "xla"


# Minimum own-KV length routed to the Pallas kernel (see dispatch_attention
# docstring). Module-level so tests can lower it to drive tiny pipelines
# through the kernel in interpret mode.
FLASH_MIN_KV = 512

# Test/calibration seam: extra kwargs splatted into every flash-kernel call
# dispatch_attention makes — e.g. {"interpret": True} runs the Pallas
# kernels on the CPU backend (with resolve_backend monkeypatched), and
# {"static_smax": None} forces exact row maxes while calibrating the
# static-shift window with attention_logit_window.
FLASH_KERNEL_OVERRIDES: dict = {}

# Static-shift calibration hook: when set to a callable ``fn(lo, hi)``,
# every dispatch_attention call probes the window of PER-ACCUMULATOR-SET
# row maxes of its scaled logits and reports it via jax.debug.callback.
# Each softmax the kernel evaluates is normalized over its own key set
# ([kb] and [ke] for pure_outer; [k;kb] and [k;ke] for fused_outer;
# lerp(kb,ke) / [k;lerp] for inner modes), so exactness under a static
# shift requires EVERY set's row max in-window — a union over the packed
# stream would hide a set whose row max sits below C-72 behind another
# set's larger max. For inner modes the lerped row max is bracketed
# soundly: above by max(rowmax_b, rowmax_e), below by the row max of the
# elementwise MIN of the two logit matrices (lerp_j >= min(b_j, e_j)
# pointwise for t in [0,1]). tools/hw_smoke.py --logit-window uses this to
# produce the measured evidence behind the static_smax="auto" model-path
# default.
LOGIT_WINDOW_RECORDER = None


def _row_maxes(q, k, scale, q_block=512, pair=None):
    """Per-(batch*head, q-row) max of the scaled logits ``q @ k^T * scale``
    as a (N, Sq_padded) array (padding duplicates row 0 — min/max
    invariant). With ``pair`` (a second K of identical shape), returns row
    maxes of the ELEMENTWISE MIN of the two logit matrices instead — the
    sound lower bound for lerped keys. Chunked over q blocks so logits
    never exceed (q_block, L) per (batch, head)."""
    *_, Sq, D = q.shape
    L = k.shape[-2]
    qf = q.reshape(-1, Sq, D).astype(jnp.float32)

    def flat_k(x):
        return jnp.broadcast_to(
            x.astype(jnp.float32), tuple(q.shape[:-2]) + (L, D)).reshape(-1, L, D)

    kf = flat_k(k)
    pf = flat_k(pair) if pair is not None else kf
    nqb = -(-Sq // q_block)
    pad = nqb * q_block - Sq
    qf = jnp.concatenate([qf, jnp.broadcast_to(qf[:, :1], (qf.shape[0], pad, D))],
                         axis=1) if pad else qf

    def per_bh(args):
        qb, kb, pb = args  # (Sq_padded, D), (L, D), (L, D)

        def qchunk(c, qs):  # (q_block, D)
            logits = qs @ kb.T
            if pair is not None:
                logits = jnp.minimum(logits, qs @ pb.T)
            return c, jnp.max(logits * jnp.float32(scale), axis=-1)

        _, m = jax.lax.scan(qchunk, 0, qb.reshape(nqb, q_block, D))
        return m.reshape(-1)

    return jax.lax.map(per_bh, (qf, kf, pf))


def _probe_logit_window(q, k, v, mode, k_begin, k_end, scale,
                        skip_endpoints=None, force_vanilla=None):
    mode = AttnMode(mode)
    if mode == AttnMode.SELF:
        own = _row_maxes(q, k, scale)
        lo, hi = jnp.min(own), jnp.max(own)
        jax.debug.callback(LOGIT_WINDOW_RECORDER, lo, hi)
        return

    def ep(x, row):
        e = k[row] if x is None else x
        if e.ndim < k.ndim:
            e = jnp.broadcast_to(e[None], k.shape[:1] + e.shape)
        return e

    # force_vanilla rows reduce to the own-K-only softmax set (the
    # duplicated-KV identity / fused-mode skip predication) on ARBITRARY
    # rows, so the own-K set must be covered whenever the caller passes it.
    # Likewise a FUSED-mode skip vector: the kernel gates those rows to the
    # own-only set, and the vector is traced so the probe cannot see which
    # rows (or whether their endpoints equal their own K/V) — cover own-K
    # whenever gating is possible. PURE modes ignore skip at the kernel
    # (the skip vector is forced to zero there; skip semantics come from
    # the coef-0/1 endpoints-are-own-K/V construction, already one of the
    # probed endpoint sets), so a pure-mode skip vector needs no widening.
    # Calls that can never reduce keep the tight per-set window — an
    # unconditional widening would spuriously disqualify configs whose
    # endpoint sets are in-window but whose vanilla diagonal strays
    # (code-review r4 #3).
    may_own = force_vanilla is not None or (
        mode.is_fused and skip_endpoints is not None)

    kb, ke = ep(k_begin, 0), ep(k_end, -1)
    mb, me = _row_maxes(q, kb, scale), _row_maxes(q, ke, scale)
    mown = (_row_maxes(q, k, scale)
            if (mode.is_fused or may_own) else None)
    if mode == AttnMode.PURE_OUTER:
        # two independent softmaxes over [kb] and [ke]
        low, up = jnp.minimum(mb, me), jnp.maximum(mb, me)
    elif mode == AttnMode.FUSED_OUTER:
        # two independent softmaxes over [k; kb] and [k; ke]
        s1, s2 = jnp.maximum(mown, mb), jnp.maximum(mown, me)
        low, up = jnp.minimum(s1, s2), jnp.maximum(s1, s2)
    elif mode == AttnMode.FUSED_INNER:
        # one softmax over [k; lerp(kb, ke)]; the unknown-t lerped row max
        # is bracketed above by max(mb, me) and below by the row max of the
        # elementwise MIN of the two logit matrices — but when skip rows are
        # possible the lower edge collapses to mown anyway
        # (min(max(mown, mmin), mown) == mown), so skip the pair pass then
        up = jnp.maximum(mown, jnp.maximum(mb, me))
        low = (mown if may_own
               else jnp.maximum(mown, _row_maxes(q, kb, scale, pair=ke)))
    else:  # PURE_INNER: one softmax over lerp(kb, ke)
        low, up = _row_maxes(q, kb, scale, pair=ke), jnp.maximum(mb, me)
    if may_own:
        low = jnp.minimum(low, mown)
        if not mode.is_fused:  # fused up already >= mown structurally
            up = jnp.maximum(up, mown)
    jax.debug.callback(LOGIT_WINDOW_RECORDER, jnp.min(low), jnp.max(up))


def _bcast_force(force_vanilla):
    """Broadcastable forced-row predicate: scalar passes through; a (B,)
    row vector gains trailing axes so it selects whole (B, H, S, D) rows."""
    fv = jnp.asarray(force_vanilla)
    return fv if fv.ndim == 0 else fv.reshape(fv.shape[0], 1, 1, 1)


def _force_vanilla_endpoints(force_vanilla, k, v, k_begin, v_begin, k_end, v_end):
    """Endpoint substitution realizing force_vanilla by the duplicated-KV
    identity: substituting each forced row's OWN K/V for both endpoints
    reduces every AID mode exactly to vanilla attention — fused modes
    attend over [K; K] (each key twice at half weight, duplicated V
    restores the sum), inner lerps K with itself, pure_outer blends two
    identical passes. Requires endpoint seq length == own KV length (true
    everywhere in the model: self endpoints are batch rows of k/v,
    cross/IP endpoints are same-token-count embeds); returns None on a
    length mismatch so the caller can fall back to compute-and-select."""
    same_len = all(
        ep is None or ep.shape[-2] == x.shape[-2]
        for ep, x in ((k_begin, k), (k_end, k), (v_begin, v), (v_end, v)))
    if not same_len:
        return None
    fv = _bcast_force(force_vanilla)

    def own_or_endpoint(explicit, x, row):
        ep = x[row] if explicit is None else explicit
        if ep.ndim < x.ndim:
            ep = jnp.broadcast_to(ep[None], x.shape[:1] + ep.shape)
        return jnp.where(fv, x, ep)

    return (own_or_endpoint(k_begin, k, 0), own_or_endpoint(v_begin, v, 0),
            own_or_endpoint(k_end, k, -1), own_or_endpoint(v_end, v, -1))


def dispatch_attention(
    q, k, v, coef, mode,
    k_begin=None, v_begin=None, k_end=None, v_end=None,
    scale=None, backend: str = "auto", skip_endpoints=None,
    force_vanilla=None, static_smax="auto",
):
    """Route to the Pallas flash kernel or the jnp reference path.

    ``skip_endpoints``: optional (B,) bool — rows whose endpoint segments
    provably reduce to vanilla attention; the flash kernel skips their
    compute (the jnp path ignores the hint; results are identical).

    ``static_smax``: static-shift softmax opt-in forwarded to the flash
    kernel. The MODEL path defaults to ``"auto"`` (the hardware-measured
    9-11% win) because SD/SDXL attention logits are architecturally bounded
    — scaled row maxes sit single digits from zero, far inside the C=40
    window [-32, +70]; ``attention_logit_window`` calibrates the assumption
    on real activations (tools/hw_smoke.py logs it per config). The kernel
    itself defaults to ``None`` (exact for arbitrary inputs); pass ``None``
    here to force exactness end to end.

    Size heuristic: short-KV calls (cross-attention over 77 text or a few
    IP tokens) stay on the XLA logits path — measured FASTER than both the
    per-(b,h) kernel grid and the head-looped single-block kernel (0.66 vs
    0.77 ms on the SDXL S=1024 cross shape; tools/opt3_results.jsonl
    r3cross_*): at K<=128 the cost is the per-head softmax itself, which
    no launch restructuring removes. The kernel takes over where logits
    get large (own-KV >= FLASH_MIN_KV, incl. the S<=1024 single-block
    path)."""
    if LOGIT_WINDOW_RECORDER is not None:
        _probe_logit_window(q, k, v, mode, k_begin, k_end,
                            scale or q.shape[-1] ** -0.5,
                            skip_endpoints=skip_endpoints,
                            force_vanilla=force_vanilla)
    mode = AttnMode(mode)
    if resolve_backend(backend) == "flash" and k.shape[-2] >= FLASH_MIN_KV:
        from aid_tpu.ops.flash_attention import flash_interpolated_attention

        kernel_kwargs = dict(static_smax=static_smax)
        kernel_kwargs.update(FLASH_KERNEL_OVERRIDES)
        # FUSED modes: fold force_vanilla into the skip vector HERE (the
        # kernel honors skip by dropping the endpoint segments — own-only
        # IS vanilla attention), so direct dispatch callers get the same
        # semantics on every backend without replicating layers.py's
        # skip|force fold. PURE modes: the kernel CANNOT honor skip rows
        # (their streams have no self segment to fall back on — it zeroes
        # the vector), so realize force_vanilla by the duplicated-KV
        # identity: substitute each forced row's own K/V for both endpoints
        # (per-row 4D endpoints route to the packed kernel path, which
        # handles them). NB this forfeits the split-endpoint routing for
        # the call (3D shared endpoints become per-row 4D) even when the
        # traced force vector is all-False — pure-mode callers who never
        # force should pass force_vanilla=None, and skip-style callers
        # should build coef-0/1 rows whose endpoints ARE their own K/V
        # (then the kernel result is already exactly vanilla with no
        # substitution needed).
        if force_vanilla is not None and mode.is_fused:
            fv = jnp.broadcast_to(
                jnp.asarray(force_vanilla, bool), k.shape[:1])
            skip_endpoints = (fv if skip_endpoints is None
                              else jnp.logical_or(skip_endpoints, fv))
        if (force_vanilla is not None and mode != AttnMode.SELF
                and not mode.is_fused):
            subst = _force_vanilla_endpoints(
                force_vanilla, k, v, k_begin, v_begin, k_end, v_end)
            if subst is not None:
                k_begin, v_begin, k_end, v_end = subst
            else:
                # mismatched endpoint lengths (never produced by the model
                # path): select the vanilla result after the kernel call
                out = flash_interpolated_attention(
                    q, k, v, coef, mode,
                    k_begin=k_begin, v_begin=v_begin,
                    k_end=k_end, v_end=v_end,
                    scale=scale, skip_endpoints=skip_endpoints,
                    **kernel_kwargs)
                van = flash_interpolated_attention(
                    q, k, v, scale=scale, **kernel_kwargs)
                return jnp.where(_bcast_force(force_vanilla), van, out)
        return flash_interpolated_attention(
            q, k, v, coef, mode,
            k_begin=k_begin, v_begin=v_begin, k_end=k_end, v_end=v_end,
            scale=scale, skip_endpoints=skip_endpoints, **kernel_kwargs,
        )
    if force_vanilla is not None and mode != AttnMode.SELF:
        # The xla path realizes force_vanilla by the duplicated-KV identity
        # (the same one the kernel's skip rows and the batched-CFG uncond
        # rows use); see _force_vanilla_endpoints. ONE attention evaluation
        # per call instead of the old interpolated+vanilla
        # double-compute-and-select (VERDICT r3 weak #6).
        subst = _force_vanilla_endpoints(
            force_vanilla, k, v, k_begin, v_begin, k_end, v_end)
        if subst is not None:
            kb, vb, ke, ve = subst
            return interpolated_attention(
                q, k, v, coef, mode,
                k_begin=kb, v_begin=vb, k_end=ke, v_end=ve, scale=scale,
            )
    out = interpolated_attention(
        q, k, v, coef, mode,
        k_begin=k_begin, v_begin=v_begin, k_end=k_end, v_end=v_end,
        scale=scale,
    )
    if force_vanilla is not None and mode != AttnMode.SELF:
        # mismatched endpoint lengths: select the vanilla result instead
        out = jnp.where(_bcast_force(force_vanilla),
                        _softmax_attn(q, k, v, scale or q.shape[-1] ** -0.5), out)
    return out


def interpolated_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    coef: jnp.ndarray,
    mode: AttnMode | str,
    k_begin: Optional[jnp.ndarray] = None,
    v_begin: Optional[jnp.ndarray] = None,
    k_end: Optional[jnp.ndarray] = None,
    v_end: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Interpolated attention over a frame batch.

    Args:
      q: queries (B, H, Sq, D) — one row per frame.
      k, v: per-frame keys/values (B, H, Sk, D). For self-attention these are
        projections of each frame's own hidden states; for cross-attention,
        of each frame's text embeddings.
      coef: (B,) per-frame interpolation coefficients t_i in [0, 1]
        (reference: ``self.coef``, interpolation.py:29-31).
      mode: AttnMode (or its string value). ``self`` ignores coef/endpoints.
      k_begin / v_begin / k_end / v_end: optional explicit endpoint K/V of
        shape (H, Sk, D) or (B, H, Sk, D). Default: rows 0 and B-1 of k/v
        (reference interpolation.py:627-630).
      scale: attention scale; default D**-0.5.

    Returns:
      (B, H, Sq, D) attention output, same dtype as q.
    """
    mode = AttnMode(mode)
    if scale is None:
        scale = q.shape[-1] ** -0.5

    if mode == AttnMode.SELF:
        return _softmax_attn(q, k, v, scale)

    def _endpoint(x, explicit, row):
        if explicit is None:
            ep = x[row]
        elif explicit.ndim == q.ndim:  # (B,H,S,D): PER-ROW endpoints, use as-is
            return explicit
        else:
            ep = explicit
        # endpoint sequence length may differ from the own-KV length
        return jnp.broadcast_to(ep[None], (x.shape[0],) + ep.shape)

    kb = _endpoint(k, k_begin, 0)
    vb = _endpoint(v, v_begin, 0)
    ke = _endpoint(k, k_end, -1)
    ve = _endpoint(v, v_end, -1)

    c = coef.astype(jnp.float32).reshape(-1, 1, 1, 1)

    if mode.is_inner:
        # Interpolate K/V first (reference interpolation.py:771-775), then a
        # single attention pass; fused prepends each frame's own K/V
        # (interpolation.py:781-785: key_cross = cat([key, key_cross])).
        k_cross = ((1.0 - c) * kb.astype(jnp.float32) + c * ke.astype(jnp.float32)).astype(k.dtype)
        v_cross = ((1.0 - c) * vb.astype(jnp.float32) + c * ve.astype(jnp.float32)).astype(v.dtype)
        if mode.is_fused:
            k_cross = jnp.concatenate([k, k_cross], axis=-2)
            v_cross = jnp.concatenate([v, v_cross], axis=-2)
        return _softmax_attn(q, k_cross, v_cross, scale)

    # Outer: two attention passes blended by coef (interpolation.py:651-664).
    if mode.is_fused:
        kb = jnp.concatenate([k, kb], axis=-2)
        vb = jnp.concatenate([v, vb], axis=-2)
        ke = jnp.concatenate([k, ke], axis=-2)
        ve = jnp.concatenate([v, ve], axis=-2)
    out_begin = _softmax_attn(q, kb, vb, scale)
    out_end = _softmax_attn(q, ke, ve, scale)
    out = (1.0 - c) * out_begin.astype(jnp.float32) + c * out_end.astype(jnp.float32)
    return out.astype(q.dtype)


def attention_logit_window(q: jnp.ndarray, k: jnp.ndarray,
                           scale: float | None = None,
                           q_block: int = 512) -> tuple:
    """Row-max logit statistics for static-shift softmax calibration.

    Returns ``(min_row_max, max_row_max)`` of the scaled attention logits
    q @ k^T * scale — the quantities that must lie inside the flash
    kernel's static-shift window ``[C - 72, C + 30]`` (C = ``static_smax``,
    default 40 -> window [-32, +70]) for the static shift to be the exact
    softmax. tools/hw_smoke.py logs this per smoke config (set
    ``LOGIT_WINDOW_RECORDER``) and PARITY.md's real-checkpoint runbook
    calls it per attention layer on captured activations; any real
    SD/SDXL logit sits single digits from zero, but the check makes that
    an observation instead of an assumption. Chunked over q blocks so the
    logits are never materialized beyond (q_block, L) per (batch, head) —
    safe at the SDXL 4096x12288 hot shapes.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    m = _row_maxes(q, k, scale, q_block)
    return jnp.min(m), jnp.max(m)
