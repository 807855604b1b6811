"""Pallas TPU flash kernel for the interpolated-attention family.

One kernel covers the whole AID family (reference interpolation.py:548-804)
without materializing attention logits in HBM:

  * ``self``        — vanilla flash attention (deactivated processors)
  * ``pure_outer``  — two online-softmax accumulator sets, one attending the
                      begin-endpoint K/V and one the end-endpoint K/V,
                      blended by the per-frame coefficient at the end
  * ``fused_outer`` — same, plus the frame's own K/V blocks update BOTH
                      accumulator sets (logical concat [K_i; K_*], reference
                      interpolation.py:643-649, never materialized as
                      doubled-length logits; shared self-block scores are
                      computed ONCE for both endpoints)
  * ``pure_inner`` / ``fused_inner`` — endpoint K/V lerped per frame
                      (K_x = (1-c) K_b + c K_e, interpolation.py:771-775; a
                      cheap fused elementwise op at the caller), then flash
                      over [K_i; K_x]

Layout: the caller packs one KV stream per frame — [own | begin | end] for
outer, [own | cross] for inner — so every BlockSpec index map is static and
the grid (B, H, q_blocks, kv_blocks) pipelines cleanly. Online-softmax state
(m, l, acc) x {begin,end} lives in VMEM scratch persisted across the
sequential innermost grid dimension.

vs the jnp reference (ops.attention): fused-outer self-attention at SD1.5
512px materializes 2 x (B,H,4096,8192) float32 logit tensors (~6 GB HBM
traffic per layer); here scores never leave VMEM. Numerics: f32 scores on
the MXU, f32 online softmax, probabilities cast to the input dtype for the
PV matmul, f32 accumulators.

MXU-resident normalizer (``mxu_den``, default on): this kernel family is
VPU-softmax-bound, not MXU-bound (PERF.md round-3 campaign). A ones-column
written into V at lane ``den_col`` makes the PV product carry ``sum(p)`` as
one extra output lane — at D=64 the dot already pads its N dimension to the
128-lane MXU tile, so the normalizer is literally free MXU work — and the
rowsum lane-reduction (a full VPU pass over every (bq, bk) probability
block) plus the separate ``l`` accumulator/rescale disappear; the acc
rescale covers the merged lane. Auto-disabled at D % 128 == 0 (VAE D=512:
no free lane without a whole extra tile). den = sum of the same
dtype-cast p the PV matmul consumes, which makes num/den dtype-consistent
(the legacy path summed f32 p against a bf16-p numerator).

Static-shift softmax (``static_smax``): softmax is shift-invariant, so the
data-dependent row max only serves to keep exp() in range. Substituting a
COMPILE-TIME shift C — ``p = exp(min(s - C, U))`` with U = 30 nats of
clip headroom — produces the *identical* softmax (same f32 rounding class)
whenever every row's true max logit lies in ``[C - 72, C + U]``: above
C + U the clip flattens ratios among >e^U-dominant logits; below C - 72
the bf16 probabilities hit their e^-87 normal floor and relative precision
fades (f32 probabilities fade ~c-87 nats lower still). With C = 40 the
exact window is max-logit ∈ [-32, +70] — attention logits in SD/SDXL-class
models live within single digits of zero, so both tails are unreachable.
What it buys: the row-max lane reduction (a full VPU pass over every
(bq, bk) score block), the running-max compare/select chain, and the
accumulator rescale multiplies all disappear from BOTH kernels; with
``mxu_den`` the remaining per-element VPU work is ONE subtract+clip+exp
pass. The kernel-level default is ``None`` (exact for arbitrary inputs);
the model dispatch path (ops/attention.py dispatch_attention) opts into
``"auto"`` because SD/SDXL attention logits are architecturally bounded —
``attention_logit_window`` calibrates that assumption on real activations.
Exactness is fuzz-pinned vs the jnp reference in
tests/test_flash_attention.py; incompatible with ``exp_impl="bf16"``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aid_tpu.ops.attention import AttnMode
from aid_tpu.ops.pallas_util import compiler_params as _compiler_params

NEG_INF = -1e30
LANES = 128
# One-pass kernel resident-KV envelope: heads-per-group x packed-stream
# cols must stay under this (proven at the S=1024 H=20 SDXL shape).
_ONEPASS_MAX_RESIDENT_COLS = 20 * 1024
# Split-endpoint routing ceiling: outer modes with shared 3D endpoints take
# the split one-pass path up to this stream length regardless of the
# default onepass_max — measured 10.47 vs 14.86 ms (-30%) against the
# streaming kernel at the SDXL fused@4096 shape (B7 H10 Ltot 12288,
# tools/opt4_results.jsonl r4split_* vs r4packg_*): no endpoint broadcast
# in HBM + per-(b,g) whole-segment residency beats the online-softmax
# stream. Bounded by the VMEM envelope via the hgroup divisor search.
_SPLIT_ONEPASS_MAX = 16384
# escape hatch: False restores the packed-stream routing everywhere (A/B,
# debugging) — the split path is a pure perf optimization, numerics-equal
_SPLIT_EP_ENABLE = True


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(
    # scalar-prefetch: per-phase valid lengths (absolute cols in the packed
    # stream): [self_end, begin_end, end_end]
    lens_ref,
    coef_ref,  # (B,) f32
    skip_ref,  # (B,) int32: 1 = this row's endpoint segments are no-ops
    # inputs
    q_ref,  # (1, 1, bq, Dp)
    k_ref,  # (1, 1, bk, Dp) packed-stream block
    v_ref,
    # output
    o_ref,  # (1, 1, bq, Dp)
    # scratch
    m_ref,  # (n_m, bq, LANES) f32: shared (n_m=1) or per-set (pure outer)
    l_ref,  # (n_sets, bq, LANES) f32
    acc_ref,  # (n_sets, bq, Dp) f32
    *,
    mode: AttnMode,
    scale: float,
    block_k: int,
    n_self: int,
    n_begin: int,
    n_steps: int,
    needs_mask: bool,
    exp_impl: str,
    den_col: int,  # -1 = VPU rowsum + l scratch; else the softmax
    # normalizer rides MXU lane `den_col` of the widened PV product (see
    # module docstring "MXU-resident normalizer")
    smax_shift: Optional[float],  # static-shift softmax constant (already
    # in the kernel's exp domain — exp2 callers fold log2e); None = exact
    # online row max. See module docstring "Static-shift softmax".
    smax_clip: Optional[float],  # overflow clip for the shifted scores
):
    j = pl.program_id(3)
    b = pl.program_id(0)
    bq, Dp = q_ref.shape[2], q_ref.shape[3]
    two_sets = mode.is_outer
    mxu_den = den_col >= 0

    def read(ref):
        return ref[0, 0]

    @pl.when(j == 0)
    def _init():
        if smax_shift is None:
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        if not mxu_den:
            l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = read(q_ref)
    base = j * block_k

    # phase of this block in the packed stream and its valid end column
    in_self = j < n_self
    in_begin = jnp.logical_and(j >= n_self, j < n_self + n_begin)

    # Per-row endpoint skip: rows whose endpoint segments provably reduce to
    # vanilla attention (coef-0/1 endpoint frames; batched-CFG uncond rows
    # with own K/V as both endpoints) skip the endpoint blocks entirely —
    # real predicated control flow, the MXU work is not issued.
    active = jnp.logical_or(in_self, skip_ref[b] == 0)

    @pl.when(active)
    def _compute():
        s = jax.lax.dot_general(
            q, read(k_ref), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if needs_mask:
            # Only traced when some segment length is not a block_k multiple
            # — the hot self-attention shapes (4096/1024/256) divide evenly,
            # so their kernels skip this VPU pass entirely (per-block
            # iota+compare+select is comparable to the QK MXU cost).
            valid = jnp.where(
                in_self, lens_ref[0], jnp.where(in_begin, lens_ref[1], lens_ref[2])
            )
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
            s = jnp.where(col + base < valid, s, NEG_INF)
        v_blk = read(v_ref)
        if den_col == v_blk.shape[-1]:
            # MXU-resident normalizer: a ones-column at lane den_col makes
            # the PV product carry sum(p) along as one extra within-tile
            # output lane — the VPU rowsum reduction and the separate l
            # accumulator disappear; the acc rescale covers both. (When a
            # zero pad lane exists, den_col < Dp, the wrapper already wrote
            # the ones into the packed stream and no kernel op is needed.)
            v_blk = jnp.pad(v_blk, ((0, 0), (0, 1)), constant_values=1)

        # With exp_impl="exp2" the scale folds in log2(e) (see caller), so
        # 2^(s-m) == e^(s'-m') exactly — same softmax, cheaper VPU op.
        exp_fn = jax.lax.exp2 if exp_impl == "exp2" else jnp.exp

        def probs(m_new):
            if exp_impl == "bf16":
                # probabilities are cast to bf16 for the PV matmul anyway;
                # computing exp directly in bf16 packs 2 lanes per VPU op
                p = jnp.exp((s - m_new).astype(jnp.bfloat16))
                rowsum = (None if mxu_den else
                          jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32))
            else:
                p = exp_fn(s - m_new)
                rowsum = None if mxu_den else jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return rowsum, pv

        if smax_shift is not None:
            # Static-shift softmax: no row max, no m/alpha bookkeeping, no
            # accumulator rescale — contributions just add up and finalize
            # divides by the (MXU-lane or l-scratch) denominator.
            shifted = jnp.minimum(s - smax_shift, smax_clip)
            if exp_impl == "bf16":
                p = jnp.exp(shifted.astype(jnp.bfloat16))
                rowsum = (None if mxu_den else
                          jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32))
            else:
                p = exp_fn(shifted)
                rowsum = None if mxu_den else jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if not two_sets:
                if not mxu_den:
                    l_ref[0] = l_ref[0] + rowsum
                acc_ref[0] = acc_ref[0] + pv
            elif mode.is_fused:
                upd0 = jnp.logical_or(in_self, in_begin)
                upd1 = jnp.logical_or(
                    in_self, jnp.logical_not(jnp.logical_or(in_self, in_begin))
                )
                w0 = jnp.where(upd0, 1.0, 0.0).astype(jnp.float32)
                w1 = jnp.where(upd1, 1.0, 0.0).astype(jnp.float32)
                if not mxu_den:
                    l_ref[0] = l_ref[0] + w0 * rowsum
                    l_ref[1] = l_ref[1] + w1 * rowsum
                acc_ref[0] = acc_ref[0] + w0 * pv
                acc_ref[1] = acc_ref[1] + w1 * pv
            else:
                # pure_outer: disjoint streams, contribution lands in the
                # set this phase feeds
                def update_static(i):
                    if not mxu_den:
                        l_ref[i] = l_ref[i] + rowsum
                    acc_ref[i] = acc_ref[i] + pv

                @pl.when(in_begin)
                def _():
                    update_static(0)

                @pl.when(jnp.logical_not(in_begin))
                def _():
                    update_static(1)

            return

        s_max = jnp.max(s, axis=-1, keepdims=True)

        if not two_sets or mode.is_fused:
            # SHARED running max across both accumulator sets: m is only a
            # stability offset, so one max over everything seen keeps each
            # set's softmax exact while letting self blocks (fused modes)
            # compute exp(s-m) and the PV matmul ONCE and credit BOTH sets.
            # Sound for fused modes because both sets contain the self
            # segment, coupling their maxima — an endpoint segment would
            # need logits ~88 above the shared self segment (f32 exp
            # underflow) before the weaker set lost precision; the l-guard
            # at finalize bounds even that case to a graceful fade.
            m_old = m_ref[0, :, :1]
            m_new = jnp.maximum(m_old, s_max)
            alpha = exp_fn(m_old - m_new)
            rowsum, pv = probs(m_new)
            m_ref[0] = jnp.broadcast_to(m_new, (bq, LANES))
            if not two_sets:
                if not mxu_den:
                    l_ref[0] = l_ref[0] * alpha + rowsum
                acc_ref[0] = acc_ref[0] * alpha + pv
            else:
                upd0 = jnp.logical_or(in_self, in_begin)
                upd1 = jnp.logical_or(
                    in_self, jnp.logical_not(jnp.logical_or(in_self, in_begin))
                )
                # both sets rescale by the shared alpha every block; the
                # l/acc contribution lands only in the set(s) this phase feeds
                w0 = jnp.where(upd0, 1.0, 0.0).astype(jnp.float32)
                w1 = jnp.where(upd1, 1.0, 0.0).astype(jnp.float32)
                if not mxu_den:
                    l_ref[0] = l_ref[0] * alpha + w0 * rowsum
                    l_ref[1] = l_ref[1] * alpha + w1 * rowsum
                acc_ref[0] = acc_ref[0] * alpha + w0 * pv
                acc_ref[1] = acc_ref[1] * alpha + w1 * pv
        else:
            # pure_outer: the two streams are disjoint (no shared self
            # blocks), so a shared max buys nothing and could underflow the
            # weaker stream; keep an exact per-set running max instead.
            def update(i):
                m_old = m_ref[i, :, :1]
                m_new = jnp.maximum(m_old, s_max)
                alpha = exp_fn(m_old - m_new)
                rowsum, pv = probs(m_new)
                m_ref[i] = jnp.broadcast_to(m_new, (bq, LANES))
                if not mxu_den:
                    l_ref[i] = l_ref[i] * alpha + rowsum
                acc_ref[i] = acc_ref[i] * alpha + pv

            @pl.when(in_begin)
            def _():
                update(0)

            @pl.when(jnp.logical_not(in_begin))
            def _():
                update(1)

    # skipped endpoint blocks contribute nothing and m does not move, so the
    # inactive branch needs no rescale at all.

    @pl.when(j == n_steps - 1)
    def _finalize():
        # the guard keeps an (astronomically unlikely) fully-underflowed
        # set at 0 instead of 0/0 = NaN
        def norm(i):
            if mxu_den:
                den = acc_ref[i, :, den_col:den_col + 1]
                return acc_ref[i, :, :Dp] / jnp.maximum(den, 1e-37)
            return acc_ref[i] / jnp.maximum(l_ref[i, :, :1], 1e-37)

        out0 = norm(0)
        if two_sets:
            c = coef_ref[b]
            out = (1.0 - c) * out0 + c * norm(1)
        else:
            out = out0
        o_ref[0, 0] = out.astype(o_ref.dtype)


def _kernel_onepass(
    lens_ref,  # per-slot valid cols: packed = [self_end, begin_end,
    # end_end] absolute in the stream; split = [Lk, Le, ep_cols + Le]
    # in source-local coords
    coef_ref,  # (B,) f32
    skip_ref,  # (B,) int32
    # positional refs (composition depends on the path):
    #   packed (ep_cols=0):      q, k, v, o           k/v = (1, Hb, Ltot, Dp)
    #   split  (ep_cols>0):      q, [k, v,] ek, ev, o — own stream k/v only
    #   when n_self_cols > 0; ek/ev = (Hb, 2*ep_cols, Dp) SHARED across the
    #   batch (block index map ignores b — no endpoint broadcast in HBM)
    *refs,
    mode: AttnMode,
    scale: float,
    n_self_cols: int,
    n_begin_cols: int,
    H: int,  # heads per grid step (the head-group size)
    exp_impl: str,
    needs_mask: bool,
    unroll: int,
    den_col: int,  # -1 = VPU rowsum; else MXU-resident normalizer lane
    smax_shift: Optional[float],  # static-shift softmax (see module
    # docstring / _kernel): per-segment row maxima AND the cross-segment
    # combine weights all collapse — every segment contributes at the same
    # static scale, so num/den are plain sums over member segments
    smax_clip: Optional[float],
    ep_cols: int = 0,  # split-endpoint path: padded per-endpoint width
    pipeline_chunk: int = 0,  # >0 + static shift: chunk-skewed software
    # pipeline — each segment's QK/exp/PV is split into K-chunks of this
    # width and chunk c+1's QK dot is issued (program order) before chunk
    # c's exp/PV, so Mosaic can overlap the VPU exp pass with MXU dots.
    # Only valid under the static shift, where chunks are purely
    # associative (no cross-chunk row max / rescale); at most two chunk
    # slabs are live at once, so VMEM stays bounded where the rejected
    # whole-slab skew OOM'd (PERF.md round-3 campaign).
):
    """One-pass kernel: whole packed stream resident, heads looped in-kernel.

    Cross-attention (L=77), IP branches (L=4..16) and short self calls
    spend most of their time in per-grid-step overhead on the main kernel
    (measured ~8 us/step at ~4 us of real work; the xla path is similarly
    overhead-bound at 0.68 ms for work with a ~0.2 ms floor). Here the grid
    is (B, H/Hb, q_blocks) — one step covers a whole head group via an
    in-kernel loop — so the fixed cost amortizes and the softmax is exact
    in one pass (no scratch/init/finalize/rescale).

    SEGMENT-DECOMPOSED softmax (this path is softmax-VPU-bound, not
    MXU-bound — tools/opt3_results.jsonl r3flash_self_b7h20s1024d64 =
    33 TF/s under the earlier union-masked design):

      * ONE QK matmul over the full stream, then per-segment
        (self / begin / end / cross) row-max, exp, row-sum and PV on static
        lane-aligned slices of the logits.
      * Set membership is STRUCTURAL — set 0 = {self, begin}, set 1 =
        {self, end} — so no per-element set masks (w0/w1 multiplies of the
        old design) exist at all, and the self-segment PV matmul is shared
        by both sets: outer-mode MXU work drops from QK + 2 full-stream PVs
        to QK + one PV per segment (-33% at Ltot = 3S).
      * Segments combine flash-style at (bq, 1) granularity:
        out_set = sum_seg(pv_seg * e^{m_seg - m_set}) /
                  sum_seg(l_seg  * e^{m_seg - m_set});
        exact per-SET maxima (the old shared-max-over-union could underflow
        the weaker stream of pure_outer; segment maxima are exact for every
        mode at no extra stream-wide VPU work).
      * Skip rows (endpoint frames whose interpolated result provably
        equals vanilla attention) gate the endpoint/cross segments with
        SCALAR selects on the (bq, 1)/(bq, Dp) combine terms — the per-row
        guarantee the main kernel gets from predication, without its
        control flow.
      * ``needs_mask=False`` (every segment exactly fills its padded span)
        elides tail masking entirely; otherwise each segment masks only its
        own (bq, seg_width) slice."""
    refs = list(refs)
    q_ref = refs.pop(0)
    if ep_cols == 0 or n_self_cols:
        k_ref = refs.pop(0)
        v_ref = refs.pop(0)
    else:  # split pure_outer: the own stream is never read, never shipped
        k_ref = v_ref = None
    if ep_cols:
        ek_ref = refs.pop(0)
        ev_ref = refs.pop(0)
    (o_ref,) = refs

    b = pl.program_id(0)
    bq, Dp = q_ref.shape[2], q_ref.shape[3]
    Ltot = n_self_cols + 2 * ep_cols if ep_cols else k_ref.shape[2]
    exp_fn = jax.lax.exp2 if exp_impl == "exp2" else jnp.exp

    # static segment table: (src, start, width, lens-slot, mask-offset) —
    # src 0 reads the own-stream ref, src 1 the shared endpoint ref; start
    # is the slice start within its source, and mask compares
    # col + mask_offset < lens_ref[slot]
    segments = []
    if ep_cols:  # split-endpoint path (outer modes, shared 3D endpoints)
        if n_self_cols:
            segments.append((0, 0, n_self_cols, 0, 0))
        segments.append((1, 0, ep_cols, 1, 0))
        segments.append((1, ep_cols, ep_cols, 2, ep_cols))
    else:
        if n_self_cols:
            segments.append((0, 0, n_self_cols, 0, 0))
        if mode.is_outer:
            segments.append((0, n_self_cols, n_begin_cols, 1, n_self_cols))
            start2 = n_self_cols + n_begin_cols
            segments.append((0, start2, Ltot - start2, 2, start2))
        elif mode.is_inner:
            segments.append((0, n_self_cols, Ltot - n_self_cols, 1, n_self_cols))
        if not segments:  # plain SELF over the whole stream
            segments.append((0, 0, Ltot, 0, 0))
    # which segments each accumulator set sums over (indices into `segments`)
    if mode.is_outer:
        own = [0] if n_self_cols else []
        sets = [own + [len(segments) - 2], own + [len(segments) - 1]]
        # endpoint segments are skippable in fused modes; pure modes never
        # receive a skip vector (forced zero at the caller)
        skippable = {len(segments) - 2, len(segments) - 1}
    elif mode.is_inner:
        sets = [list(range(len(segments)))]
        skippable = {len(segments) - 1} if mode.is_fused else set()
    else:
        sets = [[0]]
        skippable = set()

    skip = skip_ref[b] != 0

    def exp_of(x):
        if exp_impl == "bf16":
            return jnp.exp(x.astype(jnp.bfloat16))
        return exp_fn(x)

    def exp_rows(sm, m):
        return exp_of(sm - m)

    def score(h):
        """Per-segment score slabs. Packed path: ONE full-stream QK dot,
        sliced (unchanged MXU shape); split path: one dot per segment
        against its source ref (each segment is block-scale wide, so the
        MXU sees the same large dots)."""
        q = q_ref[0, h]
        if ep_cols:
            slabs = []
            for (src, start, width, slot, moff) in segments:
                arr = k_ref[0, h] if src == 0 else ek_ref[h]
                ks = jax.lax.slice(arr, (start, 0), (start + width, Dp))
                slabs.append(jax.lax.dot_general(
                    q, ks, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale)
            return slabs
        s = jax.lax.dot_general(
            q, k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        return [jax.lax.slice(s, (0, start), (bq, start + width))
                for (src, start, width, slot, moff) in segments]

    def v_sources(h):
        v_srcs = [None if v_ref is None else v_ref[0, h]]
        if ep_cols:
            v_srcs.append(ev_ref[h])
        if den_col == Dp:
            # MXU-resident normalizer (see _kernel): widen V by a ones
            # column inside the lane tile the PV dot already pads to (the
            # Dp > D case needs nothing here — the wrapper wrote the ones
            # into the stream's zero pad lane)
            v_srcs = [None if x is None else
                      jnp.pad(x, ((0, 0), (0, 1)), constant_values=1)
                      for x in v_srcs]
        vw = next(x for x in v_srcs if x is not None).shape[-1]
        return v_srcs, vw

    def process(h, slabs):
        v_srcs, vw = v_sources(h)

        stats = []  # per segment: (m, l|None, pv) — with den_col>=0 the
        # normalizer rides pv lane den_col instead of a separate l
        for (src, start, width, slot, moff), s_seg in zip(segments, slabs):
            if needs_mask:
                col = jax.lax.broadcasted_iota(jnp.int32, (bq, width), 1)
                s_seg = jnp.where(col + moff < lens_ref[slot], s_seg, NEG_INF)
            if smax_shift is not None:
                m_seg = None
                p_seg = exp_of(jnp.minimum(s_seg - smax_shift, smax_clip))
            else:
                m_seg = jnp.max(s_seg, axis=-1, keepdims=True)
                p_seg = exp_rows(s_seg, m_seg)
            l_seg = (None if den_col >= 0 else
                     jnp.sum(p_seg, axis=-1, keepdims=True, dtype=jnp.float32))
            pv_seg = jax.lax.dot_general(
                p_seg.astype(v_srcs[src].dtype),
                jax.lax.slice(v_srcs[src], (start, 0), (start + width, vw)),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            stats.append((m_seg, l_seg, pv_seg))
        combine_store(h, stats, vw)

    def combine_store(h, stats, vw):
        outs = []
        for members in sets:
            if smax_shift is not None:
                # static shift: every segment is already at the shared
                # scale — num/den are plain sums, skip rows gate the
                # skippable segments with a scalar select
                num = jnp.zeros((bq, vw), jnp.float32)
                den = None if den_col >= 0 else jnp.zeros((bq, 1), jnp.float32)
                for i in members:
                    _, l_seg, pv_seg = stats[i]
                    if i in skippable:
                        g = jnp.where(skip, 0.0, 1.0)
                        pv_seg = pv_seg * g
                        l_seg = None if l_seg is None else l_seg * g
                    num = num + pv_seg
                    if den is not None:
                        den = den + l_seg
                if den is None:
                    den = num[:, den_col:den_col + 1]
                    num = num[:, :Dp]
                outs.append(num / jnp.maximum(den, 1e-37))
                continue
            live = [i for i in members if i not in skippable]
            gated = [i for i in members if i in skippable]
            # m_set over the segments that actually contribute: skip rows
            # exclude the gated segments (scalar select — `skip` is a
            # per-grid-step scalar, so this is branch-free row math)
            m_live = stats[live[0]][0] if live else None
            for i in live[1:]:
                m_live = jnp.maximum(m_live, stats[i][0])
            if gated:
                m_all = m_live
                for i in gated:
                    m_all = stats[i][0] if m_all is None else jnp.maximum(m_all, stats[i][0])
                m_set = m_all if m_live is None else jnp.where(skip, m_live, m_all)
            else:
                m_set = m_live
            num = jnp.zeros((bq, vw), jnp.float32)
            den = None if den_col >= 0 else jnp.zeros((bq, 1), jnp.float32)
            for i in members:
                m_seg, l_seg, pv_seg = stats[i]
                w = exp_fn(m_seg - m_set) if exp_impl != "bf16" else jnp.exp(m_seg - m_set)
                if i in skippable:
                    w = jnp.where(skip, 0.0, w)
                num = num + pv_seg * w
                if den is not None:
                    den = den + l_seg * w
            if den is None:
                den = num[:, den_col:den_col + 1]
                num = num[:, :Dp]
            outs.append(num / jnp.maximum(den, 1e-37))

        if mode.is_outer:
            c = coef_ref[b]
            out = (1.0 - c) * outs[0] + c * outs[1]
        else:
            out = outs[0]
        o_ref[0, h] = out.astype(o_ref.dtype)

    def process_chunked(h):
        """Chunk-skewed pipeline (pipeline_chunk > 0, static shift only):
        flatten the segments into K-chunks and issue chunk c+1's QK dot
        before chunk c's exp/PV in program order. Under the static shift
        every chunk contributes independently at the shared scale (num/den
        are plain sums), so no cross-chunk max/rescale chain serializes the
        pipeline, and only two chunk slabs are ever live."""
        pieces = []  # (seg_idx, src, start, width, slot, mask_offset)
        for si, (src, start, width, slot, moff) in enumerate(segments):
            for off in range(0, width, pipeline_chunk):
                w = min(pipeline_chunk, width - off)
                pieces.append((si, src, start + off, w, slot, moff + off))

        v_srcs, vw = v_sources(h)
        q = q_ref[0, h]
        num = [None] * len(segments)
        den = [None] * len(segments)

        def score_piece(piece):
            _, src, start, w, _, _ = piece
            arr = k_ref[0, h] if src == 0 else ek_ref[h]
            ks = jax.lax.slice(arr, (start, 0), (start + w, Dp))
            return jax.lax.dot_general(
                q, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale

        def exp_pv_piece(piece, s_seg):
            si, src, start, w, slot, moff = piece
            if needs_mask:
                col = jax.lax.broadcasted_iota(jnp.int32, (bq, w), 1)
                s_seg = jnp.where(col + moff < lens_ref[slot], s_seg, NEG_INF)
            p_seg = exp_of(jnp.minimum(s_seg - smax_shift, smax_clip))
            pv = jax.lax.dot_general(
                p_seg.astype(v_srcs[src].dtype),
                jax.lax.slice(v_srcs[src], (start, 0), (start + w, vw)),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            num[si] = pv if num[si] is None else num[si] + pv
            if den_col < 0:
                l = jnp.sum(p_seg, axis=-1, keepdims=True, dtype=jnp.float32)
                den[si] = l if den[si] is None else den[si] + l

        s_prev = score_piece(pieces[0])
        for i in range(1, len(pieces)):
            s_next = score_piece(pieces[i])
            exp_pv_piece(pieces[i - 1], s_prev)
            s_prev = s_next
        exp_pv_piece(pieces[-1], s_prev)
        combine_store(h, [(None, den[si], num[si])
                          for si in range(len(segments))], vw)

    # HOISTED head groups: within a group, every head's score matmul is
    # issued before ANY head's softmax/PV in program order, giving Mosaic
    # the chance to bundle head h+1's MXU QK tiles against head h's VPU
    # softmax. Alternatives measured and rejected (tools/opt3_results.jsonl
    # r3op_*): a fori_loop CARRY of the logit slab (2.80 ms at B7 H20
    # 1024x3072 — Mosaic copies multi-MB carries every iteration), a static
    # skewed score(h+1);process(h) pipeline (2.48 ms there, compile failure
    # at H=20 — Mosaic keeps every slab live), and full head unroll (scoped
    # VMEM stack OOM at H=20: 116 MB). Mosaic only lowers fori_loop
    # unroll=1/full, so the grouping is expressed manually.
    group = unroll if unroll > 1 and H % unroll == 0 else 1
    chunked = pipeline_chunk > 0 and smax_shift is not None

    def head_group(g, _):
        hs = [g * group + ui for ui in range(group)]
        if chunked:
            for h in hs:
                process_chunked(h)
        else:
            ss = [score(h) for h in hs]
            for h, s in zip(hs, ss):
                process(h, s)
        return 0

    jax.lax.fori_loop(0, H // group, head_group, 0)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "scale", "block_q", "block_k", "interpret", "pad_d",
                     "exp_impl", "short_unroll", "onepass_max", "mxu_den",
                     "static_smax", "pipeline_chunk"),
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
    skip_endpoints=None,  # (B,) bool: rows whose result must be OWN-K-only
    # (vanilla) attention. Honored as real predication only in FUSED modes
    # (endpoint segments dropped, the self segment remains). PURE streams
    # have no self segment, so the kernel ZEROES the vector there — pure-
    # mode callers must guarantee skip rows' endpoint K/V equals their own
    # K/V (true for every constructor in models/layers.py: coef-0/1
    # frames, batched-CFG uncond rows, sharded boundary frames), making
    # the unskipped result already vanilla. force_vanilla on arbitrary
    # pure-mode rows is NOT expressible here — dispatch_attention realizes
    # it by the duplicated-KV endpoint substitution instead.
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
    pad_d: bool = False,
    short_unroll: int = 1,  # head-loop unroll factor in the one-pass kernel
    onepass_max: int = 3072,  # max packed-stream length routed to the
    # one-pass kernel (whole stream resident; larger calls use the online-
    # softmax main kernel). 3072 routes the SDXL warmup fused_outer S=1024
    # calls (Ltot=3S) to the one-pass kernel: measured 2.25 vs 2.375 ms on
    # the main kernel (B7 H20, tools/opt3_results.jsonl r3op_* vs
    # r3flash_*); at Ltot>=4096 the main kernel wins (5.10 vs 5.53 self,
    # 15.3 vs 16.0 fused) so the threshold sits between.
    mxu_den: bool = True,  # ride the softmax normalizer on an MXU output
    # lane (ones-column in V) instead of a VPU rowsum reduction; auto-
    # disabled when D % 128 == 0 (no free lane without a whole extra tile)
    static_smax: Optional[float] | str = None,  # static-shift softmax
    # constant C (nats, pre-scale-fold): p = exp(min(s*scale - C, 30)).
    # None (the DEFAULT — the kernel is exact for arbitrary inputs) = exact
    # online/segment row max. Output is numerically the SAME softmax while
    # every row's max scaled logit lies in [C-72, C+30] (see module
    # docstring) — C=40 covers [-32, +70]. Kills the row-max VPU pass and
    # all m/l rescale work. "auto" applies the hardware-measured routing
    # (tools/opt3_results.jsonl r3sx_*): C=40 on the streaming main kernel
    # (wins 9-11% at S=4096: self 4.40 vs 4.85 ms, fused 12.87 vs 14.38)
    # and on one-pass non-self modes (fused@1024 1.89 vs 1.97); exact row
    # max on one-pass SELF, where the shift measured 10% SLOWER (the
    # one-pass self path has no rescale chain to delete — segment maxes
    # are computed once — so the clip pass is pure overhead there).
    # "auto" is opted into by dispatch_attention (the model path), where
    # logits are architecturally bounded (attention_logit_window calibrates
    # the assumption) — NOT here: a library-level default would silently
    # violate the exactness contract for out-of-window inputs (VERDICT r3
    # weak #1). Incompatible with exp_impl="bf16": exp(bf16(s-40)) at
    # operand magnitude ~40 quantizes at 0.125-nat steps (~13% per-prob
    # error); "auto" resolves to None under bf16, an explicit C raises.
    pipeline_chunk: int = 0,  # EXPERIMENTAL (one-pass kernel, static shift
    # only): K-chunk width for the chunk-skewed QK/exp/PV software pipeline
    # (see _kernel_onepass). 0 = off. Ignored on the streaming kernel and
    # whenever the static shift is inactive (the exact path's cross-chunk
    # max/rescale chain would serialize the skew anyway).
    exp_impl: str = "f32",  # "f32" | "exp2" | "bf16" (softmax exp strategy).
    # "f32"/"exp2" are numerically equivalent and fuzz-tested across all
    # modes. "bf16" is EXPERIMENTAL: only validated at mask-free,
    # block-aligned self/fused_outer shapes (measured ±1% perf — the kernel
    # is not exp-bound); its interaction with partial-block masking
    # (NEG_INF in bf16) and pure_outer/inner is untested, and
    # dispatch_attention never selects it.
) -> jnp.ndarray:
    """Flash interpolated attention (see module docstring).

    Default blocks 1024/1024 measured fastest across the SD1.5/SDXL
    self-attention shapes on v5e with the shared-max kernel
    (tools/opt2_results.jsonl); short-sequence (cross) calls auto-clamp.
    pad_d=False keeps D=64/D=40 head dims unpadded (faster at every
    measured shape; the interpret-mode fuzz suite covers both settings).

    Endpoint tensors default to batch rows 0 / B-1 of k/v (reference
    interpolation.py:627-630).
    """
    mode = AttnMode(mode)
    if isinstance(static_smax, str) and static_smax != "auto":
        raise ValueError(
            f"static_smax must be None, a float, or 'auto'; got {static_smax!r}")
    if static_smax is not None and exp_impl == "bf16":
        # exp(bf16(s - C)) at operand magnitude ~C quantizes at ~0.125-nat
        # steps — static shift and bf16 exp are numerically incompatible.
        if static_smax == "auto":
            static_smax = None
        else:
            raise ValueError(
                "static_smax is incompatible with exp_impl='bf16': the bf16 "
                "cast of the shifted logit (magnitude ~C) loses ~0.125 nats "
                "per probability; use exp_impl='f32'/'exp2' or static_smax=None")
    # NOTE: a no-transpose (B,S,H,D) layout was evaluated and rejected —
    # Mosaic forbids head-sliced blocks (last two block dims must be
    # (div 8, div 128) or match the array); see PERF.md.
    B, H, Sq, D = q.shape
    Lk = k.shape[2]
    seq_ax, ep_seq_ax = 2, -2
    if scale is None:
        scale = D ** -0.5
    if coef is None:
        coef = jnp.zeros((B,), jnp.float32)
    # 3D endpoints (H,L,D) are shared across rows; 4D (B,H,L,D) are PER-ROW
    # (used by the batched-CFG path where uncond rows carry their own K/V as
    # both endpoints, which reduces exactly to vanilla attention).
    if k_begin is None:
        k_begin, v_begin = k[0], v[0]
    if k_end is None:
        k_end, v_end = k[-1], v[-1]
    Le = k_begin.shape[ep_seq_ax]

    # pad_d=False keeps the head dim unpadded (legal: a block dim equal to
    # the full array dim bypasses the div-128 lane rule) — halves q/k/v/out
    # DMA for D=64 at the cost of Mosaic's internal lane padding on the dots.
    # Only valid within one lane tile: D>128 non-multiples (e.g. SD1.5's
    # 160-dim heads) must pad, or the TPU runtime rejects the layout.
    unpadded_ok = D <= LANES or D % LANES == 0
    Dp = _ceil_to(D, LANES) if (pad_d or not unpadded_ok) else D
    # Wide-head shapes (e.g. the VAE mid block: D=512 f32) blow past
    # Mosaic's per-buffer limits at the default 1024-row blocks — cap each
    # q/kv block at ~512 KB (the regime the block sweep validated).
    itemsize = jnp.dtype(q.dtype).itemsize
    if Dp * itemsize * LANES > 512 * 1024:
        # The row clamp floors at LANES rows; past this point the minimum
        # block already exceeds the 512 KB budget the clamp enforces, and
        # Mosaic would fail with an opaque allocation error — fail loudly
        # instead (no supported model hits this: needs D > 1024 at f32).
        raise ValueError(
            f"head dim {D} (padded {Dp}) at {q.dtype} needs "
            f"{Dp * itemsize * LANES // 1024} KB for a minimum {LANES}-row "
            "block, over the 512 KB Mosaic block budget; use the xla backend")
    max_rows = max(LANES, (512 * 1024) // (Dp * itemsize) // LANES * LANES)
    block_q = min(block_q, max_rows, _ceil_to(Sq, LANES))
    block_k = min(block_k, max_rows, _ceil_to(max(Lk, Le), LANES))
    Sqp = _ceil_to(Sq, block_q)
    Lkp = _ceil_to(Lk, block_k)
    Lep = _ceil_to(Le, block_k)

    def pad(x, s_axis, target_s):
        pads = [(0, 0)] * x.ndim
        pads[s_axis] = (0, target_s - x.shape[s_axis])
        pads[-1] = (0, Dp - D)
        return jnp.pad(x, pads)

    qp = pad(q, seq_ax, Sqp)

    # ---- stream geometry, decided BEFORE any packing so the one-pass
    # split-endpoint path can skip the packed-stream materialization
    cf = coef.astype(jnp.float32)
    include_self = mode in (AttnMode.SELF, AttnMode.FUSED_OUTER, AttnMode.FUSED_INNER)
    n_self = Lkp // block_k if include_self else 0
    if mode.is_outer:
        n_begin = n_end = Lep // block_k
    elif mode.is_inner:
        n_begin, n_end = Lep // block_k, 0
    else:
        n_begin = n_end = 0
    n_steps = n_self + n_begin + n_end
    Ltot = n_steps * block_k

    needs_mask = (include_self and Lkp != Lk) or (
        (mode.is_outer or mode.is_inner) and Lep != Le
    )

    # MXU-resident softmax normalizer lane (see kernel docstrings): the
    # ones-column goes in an existing zero pad lane (Dp > D — written ONCE
    # into the stream here, so the kernels touch nothing), or widens
    # V by one lane inside the tile the PV dot pads to anyway (D < 128
    # unpadded — kernel-side pad). D % 128 == 0 (e.g. the VAE's D=512) has
    # no free lane — keep the VPU rowsum there.
    if not mxu_den or D % LANES == 0:
        den_col = -1
    else:
        den_col = D if Dp > D else Dp

    def set_den_col(x):
        return x.at[..., den_col].set(1.0) if 0 <= den_col < Dp else x

    # outer modes with shared (3D) endpoints qualify for the split-endpoint
    # one-pass path, which wins past the default routing threshold
    # (_SPLIT_EP_ENABLE is a debugging escape hatch back to packed routing)
    split_capable = (_SPLIT_EP_ENABLE and mode.is_outer
                     and k_begin.ndim == 3 and v_begin.ndim == 3
                     and k_end.ndim == 3 and v_end.ndim == 3)
    onepass_limit = onepass_max
    if split_capable and onepass_max:
        onepass_limit = max(onepass_max, _SPLIT_ONEPASS_MAX)
    if Ltot <= onepass_limit:
        # one-pass path (see _kernel_onepass): whole stream in one block,
        # heads looped in-kernel, grid over (B, head groups, q blocks).
        # Covers cross-attention and IP branches in EVERY mode plus short
        # self/fused calls up to the routed threshold.
        #
        # Head group: largest divisor of H whose resident KV footprint stays
        # inside the proven envelope (20 heads x 1024 cols — the S=1024 H=20
        # SDXL shape). Bigger Ltot => fewer heads per grid step, so VMEM
        # stays bounded while the grid regains parallelism.
        # None when even a single head exceeds the envelope (possible with a
        # user-raised onepass_max): fall through to the streaming main
        # kernel rather than crash.
        hgroup = next((g for g in range(H, 0, -1)
                       if H % g == 0 and g * Ltot <= _ONEPASS_MAX_RESIDENT_COLS), None)
    else:
        hgroup = None
    if static_smax == "auto":
        # measured routing — see the parameter docstring above
        static_smax = None if (hgroup is not None and mode == AttnMode.SELF) else 40.0
    # static-shift constants, folded into the kernel's exp domain (exp2
    # kernels work in log2 units, so the shift and clip fold log2e too)
    _fold = 1.4426950408889634 if exp_impl == "exp2" else 1.0
    smax_shift = None if static_smax is None else float(static_smax) * _fold
    smax_clip = None if static_smax is None else 30.0 * _fold

    def pack_stream():
        """Materialize the packed [own | begin | end] / [own | cross] KV
        stream (endpoints broadcast to every row) + the absolute per-phase
        valid lengths. Used by the streaming kernel and the non-split
        one-pass paths (inner modes lerp per row; 4D endpoints are per-row
        by definition)."""
        segs_k, segs_v = [], []
        if include_self:
            segs_k.append(pad(k, seq_ax, Lkp))
            segs_v.append(pad(v, seq_ax, Lkp))

        def tile(x):  # shared 3D or per-row 4D endpoint -> padded (B, H, Lep, Dp)
            x = pad(x, x.ndim + ep_seq_ax, Lep)
            if x.ndim == 3:
                x = jnp.broadcast_to(x[None], (B, H, Lep, Dp))
            return x

        if mode.is_outer:
            segs_k += [tile(k_begin), tile(k_end)]
            segs_v += [tile(v_begin), tile(v_end)]
        elif mode.is_inner:
            c4 = cf.reshape(B, 1, 1, 1)
            kb4, ke4 = tile(k_begin).astype(jnp.float32), tile(k_end).astype(jnp.float32)
            vb4, ve4 = tile(v_begin).astype(jnp.float32), tile(v_end).astype(jnp.float32)
            segs_k.append(((1.0 - c4) * kb4 + c4 * ke4).astype(q.dtype))
            segs_v.append(((1.0 - c4) * vb4 + c4 * ve4).astype(q.dtype))

        kv_k = segs_k[0] if len(segs_k) == 1 else jnp.concatenate(segs_k, axis=seq_ax)
        kv_v = set_den_col(segs_v[0] if len(segs_v) == 1
                           else jnp.concatenate(segs_v, axis=seq_ax))
        # absolute valid end columns per phase in the packed stream
        # (inner's cross phase masks via the "begin" slot)
        lens = jnp.array([Lk, n_self * block_k + Le,
                          (n_self + n_begin) * block_k + Le], jnp.int32)
        return kv_k, kv_v, lens

    if hgroup is not None:
        # SPLIT-ENDPOINT path: outer modes with shared (3D) endpoints skip
        # the packed-stream materialization entirely — own K/V ride through
        # (pad-only; zero copies at block-aligned D=64 shapes) and both
        # endpoint streams share ONE (H, 2*Lep, Dp) operand whose block
        # index map ignores the batch dim, so the B-fold endpoint broadcast
        # never exists in HBM. Measured -22% at fused@1024 and -30% at
        # fused@4096 vs the packed paths (tools/opt4_results.jsonl
        # r4split_* vs r4packg_*).
        split_ep = split_capable
        kernel_scale1 = float(scale) * _fold
        k1 = functools.partial(
            _kernel_onepass, mode=mode, scale=kernel_scale1,
            n_self_cols=n_self * block_k, n_begin_cols=n_begin * block_k,
            H=hgroup, exp_impl=exp_impl, needs_mask=needs_mask,
            unroll=short_unroll, den_col=den_col,
            smax_shift=smax_shift, smax_clip=smax_clip,
            ep_cols=Lep if split_ep else 0,
            pipeline_chunk=_ceil_to(pipeline_chunk, LANES) if pipeline_chunk else 0,
        )
        q_spec1 = pl.BlockSpec((1, hgroup, block_q, Dp), lambda b, g, i, *_: (b, g, i, 0))
        if skip_endpoints is None or not mode.is_fused:
            skip1 = jnp.zeros((B,), jnp.int32)
        else:
            skip1 = skip_endpoints.astype(jnp.int32)
        if split_ep:
            def pad3(x):
                return jnp.pad(x, ((0, 0), (0, Lep - x.shape[-2]), (0, Dp - D)))

            ep_k3 = jnp.concatenate([pad3(k_begin), pad3(k_end)], axis=-2)
            ep_v3 = set_den_col(jnp.concatenate([pad3(v_begin), pad3(v_end)], axis=-2))
            lens1 = jnp.array([Lk, Le, Lep + Le], jnp.int32)
            ep_spec = pl.BlockSpec((hgroup, 2 * Lep, Dp), lambda b, g, i, *_: (g, 0, 0))
            in_specs1 = [q_spec1]
            operands = [qp]
            if n_self:  # pure_outer never reads the own stream — don't ship it
                own_spec = pl.BlockSpec((1, hgroup, Lkp, Dp), lambda b, g, i, *_: (b, g, 0, 0))
                in_specs1 += [own_spec, own_spec]
                operands += [pad(k, seq_ax, Lkp), set_den_col(pad(v, seq_ax, Lkp))]
            in_specs1 += [ep_spec, ep_spec]
            operands += [ep_k3, ep_v3]
        else:
            kv_k, kv_v, lens1 = pack_stream()
            kv_spec1 = pl.BlockSpec((1, hgroup, Ltot, Dp), lambda b, g, i, *_: (b, g, 0, 0))
            in_specs1 = [q_spec1, kv_spec1, kv_spec1]
            operands = [qp, kv_k, kv_v]
        grid_spec1 = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, H // hgroup, Sqp // block_q),
            in_specs=in_specs1,
            out_specs=q_spec1,
        )
        # whole-stream blocks at (1, H, 1024, Dp) x q/k/v/out exceed the
        # default scoped-vmem budget once double-buffered (seen as a
        # compile-time stack OOM inside large programs at B=7 H=20 —
        # standalone compiles pass, full denoise programs don't)
        cp1 = _compiler_params("parallel", "parallel", "parallel")
        out = pl.pallas_call(
            k1, grid_spec=grid_spec1,
            out_shape=jax.ShapeDtypeStruct((B, H, Sqp, Dp), q.dtype),
            compiler_params=cp1, interpret=interpret,
        )(lens1, cf, skip1, *operands)
        return out[:, :, :Sq, :D]

    kv_k, kv_v, lens = pack_stream()

    n_sets = 2 if mode.is_outer else 1
    n_m = 2 if (mode.is_outer and not mode.is_fused) else 1
    # exp2 strategy: fold log2(e) into the score scale so in-kernel
    # 2^(s-m) equals e^(s/log2e - m/log2e) — bit-for-bit the same softmax
    kernel_scale = float(scale) * _fold
    kernel = functools.partial(
        _kernel,
        mode=mode,
        scale=kernel_scale,
        block_k=block_k,
        n_self=n_self,
        n_begin=n_begin,
        n_steps=n_steps,
        needs_mask=needs_mask,
        exp_impl=exp_impl,
        den_col=den_col,
        smax_shift=smax_shift,
        smax_clip=smax_clip,
    )

    q_spec = pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, i, j, *_: (b, h, i, 0))
    kv_spec = pl.BlockSpec((1, 1, block_k, Dp), lambda b, h, i, j, *_: (b, h, j, 0))
    out_shape = (B, H, Sqp, Dp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, H, Sqp // block_q, n_steps),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        scratch_shapes=[
            # running max: shared for self/fused (coupled via the self
            # segment), per-set for pure outer (disjoint streams); unused
            # with the static shift (minimal dummy)
            pltpu.VMEM((1, 8, LANES) if smax_shift is not None else
                       (n_m, block_q, LANES), jnp.float32),
            # l: unused with the MXU-resident normalizer (minimal dummy —
            # the normalizer rides acc lane den_col instead)
            pltpu.VMEM((1, 8, LANES) if den_col >= 0 else
                       (n_sets, block_q, LANES), jnp.float32),
            pltpu.VMEM((n_sets, block_q,
                        Dp + 1 if den_col == Dp else Dp), jnp.float32),
        ],
    )

    # batch/head/q-block grid dims are embarrassingly parallel; only the
    # kv-step dim carries the online-softmax state.
    cp = _compiler_params("parallel", "parallel", "parallel", "arbitrary")

    if skip_endpoints is None or not mode.is_fused:
        # pure modes have no self segments — their single pass must run
        skip = jnp.zeros((B,), jnp.int32)
    else:
        skip = skip_endpoints.astype(jnp.int32)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, q.dtype),
        compiler_params=cp,
        interpret=interpret,
    )(lens, cf, skip, qp, kv_k, kv_v)
    return out[:, :, :Sq, :D]
