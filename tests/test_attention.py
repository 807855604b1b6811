"""Kernel-level tests: batched interpolated attention vs a naive per-frame
oracle implementing the exact reference formulas
(reference interpolation.py:548-679 outer, :682-804 inner).
SURVEY.md §4 'Kernel'."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aid_tpu.ops import AttnMode, attention, interpolated_attention

B, H, S, L, D = 5, 2, 6, 4, 8


def _np_attn(q, k, v, scale):
    logits = q @ k.swapaxes(-1, -2) * scale
    logits = logits - logits.max(axis=-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(axis=-1, keepdims=True)
    return p @ v


def _oracle(q, k, v, coef, mode):
    """Per-frame numpy implementation of the reference processor math."""
    scale = q.shape[-1] ** -0.5
    kb, vb = k[0], v[0]
    ke, ve = k[-1], v[-1]
    out = np.zeros_like(q)
    for i in range(q.shape[0]):
        c = coef[i]
        if mode == "self":
            out[i] = _np_attn(q[i], k[i], v[i], scale)
        elif mode in ("pure_outer", "fused_outer"):
            kbi, vbi, kei, vei = kb, vb, ke, ve
            if mode == "fused_outer":
                kbi = np.concatenate([k[i], kb], axis=-2)
                vbi = np.concatenate([v[i], vb], axis=-2)
                kei = np.concatenate([k[i], ke], axis=-2)
                vei = np.concatenate([v[i], ve], axis=-2)
            out[i] = (1 - c) * _np_attn(q[i], kbi, vbi, scale) + c * _np_attn(q[i], kei, vei, scale)
        else:
            kx = (1 - c) * kb + c * ke
            vx = (1 - c) * vb + c * ve
            if mode == "fused_inner":
                kx = np.concatenate([k[i], kx], axis=-2)
                vx = np.concatenate([v[i], vx], axis=-2)
            out[i] = _np_attn(q[i], kx, vx, scale)
    return out


@pytest.fixture
def qkv():
    rng = np.random.default_rng(42)
    q = rng.normal(size=(B, H, S, D)).astype(np.float32)
    k = rng.normal(size=(B, H, L, D)).astype(np.float32)
    v = rng.normal(size=(B, H, L, D)).astype(np.float32)
    coef = np.linspace(0, 1, B).astype(np.float32)
    return q, k, v, coef


@pytest.mark.parametrize(
    "mode", ["self", "pure_outer", "fused_outer", "pure_inner", "fused_inner"]
)
def test_matches_per_frame_oracle(qkv, mode):
    q, k, v, coef = qkv
    got = np.asarray(
        interpolated_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(coef), mode)
    )
    want = _oracle(q, k, v, coef, mode)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_endpoint_frames_are_fixed_points(qkv):
    """With coef[0]=0 and coef[-1]=1, fused-outer endpoint frames attend only
    to [own; own] K/V, i.e. exactly their vanilla attention output."""
    q, k, v, coef = qkv
    out = np.asarray(
        interpolated_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(coef), AttnMode.FUSED_OUTER)
    )
    vanilla = np.asarray(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(out[0], vanilla[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out[-1], vanilla[-1], rtol=2e-5, atol=2e-5)


def test_explicit_endpoints_override(qkv):
    q, k, v, coef = qkv
    rng = np.random.default_rng(7)
    kb = rng.normal(size=(H, L, D)).astype(np.float32)
    vb = rng.normal(size=(H, L, D)).astype(np.float32)
    ke = rng.normal(size=(H, L, D)).astype(np.float32)
    ve = rng.normal(size=(H, L, D)).astype(np.float32)
    got = np.asarray(
        interpolated_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(coef),
            AttnMode.PURE_OUTER,
            k_begin=jnp.asarray(kb), v_begin=jnp.asarray(vb),
            k_end=jnp.asarray(ke), v_end=jnp.asarray(ve),
        )
    )
    k2 = k.copy(); v2 = v.copy()
    k2[0], v2[0], k2[-1], v2[-1] = kb, vb, ke, ve
    want = _oracle(q, k2, v2, coef, "pure_outer")
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_inner_with_midpoint_coef_is_kv_average(qkv):
    q, k, v, _ = qkv
    coef = jnp.full((B,), 0.5)
    got = np.asarray(
        interpolated_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), coef, AttnMode.PURE_INNER)
    )
    kx = 0.5 * (k[0] + k[-1])
    vx = 0.5 * (v[0] + v[-1])
    scale = D ** -0.5
    want = np.stack([_np_attn(q[i], kx, vx, scale) for i in range(B)])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bfloat16_runs(qkv):
    q, k, v, coef = qkv
    out = interpolated_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.asarray(coef), AttnMode.FUSED_OUTER,
    )
    assert out.dtype == jnp.bfloat16
    assert out.shape == (B, H, S, D)


def test_attention_logit_window_stats():
    """Calibration helper: returns (min,max) of per-row max scaled logits
    (the static-shift softmax window check in PARITY.md)."""
    import numpy as np
    from aid_tpu.ops.attention import attention_logit_window

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(2, 2, 32, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, 48, 16)).astype(np.float32))
    lo, hi = attention_logit_window(q, k)
    s = (np.asarray(q, np.float64) @ np.swapaxes(np.asarray(k, np.float64), -1, -2)) * 16 ** -0.5
    rm = s.max(-1)
    np.testing.assert_allclose(float(lo), rm.min(), rtol=1e-5)
    np.testing.assert_allclose(float(hi), rm.max(), rtol=1e-5)


class TestProbeLogitWindowPerSet:
    """The calibration probe must certify PER-ACCUMULATOR-SET row maxes:
    each softmax the kernel evaluates normalizes over its own key set, so
    a set whose row max sits below C-72 must drag the reported lo down
    even when another set's larger max would dominate a packed-union
    probe (code-review r4: union row max hid the lower edge)."""

    def _window(self, q, k, mode, k_begin, k_end, **probe_kwargs):
        import importlib

        # NB: `import aid_tpu.ops.attention as A` would bind the package's
        # re-exported `attention` FUNCTION, not the submodule
        A = importlib.import_module("aid_tpu.ops.attention")

        acc = []
        A.LOGIT_WINDOW_RECORDER = lambda lo, hi: acc.append((float(lo), float(hi)))
        try:
            A._probe_logit_window(q, k, None, mode, k_begin, k_end,
                                  q.shape[-1] ** -0.5, **probe_kwargs)
            jax.effects_barrier()
        finally:
            A.LOGIT_WINDOW_RECORDER = None
        (lo, hi), = acc
        return lo, hi

    @staticmethod
    def _maxes(q, k, kb, ke):
        sc = np.float64(q.shape[-1]) ** -0.5
        qn = np.asarray(q, np.float64)

        def rm(x):
            xb = np.asarray(jnp.broadcast_to(x, q.shape), np.float64)
            return (qn @ xb.swapaxes(-1, -2) * sc).max(-1)

        return rm(k), rm(kb), rm(ke)

    def test_pure_outer_low_segment_not_hidden(self):
        rng = np.random.default_rng(7)
        B, H, S, D = 3, 2, 16, 8
        q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
        kb = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
        ke = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32) - 4.0)
        lo, hi = self._window(q, q, "pure_outer", kb, ke)
        # exact per-set answer: lo = min over rows/sets of that set's row
        # max — the [ke] set drags lo down even where [kb] dominates
        _, mb, me = self._maxes(q, q, kb, ke)
        np.testing.assert_allclose(lo, np.minimum(mb, me).min(), rtol=1e-5)
        np.testing.assert_allclose(hi, np.maximum(mb, me).max(), rtol=1e-5)
        # strictly below what the old packed-union probe reported (the
        # union's per-row max is max(mb, me), hiding the lower set)
        assert lo < np.maximum(mb, me).min() - 1e-6

    def test_pure_force_vanilla_adds_own_k_set(self):
        """With force_vanilla, arbitrary rows softmax over their OWN K
        (duplicated-KV substitution), so the own-K set joins the window;
        without it the pure window must NOT include the vanilla diagonal
        (code-review r4 #3: unconditional widening spuriously disqualifies
        configs whose endpoint sets are in-window)."""
        rng = np.random.default_rng(12)
        B, H, S, D = 3, 2, 16, 8
        q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32) + 6.0)
        kb = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
        ke = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
        mo, mb, me = self._maxes(q, k, kb, ke)
        lo, hi = self._window(q, k, "pure_outer", kb, ke,
                              force_vanilla=jnp.asarray(True))
        np.testing.assert_allclose(
            lo, np.minimum(np.minimum(mb, me), mo).min(), rtol=1e-5)
        np.testing.assert_allclose(
            hi, np.maximum(np.maximum(mb, me), mo).max(), rtol=1e-5)
        # a skip vector alone must NOT widen (skip contract: those rows'
        # endpoints ARE their own K/V, already covered by mb/me)
        lo2, hi2 = self._window(q, k, "pure_outer", kb, ke,
                                skip_endpoints=jnp.zeros((B,), bool))
        np.testing.assert_allclose(lo2, np.minimum(mb, me).min(), rtol=1e-5)
        np.testing.assert_allclose(hi2, np.maximum(mb, me).max(), rtol=1e-5)
        assert hi > hi2  # own K sits +6 sigma: force really widened

    def test_fused_outer_sets_include_own_k(self):
        rng = np.random.default_rng(8)
        B, H, S, D = 3, 2, 16, 8
        q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
        kb = k[0] - 60.0
        ke = k[-1]
        lo, hi = self._window(q, k, "fused_outer", kb, ke)
        mo, mb, me = self._maxes(q, k, kb, ke)
        s1, s2 = np.maximum(mo, mb), np.maximum(mo, me)
        # fused sets softmax over [k; endpoint] — own K couples both sets
        # structurally (no widening needed for skip rows: per-row
        # min(s1, s2) >= mo, and force_vanilla rows' own-only set has row
        # max mo <= min(s1, s2), covered when force is passed)
        np.testing.assert_allclose(lo, np.minimum(s1, s2).min(), rtol=1e-5)
        np.testing.assert_allclose(hi, np.maximum(s1, s2).max(), rtol=1e-5)
        # force_vanilla: own-only sets can sit BELOW min(s1, s2)
        lo3, _ = self._window(q, k, "fused_outer", kb, ke,
                              force_vanilla=jnp.asarray(True))
        np.testing.assert_allclose(
            lo3, np.minimum(np.minimum(s1, s2), mo).min(), rtol=1e-5)
        # a FUSED-mode skip vector alone also widens: the kernel gates skip
        # rows to the own-only set and the probe cannot see which rows or
        # whether their endpoints equal own K/V (code-review r4b #2)
        lo4, _ = self._window(q, k, "fused_outer", kb, ke,
                              skip_endpoints=jnp.zeros((3,), bool))
        np.testing.assert_allclose(lo4, lo3, rtol=1e-5)

    def test_inner_lower_bound_is_elementwise_min(self):
        rng = np.random.default_rng(9)
        B, H, S, D = 3, 2, 16, 8
        q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
        kb = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
        ke = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
        lo, hi = self._window(q, q, "pure_inner", kb, ke)
        sc = np.float64(D) ** -0.5
        qn = np.asarray(q, np.float64)
        lb = qn @ np.asarray(jnp.broadcast_to(kb, q.shape), np.float64).swapaxes(-1, -2) * sc
        le = qn @ np.asarray(jnp.broadcast_to(ke, q.shape), np.float64).swapaxes(-1, -2) * sc
        np.testing.assert_allclose(
            lo, np.minimum(lb, le).max(-1).min(), rtol=1e-5)
        np.testing.assert_allclose(
            hi, np.maximum(lb.max(-1), le.max(-1)).max(), rtol=1e-5)
        # soundness vs every t: the true lerped row max stays inside [lo, hi]
        for t in (0.0, 0.25, 0.5, 0.75, 1.0):
            rm = ((1 - t) * lb + t * le).max(-1)
            assert lo <= rm.min() + 1e-9 and rm.max() <= hi + 1e-9

    def test_fused_inner_force_collapses_lower_to_own(self):
        """FUSED_INNER: without force the lower edge uses the elementwise-
        min lerp bound max'd with own K; with force it provably collapses
        to own K alone (min(max(mo, mmin), mo) == mo), and the probe skips
        the pair pass entirely (code-review r4 #4)."""
        rng = np.random.default_rng(10)
        B, H, S, D = 3, 2, 16, 8
        q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
        kb = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
        ke = jnp.asarray(rng.normal(size=(H, S, D)).astype(np.float32))
        mo, mb, me = self._maxes(q, k, kb, ke)
        sc = np.float64(D) ** -0.5
        qn = np.asarray(q, np.float64)
        lb = qn @ np.asarray(jnp.broadcast_to(kb, q.shape), np.float64).swapaxes(-1, -2) * sc
        le = qn @ np.asarray(jnp.broadcast_to(ke, q.shape), np.float64).swapaxes(-1, -2) * sc
        mmin = np.minimum(lb, le).max(-1)
        lo, hi = self._window(q, k, "fused_inner", kb, ke)
        np.testing.assert_allclose(lo, np.maximum(mo, mmin).min(), rtol=1e-5)
        np.testing.assert_allclose(
            hi, np.maximum(mo, np.maximum(mb, me)).max(), rtol=1e-5)
        lo2, hi2 = self._window(q, k, "fused_inner", kb, ke,
                                force_vanilla=jnp.asarray(True))
        np.testing.assert_allclose(lo2, mo.min(), rtol=1e-5)
        np.testing.assert_allclose(hi2, hi, rtol=1e-5)


class TestDispatchForceVanilla:
    """force_vanilla on the xla path (VERDICT r3 weak #6): realized by the
    duplicated-KV endpoint substitution — ONE interpolated evaluation per
    call, never interpolated+vanilla double-compute-and-select."""

    @pytest.mark.parametrize(
        "mode", ["pure_outer", "fused_outer", "pure_inner", "fused_inner"]
    )
    def test_reduces_to_vanilla(self, qkv, mode):
        from aid_tpu.ops.attention import dispatch_attention

        q, k, v, coef = map(jnp.asarray, qkv)
        van = attention(q, k, v)
        on = dispatch_attention(q, k, v, coef, mode, backend="xla",
                                force_vanilla=jnp.asarray(True))
        np.testing.assert_allclose(np.asarray(on), np.asarray(van),
                                   rtol=2e-5, atol=2e-5)
        off = dispatch_attention(q, k, v, coef, mode, backend="xla",
                                 force_vanilla=jnp.asarray(False))
        want = interpolated_attention(q, k, v, coef, mode)
        np.testing.assert_allclose(np.asarray(off), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_explicit_endpoints(self, qkv):
        from aid_tpu.ops.attention import dispatch_attention

        q, k, v, coef = map(jnp.asarray, qkv)
        rng = np.random.default_rng(7)
        kb = jnp.asarray(rng.normal(size=k.shape[1:]).astype(np.float32))
        vb = jnp.asarray(rng.normal(size=v.shape[1:]).astype(np.float32))
        van = attention(q, k, v)
        on = dispatch_attention(q, k, v, coef, "fused_inner", backend="xla",
                                k_begin=kb, v_begin=vb,
                                force_vanilla=jnp.asarray(True))
        np.testing.assert_allclose(np.asarray(on), np.asarray(van),
                                   rtol=2e-5, atol=2e-5)

    def test_mismatched_endpoint_len_fallback(self, qkv):
        """Endpoint seq length != own KV length routes through the
        compute-both-and-select fallback and still returns vanilla."""
        from aid_tpu.ops.attention import dispatch_attention

        q, k, v, coef = map(jnp.asarray, qkv)
        rng = np.random.default_rng(8)
        Lb = k.shape[-2] + 3
        kb = jnp.asarray(rng.normal(size=(H, Lb, D)).astype(np.float32))
        vb = jnp.asarray(rng.normal(size=(H, Lb, D)).astype(np.float32))
        ke = jnp.asarray(rng.normal(size=(H, Lb, D)).astype(np.float32))
        ve = jnp.asarray(rng.normal(size=(H, Lb, D)).astype(np.float32))
        van = attention(q, k, v)
        on = dispatch_attention(q, k, v, coef, "fused_outer", backend="xla",
                                k_begin=kb, v_begin=vb, k_end=ke, v_end=ve,
                                force_vanilla=jnp.asarray(True))
        np.testing.assert_allclose(np.asarray(on), np.asarray(van),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("with_skip", [True, False])
    @pytest.mark.parametrize("mode", ["pure_outer", "pure_inner",
                                      "fused_outer", "fused_inner"])
    def test_kernel_path_honors_force_vanilla(self, qkv, mode, with_skip,
                                              monkeypatch):
        """Kernel-path force_vanilla (code-review r4 #1): the flash kernel
        only honors skip rows in fused modes, so dispatch must realize
        force_vanilla for PURE modes by the duplicated-KV endpoint
        substitution before calling the kernel — previously those rows
        silently received interpolated output. with_skip=False exercises
        dispatch's OWN skip|force fold for fused modes (code-review r4b #1:
        direct callers must not need to replicate layers.py's fold)."""
        import importlib

        A = importlib.import_module("aid_tpu.ops.attention")
        monkeypatch.setattr(A, "resolve_backend", lambda b="auto": "flash")
        monkeypatch.setattr(A, "FLASH_MIN_KV", 1)
        monkeypatch.setattr(A, "FLASH_KERNEL_OVERRIDES", {"interpret": True})

        q, k, v, coef = map(jnp.asarray, qkv)
        # skip vector as the model path builds it: coef mask | force
        skip = jnp.ones((q.shape[0],), bool) if with_skip else None
        van = attention(q, k, v)
        on = A.dispatch_attention(q, k, v, coef, mode,
                                  skip_endpoints=skip,
                                  force_vanilla=jnp.asarray(True))
        np.testing.assert_allclose(np.asarray(on), np.asarray(van),
                                   rtol=2e-3, atol=2e-3)
        off = A.dispatch_attention(q, k, v, coef, mode,
                                   force_vanilla=jnp.asarray(False))
        want = interpolated_attention(q, k, v, coef, mode)
        np.testing.assert_allclose(np.asarray(off), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)

    def test_single_attention_evaluation(self, qkv):
        """Structural no-double-compute guard: fused_inner under
        force_vanilla must lower to exactly 2 dot_generals (QK + PV) —
        the old select path had 4 (interpolated pair + vanilla pair)."""
        import jax

        from aid_tpu.ops.attention import dispatch_attention

        q, k, v, coef = map(jnp.asarray, qkv)

        def count_dots(jaxpr):
            n = 0
            for eqn in jaxpr.eqns:
                if eqn.primitive.name == "dot_general":
                    n += 1
                for sub in jax.core.jaxprs_in_params(eqn.params) \
                        if hasattr(jax.core, "jaxprs_in_params") else []:
                    n += count_dots(sub)
                for pval in eqn.params.values():
                    if hasattr(pval, "jaxpr"):
                        n += count_dots(pval.jaxpr)
            return n

        fn = lambda fv: dispatch_attention(q, k, v, coef, "fused_inner",
                                           backend="xla", force_vanilla=fv)
        jaxpr = jax.make_jaxpr(fn)(jnp.asarray(True)).jaxpr
        assert count_dots(jaxpr) == 2
