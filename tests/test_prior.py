"""Prior/selection tests: DP path search vs brute force, beta fitting,
dynamic selection with a fake deterministic scorer (SURVEY.md §4)."""

import itertools

import numpy as np
import pytest

from aid_tpu.metrics.gini import compute_gini, compute_smoothness_and_consistency
from aid_tpu.prior import (
    BetaPriorPipeline,
    GPOptimizer,
    bayesian_prior_selection,
    find_minimal_spread_and_path,
    fit_alpha_beta,
)


def _brute_force_minimal_spread(n, m, weights):
    """Exhaustive search over all increasing paths 0 -> m-1 of length n."""
    best_spread, best_path = None, None
    for mids in itertools.combinations(range(1, m - 1), n - 2):
        path = (0,) + mids + (m - 1,)
        ws = [weights[path[i]][path[i + 1]] for i in range(n - 1)]
        if any(w == -1 for w in ws):
            continue
        spread = max(ws) - min(ws)
        if best_spread is None or spread < best_spread:
            best_spread, best_path = spread, list(path)
    return best_spread, best_path


class TestDPPathSearch:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_brute_force_spread(self, seed):
        rng = np.random.default_rng(seed)
        m, n = 8, 4
        weights = -np.ones((m, m))
        for i in range(m):
            for j in range(i + 1, m):
                weights[i][j] = rng.uniform(0.1, 1.0)
        want_spread, _ = _brute_force_minimal_spread(n, m, weights)
        got_spread, got_path = find_minimal_spread_and_path(n, m, weights)
        assert got_path[0] == 0 and got_path[-1] == m - 1 and len(got_path) == n
        ws = [weights[got_path[i]][got_path[i + 1]] for i in range(n - 1)]
        # binary search converges to within epsilon of the optimum
        assert max(ws) - min(ws) <= want_spread + 1e-4


class TestBetaFit:
    def test_recovers_known_beta(self):
        from aid_tpu.ops.interp import beta_cdf, generate_beta_schedule

        a_true, b_true = 4.0, 2.0
        xs = np.linspace(0.01, 0.99, 12)
        cdf = beta_cdf(xs, a_true, b_true)
        ds = np.diff(cdf)  # distances proportional to CDF increments
        a, b = fit_alpha_beta(xs, ds)
        assert abs(a - a_true) < 0.2 and abs(b - b_true) < 0.2


class _FakePipe:
    """Deterministic stand-in: 'image' i is a gradient image keyed by t."""

    def __init__(self):
        self.calls = []
        self.batch_calls = []

    def interpolate_single(self, t, *args, **kwargs):
        self.calls.append(t)
        def img(tv):
            x = np.full((8, 8, 3), tv * 255.0)
            return x.astype(np.uint8)
        return np.stack([img(0.0), img(t), img(1.0)])

    def generate_latent(self, seed=0):
        return np.zeros((1, 4, 4, 4), np.float32)

    def interpolate(self, latent_start=None, latent_end=None, prompt_start="",
                    prompt_end="", ts=None, **kwargs):
        ts = np.asarray(ts, np.float32)
        assert ts[0] == 0.0 and ts[-1] == 1.0 and np.all(np.diff(ts) >= 0)
        self.batch_calls.append([float(t) for t in ts])
        return np.stack(
            [np.full((8, 8, 3), t * 255.0).astype(np.uint8) for t in ts])

    def interpolate_save_gpu(self, *args, size=3, alpha=None, beta=None, **kw):
        from aid_tpu.ops.interp import generate_beta_schedule

        ts = generate_beta_schedule(size, alpha or 3, beta or 3, force_endpoints=True)
        return np.stack([np.full((8, 8, 3), t * 255.0, np.uint8) for t in ts])


def _fake_features(images: np.ndarray) -> np.ndarray:
    """Maps brightness to an angle on the unit circle -> cosine distance is
    monotone in |t_a - t_b| (deterministic CLIP stand-in)."""
    t = images.reshape(images.shape[0], -1).mean(axis=1) / 255.0
    ang = t * 0.9  # < pi
    return np.stack([np.cos(ang), np.sin(ang)], axis=1)


class TestBetaPriorPipeline:
    def test_explore_inserts_at_largest_gap(self):
        pipe = _FakePipe()
        bp = BetaPriorPipeline(pipe, _fake_features)
        images, features, ds, xs, alpha, beta = bp.explore_with_beta(
            "a", "b", exploration_size=7, num_inference_steps=2,
        )
        assert len(xs) == 7
        assert xs == sorted(xs) and xs[0] == 0.0 and xs[-1] == 1.0
        assert len(ds) == len(xs) - 1
        assert len(images) == len(features) == 7

    def test_generate_interpolation_selects_subsequence(self):
        pipe = _FakePipe()
        bp = BetaPriorPipeline(pipe, _fake_features)
        out = bp.generate_interpolation(
            "a", "b", exploration_size=8, interpolation_size=5,
            num_inference_steps=2,
        )
        assert len(out) == 5
        assert bp.xs[0] == 0.0 and bp.xs[-1] == 1.0

    def test_uniform_mode(self):
        pipe = _FakePipe()
        bp = BetaPriorPipeline(pipe, _fake_features)
        _, _, _, xs, alpha, beta = bp.explore_with_beta(
            "a", "b", exploration_size=5, uniform=True, num_inference_steps=2,
        )
        assert alpha == 1.0 and beta == 1.0
        # uniform midpoint insertion: 0.25/0.75 appear
        assert any(abs(x - 0.25) < 1e-6 for x in xs)


class TestBatchedExploration:
    """SURVEY §7 batched candidate generation (VERDICT r4 next #2b)."""

    def test_gen_batch_preserves_input_order(self):
        pipe = _FakePipe()
        bp = BetaPriorPipeline(pipe, _fake_features)
        out = bp._gen_batch([0.7, 0.2], prompt_start="a", prompt_end="b",
                            latent_start=None, latent_end=None)
        assert out.shape[0] == 2
        # the engine sorts ts internally; results must come back in input order
        assert abs(out[0].mean() / 255.0 - 0.7) < 2 / 255
        assert abs(out[1].mean() / 255.0 - 0.2) < 2 / 255
        assert pipe.batch_calls[0] == sorted(pipe.batch_calls[0])

    def test_batch_k_explores_in_rounds(self):
        pipe = _FakePipe()
        bp = BetaPriorPipeline(pipe, _fake_features)
        images, features, ds, xs, alpha, beta = bp.explore_with_beta(
            "a", "b", exploration_size=9, batch_k=3, num_inference_steps=2,
        )
        assert len(xs) == 9 and xs == sorted(xs)
        assert xs[0] == 0.0 and xs[-1] == 1.0
        assert len(images) == len(features) == 9 and len(ds) == 8
        # every frame sits at its coefficient (fake image encodes t)
        for im, t in zip(images, xs):
            assert abs(im.mean() / 255.0 - t) < 2 / 255
        # round 1 has only 2 gaps (batch of 2+2), round 2 inserts 3 (3+2),
        # the last single insert takes the k=1 interpolate_single path
        assert [len(c) for c in pipe.batch_calls] == [4, 5]
        assert len(pipe.calls) == 2  # initial t=0.5 + the final single insert

    def test_batch_k_respects_exploration_cap(self):
        pipe = _FakePipe()
        bp = BetaPriorPipeline(pipe, _fake_features)
        *_, xs, _, _ = bp.explore_with_beta(
            "a", "b", exploration_size=6, batch_k=4, num_inference_steps=2,
        )
        assert len(xs) == 6  # 3 initial + one round clamped to k=3

    def test_batch_k_one_keeps_reference_sequence(self):
        """batch_k=1 must drive interpolate_single exactly like the
        default path (same explored points, no batched calls)."""
        ref, bat = _FakePipe(), _FakePipe()
        BetaPriorPipeline(ref, _fake_features).explore_with_beta(
            "a", "b", exploration_size=7, num_inference_steps=2)
        BetaPriorPipeline(bat, _fake_features).explore_with_beta(
            "a", "b", exploration_size=7, batch_k=1, num_inference_steps=2)
        assert bat.calls == ref.calls
        assert bat.batch_calls == []

    def test_batch_k_falls_back_on_single_only_kwargs(self):
        """interpolate_single-only kwargs (IP embeds / rescale / non-linear
        init) cannot ride the full-sequence engine: batch_k>1 must warn and
        degrade to the sequential reference path, never silently drop the
        kwarg (round-5 _batchable gate)."""
        import warnings

        for kw in ({"guidance_rescale": 0.7},
                   {"image_embeds_start": np.zeros((1, 4), np.float32),
                    "image_embeds_end": np.zeros((1, 4), np.float32)},
                   {"init": "denoising"}):
            pipe = _FakePipe()
            bp = BetaPriorPipeline(pipe, _fake_features)
            with pytest.warns(UserWarning, match="sequential"):
                *_, xs, _, _ = bp.explore_with_beta(
                    "a", "b", exploration_size=6, batch_k=3,
                    num_inference_steps=2, **kw)
            assert len(xs) == 6
            assert pipe.batch_calls == []  # all frames went through _gen
        # a None-valued single-only kwarg is NOT a conflict: stays batched
        pipe = _FakePipe()
        bp = BetaPriorPipeline(pipe, _fake_features)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            bp.explore_with_beta(
                "a", "b", exploration_size=6, batch_k=3,
                num_inference_steps=2, guidance_rescale=None,
                image_embeds_start=None)
        assert len(pipe.batch_calls) >= 1

    def test_gen_batch_rejects_unbatchable_kwargs(self):
        bp = BetaPriorPipeline(_FakePipe(), _fake_features)
        with pytest.raises(AssertionError, match="incompatible"):
            bp._gen_batch([0.5], prompt_start="a", prompt_end="b",
                          latent_start=None, latent_end=None,
                          guidance_rescale=0.5)

    def test_generate_interpolation_batched(self):
        pipe = _FakePipe()
        bp = BetaPriorPipeline(pipe, _fake_features)
        out = bp.generate_interpolation(
            "a", "b", exploration_size=10, interpolation_size=5,
            batch_k=4, num_inference_steps=2,
        )
        assert len(out) == 5
        assert len(pipe.batch_calls) >= 1


class TestGini:
    def test_matches_reference_double_loop(self):
        rng = np.random.default_rng(0)
        d = rng.uniform(0.1, 1.0, size=11)
        # reference O(n^2) formula (utils.py:142-168)
        s = sorted(d)
        n = len(s)
        tot = sum(abs(a - b) for a in s for b in s)
        want = tot / (2 * n * n * np.mean(s))
        assert abs(compute_gini(d) - want) < 1e-12

    def test_uniform_distances_gini_zero(self):
        assert compute_gini([0.5] * 6) < 1e-12
        s, c, m = compute_smoothness_and_consistency([0.5] * 6)
        assert abs(s - 1.0) < 1e-12 and abs(c - 0.5) < 1e-12 and m == 0.5

    def test_short_input(self):
        assert compute_gini([0.3]) == 0.0


def _fake_lpips(images: np.ndarray) -> np.ndarray:
    t = images.reshape(images.shape[0], -1).mean(axis=1) / 255.0
    return np.abs(np.diff(t))


class TestBayesianSelection:
    def test_gp_optimizer_finds_peak(self):
        opt = GPOptimizer(bounds=np.array([[0.0, 10.0], [0.0, 10.0]]), seed=0)
        f = lambda x: -((x[0] - 3.0) ** 2 + (x[1] - 7.0) ** 2)
        for x in [[0, 0], [10, 10], [5, 5], [0, 10], [10, 0]]:
            opt.register(x, f(x))
        for _ in range(25):
            x = opt.suggest()
            opt.register(x, f(x))
        best = opt.max["params"]
        assert abs(best[0] - 3.0) < 1.5 and abs(best[1] - 7.0) < 1.5

    def test_bayesian_prior_selection_runs(self):
        pipe = _FakePipe()
        a, b = bayesian_prior_selection(
            pipe, None, None, "a", "b", _fake_lpips,
            size=5, num_inference_steps=4, n_iter=3, target_score=0.99,
        )
        assert 1.0 <= a <= 4.0 and 1.0 <= b <= 4.0


class TestNativeSolver:
    def test_cpp_matches_python(self):
        pytest.importorskip("aid_tpu.native.dp_solver")
        from aid_tpu.native import dp_solver
        from aid_tpu.prior.beta import _find_minimal_spread_and_path_py

        rng = np.random.default_rng(3)
        m, n = 9, 4
        w = -np.ones((m, m))
        for i in range(m):
            for j in range(i + 1, m):
                w[i][j] = rng.uniform(0.1, 1.0)
        d_cpp, p_cpp = dp_solver.find_minimal_spread_and_path(n, m, w)
        d_py, p_py = _find_minimal_spread_and_path_py(n, m, w)
        ws = lambda p: [w[p[i]][p[i + 1]] for i in range(n - 1)]
        s_cpp = max(ws(p_cpp)) - min(ws(p_cpp))
        s_py = max(ws(p_py)) - min(ws(p_py))
        assert abs(s_cpp - s_py) < 1e-4
        assert p_cpp[0] == 0 and p_cpp[-1] == m - 1


class TestReviewR3bFixes:
    def test_early_kwarg_does_not_collide(self):
        """Passing early= through explore must override the fused_outer
        default, not raise 'multiple values for keyword' (review r3b)."""
        seen = []

        class Pipe(_FakePipe):
            def interpolate_single(self, t, *a, **kw):
                seen.append(kw.get("early"))
                return super().interpolate_single(t, *a, **kw)

        bp = BetaPriorPipeline(Pipe(), _fake_features)
        bp.explore_with_beta("a", "b", exploration_size=4,
                             num_inference_steps=2, early="pure_inner")
        assert seen and all(e == "pure_inner" for e in seen)

    def test_uniform_insertion_picks_widest_x_gap(self):
        """Reference prior.py:87-89: uniform mode bisects the widest
        COEFFICIENT gap, not the largest perceptual gap."""
        # features where the perceptual distance of the [0.5, 1.0] pair is
        # made artificially huge while x-gaps stay symmetric: insertion
        # must still go by x-gap (first insert splits 0-0.5 or 0.5-1 at
        # .25/.75 regardless of which ds entry dominates)
        def skew_features(images):
            t = images.reshape(images.shape[0], -1).mean(axis=1) / 255.0
            ang = np.where(t > 0.5, t * 2.5, t * 0.2)  # wildly asymmetric
            return np.stack([np.cos(ang), np.sin(ang)], axis=1)

        bp = BetaPriorPipeline(_FakePipe(), skew_features)
        _, _, _, xs, _, _ = bp.explore_with_beta(
            "a", "b", exploration_size=5, uniform=True, num_inference_steps=2)
        # widest-gap bisection from [0,.5,1] gives .25 and .75 (order may
        # vary); perceptual-gap insertion would bisect [.5,1] twice (.75,
        # .875) and never produce .25
        assert any(abs(x - 0.25) < 1e-9 for x in xs)
        assert any(abs(x - 0.75) < 1e-9 for x in xs)

    def test_gini_all_zero_distances(self):
        assert compute_gini([0.0, 0.0, 0.0]) == 0.0
        s, c, m = compute_smoothness_and_consistency([0.0, 0.0])
        assert s == 1.0 and c == 0.0 and m == 0.0


class TestDPFullRangeSpread:
    """Review r3c: instances whose minimal feasible spread equals the full
    weight range (incl. all-equal weights) must solve, not report
    infeasible. The reference returns (None, None) here and crashes
    downstream — documented deviation."""

    def _all_equal(self, m=4, n=3, w0=0.3):
        w = np.full((m, m), -1.0)
        for i in range(m - 1):
            for j in range(i + 1, m):
                w[i, j] = w0
        return w

    def test_all_equal_weights_python(self):
        from aid_tpu.prior.beta import _find_minimal_spread_and_path_py

        D, path = _find_minimal_spread_and_path_py(3, 4, self._all_equal())
        assert D == 0.0 and path is not None and path[0] == 0 and path[-1] == 3

    def test_all_equal_weights_dispatch(self):
        from aid_tpu.prior.beta import find_minimal_spread_and_path

        D, path = find_minimal_spread_and_path(3, 4, self._all_equal())
        assert D == 0.0 and path is not None

    def test_forced_full_range_path(self):
        from aid_tpu.prior.beta import (_find_minimal_spread_and_path_py,
                                        find_minimal_spread_and_path)

        w = np.full((3, 3), -1.0)
        w[0, 1], w[1, 2], w[0, 2] = 0.0, 1.0, 0.5
        for solver in (find_minimal_spread_and_path, _find_minimal_spread_and_path_py):
            D, path = solver(3, 3, w)
            assert path == [0, 1, 2] and abs(D - 1.0) < 1e-9
