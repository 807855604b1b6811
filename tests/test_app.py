"""Gradio app pure-python pieces (gradio itself is not in the image;
the UI wiring is covered by feature parity review, these test the data)."""

import numpy as np

from aid_tpu.apps.gradio_app import (
    EARLY_CHOICES,
    LATE_CHOICES,
    beta_plot_data,
    get_examples,
    model_defaults,
)


class TestAppData:
    def test_examples_match_reference_gallery(self):
        """4 examples mirroring gradio_src/app.py:115-186 (2 SD PAID cases,
        2 SDXL AID cases) with valid option values."""
        ex = get_examples()
        assert len(ex) == 4
        for row in ex:
            (p1, p2, guide, neg, model, size, alpha, beta, warmup,
             guidance, steps, early, late, seed, same_latent) = row
            assert isinstance(p1, str) and isinstance(p2, str)
            assert model in ("sd15", "sd21", "sdxl")
            assert 3 <= size <= 15
            assert early in EARLY_CHOICES and late in LATE_CHOICES
            assert 0.0 <= warmup <= 1.0
        assert ex[0][4] == "sd15" and ex[2][4] == "sdxl"
        assert ex[0][2] is not None  # PAID guide prompt
        assert ex[2][2] is None  # plain AID

    def test_model_defaults(self):
        assert model_defaults("sd15")["guidance"] == 10.0  # reference app.py:58
        assert model_defaults("sdxl")["steps"] == 28
        assert model_defaults("unknown") == model_defaults("sd15")

    def test_beta_plot_monotone(self):
        d = beta_plot_data(7, 25, 25)
        y = d["y"]
        assert y[0] == 0.0 and y[-1] == 1.0
        assert all(b >= a for a, b in zip(y, y[1:]))
