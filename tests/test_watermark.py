"""Invisible watermark (DWT-DCT) tests — reference sdxl:2398-2401 parity."""

import numpy as np
import pytest

from aid_tpu.utils.watermark import WATERMARK_BITS, InvisibleWatermark


class TestWatermark:
    def test_roundtrip_through_uint8(self):
        """Encode -> uint8 -> decode must recover the 48-bit message."""
        rng = np.random.default_rng(0)
        # smooth-ish natural-image stand-in (pure noise is the worst case)
        base = rng.integers(60, 196, size=(1, 16, 16, 3)).astype(np.float64)
        img = np.clip(np.kron(base, np.ones((1, 16, 16, 1))) +
                      rng.normal(0, 8, (1, 256, 256, 3)), 0, 255).astype(np.uint8)
        wm = InvisibleWatermark()
        out = wm.apply(img)
        bits = wm.decode(out[0])
        np.testing.assert_array_equal(bits, WATERMARK_BITS)

    def test_custom_message(self):
        rng = np.random.default_rng(1)
        img = np.clip(np.kron(
            rng.integers(40, 215, size=(1, 32, 32, 3)).astype(np.float64),
            np.ones((1, 8, 8, 1))) + rng.normal(0, 5, (1, 256, 256, 3)),
            0, 255).astype(np.uint8)
        msg = [1, 0, 1, 1, 0, 0, 1, 0]
        wm = InvisibleWatermark(bits=msg)
        np.testing.assert_array_equal(wm.decode(wm.apply(img)[0]), msg)

    def test_imperceptible(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, size=(2, 128, 128, 3)).astype(np.uint8)
        out = InvisibleWatermark().apply(img)
        delta = np.abs(out.astype(np.int32) - img.astype(np.int32))
        assert delta.max() <= 40  # chroma-plane QIM at scale 36
        assert delta.mean() < 4.0

    def test_unwatermarked_does_not_match(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(128, 128, 3)).astype(np.uint8)
        bits = InvisibleWatermark().decode(img)
        assert (bits == np.asarray(WATERMARK_BITS)).mean() < 0.9

    def test_pipeline_off_by_default(self):
        from aid_tpu.pipelines.sdxl import InterpolationXLPipeline

        import dataclasses

        fields = {f.name: f for f in dataclasses.fields(InterpolationXLPipeline)}
        assert fields["watermarker"].default is None
