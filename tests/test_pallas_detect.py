"""Pallas fused detect kernel vs the XLA reference implementation.
On the CPU test backend the kernel runs in interpreter mode (slow but
bit-faithful to the lowering semantics); the TPU path is exercised by
bench.py and the extractor's default configuration.
"""
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier

from rgbdslam_v2_tpu.ops.fast import detect_corners
from rgbdslam_v2_tpu.ops.pallas_detect import detect_corners_pallas


@pytest.mark.parametrize("shape", [(112, 128), (224, 192)])
def test_pallas_matches_xla(shape):
    rng = np.random.default_rng(0)
    h, w = shape
    img = jnp.asarray(
        np.kron(
            rng.uniform(0, 1, (h // 16, w // 16)), np.ones((16, 16))
        ).astype(np.float32)
    )
    ref = np.asarray(detect_corners(img, threshold=0.05, use_harris=True))
    pal = np.asarray(detect_corners_pallas(img, threshold=0.05, interpret=True))
    mref = np.isfinite(ref)
    mpal = np.isfinite(pal)
    np.testing.assert_array_equal(mref, mpal)
    np.testing.assert_allclose(ref[mref], pal[mpal], rtol=2e-4, atol=1e-6)
