"""Fused FAST+NMS Pallas kernel vs the XLA reference formulation.

Runs the kernel in interpreter mode (tests are CPU-only, conftest.py);
on the real chip the same kernel body is exercised by tests_tpu.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from matchinglib_poselib_tpu.ops import features
from matchinglib_poselib_tpu.ops.pallas import fast as pfast


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _xla_ref(img, thr, radius):
    return features.nms(features.fast_score(img, thr), radius)


@pytest.mark.smoke
def test_fast_nms_matches_xla_interior(rng):
    """Kernel == fast_score+nms away from the border (up to f32 ties).

    The XLA path wraps edges via jnp.roll while the kernel zero-pads;
    both regions are discarded by the caller's border mask, so the
    comparison is over the interior. Interior disagreements can only be
    f32-reassociation ties (near-equal window maxima) — checked by
    asserting every mismatch has a matching-score partner in the other
    output within the NMS window.
    """
    H, W = 96, 200
    img = jnp.asarray(rng.random((H, W), np.float32))
    thr = 12.0 / 255.0
    ref = np.asarray(_xla_ref(img, thr, 3))
    out = np.asarray(pfast.fast_nms_score(img, thr, 3, interpret=True))

    b = 8
    ri, oi = ref[b:-b, b:-b], out[b:-b, b:-b]
    yy, xx = np.where(np.abs(ri - oi) > 1e-6)
    for y, x in zip(yy, xx):
        v = max(ri[y, x], oi[y, x])
        win_r = ref[b + y - 3:b + y + 4, b + x - 3:b + x + 4]
        win_o = out[b + y - 3:b + y + 4, b + x - 3:b + x + 4]
        assert (
            np.min(np.abs(win_r - v)) < 1e-5
            and np.min(np.abs(win_o - v)) < 1e-5
        ), f"non-tie mismatch at ({y},{x}): ref={ri[y, x]} out={oi[y, x]}"
    # and the survivor sets agree in size to within the tie count
    assert abs(int((ri > 0).sum()) - int((oi > 0).sum())) <= len(yy)


def test_fast_nms_batch_matches_single(rng):
    imgs = jnp.asarray(rng.random((2, 64, 160), np.float32))
    thr = 20.0 / 255.0
    single = [
        np.asarray(pfast.fast_nms_score(imgs[i], thr, 3, interpret=True))
        for i in range(2)
    ]
    batched = np.asarray(
        pfast.fast_nms_score_batch(imgs, thr, 3, interpret=True)
    )
    np.testing.assert_array_equal(batched[0], single[0])
    np.testing.assert_array_equal(batched[1], single[1])


def test_fast_nms_detects_planted_corner():
    """A synthetic bright square's corners must survive score+NMS."""
    H, W = 64, 128
    img = np.zeros((H, W), np.float32)
    img[24:40, 48:80] = 1.0
    out = np.asarray(
        pfast.fast_nms_score(jnp.asarray(img), 40.0 / 255.0, 3,
                             interpret=True)
    )
    # a survivor within 3 px of each inner corner
    for cy, cx in [(24, 48), (24, 79), (39, 48), (39, 79)]:
        win = out[max(cy - 3, 0):cy + 4, max(cx - 3, 0):cx + 4]
        assert win.max() > 0.0, f"no corner near ({cy},{cx})"
