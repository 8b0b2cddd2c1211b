"""Sub-pixel match refinement: known sub-pixel shifts must be recovered.

Reference behavior: getSubPixMatches (matchers.cpp:1085-1317) — template
matching in a 2x-upscaled window; whole pass rejected if too many matches
fail."""

import numpy as np
import jax.numpy as jnp

from matchinglib_poselib_tpu.ops import subpix


def analytic_texture(h=96, w=128, dx=0.0, dy=0.0):
    """Smooth multi-frequency texture, evaluable at any sub-pixel shift.

    A point at (x, y) in the unshifted image appears at (x + dx, y + dy)
    in the shifted one."""
    yy, xx = np.meshgrid(
        np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64),
        indexing="ij",
    )
    x = xx - dx
    y = yy - dy
    img = (
        0.5
        + 0.2 * np.sin(0.9 * x + 1.4 * y)
        + 0.15 * np.cos(1.3 * x - 0.7 * y)
        + 0.1 * np.sin(0.45 * x * 0.9 + 0.25 * y)
        + 0.05 * np.cos(2.1 * x + 0.3 * y)
    )
    return img.astype(np.float32)


def test_recovers_known_subpixel_shift(rng):
    true_dx, true_dy = 0.7, -1.3
    img1 = analytic_texture()
    # img2 shows the same scene shifted: a point at p in img1 appears at
    # p + (dx, dy) in img2
    img2 = analytic_texture(dx=true_dx, dy=true_dy)

    n = 64
    pts1 = np.stack(
        [rng.uniform(15, 110, n), rng.uniform(15, 80, n)], axis=1
    ).astype(np.float32)
    # start from integer-rounded (wrong by the subpixel part) positions
    pts2_init = np.round(pts1 + [true_dx, true_dy]) + rng.uniform(
        -0.4, 0.4, (n, 2)
    ).astype(np.float32)

    res = subpix.refine_matches_subpix(
        jnp.asarray(img1), jnp.asarray(img2),
        jnp.asarray(pts1), jnp.asarray(pts2_init.astype(np.float32)),
        jnp.ones(n, bool),
    )
    assert bool(res.pass_ok)
    err_before = np.abs(pts2_init - (pts1 + [true_dx, true_dy]))
    err_after = np.abs(np.asarray(res.pts2) - (pts1 + [true_dx, true_dy]))
    ok = np.asarray(res.success)
    assert ok.mean() > 0.8
    assert np.median(err_after[ok]) < 0.15, (
        f"median err {np.median(err_after[ok])} (before {np.median(err_before)})"
    )
    assert np.median(err_after[ok]) < 0.5 * np.median(err_before)


def test_pass_rejected_on_textureless_images(rng):
    """Flat images: no correlation contrast -> whole pass rejected and the
    original points returned (the reference's too-many-failures guard)."""
    img = np.full((64, 64), 0.5, np.float32)
    n = 16
    pts = np.stack(
        [rng.uniform(20, 44, n), rng.uniform(20, 44, n)], axis=1
    ).astype(np.float32)
    res = subpix.refine_matches_subpix(
        jnp.asarray(img), jnp.asarray(img),
        jnp.asarray(pts), jnp.asarray(pts), jnp.ones(n, bool),
    )
    assert not bool(res.pass_ok)
    np.testing.assert_allclose(np.asarray(res.pts2), pts, atol=1e-6)


def test_masked_matches_untouched(rng):
    img1 = analytic_texture()
    img2 = analytic_texture(dx=0.5)
    n = 32
    pts1 = np.stack(
        [rng.uniform(15, 110, n), rng.uniform(15, 80, n)], axis=1
    ).astype(np.float32)
    pts2 = (pts1 + [0.5, 0.0]).astype(np.float32)
    mask = np.zeros(n, bool)
    mask[: n // 2] = True
    res = subpix.refine_matches_subpix(
        jnp.asarray(img1), jnp.asarray(img2),
        jnp.asarray(pts1), jnp.asarray(pts2), jnp.asarray(mask),
    )
    # masked-out rows keep their input coordinates exactly
    np.testing.assert_allclose(
        np.asarray(res.pts2)[~mask], pts2[~mask], atol=1e-6
    )
