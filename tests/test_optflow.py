"""Pyramidal LK flow + LKOF/ALKOF/LKOFT matchers (match_opticalflow.cpp parity)."""

import numpy as np
import jax.numpy as jnp

from matchinglib_poselib_tpu.ops import matching, optflow


def lk_texture(h, w, dx=0.0, dy=0.0):
    """Band-limited texture for LK: shortest period 16px, so pyramid
    levels stay alias-free and a 6px shift is unambiguous."""
    yy, xx = np.meshgrid(
        np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64),
        indexing="ij",
    )
    x = xx - dx
    y = yy - dy
    img = (
        0.5
        + 0.2 * np.sin(0.15 * x + 0.11 * y)
        + 0.15 * np.cos(0.23 * x - 0.19 * y)
        + 0.1 * np.sin(0.4 * x + 0.05 * y)
        + 0.08 * np.cos(0.07 * x + 0.35 * y)
    )
    return img.astype(np.float32)


def test_lk_recovers_large_shift(rng):
    """A 6px global shift must be recovered through the pyramid."""
    dx, dy = 6.0, -4.0
    img1 = lk_texture(128, 160)
    img2 = lk_texture(128, 160, dx=dx, dy=dy)
    n = 48
    pts = np.stack(
        [rng.uniform(25, 135, n), rng.uniform(25, 100, n)], axis=1
    ).astype(np.float32)
    fl = optflow.lk_flow(
        jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(pts),
        jnp.ones(n, bool),
    )
    ok = np.asarray(fl.status)
    assert ok.mean() > 0.8
    err = np.abs(np.asarray(fl.pts)[ok] - (pts[ok] + [dx, dy]))
    assert np.median(err) < 0.25, f"median flow error {np.median(err)}"


def test_lkof_matches_correct_keypoints(rng):
    dx, dy = 3.0, 2.0
    img1 = lk_texture(128, 160)
    img2 = lk_texture(128, 160, dx=dx, dy=dy)
    n = 40
    kp1 = np.stack(
        [rng.uniform(25, 135, n), rng.uniform(25, 100, n)], axis=1
    ).astype(np.float32)
    perm = rng.permutation(n)
    kp2 = (kp1 + [dx, dy])[perm].astype(np.float32)
    res = optflow.match_lkof(
        jnp.asarray(kp1), jnp.asarray(kp2),
        jnp.ones(n, bool), jnp.ones(n, bool),
        jnp.asarray(img1), jnp.asarray(img2), search_radius=5.0,
    )
    m = np.asarray(res.mask)
    assert m.mean() > 0.8
    # matched index must be the permuted partner
    expected = np.argsort(perm)
    assert (np.asarray(res.idx)[m] == expected[m]).mean() > 0.95


def test_alkof_rejects_wrong_descriptors(rng):
    """Two spatially-close keypoints: the Hamming gate must pick the one
    with the matching descriptor, not merely the nearest."""
    dx = 3.0
    img1 = lk_texture(96, 128)
    img2 = lk_texture(96, 128, dx=dx)
    n = 24
    kp1 = np.stack(
        [rng.uniform(20, 105, n), rng.uniform(20, 72, n)], axis=1
    ).astype(np.float32)
    # kp2: true partners plus a decoy 2px away with a different descriptor
    kp2 = np.concatenate([kp1 + [dx, 0.0], kp1 + [dx + 2.0, 0.0]]).astype(
        np.float32
    )
    desc1 = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    noise = (
        rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
        & rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
        & rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    )
    desc2 = np.concatenate(
        [desc1 ^ noise, rng.integers(0, 2**32, (n, 8), dtype=np.uint32)]
    )
    res = optflow.match_alkof(
        jnp.asarray(kp1), jnp.asarray(kp2),
        jnp.asarray(desc1), jnp.asarray(desc2),
        jnp.ones(n, bool), jnp.ones(2 * n, bool),
        jnp.asarray(img1), jnp.asarray(img2),
        search_radius=6.0, max_hamm=80.0,
    )
    m = np.asarray(res.mask)
    assert m.mean() > 0.8
    # every accepted match points at the true partner (index < n), never
    # the decoy
    assert (np.asarray(res.idx)[m] == np.arange(n)[m]).all()


def test_lkoft_tracker_status(rng):
    img1 = lk_texture(96, 128)
    img2 = lk_texture(96, 128, dx=2.0)
    kp = np.array(
        [[40.0, 40.0], [80.0, 50.0], [126.0, 94.0]], np.float32
    )  # last point slides off the border
    fl = optflow.track_lkoft(
        jnp.asarray(kp), jnp.ones(3, bool),
        jnp.asarray(img1), jnp.asarray(img2),
    )
    st = np.asarray(fl.status)
    assert st[0] and st[1]
    err = np.abs(np.asarray(fl.pts)[:2] - (kp[:2] + [2.0, 0.0]))
    assert err.max() < 0.3
