"""Tests for exact matching engine and correspondence filters."""

import numpy as np
import jax.numpy as jnp

from matchinglib_poselib_tpu.ops import matching, filters


def _random_binary_desc(rng, n, words=8):
    return rng.integers(0, 2**32, size=(n, words), dtype=np.uint32)


def test_hamming_matrix_exact(rng):
    d1 = _random_binary_desc(rng, 32)
    d2 = _random_binary_desc(rng, 48)
    dist = np.asarray(
        matching.hamming_distance_matrix(jnp.asarray(d1), jnp.asarray(d2))
    )
    # reference popcount
    a = np.unpackbits(d1.view(np.uint8), axis=1)
    b = np.unpackbits(d2.view(np.uint8), axis=1)
    ref = (a[:, None, :] != b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(dist.astype(np.int64), ref)


def test_l2_matrix_exact(rng):
    d1 = rng.normal(size=(20, 128)).astype(np.float32)
    d2 = rng.normal(size=(30, 128)).astype(np.float32)
    dist = np.asarray(matching.l2_distance_matrix(jnp.asarray(d1), jnp.asarray(d2)))
    ref = ((d1[:, None, :] - d2[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(dist, ref, rtol=1e-4, atol=1e-3)


def test_match_identity_permutation(rng):
    """Identical descriptors under a permutation must match exactly."""
    n = 64
    d1 = _random_binary_desc(rng, n)
    perm = rng.permutation(n)
    d2 = d1[perm]
    res = matching.match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), jnp.ones(n), jnp.ones(n),
        ratio_test=False, cross_check=True,
    )
    assert bool(res.mask.all())
    np.testing.assert_array_equal(np.asarray(res.idx), np.argsort(perm)[np.arange(n)] if False else np.asarray([int(np.where(perm == i)[0][0]) for i in range(n)]))
    assert float(res.distance.max()) == 0.0


def test_ratio_test_rejects_ambiguous(rng):
    n = 16
    d1 = _random_binary_desc(rng, n)
    # set 2 = two near-copies of every descriptor -> ambiguous 2nd NN
    d2 = np.concatenate([d1, d1], axis=0)
    res = matching.match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), jnp.ones(n), jnp.ones(2 * n),
        ratio_test=True, cross_check=False,
    )
    assert int(res.n_matches) == 0  # d1/d2 ratio = 1 > 0.75


def test_mask_excludes_padding(rng):
    n = 32
    d1 = _random_binary_desc(rng, n)
    d2 = np.concatenate([d1, d1[:8]], axis=0)  # 8 padded duplicate slots
    valid2 = np.ones(n + 8, np.float32)
    valid2[n:] = 0.0
    res = matching.match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), jnp.ones(n), jnp.asarray(valid2),
        ratio_test=True, cross_check=True,
    )
    # with padding masked, every descriptor has a unique perfect match
    assert int(res.n_matches) == n
    assert int(res.idx.max()) < n


def test_spatial_penalty_guides_match(rng):
    """With a spatial penalty, a worse-descriptor but spatially-consistent
    candidate must win (the GMbSOF guided-matching mechanism)."""
    d1 = _random_binary_desc(rng, 1)
    # candidate 0: perfect descriptor; candidate 1: 1 bit flipped
    d2 = np.concatenate([d1, d1], axis=0)
    d2[1, 0] ^= 1
    penalty = jnp.asarray([[1e9, 0.0]])  # candidate 0 spatially implausible
    res = matching.match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), jnp.ones(1), jnp.ones(2),
        ratio_test=False, cross_check=False,
        spatial_penalty=penalty,
    )
    assert int(res.idx[0]) == 1


def _flow_scene(rng, n=512, outlier_frac=0.3, shape=(480, 640)):
    """Smooth-flow inlier matches + scattered outliers, pixel coords."""
    h, w = shape
    pts1 = np.stack(
        [rng.uniform(0, w, n), rng.uniform(0, h, n)], axis=1
    ).astype(np.float32)
    # smooth affine-ish flow
    flow = np.stack(
        [10 + 0.02 * pts1[:, 0], -6 + 0.01 * pts1[:, 1]], axis=1
    ).astype(np.float32)
    pts2 = pts1 + flow + rng.normal(scale=0.5, size=(n, 2)).astype(np.float32)
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    pts2[out_idx] = np.stack(
        [rng.uniform(0, w, n_out), rng.uniform(0, h, n_out)], axis=1
    )
    gt_inlier = np.ones(n, bool)
    gt_inlier[out_idx] = False
    return pts1, pts2, gt_inlier, shape


def _precision_recall(keep, gt):
    keep = np.asarray(keep)
    tp = (keep & gt).sum()
    return tp / max(keep.sum(), 1), tp / max(gt.sum(), 1)


def test_gms_filter(rng):
    pts1, pts2, gt, shape = _flow_scene(rng, n=2048, outlier_frac=0.3)
    keep = filters.gms_filter(
        jnp.asarray(pts1), jnp.asarray(pts2), jnp.ones(len(pts1)),
        shape, shape,
    )
    prec, rec = _precision_recall(np.asarray(keep), gt)
    assert prec > 0.9, f"GMS precision {prec}"
    assert rec > 0.5, f"GMS recall {rec}"


def test_sof_filter(rng):
    pts1, pts2, gt, shape = _flow_scene(rng, n=2048, outlier_frac=0.3)
    keep = filters.sof_filter_matches(
        jnp.asarray(pts1), jnp.asarray(pts2), jnp.ones(len(pts1)), shape
    )
    prec, rec = _precision_recall(np.asarray(keep), gt)
    assert prec > 0.9, f"SOF precision {prec}"
    assert rec > 0.6, f"SOF recall {rec}"


def test_sof_statistics_validation(rng):
    """Cells full of random flow must be invalidated."""
    pts1, pts2, gt, shape = _flow_scene(rng, n=1024, outlier_frac=0.95)
    field = filters.sof_statistics(
        jnp.asarray(pts1), jnp.asarray(pts2), jnp.ones(len(pts1)), shape
    )
    assert int(field.valid.sum()) <= 6  # nearly all cells inconsistent


def test_vfc_filter(rng):
    pts1, pts2, gt, shape = _flow_scene(rng, n=512, outlier_frac=0.3)
    h, w = shape
    scale = np.array([w, h], np.float32)
    res = filters.vfc_filter(
        jnp.asarray(pts1 / scale), jnp.asarray(pts2 / scale),
        jnp.ones(len(pts1)),
    )
    prec, rec = _precision_recall(np.asarray(res.inlier_mask), gt)
    assert prec > 0.9, f"VFC precision {prec}"
    assert rec > 0.8, f"VFC recall {rec}"


def test_vfc_sparse_variant(rng):
    pts1, pts2, gt, shape = _flow_scene(rng, n=512, outlier_frac=0.3)
    h, w = shape
    scale = np.array([w, h], np.float32)
    res = filters.vfc_filter(
        jnp.asarray(pts1 / scale), jnp.asarray(pts2 / scale),
        jnp.ones(len(pts1)), n_basis=16,
    )
    prec, rec = _precision_recall(np.asarray(res.inlier_mask), gt)
    assert prec > 0.85, f"sparse VFC precision {prec}"
    assert rec > 0.7, f"sparse VFC recall {rec}"


def test_matcher_registry():
    assert matching.is_matcher_supported("GMBSOF")
    assert matching.is_matcher_supported("hnsw")
    assert not matching.is_matcher_supported("NOPE")


def test_ratio_fallback_low_texture(rng):
    """ratioMatches_Flann.cpp:91-110: <30 ratio-test survivors -> keep the
    best-ratio half (<=60, ratio <= 0.85). A low-texture frame with nearly
    ambiguous descriptors must go from ~0 matches to a usable set."""
    from matchinglib_poselib_tpu.ops import matching

    n = 100
    base = rng.normal(size=(n, 128)).astype(np.float32)
    # ambiguous gallery: every descriptor has a near-duplicate, pushing the
    # distance ratio into the (0.75, 0.85] band the strict test rejects
    d2 = np.concatenate([base, base + rng.normal(scale=0.15, size=base.shape)
                         .astype(np.float32)])
    d1 = base + rng.normal(scale=0.30, size=base.shape).astype(np.float32)
    v1 = jnp.ones(n, bool)
    v2 = jnp.ones(2 * n, bool)

    strict = matching.match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), v1, v2,
        binary=False, cross_check=False, ratio_fallback=False,
    )
    fb = matching.match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), v1, v2,
        binary=False, cross_check=False, ratio_fallback=True,
    )
    n_strict = int(jnp.sum(strict.mask))
    n_fb = int(jnp.sum(fb.mask))
    assert n_strict < 30  # the scenario really is low-texture
    assert n_fb > n_strict
    assert n_fb <= 60
    # fallback keeps only correct matches here (nearest is the true one)
    idx = np.asarray(fb.idx)[np.asarray(fb.mask)]
    assert (idx == np.arange(n)[np.asarray(fb.mask)]).mean() > 0.9
    # and with plenty of unambiguous matches the fallback changes nothing
    d2u = np.concatenate([base, rng.normal(size=base.shape).astype(np.float32)])
    a = matching.match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2u), v1, v2,
        binary=False, cross_check=False, ratio_fallback=False,
    )
    b = matching.match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2u), v1, v2,
        binary=False, cross_check=False, ratio_fallback=True,
    )
    assert int(jnp.sum(a.mask)) >= 30
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))


# ---------------------------------------------------------------------------
# GMbSOF fidelity: angular statistics, AUTOTH, strongest-per-cell init
# ---------------------------------------------------------------------------


def test_autoth_validation_th_formula():
    """AUTOTH mapping (match_statOptFlow.cpp:766-801)."""
    tol = dict(rtol=1e-6)
    # binary descriptors
    np.testing.assert_allclose(
        float(filters.autoth_validation_th(0.10, binary=True)), 0.3, **tol)
    np.testing.assert_allclose(
        float(filters.autoth_validation_th(0.50, binary=True)), 0.75, **tol)
    np.testing.assert_allclose(
        float(filters.autoth_validation_th(0.30, binary=True)),
        1.5 * 0.30 + 0.075, **tol)
    # float descriptors: clip(ratio, 0.3, 0.75)
    np.testing.assert_allclose(
        float(filters.autoth_validation_th(0.10, binary=False)), 0.3, **tol)
    np.testing.assert_allclose(
        float(filters.autoth_validation_th(0.50, binary=False)), 0.5, **tol)
    np.testing.assert_allclose(
        float(filters.autoth_validation_th(0.90, binary=False)), 0.75, **tol)


def test_circular_stats_wraparound(rng):
    """Angles straddling the 0/2pi seam must yield tight statistics.

    getAngularStatistic (match_statOptFlow.cpp:4177) exists exactly for
    this case: a naive mean of angles near 0 and near 2pi lands at pi.
    """
    ang = np.concatenate([
        rng.normal(scale=0.05, size=64) % (2 * np.pi),          # near 0/2pi
    ])
    member = jnp.ones((1, len(ang)), bool)
    med, mean, std = filters._masked_circ_moments(
        jnp.asarray(ang)[None, :], member
    )
    # mean must be near the seam (0 or 2pi), never near pi
    d = float(filters._circ_diff(mean[0], jnp.asarray(0.0)))
    assert d < 0.1, f"circular mean off: {float(mean[0])}"
    assert float(std[0]) < 0.2


def test_sof_angle_validation_rejects_rotation_inconsistency(rng):
    """Consistent magnitudes + random directions -> cell invalid.

    The distance-only validation of a naive SOF cannot catch this; the
    reference adds getAngularStatistic-based validation (:3429-3437).
    """
    n, shape = 512, (200, 200)  # single 100px grid -> 4 cells
    pts1 = np.stack(
        [rng.uniform(0, 200, n), rng.uniform(0, 200, n)], axis=1
    ).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi, n)
    mag = 30.0 + rng.normal(scale=0.5, size=n)
    pts2 = pts1 + np.stack(
        [mag * np.cos(ang), mag * np.sin(ang)], axis=1
    ).astype(np.float32)
    field = filters.sof_statistics(
        jnp.asarray(pts1), jnp.asarray(pts2), jnp.ones(n), shape
    )
    assert int(field.valid.sum()) == 0


def test_select_strongest_per_cell(rng):
    n, shape, k = 256, (200, 200), 8  # 2x2 cells of 100 px
    xy = np.stack(
        [rng.uniform(0, 200, n), rng.uniform(0, 200, n)], axis=1
    ).astype(np.float32)
    resp = rng.uniform(0, 1, n).astype(np.float32)
    keep = np.asarray(filters.select_strongest_per_cell(
        jnp.asarray(xy), jnp.asarray(resp), jnp.ones(n), shape,
        cell_px=100, per_cell=k,
    ))
    cell = (xy[:, 1] // 100).astype(int) * 2 + (xy[:, 0] // 100).astype(int)
    for c in range(4):
        in_cell = cell == c
        kept = keep & in_cell
        assert kept.sum() == min(k, in_cell.sum())
        if kept.sum() and (in_cell & ~keep).any():
            # every kept response >= every dropped response in the cell
            assert resp[kept].min() >= resp[in_cell & ~keep].max()


def test_sof_field_radius_grows_away_from_valid_cells(rng):
    """interpolStatOptFlow parity: filled cells get distance-grown radii."""
    n, shape = 256, (200, 600)  # 2x6 grid
    # consistent flow only in the leftmost column of cells
    pts1 = np.stack(
        [rng.uniform(0, 100, n), rng.uniform(0, 200, n)], axis=1
    ).astype(np.float32)
    pts2 = pts1 + np.array([12.0, -5.0], np.float32)
    field = filters.sof_statistics(
        jnp.asarray(pts1), jnp.asarray(pts2), jnp.ones(n), shape
    )
    rad = np.asarray(field.radius)
    valid = np.asarray(field.valid)
    assert valid[:, 0].any() and not valid[:, -1].any()
    # radius must increase monotonically-ish with distance from col 0
    assert rad[0, -1] > rad[0, 1]


def test_sof_predict_knn_sparse_seed_fallback(rng):
    """Seed-kNN prediction tracks a scale flow field no grid cell can.

    A zoom about the image center gives every 100px cell too few seeds
    to validate (20 seeds over a 6x8 grid): sof_predict_knn must still
    predict each query's flow from its nearest seeds with a finite
    radius that contains the true displacement.
    """
    shape = (600, 800)
    cx, cy, s = 400.0, 300.0, 1.25
    seeds = np.stack(
        [rng.uniform(50, 750, 20), rng.uniform(50, 550, 20)], axis=1
    ).astype(np.float32)
    seed_flow = (seeds - [cx, cy]) * (s - 1.0)
    queries = np.stack(
        [rng.uniform(100, 700, 64), rng.uniform(100, 500, 64)], axis=1
    ).astype(np.float32)
    true_flow = (queries - [cx, cy]) * (s - 1.0)

    pred, rad, ok = filters.sof_predict_knn(
        jnp.asarray(seeds), jnp.asarray(seed_flow), jnp.ones(20),
        jnp.asarray(queries),
    )
    assert bool(ok.all())
    err = np.linalg.norm(np.asarray(pred) - (queries + true_flow), axis=1)
    inside = err <= np.asarray(rad)
    # the radius (MAD + distance growth) must cover the true target for
    # the overwhelming majority of queries
    assert inside.mean() > 0.9
    assert np.isfinite(np.asarray(rad)).all()

    # fewer than 3 seeds -> not ok
    _, _, ok2 = filters.sof_predict_knn(
        jnp.asarray(seeds), jnp.asarray(seed_flow),
        jnp.zeros(20).at[0].set(1.0),
        jnp.asarray(queries),
    )
    assert not bool(ok2.any())


def test_partition_moments_match_dense_masked(rng):
    """The partition-sort statistics must reproduce the dense masked ones.

    sof_statistics switched from (C, N) masked row-sorts to partition
    sorts + segment sums (one lexicographic sort of N values); this pins
    the new machinery to the original formulation on random partitions,
    including empty cells and IQR trimming.
    """
    N, C = 700, 12
    vals = jnp.asarray(rng.normal(size=N).astype(np.float32))
    cell = jnp.asarray(rng.integers(0, C, N).astype(np.int32))
    valid = jnp.asarray(rng.random(N) > 0.15)
    # leave cells 3 and 7 empty
    valid = valid & (cell != 3) & (cell != 7)

    member = (cell[None, :] == jnp.arange(C)[:, None]) & valid[None, :]
    for trim in (False, True):
        med_d, mean_d, std_d = filters._masked_moments(
            jnp.broadcast_to(vals[None, :], (C, N)), member, trim=trim
        )
        med_p, mean_p, std_p = filters._partition_moments(
            vals, cell, valid, C, trim=trim
        )
        np.testing.assert_allclose(np.asarray(med_p), np.asarray(med_d),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(mean_p), np.asarray(mean_d),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(std_p), np.asarray(std_d),
                                   rtol=1e-4, atol=1e-5)

    # circular variant
    ang = jnp.asarray(rng.uniform(0, 2*np.pi, N).astype(np.float32))
    med_d, mean_d, std_d = filters._masked_circ_moments(
        jnp.broadcast_to(ang[None, :], (C, N)), member
    )
    med_p, mean_p, std_p = filters._partition_circ_moments(
        ang, cell, valid, C
    )
    np.testing.assert_allclose(np.asarray(med_p), np.asarray(med_d),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean_p), np.asarray(mean_d),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(std_p), np.asarray(std_d),
                               rtol=1e-4, atol=1e-5)
