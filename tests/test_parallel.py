"""Multi-device tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from matchinglib_poselib_tpu.ops import matching
from matchinglib_poselib_tpu.parallel import mesh as pmesh
from matchinglib_poselib_tpu.parallel.matching import sharded_match


def test_mesh_axes():
    m = pmesh.make_mesh()
    assert set(m.axis_names) == {"pairs", "db"}
    assert int(np.prod(list(m.shape.values()))) == len(jax.devices())


def test_sharded_match_equals_local(rng):
    m = pmesh.make_mesh(db_parallelism=4)
    n1, n2 = 64, 256
    dq = rng.integers(0, 2**32, size=(n1, 8), dtype=np.uint32)
    # give every query an exact partner scattered across shards
    ddb = rng.integers(0, 2**32, size=(n2, 8), dtype=np.uint32)
    pos = rng.permutation(n2)[:n1]
    ddb[pos] = dq
    vq = jnp.ones(n1)
    vdb = jnp.ones(n2)
    ref = matching.match_descriptors(
        jnp.asarray(dq), jnp.asarray(ddb), vq, vdb,
        ratio_test=True, cross_check=True,
    )
    with m:
        db_arr = jax.device_put(
            jnp.asarray(ddb), pmesh.db_sharding(m)
        )
        res = sharded_match(m, jnp.asarray(dq), db_arr, vq, vdb)
    np.testing.assert_array_equal(np.asarray(res.mask), np.asarray(ref.mask))
    kept = np.asarray(ref.mask)
    np.testing.assert_array_equal(
        np.asarray(res.idx)[kept], np.asarray(ref.idx)[kept]
    )
    np.testing.assert_allclose(
        np.asarray(res.distance)[kept], np.asarray(ref.distance)[kept]
    )


def test_sharded_match_l2(rng):
    m = pmesh.make_mesh(db_parallelism=2)
    n1, n2 = 32, 128
    dq = rng.normal(size=(n1, 128)).astype(np.float32)
    ddb = rng.normal(size=(n2, 128)).astype(np.float32)
    ddb[:n1] = dq + rng.normal(scale=0.01, size=(n1, 128)).astype(np.float32)
    ref = matching.match_descriptors(
        jnp.asarray(dq), jnp.asarray(ddb), jnp.ones(n1), jnp.ones(n2),
        binary=False,
    )
    res = sharded_match(
        m, jnp.asarray(dq),
        jax.device_put(jnp.asarray(ddb), pmesh.db_sharding(m)),
        jnp.ones(n1), jnp.ones(n2), binary=False,
    )
    kept = np.asarray(ref.mask)
    assert kept.sum() >= 0.9 * n1
    np.testing.assert_array_equal(
        np.asarray(res.idx)[kept], np.asarray(ref.idx)[kept]
    )


def test_pairs_sharded_pose_batch(rng):
    """vmap the robust pose over a pair batch sharded on the pairs axis."""
    from tests.conftest import random_pose, synthetic_correspondences
    from matchinglib_poselib_tpu.config import RobustConfig
    from matchinglib_poselib_tpu.ops import robust, geometry as geo

    m = pmesh.make_mesh(db_parallelism=1)  # 8-way pairs
    B, n = 8, 128
    X1, X2, Rs, ts = [], [], [], []
    for _ in range(B):
        R, t = random_pose(rng)
        x1, x2 = synthetic_correspondences(rng, R, t, n, noise=0.0005,
                                           outlier_frac=0.3)
        X1.append(x1)
        X2.append(x2)
        Rs.append(R)
        ts.append(t)
    X1 = jnp.asarray(np.stack(X1), jnp.float32)
    X2 = jnp.asarray(np.stack(X2), jnp.float32)
    mask = jnp.ones((B, n), jnp.float32)
    cfg = RobustConfig(batch_hypotheses=64, max_batches=3,
                       check_degeneracy=False, threshold_px=0.002)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    def one(x1, x2, msk, key):
        res, _ = robust.estimate_essential_robust(x1, x2, msk, msk, cfg, key)
        return res.model, res.n_inliers

    sh = pmesh.pairs_sharding(m)
    X1s = jax.device_put(X1, sh)
    X2s = jax.device_put(X2, sh)
    Es, ninl = jax.jit(jax.vmap(one))(X1s, X2s, mask, keys)
    for b in range(B):
        Rr, tr, _, _, _ = geo.recover_pose(
            Es[b], X1[b], X2[b], mask[b]
        )
        rdiff, tang, _ = geo.compare_poses(
            jnp.asarray(Rs[b], jnp.float32), jnp.asarray(ts[b], jnp.float32),
            Rr, tr,
        )
        assert float(rdiff) < 2.0, f"pair {b}: rot {float(rdiff)}"
        assert int(ninl[b]) > 0.5 * n


def test_sharded_ba_matches_local(rng):
    """Distributed BA (points sharded over the db axis) == local BA."""
    from tests.conftest import random_pose
    from matchinglib_poselib_tpu.ops import ba
    from matchinglib_poselib_tpu.parallel.ba import bundle_adjust_sharded

    m = pmesh.make_mesh(db_parallelism=4)
    n = 256  # divisible by 4 shards
    R, t = random_pose(rng, max_angle_deg=12.0)
    t = t / np.linalg.norm(t)
    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
         rng.uniform(4, 10, n)], axis=1,
    )
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    obs = np.zeros((n, 2, 2))
    for c, (Rc, tc) in enumerate([(np.eye(3), np.zeros(3)), (R, t)]):
        Xc = X @ Rc.T + tc
        xn = Xc[:, :2] / Xc[:, 2:3]
        obs[:, c] = xn @ K[:2, :2].T + K[:2, 2]
    obs += rng.normal(scale=0.2, size=obs.shape)

    # perturbed init (small rotation via the exp map + structure noise)
    dR = np.asarray(ba.exp_so3(jnp.asarray([0.004, -0.006, 0.003],
                                           jnp.float32)), np.float64)
    R0 = R @ dR
    X0 = X + rng.normal(scale=0.01, size=X.shape)

    args = dict(
        obs=jnp.asarray(obs, jnp.float32),
        vis=jnp.ones((n, 2), jnp.float32),
        R=jnp.asarray(np.stack([np.eye(3), R0]), jnp.float32),
        t=jnp.asarray(np.stack([np.zeros(3), t]), jnp.float32),
        K=jnp.asarray(np.stack([K, K]), jnp.float32),
        dist=jnp.zeros((2, 5), jnp.float32),
        X=jnp.asarray(X0, jnp.float32),
        free_cams=jnp.asarray([0.0, 1.0], jnp.float32),
        iterations=8,
    )
    local = ba.bundle_adjust(**args)
    shard = bundle_adjust_sharded(m, **args)
    # atol reflects f32 psum-vs-local reduction-order noise amplified over
    # 8 LM iterations, not a semantic difference
    np.testing.assert_allclose(
        np.asarray(shard.R), np.asarray(local.R), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(shard.t), np.asarray(local.t), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(shard.points), np.asarray(local.points), atol=5e-3
    )
    np.testing.assert_allclose(
        float(shard.final_cost), float(local.final_cost), rtol=1e-3
    )
    assert float(shard.final_cost) < float(shard.initial_cost)
