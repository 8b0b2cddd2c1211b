"""Tests for StereoRefine checkpoint/resume and the stage timer."""

import numpy as np

import jax
import jax.numpy as jnp

from matchinglib_poselib_tpu.config import StereoRefineConfig
from matchinglib_poselib_tpu.models import checkpoint
from matchinglib_poselib_tpu.models.stereo_refine import StereoRefine
from matchinglib_poselib_tpu.utils.profiling import StageTimer
from tests.conftest import random_pose, synthetic_correspondences


def _make_frames(rng, R, t, n_frames, n=200, noise=3e-4):
    frames = []
    for _ in range(n_frames):
        x1, x2 = synthetic_correspondences(rng, R, t, n, noise=noise,
                                           outlier_frac=0.1)
        frames.append((x1, x2))
    return frames


def _feed(sr, frames, K):
    results = []
    for x1, x2 in frames:
        pts1 = (x1 * K[0, 0] + K[:2, 2]).astype(np.float32)
        pts2 = (x2 * K[0, 0] + K[:2, 2]).astype(np.float32)
        n = pts1.shape[0]
        res = sr.add_new_correspondences(
            jnp.asarray(pts1), jnp.asarray(pts2),
            desc_dist=jnp.zeros(n, jnp.float32),
            response=jnp.ones(n, jnp.float32),
        )
        results.append(res)
    return results


def test_checkpoint_roundtrip_resume(rng, tmp_path):
    R, t = random_pose(rng, max_angle_deg=12.0)
    K = np.array([[400.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1.0]])
    cfg = StereoRefineConfig()
    frames = _make_frames(rng, R, t, 6)

    # run A: 3 frames, checkpoint, 3 more frames
    a = StereoRefine(K, K, cfg=cfg, seed=7)
    _feed(a, frames[:3], K)
    ckpt = tmp_path / "sr.npz"
    checkpoint.save_stereo_refine(a, ckpt)
    res_a = _feed(a, frames[3:], K)

    # run B: restore at frame 3, continue with the same frames
    b = StereoRefine(K, K, cfg=cfg, seed=99)  # different seed: must be
    checkpoint.load_stereo_refine(b, ckpt)    # overwritten by the ckpt key
    res_b = _feed(b, frames[3:], K)

    # resumed run must be bit-exact vs the uninterrupted one
    for ra, rb in zip(res_a, res_b):
        np.testing.assert_array_equal(np.asarray(ra.R), np.asarray(rb.R))
        np.testing.assert_array_equal(np.asarray(ra.t), np.asarray(rb.t))
        assert ra.state == rb.state
    assert a.frame_idx == b.frame_idx
    assert int(a.pool.n_valid) == int(b.pool.n_valid)
    np.testing.assert_array_equal(
        np.asarray(a.pool.x1), np.asarray(b.pool.x1)
    )


def test_checkpoint_capacity_mismatch(rng, tmp_path):
    import dataclasses
    import pytest

    K = np.array([[400.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1.0]])
    cfg = StereoRefineConfig()
    a = StereoRefine(K, K, cfg=cfg, seed=1)
    ckpt = tmp_path / "sr.npz"
    checkpoint.save_stereo_refine(a, ckpt)
    cfg2 = dataclasses.replace(
        cfg, max_pool_correspondences=cfg.max_pool_correspondences // 2
    )
    b = StereoRefine(K, K, cfg=cfg2, seed=1)
    with pytest.raises(ValueError):
        checkpoint.load_stereo_refine(b, ckpt)


def test_stage_timer_taxonomy():
    timer = StageTimer()
    with timer.stage("matching") as h:
        h["outputs"] = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    with timer.stage("robEstimationAndRef"):
        pass
    row = timer.row()
    # the reference's timeMeasurements columns all present
    for col in ("keypoints_ms", "descriptors_ms", "matching_ms",
                "filtering_ms", "robEstimationAndRef_ms",
                "linRefinement_ms", "bundleAdjust_ms", "stereoRefine_ms"):
        assert col in row
    assert row["matching_ms"] > 0.0
    assert row["keypoints_ms"] == 0.0
    assert timer.total_ms() >= row["matching_ms"]
    timer.reset()
    assert timer.total_ms() == 0.0


def test_pipeline_timer_integration(rng):
    from matchinglib_poselib_tpu.config import DetectorConfig
    from matchinglib_poselib_tpu.models.pipeline import StereoPipeline

    img = rng.random((128, 160)).astype(np.float32)
    pipe = StereoPipeline(det_cfg=DetectorConfig(max_keypoints=128))
    K = jnp.asarray(
        [[200.0, 0, 80.0], [0, 200.0, 64.0], [0, 0, 1.0]], jnp.float32
    )
    d = jnp.zeros(5, jnp.float32)
    pipe.run(jnp.asarray(img), jnp.asarray(np.roll(img, 3, 1)),
             K, K, d, d, jax.random.PRNGKey(0))
    assert pipe.timer.times_ms["matching"] > 0.0
    assert pipe.timer.times_ms["robEstimationAndRef"] > 0.0
