"""Slope-timed fused-step sweep over the sequential-work knobs.

The fused step is op-count/latency bound (~3300 device events/step), not
FLOP bound: removing the largest einsum entirely does not move the step
time. This sweeps the knobs that shorten the SEQUENTIAL critical path.
Timing: slope method — (wall(200) - wall(100)) / 100 with a forced fetch
at each drain, immune to queue-depth and lazy-blocking artifacts of the
tunneled runtime.

Run ON TPU: python tools/perf_sweep.py
"""

from __future__ import annotations

import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from matchinglib_poselib_tpu.config import (
        DescriptorConfig, DetectorConfig, MatchingConfig, PoseConfig,
        RobustConfig,
    )
    from matchinglib_poselib_tpu.models import pipeline
    from matchinglib_poselib_tpu.utils import io

    stereo = pathlib.Path(
        "/root/reference/matchinglib_poselib/source/tests/poselib-test/imgs/stereo"
    )
    i1 = jnp.asarray(io.load_image_gray(stereo / "left_0000000000.png"))
    i2 = jnp.asarray(io.load_image_gray(stereo / "right_0000000000.png"))
    calib = io.load_kitti_calib(stereo / "calib_cam_to_cam.txt")
    K1 = jnp.asarray(calib.K0, jnp.float32)
    K2 = jnp.asarray(calib.K1, jnp.float32)
    d1 = jnp.asarray(calib.dist0, jnp.float32)
    d2 = jnp.asarray(calib.dist1, jnp.float32)
    det = DetectorConfig(kind="FAST", max_keypoints=2048, fast_threshold=12.0)
    desc = DescriptorConfig(kind="ORB")
    match = MatchingConfig(matcher_name="GMBSOF")
    base = PoseConfig(robust=RobustConfig(batch_hypotheses=96, max_batches=12))
    key = jax.random.PRNGKey(0)

    def slope(pose_cfg, match_cfg=match):
        def step(a, b):
            c = pipeline.get_correspondences(a, b, det, desc, match_cfg)
            r = pipeline.estimate_pose(
                c.pts1, c.pts2, c.mask, c.quality, K1, K2, d1, d2,
                pose_cfg, key)
            return r.R, r.t, r.n_inliers
        stepj = jax.jit(step)
        out = stepj(i1, i2)
        n_inl = int(np.asarray(out[2]))

        def wall(n):
            t0 = time.perf_counter()
            for _ in range(n):
                out = stepj(i1, i2)
            _ = np.asarray(out[2])
            return time.perf_counter() - t0
        wall(30)  # settle
        w100 = wall(100)
        w200 = wall(200)
        return (w200 - w100) / 100, n_inl

    def rep(cfg=base, **kw):
        return dataclasses.replace(cfg, **kw)

    rref = lambda **kw: rep(refine=dataclasses.replace(base.refine, **kw))
    rrob = lambda **kw: rep(robust=dataclasses.replace(base.robust, **kw))

    variants = {
        "baseline": base,
        "no polish": rref(polish_rt=False),
        "polish 2 rounds": rref(polish_rounds=2),
        "polish 4 iters": rref(polish_iterations=4),
        "polish 512 pts": rref(polish_max_points=512),
        "IRLS 6 iters": rref(iterations=6),
        "no lin refine": rref(enabled=False),
        "robust 6 batches": rrob(max_batches=6),
        "no degeneracy": rrob(check_degeneracy=False),
        "no LO": rrob(lo_refine=False),
        "baseline repeat": base,
    }
    for name, cfg in variants.items():
        dt, n_inl = slope(cfg)
        print(f"{name:20s} {1e3 * dt:7.3f} ms ({1.0/dt:6.1f} fps)  "
              f"n_inl={n_inl}", flush=True)


if __name__ == "__main__":
    main()
