"""Fused-step sensitivity: time the HEADLINE program under config deltas.

Unlike perf_bisect (standalone per-stage programs, each paying its own
dispatch), this times the exact fused detect+match+pose step bench.py
reports, varying one knob at a time.

Run ON TPU: python tools/perf_fused.py
"""

from __future__ import annotations

import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def _time(fn, n_iter=50, warmup=3):
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


def main():
    from matchinglib_poselib_tpu.config import (
        DescriptorConfig,
        DetectorConfig,
        MatchingConfig,
        PoseConfig,
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

    def fused(pose_cfg, match_cfg=match):
        def step(a, b):
            c = pipeline.get_correspondences(a, b, det, desc, match_cfg)
            r = pipeline.estimate_pose(
                c.pts1, c.pts2, c.mask, c.quality, K1, K2, d1, d2,
                pose_cfg, key,
            )
            return r.R, r.t, r.n_inliers
        stepj = jax.jit(step)
        return lambda: stepj(i1, i2)

    def rep(cfg=base, **kw):
        return dataclasses.replace(cfg, **kw)

    variants = {
        "baseline": base,
        "polish 2r": rep(refine=dataclasses.replace(base.refine,
                                                    polish_rounds=2)),
        "IRLS 6it": rep(refine=dataclasses.replace(base.refine,
                                                   iterations=6)),
        "no degeneracy": rep(robust=dataclasses.replace(
            base.robust, check_degeneracy=False)),
        "no LO": rep(robust=dataclasses.replace(base.robust,
                                                lo_refine=False)),
        "polish 2r + IRLS 6": rep(refine=dataclasses.replace(
            base.refine, polish_rounds=2, iterations=6)),
    }
    for name, cfg in variants.items():
        dt = _time(fused(cfg))
        print(f"{name:28s} {1e3 * dt:7.3f} ms  ({1.0 / dt:6.1f} fps)",
              flush=True)

    # A/B: closed-form smalllinalg vs the jnp.linalg iterative kernels
    from matchinglib_poselib_tpu.ops import geometry as geo
    from matchinglib_poselib_tpu.ops import solvers

    def closest_linalg(E):
        U, s, Vt = jnp.linalg.svd(E)
        m = 0.5 * (s[..., 0] + s[..., 1])
        sn = jnp.stack([m, m, jnp.zeros_like(m)], axis=-1)
        return (U * sn[..., None, :]) @ Vt

    def decompose_linalg(E):
        U, _, Vt = jnp.linalg.svd(E)
        dU = jnp.linalg.det(U)
        dV = jnp.linalg.det(Vt)
        U = U * dU[..., None, None]
        Vt = Vt * dV[..., None, None]
        W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                      E.dtype)
        return U @ W @ Vt, U @ W.T @ Vt, U[..., :, 2]

    def nullspace_linalg(A, k):
        AtA = jnp.swapaxes(A, -1, -2) @ A
        _, vecs = jnp.linalg.eigh(AtA)
        return vecs[..., :, :k]

    saved = (geo.closest_essential, geo.decompose_essential,
             solvers.nullspace_from_ata)
    try:
        geo.closest_essential = closest_linalg
        geo.decompose_essential = decompose_linalg
        solvers.nullspace_from_ata = nullspace_linalg
        dt = _time(fused(base))
        print(f"{'baseline (jnp.linalg paths)':28s} {1e3 * dt:7.3f} ms  "
              f"({1.0 / dt:6.1f} fps)", flush=True)
    finally:
        (geo.closest_essential, geo.decompose_essential,
         solvers.nullspace_from_ata) = saved
    # repeat baseline to bound run-to-run noise
    dt = _time(fused(base))
    print(f"{'baseline (repeat)':28s} {1e3 * dt:7.3f} ms  "
          f"({1.0 / dt:6.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
