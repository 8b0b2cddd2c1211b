"""Fused-step decomposition by cumulative-prefix wall timing.

The xspace trace inflates custom-call durations on this backend (TopK
shows 345 us in traces vs 30 us measured serially-chained), so the
trustworthy decomposition is wall-clock deltas between cumulative
prefixes of the SINGLE fused program: detect -> +describe -> +match ->
+robust -> +refine -> +polish (each prefix compiled as one jit, one
dispatch).

Run ON TPU: python tools/perf_prefix.py
"""

from __future__ import annotations

import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def _time(fn, n_iter=50, warmup=3, reps=3):
    best = float("inf")
    for _ in range(reps):
        for _ in range(warmup):
            out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def main():
    from matchinglib_poselib_tpu.config import (
        DescriptorConfig,
        DetectorConfig,
        MatchingConfig,
        PoseConfig,
        RobustConfig,
    )
    from matchinglib_poselib_tpu.models import pipeline
    from matchinglib_poselib_tpu.ops import features, geometry as geo, refine, robust
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
    pose_cfg = PoseConfig(robust=RobustConfig(batch_hypotheses=96,
                                              max_batches=12))
    key = jax.random.PRNGKey(0)

    def p_detect(a, b):
        k1 = features.detect_keypoints(a, det)
        k2 = features.detect_keypoints(b, det)
        return k1.xy, k2.xy, k1.score, k2.score

    def p_describe(a, b):
        k1 = features.detect_keypoints(a, det)
        k2 = features.detect_keypoints(b, det)
        bands = features.detector_bands(det)
        dd1, k1 = features.compute_descriptors(a, k1, desc, bands=bands)
        dd2, k2 = features.compute_descriptors(b, k2, desc, bands=bands)
        return dd1, dd2, k1.xy, k2.xy

    def p_corr(a, b):
        c = pipeline.get_correspondences(a, b, det, desc, match)
        return c.pts1, c.pts2, c.mask, c.quality

    def make_pose_prefix(stop):
        # stop in {"robust", "refine", "recover", "polish"}
        def f(a, b):
            c = pipeline.get_correspondences(a, b, det, desc, match)
            cfg = pose_cfg
            x1 = geo.undistort_oulu(geo.img_to_cam(c.pts1, K1), d1)
            x2 = geo.undistort_oulu(geo.img_to_cam(c.pts2, K2), d2)
            f_mean = 0.25 * (K1[0, 0] + K1[1, 1] + K2[0, 0] + K2[1, 1])
            th = cfg.robust.threshold_px / f_mean
            th_sq = th * th
            mask = c.mask
            quality = c.quality
            n_val = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
            prior = jnp.clip(
                jnp.sum(((quality > 0.4) & mask.astype(bool)).astype(
                    jnp.float32)) / n_val, 0.05, 0.95)
            res, degen = robust.estimate_essential_robust(
                x1, x2, mask.astype(jnp.float32), quality, cfg.robust, key,
                threshold_sq=th_sq, prior_inlier_ratio=prior)
            E = res.model
            inl = res.inlier_mask
            if stop == "robust":
                return E, inl
            rres = refine.refine_essential_linear(
                E, x1, x2, mask.astype(jnp.float32), res.threshold,
                cfg.refine)
            keep = rres.n_inliers >= (res.n_inliers // 2)
            E = jnp.where(keep, rres.model, E)
            inl = jnp.where(keep, rres.inlier_mask, inl)
            if stop == "refine":
                return E, inl
            R, t, X, ok3d, _ = geo.recover_pose(
                E, x1, x2, inl.astype(jnp.float32), vote_points=512)
            if stop == "recover":
                return R, t
            pol, inl_p = refine.polish_pose_iterative(
                R, t, x1, x2, inl.astype(jnp.float32),
                mask.astype(jnp.float32), res.threshold,
                rounds=cfg.refine.polish_rounds,
                iterations=cfg.refine.polish_iterations,
                max_points=cfg.refine.polish_max_points)
            keep = jnp.sum(inl_p) >= (jnp.sum(inl) * 3) // 4
            R = jnp.where(keep, pol.R, R)
            t = jnp.where(keep, pol.t, t)
            _, X, ok3d = geo.cheirality_counts(R, t, x1, x2, inl_p)
            return R, t
        return f

    def full(a, b):
        c = pipeline.get_correspondences(a, b, det, desc, match)
        r = pipeline.estimate_pose(
            c.pts1, c.pts2, c.mask, c.quality, K1, K2, d1, d2, pose_cfg, key)
        return r.R, r.t, r.n_inliers

    progs = [
        ("detect", p_detect),
        ("+describe", p_describe),
        ("+match(corr)", p_corr),
        ("+robust", make_pose_prefix("robust")),
        ("+lin refine", make_pose_prefix("refine")),
        ("+recover", make_pose_prefix("recover")),
        ("+polish", make_pose_prefix("polish")),
        ("full step", full),
    ]
    prev = 0.0
    for name, f in progs:
        fj = jax.jit(f)
        dt = _time(lambda: fj(i1, i2))
        print(f"{name:14s} {1e3 * dt:7.3f} ms   (delta {1e3 * (dt - prev):+7.3f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
