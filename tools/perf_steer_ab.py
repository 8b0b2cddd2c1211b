"""A/B steered-BRIEF formulations measured on the FULL fused step.

Only the fused single-dispatch program is timed (the bench protocol);
microbenchmarks of isolated ops are unreliable through the tunnel.

Variants:
  A: current — all-30-bin sampling einsum + one-hot bin mix (60 GFLOP)
  B: gather — per-keypoint index table _ORB_IDX[bin_k], take_along_axis
  C: separable — row one-hot einsum + col elementwise reduce (4 GFLOP)
  D: 15-bin variant of A (30 GFLOP)

Run ON TPU: python tools/perf_steer_ab.py
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
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
        DescriptorConfig, DetectorConfig, MatchingConfig, PoseConfig,
        RobustConfig,
    )
    from matchinglib_poselib_tpu.models import pipeline
    from matchinglib_poselib_tpu.ops import features
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

    def fused():
        def step(a, b):
            c = pipeline.get_correspondences(a, b, det, desc, match)
            r = pipeline.estimate_pose(
                c.pts1, c.pts2, c.mask, c.quality, K1, K2, d1, d2,
                pose_cfg, key)
            return r.R, r.t, r.n_inliers
        stepj = jax.jit(step)
        return lambda: stepj(i1, i2)

    orig = features.brief_descriptor_orb

    def report(name):
        f = fused()
        dt = _time(f)
        R, t, n = f()
        print(f"{name:24s} {1e3 * dt:7.3f} ms ({1.0/dt:6.1f} fps)  "
              f"n_inl={int(n)}", flush=True)

    report("A: 30-bin einsum")

    idx_tab = jnp.asarray(features._ORB_IDX)  # (30, 512)

    def variant_b(patches, angles, oriented=True):
        K, P, _ = patches.shape
        if not oriented:
            angles = jnp.zeros_like(angles)
        two_pi = 2.0 * jnp.pi
        binf = (angles % two_pi) / two_pi * features._N_ANGLE_BINS
        bin_idx = jnp.round(binf).astype(jnp.int32) % features._N_ANGLE_BINS
        idx = idx_tab[bin_idx]  # (K, 512)
        pf = patches.reshape(K, P * P)
        vals = jnp.take_along_axis(pf, idx, axis=1).reshape(K, 256, 2)
        return features._pack_bits(vals[..., 0] < vals[..., 1])

    features.brief_descriptor_orb = variant_b
    report("B: gather")

    # C: separable one-hot (row einsum on MXU, col mix elementwise)
    row_tab = jnp.asarray(features._ORB_IDX // 31)  # (30, 512)
    col_tab = jnp.asarray(features._ORB_IDX % 31)

    def variant_c(patches, angles, oriented=True):
        K, P, _ = patches.shape
        if not oriented:
            angles = jnp.zeros_like(angles)
        two_pi = 2.0 * jnp.pi
        binf = (angles % two_pi) / two_pi * features._N_ANGLE_BINS
        bin_idx = jnp.round(binf).astype(jnp.int32) % features._N_ANGLE_BINS
        rr = row_tab[bin_idx]  # (K, 512)
        cc = col_tab[bin_idx]
        rsel = jax.nn.one_hot(rr, P, dtype=jnp.bfloat16)  # (K, 512, P)
        t1 = jnp.einsum(
            "ksr,krc->ksc", rsel, patches.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (K, 512, P)
        csel = jax.nn.one_hot(cc, P, dtype=jnp.float32)
        vals = jnp.sum(t1 * csel, axis=-1).reshape(K, 256, 2)
        return features._pack_bits(vals[..., 0] < vals[..., 1])

    features.brief_descriptor_orb = variant_c
    report("C: separable")

    # D: 15-bin einsum (halved) — quantize to even bins of the 30-table
    sel15 = jnp.asarray(
        np.asarray(features._ORB_SEL, np.float32)[::2], jnp.bfloat16
    )

    def variant_d(patches, angles, oriented=True):
        K, P, _ = patches.shape
        if not oriented:
            angles = jnp.zeros_like(angles)
        pf = patches.reshape(K, P * P).astype(jnp.bfloat16)
        samples = jnp.einsum(
            "kp,bsp->kbs", pf, sel15,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        two_pi = 2.0 * jnp.pi
        binf = (angles % two_pi) / two_pi * 15
        bin_idx = jnp.round(binf).astype(jnp.int32) % 15
        oh = jax.nn.one_hot(bin_idx, 15, dtype=jnp.float32)
        vals = jnp.einsum("kbs,kb->ks", samples, oh).reshape(K, 256, 2)
        return features._pack_bits(vals[..., 0] < vals[..., 1])

    features.brief_descriptor_orb = variant_d
    report("D: 15-bin einsum")

    features.brief_descriptor_orb = orig
    report("A again (noise bound)")


if __name__ == "__main__":
    main()
