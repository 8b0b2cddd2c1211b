"""Describe-stage decomposition + candidate optimizations, wall-timed.

The prefix decomposition (perf_prefix.py) shows describe = 3.2 ms of the
6.0 ms fused step. This times sub-prefixes of describe on ONE image and
A/Bs candidate formulations:
  - int8 MXU for the patch-extraction einsums (exact: 8-bit imagery,
    0/1 selectors; v5e int8 peak is 2x bf16)
  - int8 for the steered-BRIEF sampling einsum (exact: comparisons of
    integer pixel values; the -128 shift cancels between the pair)
  - 15 steering bins with 2-bin value interpolation vs 30 hard bins

Run ON TPU: python tools/perf_describe.py
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
    from matchinglib_poselib_tpu.config import DetectorConfig, DescriptorConfig
    from matchinglib_poselib_tpu.ops import features
    from matchinglib_poselib_tpu.utils import io

    stereo = pathlib.Path(
        "/root/reference/matchinglib_poselib/source/tests/poselib-test/imgs/stereo"
    )
    img = jnp.asarray(io.load_image_gray(stereo / "left_0000000000.png"))
    det = DetectorConfig(kind="FAST", max_keypoints=2048, fast_threshold=12.0)
    desc = DescriptorConfig(kind="ORB")
    B = features.detector_bands(det)

    def d_detect(a):
        k = features.detect_keypoints(a, det)
        return k.xy, k.score, k.mask

    def d_patches(a):
        k = features.detect_keypoints(a, det)
        p = features.extract_patches(a, k.xy, 31, bands=B)
        return p

    def d_orient(a):
        p = d_patches(a)
        return p, features.orientation_ic(p)

    def d_samples(a):
        p, ang = d_orient(a)
        K = p.shape[0]
        pf = p.reshape(K, 961).astype(jnp.bfloat16)
        samples = jnp.einsum(
            "kp,bsp->kbs", pf, features._ORB_SEL,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        return samples, ang

    def d_full(a):
        k = features.detect_keypoints(a, det)
        dd, k = features.compute_descriptors(a, k, desc, bands=B)
        return dd

    prev = 0.0
    for name, f in [("detect", d_detect), ("+patches", d_patches),
                    ("+orient", d_orient), ("+steer samples", d_samples),
                    ("full describe", d_full)]:
        fj = jax.jit(f)
        dt = _time(lambda: fj(img))
        print(f"{name:16s} {1e3 * dt:7.3f} ms  (delta {1e3 * (dt - prev):+7.3f})",
              flush=True)
        prev = dt

    # -------------------------------------------------------------- variants
    # int8 patch extraction: img as s8 (u8 - 128, exact), selectors s8
    def patches_s8(a):
        k = features.detect_keypoints(a, det)
        xy = k.xy
        H, W = a.shape
        K = xy.shape[0]
        C = K // B
        patch = 31
        r = patch // 2
        gw = (W + B - 1) // B
        Wb = ((gw + patch + 16 + 127) // 128) * 128
        Wpad = max(W, Wb)
        a8 = (jnp.round(a * 255.0) - 128.0).astype(jnp.int8)
        imgp = a8 if Wpad == W else jnp.pad(a8, ((0, 0), (0, Wpad - W)))
        starts = [min(max(b * gw - r, 0), Wpad - Wb) for b in range(B)]
        bandimg = jnp.stack(
            [jax.lax.slice(imgp, (0, s), (H, s + Wb)) for s in starts]
        )
        x0 = jnp.clip(xy[:, 0].astype(jnp.int32) - r, 0, W - patch)
        y0 = jnp.clip(xy[:, 1].astype(jnp.int32) - r, 0, H - patch)
        s_arr = jnp.asarray(starts, jnp.int32)
        relx = jnp.clip(x0.reshape(B, C) - s_arr[:, None], 0, Wb - patch)
        dy = jnp.arange(patch)
        cols = relx[..., None] + dy
        csel = jax.nn.one_hot(cols, Wb, dtype=jnp.int8)
        tmp = jnp.einsum(
            "bcpw,bhw->bcph", csel, bandimg,
            preferred_element_type=jnp.int32,
        ).astype(jnp.int8).reshape(K, patch, H)
        rows = y0[:, None] + dy
        rsel = jax.nn.one_hot(rows, H, dtype=jnp.int8)
        return jnp.einsum(
            "krh,kch->krc", rsel, tmp, preferred_element_type=jnp.int32,
        )

    fj = jax.jit(patches_s8)
    dt = _time(lambda: fj(img))
    print(f"{'patches int8':16s} {1e3 * dt:7.3f} ms", flush=True)
    # correctness vs f32 path
    p_ref = jax.jit(d_patches)(img)
    p_s8 = fj(img)
    ref_u8 = jnp.round(p_ref * 255.0) - 128.0
    print("  patches int8 exact:",
          bool(jnp.all(ref_u8.astype(jnp.int32) == p_s8)))

    # int8 steer einsum on s8 patches
    sel_s8 = jnp.asarray(np.asarray(features._ORB_SEL, np.float32),
                         jnp.int8)

    def steer_s8(a):
        p = patches_s8(a)
        K = p.shape[0]
        pf = jnp.clip(p, -128, 127).astype(jnp.int8).reshape(K, 961)
        samples = jnp.einsum(
            "kp,bsp->kbs", pf, sel_s8, preferred_element_type=jnp.int32,
        )
        return samples

    fj = jax.jit(steer_s8)
    dt = _time(lambda: fj(img))
    print(f"{'+steer int8':16s} {1e3 * dt:7.3f} ms", flush=True)

    # full describe with int8 patches + int8 steer + f32 mix/pack
    def full_s8(a):
        k = features.detect_keypoints(a, det)
        p = patches_s8(a)
        ang = features.orientation_ic(p.astype(jnp.float32))
        K = p.shape[0]
        pf = jnp.clip(p, -128, 127).astype(jnp.int8).reshape(K, 961)
        samples = jnp.einsum(
            "kp,bsp->kbs", pf, sel_s8, preferred_element_type=jnp.int32,
        )
        two_pi = 2.0 * jnp.pi
        binf = (ang % two_pi) / two_pi * features._N_ANGLE_BINS
        bin_idx = jnp.round(binf).astype(jnp.int32) % features._N_ANGLE_BINS
        oh = jax.nn.one_hot(bin_idx, features._N_ANGLE_BINS, dtype=jnp.float32)
        vals = jnp.einsum(
            "kbs,kb->ks", samples.astype(jnp.float32), oh
        ).reshape(K, 256, 2)
        return features._pack_bits(vals[..., 0] < vals[..., 1])

    fj = jax.jit(full_s8)
    dt = _time(lambda: fj(img))
    print(f"{'full desc int8':16s} {1e3 * dt:7.3f} ms", flush=True)
    d_ref = jax.jit(d_full)(img)
    d_s8 = fj(img)
    same = float(jnp.mean((d_ref == d_s8).astype(jnp.float32)))
    print(f"  desc words identical: {same:.4f}")


if __name__ == "__main__":
    main()
