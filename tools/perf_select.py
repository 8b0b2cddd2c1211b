"""A/B timing of banded keypoint-selection formulations on the real chip.

The fused-step trace shows the band-level lax.top_k (k=128 over H*gw=44544
candidates per band) costs ~345 us per image — the single largest op of the
step. Candidates replace it with per-row-cell top-k via iterative argmax
(VPU reduces, no sort network), which is also the reference's
responseFilterGridBased per-cell-quota semantics (features.cpp:506).

Run ON TPU: python tools/perf_select.py
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def _time(fn, n_iter=100, warmup=5):
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


def main():
    from matchinglib_poselib_tpu.ops import features
    from matchinglib_poselib_tpu.utils import io

    stereo = pathlib.Path(
        "/root/reference/matchinglib_poselib/source/tests/poselib-test/imgs/stereo"
    )
    img = jnp.asarray(io.load_image_gray(stereo / "left_0000000000.png"))
    score = jax.jit(
        lambda a: features.nms(features.fast_score(a, 12.0 / 255.0), 3)
    )(img)
    score = jax.block_until_ready(score)
    K, B = 2048, 16

    cur = jax.jit(
        lambda s: features.select_keypoints_banded(s, K, bands=B)
    )
    dt = _time(lambda: cur(score))
    xy0, sc0, m0 = cur(score)
    print(f"current band top_k           {1e3 * dt:7.3f} ms  "
          f"n={int(jnp.sum(m0))}")

    def percell(s, rows=16):
        H, W = s.shape
        ys = jnp.arange(H)[:, None]
        xs = jnp.arange(W)[None, :]
        inb = ((ys >= 16) & (ys < H - 16) & (xs >= 16) & (xs < W - 16))
        s = jnp.where(inb, s, 0.0)
        C = K // B
        k = C // rows
        gw = (W + B - 1) // B
        Wp = B * gw
        Hp = ((H + rows - 1) // rows) * rows
        gh = Hp // rows
        sp = jnp.zeros((Hp, Wp), s.dtype).at[:H, :W].set(s)
        # (rows, gh, B, gw) -> (B, rows, gh*gw)
        cells = sp.reshape(rows, gh, B, gw).transpose(2, 0, 1, 3).reshape(
            B, rows, gh * gw
        )
        vals, idx = features._topk_small(cells, k)  # (B, rows, k)
        ly = idx // gw
        lx = idx % gw
        gy = jnp.arange(rows)[None, :, None] * gh + ly
        gx = jnp.arange(B)[:, None, None] * gw + lx
        xy = jnp.stack(
            [gx.reshape(-1), gy.reshape(-1)], axis=-1
        ).astype(jnp.float32)
        sc = vals.reshape(-1)
        mask = sc > 0.0
        xy = jnp.where(
            mask[:, None], xy,
            jnp.stack(
                [
                    (jnp.arange(K) // C) * gw + gw // 2,
                    jnp.full((K,), H // 2),
                ], axis=-1,
            ).astype(jnp.float32),
        )
        return xy, sc, mask

    for rows in (8, 16, 32):
        f = jax.jit(lambda s, r=rows: percell(s, r))
        dt = _time(lambda: f(score))
        xy, sc, m = f(score)
        print(f"per-cell argmax rows={rows:2d}     {1e3 * dt:7.3f} ms  "
              f"n={int(jnp.sum(m))}")

    # vmap-8 behavior of both (the batched-8 regression suspect)
    scores8 = jnp.broadcast_to(score, (8,) + score.shape)
    curv = jax.jit(jax.vmap(
        lambda s: features.select_keypoints_banded(s, K, bands=B)
    ))
    dt = _time(lambda: curv(scores8), n_iter=30)
    print(f"vmap8 current band top_k     {1e3 * dt:7.3f} ms")
    pcv = jax.jit(jax.vmap(lambda s: percell(s, 16)))
    dt = _time(lambda: pcv(scores8), n_iter=30)
    print(f"vmap8 per-cell rows=16       {1e3 * dt:7.3f} ms")


if __name__ == "__main__":
    main()
