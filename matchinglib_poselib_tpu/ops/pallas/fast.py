"""Fused FAST-9/16 corner score + NMS (Pallas TPU kernel).

The detect stage's cost is pure HBM traffic: the XLA formulation of the
segment test (ops/features.fast_score) emits several elementwise fusion
passes whose pred/score intermediates round-trip through HBM (~400 us of
the ~500 us/image detect stage, slope-timed at 1392x512). This kernel
computes the ring differences, the relu score sums, the contiguous-arc
test and the (2r+1)^2 non-maximum suppression in ONE pass over row
tiles held in VMEM — the image is read once and the suppressed score
written once.

Bit-exact with fast_score + nms (ops/features.py):
- identical relu score sums and >=9-contiguous arc decision (the arc
  test runs as a packed uint32 run-length reduction: bit s of w = ring
  position s brighter/darker; a >=9 run around the 16-ring survives 8
  rounds of w &= w >> 1 on the wrap-doubled word),
- identical NMS decision (score >= 7x7 window max, ties kept), border
  behavior covered by the caller's border mask (>= halo).

Reference semantics: OpenCV FastFeatureDetector dispatched by
features.cpp:792 (createDetector) with grid response filtering
(features.cpp:506) downstream.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 8  # sublane-aligned halo (needs ring 3 + nms radius <= 5)

_RING = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


def _kernel(threshold: float, radius: int, TH: int):
    t = float(threshold)

    def kernel(img_ref, out_ref, buf, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        dma = pltpu.make_async_copy(
            img_ref.at[b, pl.ds(i * TH, TH + 2 * _HALO), :], buf, sem
        )
        dma.start()
        dma.wait()
        x = buf[:]  # (TH + 16, Wk)

        def rot(a, shift, axis):
            # pltpu.roll wants a non-negative shift; negative = size - s
            return pltpu.roll(a, shift % a.shape[axis], axis)

        # 7 column-rotated copies; row shifts are cheap sublane rolls of
        # these. Valid outputs live >= _HALO from every edge, so the
        # circular wrap never reaches them.
        xc = {dx: (rot(x, -dx, 1) if dx else x) for dx in range(-3, 4)}

        def sh(dy, dx):
            r = xc[dx]
            return rot(r, -dy, 0) if dy else r

        zero = jnp.zeros_like(x)
        sb = zero
        sd = zero
        wb = jnp.zeros(x.shape, jnp.uint32)
        wd = jnp.zeros(x.shape, jnp.uint32)
        for s, (dy, dx) in enumerate(_RING):
            d = sh(dy, dx) - x
            sb = sb + jnp.maximum(d - t, 0.0)
            sd = sd + jnp.maximum(-d - t, 0.0)
            bit = jnp.uint32(1 << s)
            wb = wb | jnp.where(d > t, bit, jnp.uint32(0))
            wd = wd | jnp.where(d < -t, bit, jnp.uint32(0))

        def run9(w):
            # >= 9 contiguous bits around the 16-ring: double the word to
            # cover wraps, then 8 rounds of AND with the 1-shifted self
            # leave bit i set iff bits i..i+8 are all set.
            y = w | (w << jnp.uint32(16))
            for _ in range(8):
                y = y & (y >> jnp.uint32(1))
            return (y & jnp.uint32(0xFFFF)) > jnp.uint32(0)

        corner = run9(wb) | run9(wd)
        score = jnp.where(corner, jnp.maximum(sb, sd), 0.0)

        # separable (2r+1)^2 window max
        m = score
        for dx in range(-radius, radius + 1):
            if dx:
                m = jnp.maximum(m, rot(score, -dx, 1))
        w = m
        for dy in range(-radius, radius + 1):
            if dy:
                w = jnp.maximum(w, rot(m, -dy, 0))
        sup = jnp.where((score >= w) & (score > 0.0), score, 0.0)
        out_ref[:] = sup[_HALO:_HALO + TH, :][None]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("threshold", "radius", "interpret")
)
def fast_nms_score_batch(
    imgs: jax.Array,
    threshold: float,
    radius: int = 3,
    interpret: bool = False,
) -> jax.Array:
    """Batched FAST-9/16 score with fused NMS: (B, H, W) f32 -> same.

    The batch rides the leading grid dimension (one manual DMA per
    (image, row-tile) program), so vmapped pipelines hit the same
    kernel without falling back to XLA.
    """
    B, H, W = imgs.shape
    assert radius <= _HALO - 3, "halo covers ring 3 + nms radius"
    TH = 64 if H >= 64 else max(8, ((H + 7) // 8) * 8)
    Hp = ((H + TH - 1) // TH) * TH
    Wk = (((W + 2 * _HALO) + 127) // 128) * 128
    n_tiles = Hp // TH
    imgp = jnp.zeros((B, Hp + 2 * _HALO, Wk), imgs.dtype)
    imgp = imgp.at[:, _HALO:_HALO + H, _HALO:_HALO + W].set(imgs)

    out = pl.pallas_call(
        _kernel(threshold, radius, TH),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wk), jnp.float32),
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, TH, Wk), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * _HALO, Wk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(imgp)
    return out[:, :H, _HALO:_HALO + W]


_SINGLE_CACHE: dict = {}


def _single_fn(threshold: float, radius: int, interpret: bool):
    """custom_vmap wrapper per static config: a vmapped call dispatches
    to the natively batched grid instead of failing on the ANY-space
    block spec."""
    key = (threshold, radius, interpret)
    fn = _SINGLE_CACHE.get(key)
    if fn is None:
        @jax.custom_batching.custom_vmap
        def fn(img):
            return fast_nms_score_batch(
                img[None], threshold, radius, interpret
            )[0]

        @fn.def_vmap
        def _rule(axis_size, in_batched, imgs):
            del axis_size
            return fast_nms_score_batch(
                imgs, threshold, radius, interpret
            ), True

        _SINGLE_CACHE[key] = fn
    return fn


def fast_nms_score(
    img: jax.Array,
    threshold: float,
    radius: int = 3,
    interpret: bool = False,
) -> jax.Array:
    """FAST-9/16 score with fused NMS. img: (H, W) f32 -> (H, W) f32.

    Equals features.nms(features.fast_score(img, threshold), radius) at
    every pixel further than `radius` from the border (the caller's
    border mask covers the rest), up to f32-reassociation ties in the
    NMS window. vmap dispatches to the natively batched grid.
    """
    return _single_fn(float(threshold), int(radius), bool(interpret))(img)
