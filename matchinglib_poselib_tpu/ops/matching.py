"""Exact descriptor matching: tiled 2-NN with ratio test and cross-check.

TPU-native replacement for every matcher backend of the reference
(SURVEY.md M4-M6, M12-M15): the 20+ matcher names (GMBSOF, CASHASH, 8 NMSLIB
ANN methods, ANNOY, 5 FLANN methods) all dispatch to this exact engine —
a documented behavioral substitution: ANN graph/hash indexes exist to avoid
exhaustive distance computation on CPUs; on TPU the exhaustive distance
matrix IS the fast path (one MXU matmul), with exact (not approximate)
2-NN recall. Reference entry: getMatches (matchers.cpp:115-736),
ratio test ratioTestFlannMatches (ratioMatches_Flann.cpp:52-200).

Key formulations:
- binary descriptors (B bits packed in uint32): Hamming distance via the
  ±1-matmul identity  ham(a, b) = (B - <s_a, s_b>) / 2  with s = 2*bit - 1,
  computed on the MXU in one (N1, B) @ (B, N2) contraction — no popcount
  loops.
- float descriptors: squared L2 via |a|^2 + |b|^2 - 2<a, b> (MXU).
- 2-NN, Lowe ratio (0.75 — LOWE_RATIO), mutual cross-check, and masking of
  padded keypoints are fused around the distance matrix.

The Pallas kernel variant (ops/pallas) tiles the same computation through
VMEM for large N; this module is the reference XLA path and the dispatcher.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from matchinglib_poselib_tpu.config import LOWE_RATIO


_BIG = 1e9


class MatchResult(NamedTuple):
    """Fixed-shape match set: one slot per query keypoint."""

    idx: jax.Array  # (N1,) int32 index into set 2 (valid slots only)
    distance: jax.Array  # (N1,) best distance
    second_distance: jax.Array  # (N1,) 2nd-best distance (ratio diagnostics)
    mask: jax.Array  # (N1,) bool — match kept

    @property
    def n_matches(self):
        return jnp.sum(self.mask.astype(jnp.int32))


def bits_to_signs(desc: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Unpack (N, W) uint32 bit-packed descriptors to (N, 32*W) ±1 values."""
    n, w = desc.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    signs = bits.astype(dtype) * 2.0 - 1.0
    return signs.reshape(n, w * 32)


def hamming_distance_matrix(d1: jax.Array, d2: jax.Array) -> jax.Array:
    """(N1, W) x (N2, W) packed uint32 -> (N1, N2) float32 Hamming distances.

    bf16 MXU passes are EXACT here: inputs are ±1 and the f32 accumulator
    carries the integer dot product without rounding, so the fast matmul
    path is explicitly requested.
    """
    s1 = bits_to_signs(d1)
    s2 = bits_to_signs(d2)
    bits = s1.shape[-1]
    dot = jnp.dot(
        s1,
        s2.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return 0.5 * (bits - dot)


def l2_distance_matrix(d1: jax.Array, d2: jax.Array) -> jax.Array:
    """(N1, D) x (N2, D) float -> (N1, N2) squared L2 distances (MXU form)."""
    d1 = d1.astype(jnp.float32)
    d2 = d2.astype(jnp.float32)
    sq1 = jnp.sum(d1 * d1, axis=-1, keepdims=True)
    sq2 = jnp.sum(d2 * d2, axis=-1, keepdims=True)
    dot = jnp.dot(d1, d2.T, preferred_element_type=jnp.float32)
    return jnp.maximum(sq1 + sq2.T - 2.0 * dot, 0.0)


def _top2(dist: jax.Array):
    """Row-wise two smallest distances + argmin. dist: (N1, N2)."""
    neg, idx = jax.lax.top_k(-dist, 2)
    return -neg[..., 0], -neg[..., 1], idx[..., 0]


def _use_pallas_auto() -> bool:
    return jax.default_backend() == "tpu"


def _ratio_fallback_keep(keep, keep_no_ratio, d_best, d_second):
    """Best-ratio fallback for low-texture frames.

    Reference (ratioMatches_Flann.cpp:91-110): when fewer than 30 matches
    survive the ratio test, discard it and keep the matches with the best
    distance ratios instead — half of them when 60 < n < 120, at most 60
    when n > 120, and never a match whose ratio exceeds 0.85. Fixed-shape
    masked selection: rank candidates by ratio and keep the best `target`.
    """
    n_kept = jnp.sum(keep.astype(jnp.int32))
    # d_second == 0 (exact duplicate) is the degenerate fully-ambiguous
    # case the strict Lowe inequality rejects — exclude it here too
    ratios = jnp.where(
        keep_no_ratio & (d_second > 1e-12),
        d_best / jnp.maximum(d_second, 1e-12),
        jnp.inf,
    )
    n_base = jnp.sum(keep_no_ratio.astype(jnp.int32))
    target = jnp.where(
        n_base > 120, 60, jnp.where(n_base > 60, n_base // 2, n_base)
    )
    target = jnp.minimum(
        target, jnp.sum((ratios <= 0.85).astype(jnp.int32))
    )
    rank = jnp.argsort(jnp.argsort(ratios))
    keep_fb = keep_no_ratio & (rank < target)
    return jnp.where(n_kept < 30, keep_fb, keep)


@functools.partial(
    jax.jit,
    static_argnames=(
        "binary", "ratio_test", "cross_check", "use_pallas", "ratio_fallback"
    ),
)
def match_descriptors(
    desc1: jax.Array,
    desc2: jax.Array,
    valid1: jax.Array,
    valid2: jax.Array,
    binary: bool = True,
    ratio_test: bool = True,
    ratio: float = LOWE_RATIO,
    cross_check: bool = True,
    max_distance: float | None = None,
    spatial_penalty: jax.Array | None = None,
    guide_pred: jax.Array | None = None,
    guide_rad: jax.Array | None = None,
    pts2_xy: jax.Array | None = None,
    use_pallas: bool | None = None,
    ratio_fallback: bool = True,
) -> MatchResult:
    """Exact 2-NN matching with ratio test and mutual cross-check.

    ``ratio_fallback``: when <30 matches survive the ratio test, keep the
    best-ratio 50% (at most 60, ratio <= 0.85) instead — the reference's
    low-texture fallback (ratioMatches_Flann.cpp:91-110). Here it selects
    among candidates that already passed the cross-check/max-distance
    gates (the reference's FLANN path has neither).

    desc1: (N1, W|D), desc2: (N2, W|D); valid1/valid2 mask padded slots.

    Guided matching (GMbSOF guidedMatching, match_statOptFlow.cpp:4410) —
    restrict candidates of query i to a circle around the SOF-predicted
    position: pass ``guide_pred`` (N1, 2), ``guide_rad`` (N1,) and
    ``pts2_xy`` (N2, 2). ``spatial_penalty`` (N1, N2) is the legacy dense
    form (0 inside / +big outside), XLA path only.

    ``use_pallas``: None = auto (fused Pallas kernel on TPU backends, which
    streams distance tiles through VMEM instead of materializing the
    (N1, N2) matrix in HBM — see ops/pallas/knn.py); True forces the
    kernel (interpret mode off-TPU), False forces the XLA path.
    """
    if use_pallas is None:
        use_pallas = spatial_penalty is None and _use_pallas_auto()

    guided = guide_pred is not None

    if use_pallas:
        from matchinglib_poselib_tpu.ops.pallas import knn

        interpret = jax.default_backend() != "tpu"
        if binary:
            a = bits_to_signs(desc1)
            b = bits_to_signs(desc2)
            bits = a.shape[-1]
        else:
            a = desc1.astype(jnp.float32)
            b = desc2.astype(jnp.float32)
            bits = 0
        rad2 = guide_rad * guide_rad if guided else None
        d_best, d_second, idx = knn.knn2(
            a, b, valid2, guide_pred, rad2, pts2_xy,
            binary=binary, bits=bits, xy_mode=1 if guided else 0,
            interpret=interpret,
        )
        idx = jnp.maximum(idx, 0)
        v1 = valid1.astype(bool)
        keep = v1 & (d_best < _BIG * 0.5)
        if max_distance is not None:
            keep = keep & (d_best <= max_distance)
        if cross_check:
            # backward top-1 under the mirrored gate
            _, _, back = knn.knn2(
                b, a, valid1, pts2_xy, rad2, guide_pred,
                binary=binary, bits=bits, xy_mode=2 if guided else 0,
                interpret=interpret,
            )
            keep = keep & (back[idx] == jnp.arange(desc1.shape[0]))
        if ratio_test:
            keep_no_ratio = keep
            keep = keep & (d_best < ratio * d_second)
            if ratio_fallback:
                keep = _ratio_fallback_keep(
                    keep, keep_no_ratio, d_best, d_second
                )
        return MatchResult(
            idx=idx.astype(jnp.int32),
            distance=d_best,
            second_distance=d_second,
            mask=keep,
        )

    if binary:
        dist = hamming_distance_matrix(desc1, desc2)
    else:
        dist = l2_distance_matrix(desc1, desc2)
    if spatial_penalty is not None:
        dist = dist + spatial_penalty
    if guided:
        d2g = jnp.sum(
            (guide_pred[:, None, :] - pts2_xy[None, :, :]) ** 2, axis=-1
        )
        dist = jnp.where(d2g <= guide_rad[:, None] ** 2, dist, dist + _BIG)

    v1 = valid1.astype(bool)
    v2 = valid2.astype(bool)
    dist = jnp.where(v2[None, :], dist, _BIG)
    dist = jnp.where(v1[:, None], dist, _BIG)

    d_best, d_second, idx = _top2(dist)
    keep = v1 & (d_best < _BIG * 0.5)

    if max_distance is not None:
        keep = keep & (d_best <= max_distance)
    if cross_check:
        # mutual best: argmin over rows for each column
        col_best = jnp.argmin(dist, axis=0)  # (N2,)
        keep = keep & (col_best[idx] == jnp.arange(dist.shape[0]))
    if ratio_test:
        keep_no_ratio = keep
        # strict Lowe inequality: rejects the degenerate d1 == d2 == 0 case
        keep = keep & (d_best < ratio * d_second)
        if ratio_fallback:
            keep = _ratio_fallback_keep(keep, keep_no_ratio, d_best, d_second)
    return MatchResult(
        idx=idx.astype(jnp.int32),
        distance=d_best,
        second_distance=d_second,
        mask=keep,
    )


def gather_matched_points(
    kp1: jax.Array, kp2: jax.Array, result: MatchResult
):
    """(N1, 2) keypoints -> matched coordinate pairs (N1, 2), (N1, 2), mask.

    Slot i holds the coordinates of keypoint i and its matched partner;
    masked slots carry garbage and must be ignored downstream (every
    consumer in this framework is mask-aware).
    """
    return kp1, kp2[result.idx], result.mask


def estimate_inlier_ratio_from_ratios(result: MatchResult) -> jax.Array:
    """Rough inlier-ratio estimate from the distance-ratio distribution.

    Mirrors the reference's SPRT epsilon initialization from match statistics
    (ratioMatches_Flann.cpp:150-200, pose_helper.cpp:2879
    estimateSprtEpsilonInit): fraction of matches whose ratio is decisively
    good (<0.8 of the already-ratio-tested band).
    """
    r = result.distance / jnp.maximum(result.second_distance, 1e-12)
    good = (r < 0.6) & result.mask
    n = jnp.maximum(jnp.sum(result.mask.astype(jnp.float32)), 1.0)
    return jnp.clip(jnp.sum(good.astype(jnp.float32)) / n, 0.05, 0.95)


# ---------------------------------------------------------------------------
# registry: reference matcher names -> engine configs
# ---------------------------------------------------------------------------

# All names accepted by the reference's getMatches dispatch
# (matchers.cpp:137-527). Each maps to the exact engine; GMBSOF additionally
# runs the SOF-guided second pass (models/pipeline.py).
SUPPORTED_MATCHERS = (
    "GMBSOF",
    "CASHASH",
    "SWGRAPH",
    "HNSW",
    "VPTREE",
    "MVPTREE",
    "GHTREE",
    "LISTCLU",
    "SATREE",
    "BRUTEFORCENMS",
    "ANNOY",
    "HIRCLUIDX",
    "HIRKMEANS",
    "LINEAR",
    "LSHIDX",
    "RANDKDTREE",
    "LKOF",
    "LKOFT",
    "ALKOF",
    "ALKOFT",
)


def is_matcher_supported(name: str) -> bool:
    """Parity with matchinglib::IsMatcherSupported (matchers.cpp:1404)."""
    return name.upper() in SUPPORTED_MATCHERS
