"""Correspondence pool: fixed-capacity SoA arrays with masked device ops.

TPU-native replacement for the reference's streaming pool machinery
(SURVEY.md P14/P15):

- `std::list<CoordinateProps>` + index map + nanoflann KD-tree
  (stereo_pose_refinement.h:214-217, nanoflannInterface.cpp) becomes one
  fixed-capacity structure-of-arrays with a validity mask. There is no
  index structure at all: spatial queries are masked distance matrices
  (one MXU/VPU pass over the whole pool beats tree traversal on TPU).
- spatial dedup of new correspondences (filterNewCorrespondences,
  stereo_pose_refinement.cpp:2107 + compareCorrespondences :2450):
  nearest-pool-point radius check; the better of (new, old) survives.
- quality weights (computeCorrespondenceWeight :2514): combination of
  Sampson error, descriptor distance and keypoint responses.
- capacity eviction (checkPoolSize :2550): concat + top-k by weight —
  insertion and eviction are a single fused sort per frame.

All functions are jitted with static capacities; the pool is a pytree of
equal-length arrays ("Pool") living on device across frames.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from matchinglib_poselib_tpu.ops import geometry as geo


class Pool(NamedTuple):
    """SoA correspondence pool (capacity P, masked).

    Mirrors CoordinateProps (stereo_pose_types.h:34-62): pixel + camera
    coordinates in both images, match quality terms, per-correspondence
    Sampson error, age, and the combined weight used for eviction.
    """

    pt1: jax.Array  # (P, 2) pixel coords, left
    pt2: jax.Array  # (P, 2) pixel coords, right
    x1: jax.Array  # (P, 2) normalized undistorted cam coords, left
    x2: jax.Array  # (P, 2) normalized undistorted cam coords, right
    desc_dist: jax.Array  # (P,) descriptor distance of the match
    response: jax.Array  # (P,) combined keypoint response
    sampson: jax.Array  # (P,) squared Sampson error vs current pose
    age: jax.Array  # (P,) int32 frame index when added
    weight: jax.Array  # (P,) eviction/quality weight (higher = better)
    valid: jax.Array  # (P,) bool

    @property
    def capacity(self) -> int:
        return self.valid.shape[0]

    @property
    def n_valid(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def empty_pool(capacity: int, dtype=jnp.float32) -> Pool:
    z2 = jnp.zeros((capacity, 2), dtype)
    z1 = jnp.zeros((capacity,), dtype)
    return Pool(
        pt1=z2, pt2=z2, x1=z2, x2=z2,
        desc_dist=z1, response=z1,
        sampson=jnp.full((capacity,), 1e9, dtype),
        age=jnp.zeros((capacity,), jnp.int32),
        weight=z1,
        valid=jnp.zeros((capacity,), bool),
    )


def correspondence_weight(
    sampson_sq: jax.Array,
    desc_dist: jax.Array,
    response: jax.Array,
    th_sq: jax.Array,
    max_desc_dist: float = 256.0,
) -> jax.Array:
    """Quality weight per correspondence (higher = better).

    Reference: computeCorrespondenceWeight (stereo_pose_refinement.cpp:2514)
    combines the Sampson error (dominant), descriptor distance, and keypoint
    responses into one scalar used for dedup decisions and pool eviction.
    """
    w_err = 1.0 / (1.0 + sampson_sq / jnp.maximum(th_sq, 1e-12))
    w_desc = 1.0 - jnp.clip(desc_dist / max_desc_dist, 0.0, 1.0)
    w_resp = jnp.clip(response, 0.0, 1.0)
    return w_err * (0.6 + 0.25 * w_desc + 0.15 * w_resp)


@jax.jit
def filter_new_vs_pool(
    pool: Pool,
    new_pt1: jax.Array,  # (K, 2) pixel coords (left image)
    new_weight: jax.Array,  # (K,)
    new_valid: jax.Array,  # (K,) bool
    min_dist: jax.Array | float,
):
    """Spatial dedup of new correspondences against the pool.

    For every new correspondence, find the nearest valid pool point in the
    left image. Within ``min_dist``: keep the better-weighted of the two —
    drop the new one, or invalidate the pool slot (filterNewCorrespondences
    stereo_pose_refinement.cpp:2107 + compareCorrespondences :2450).

    Returns (new_valid_out, pool_valid_out).
    """
    d2 = jnp.sum(
        (new_pt1[:, None, :] - pool.pt1[None, :, :]) ** 2, axis=-1
    )  # (K, P)
    d2 = jnp.where(pool.valid[None, :], d2, jnp.inf)
    near = jnp.argmin(d2, axis=1)  # (K,)
    near_d2 = jnp.take_along_axis(d2, near[:, None], axis=1)[:, 0]
    within = (near_d2 < (min_dist * min_dist)) & new_valid.astype(bool)

    old_w = pool.weight[near]
    new_better = new_weight > old_w
    drop_new = within & jnp.logical_not(new_better)
    kill_old = within & new_better

    new_valid_out = new_valid.astype(bool) & jnp.logical_not(drop_new)
    pool_valid_out = pool.valid.at[near].set(
        jnp.where(kill_old, False, pool.valid[near])
    )
    return new_valid_out, pool_valid_out


@jax.jit
def insert_and_evict(
    pool: Pool,
    new_pt1, new_pt2, new_x1, new_x2,
    new_desc_dist, new_response, new_sampson,
    new_weight, new_valid,
    frame_idx: jax.Array,
) -> Pool:
    """Insert K new correspondences, evicting the lowest-weight entries.

    TPU-native fusion of addCorrespondencesToPool (:670) + checkPoolSize
    eviction (:2550): concatenate pool and new rows, keep the capacity-P
    best by (valid, weight) via one top_k. Invalid rows sort last, so free
    slots are always consumed before any eviction happens.
    """
    P = pool.capacity
    cat = lambda a, b: jnp.concatenate([a, b], axis=0)
    valid = cat(pool.valid, new_valid.astype(bool))
    weight = cat(pool.weight, new_weight)
    score = jnp.where(valid, weight, -jnp.inf)
    _, keep = jax.lax.top_k(score, P)  # indices of survivors

    take = lambda a, b: cat(a, b)[keep]
    return Pool(
        pt1=take(pool.pt1, new_pt1),
        pt2=take(pool.pt2, new_pt2),
        x1=take(pool.x1, new_x1),
        x2=take(pool.x2, new_x2),
        desc_dist=take(pool.desc_dist, new_desc_dist),
        response=take(pool.response, new_response),
        sampson=take(pool.sampson, new_sampson),
        age=take(pool.age, jnp.full_like(new_weight, 0).astype(jnp.int32)
                 + frame_idx),
        weight=weight[keep],
        valid=valid[keep],
    )


@jax.jit
def update_pool_errors(pool: Pool, E: jax.Array, th_sq: jax.Array) -> Pool:
    """Recompute Sampson errors and weights of the pool against a pose.

    Mirrors the per-correspondence Sampson/3D update after each accepted
    frame (stereo_pose_refinement.cpp:910-934)."""
    err = geo.sampson_error(E, pool.x1, pool.x2)
    w = correspondence_weight(err, pool.desc_dist, pool.response, th_sq)
    return pool._replace(sampson=err, weight=jnp.where(pool.valid, w, 0.0))


@jax.jit
def evict_outliers(pool: Pool, E: jax.Array, th_sq: jax.Array) -> Pool:
    """Drop pool entries inconsistent with the (refined) pose.

    Reference: outlier eviction from the pool after refinement
    (stereo_pose_refinement.cpp:861-908)."""
    err = geo.sampson_error(E, pool.x1, pool.x2)
    return pool._replace(valid=pool.valid & (err < th_sq))


@jax.jit
def pool_inlier_stats(pool: Pool, E: jax.Array, th_sq: jax.Array):
    """(n_inliers, n_valid, median/mean/std/MAD of sqrt-Sampson on inliers)."""
    err = geo.sampson_error(E, pool.x1, pool.x2)
    inl = (err < th_sq) & pool.valid
    n_inl = jnp.sum(inl.astype(jnp.int32))
    n_val = pool.n_valid
    stats = geo.masked_stats(jnp.sqrt(jnp.maximum(err, 0.0)), inl)
    return n_inl, n_val, stats
