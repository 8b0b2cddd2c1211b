"""Correspondence filters: GMS grid voting, SOF flow statistics, VFC.

TPU-native equivalents of the reference's match-filter stack:

- GMS (Grid-based Motion Statistics): reference wraps vendored gms-1.0
  (matchinglib/source/gms.cpp:54-84, thirdparty/gms-1.0/src/MatchGMS.cpp).
  Here: scatter-add matches into a (G^2, G^2) cell-pair histogram, score
  each pair by the 9 diagonally-aligned neighbor cells, threshold at
  alpha * sqrt(mean support) — the GMS rule — over 4 half-cell grid
  offsets, all as dense array ops.

- SOF (Statistical Optical Flow), the heart of GMbSOF
  (match_statOptFlow.cpp:2608 getStatisticalMatchingPositions,
  :2266 interpolStatOptFlow, :4410 guidedMatching): per-grid-cell robust
  flow statistics (masked median/mean/std of dx/dy), cell validation via
  (mean - median)/mean against validationTH, nearest-valid-cell fill +
  smoothing of the flow field, and a guided-matching spatial penalty mask
  built from the interpolated flow and its per-cell uncertainty radius.

- VFC (Vector Field Consensus): EM over a Tikhonov-regularized vector field
  with a Gaussian-kernel Gram matrix (matchinglib/source/vfc.cpp, class VFC,
  include/vfc.h:55-82). Fixed-iteration EM; NORMAL (all points as basis) and
  SPARSE (K basis points) variants.

All filters are fixed-shape and mask-aware.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from matchinglib_poselib_tpu.ops import geometry as geo


# ---------------------------------------------------------------------------
# GMS
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("grid", "shape1", "shape2"))
def gms_filter(
    pts1: jax.Array,
    pts2: jax.Array,
    mask: jax.Array,
    shape1: tuple[int, int],
    shape2: tuple[int, int],
    grid: int = 20,
    alpha: float = 6.0,
) -> jax.Array:
    """Grid-based motion statistics inlier mask.

    pts1, pts2: (N, 2) pixel coords of matched pairs; mask: (N,) validity.
    shape = (height, width). Returns refined (N,) bool mask.
    """
    h1, w1 = shape1
    h2, w2 = shape2
    N = pts1.shape[0]
    maskf = mask.astype(jnp.float32)

    def run_offset(off_x: float, off_y: float):
        # cell indices with half-cell offsets (the 4 GMS grid shifts)
        cx1 = jnp.clip(
            (pts1[:, 0] / w1 * grid + off_x).astype(jnp.int32), 0, grid - 1
        )
        cy1 = jnp.clip(
            (pts1[:, 1] / h1 * grid + off_y).astype(jnp.int32), 0, grid - 1
        )
        cx2 = jnp.clip(
            (pts2[:, 0] / w2 * grid + off_x).astype(jnp.int32), 0, grid - 1
        )
        cy2 = jnp.clip(
            (pts2[:, 1] / h2 * grid + off_y).astype(jnp.int32), 0, grid - 1
        )
        cell1 = cy1 * grid + cx1
        cell2 = cy2 * grid + cx2

        counts = jnp.zeros((grid * grid, grid * grid), jnp.float32)
        counts = counts.at[cell1, cell2].add(maskf)
        c4 = counts.reshape(grid, grid, grid, grid)

        # score(a, b) = sum over the 9 aligned neighbor shifts
        score4 = jnp.zeros_like(c4)
        support4 = jnp.zeros_like(c4)  # number of contributing cell pairs
        occ = (c4 > 0).astype(jnp.float32)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                shifted = jnp.roll(c4, shift=(di, dj, di, dj), axis=(0, 1, 2, 3))
                occ_s = jnp.roll(occ, shift=(di, dj, di, dj), axis=(0, 1, 2, 3))
                score4 = score4 + shifted
                support4 = support4 + occ_s
        # GMS threshold: alpha * sqrt(mean matches per contributing cell)
        mean_per_cell = score4 / jnp.maximum(support4, 1.0)
        thresh4 = alpha * jnp.sqrt(mean_per_cell)
        accept4 = score4 > thresh4

        return accept4.reshape(grid * grid, grid * grid)[cell1, cell2]

    keep = jnp.zeros((N,), bool)
    for ox, oy in ((0.0, 0.0), (0.5, 0.0), (0.0, 0.5), (0.5, 0.5)):
        keep = keep | run_offset(ox, oy)
    return keep & mask.astype(bool)


# ---------------------------------------------------------------------------
# SOF — statistical optical flow
# ---------------------------------------------------------------------------


class SOFField(NamedTuple):
    """Per-cell flow statistics on a (gy, gx) grid."""

    flow: jax.Array  # (gy, gx, 2) median flow (dx, dy)
    radius: jax.Array  # (gy, gx) search/uncertainty radius
    valid: jax.Array  # (gy, gx) bool — cell had enough consistent matches


@functools.partial(
    jax.jit, static_argnames=("shape", "cell_px", "min_per_cell")
)
def sof_statistics(
    pts1: jax.Array,
    pts2: jax.Array,
    mask: jax.Array,
    shape: tuple[int, int],
    cell_px: int = 100,
    validation_th: float = 0.3,
    min_per_cell: int = 8,
) -> SOFField:
    """Per-cell robust flow statistics + validation + fill/smooth.

    Reference: getStatisticalMatchingPositions (match_statOptFlow.cpp:2608)
    computes per-cell distance & angle statistics with KD-tree gathered
    points; validation rejects cells where (mean - median)/mean of the flow
    magnitude exceeds validationTH; interpolStatOptFlow (:2266) fills and
    smooths the field. Here each cell's membership is a dense (C, N) mask
    and statistics are masked sorts — no trees.
    """
    h, w = shape
    gy = max(1, (h + cell_px - 1) // cell_px)
    gx = max(1, (w + cell_px - 1) // cell_px)
    C = gy * gx
    maskb = mask.astype(bool)

    cx = jnp.clip((pts1[:, 0] / cell_px).astype(jnp.int32), 0, gx - 1)
    cy = jnp.clip((pts1[:, 1] / cell_px).astype(jnp.int32), 0, gy - 1)
    cell = cy * gx + cx  # (N,)

    flow = pts2 - pts1  # (N, 2)
    member = (cell[None, :] == jnp.arange(C)[:, None]) & maskb[None, :]  # (C, N)
    memberf = member.astype(jnp.float32)
    n_cell = jnp.sum(memberf, axis=1)

    def cellwise_median(vals):  # vals (N,) -> (C,)
        return geo.masked_median(
            jnp.broadcast_to(vals[None, :], (C, vals.shape[0])), member
        )

    med_dx = cellwise_median(flow[:, 0])
    med_dy = cellwise_median(flow[:, 1])
    mag = jnp.linalg.norm(flow, axis=-1)
    med_mag = cellwise_median(mag)
    # dispersion around the cell median -> search radius
    dev = jnp.linalg.norm(
        flow[None, :, :] - jnp.stack([med_dx, med_dy], axis=-1)[:, None, :],
        axis=-1,
    )
    mad = geo.masked_median(dev, member)

    # validation on the MAD-trimmed subset: gross outliers (rejected by the
    # 3*MAD band) must not poison the mean — the reference reaches the same
    # robustness through its mean/median cross-check plus AUTOTH retries
    # (match_statOptFlow.cpp getStatisticfromVec + validation at :2608ff).
    band = member & (dev <= 3.0 * mad[:, None] + 2.0)
    bandf = band.astype(jnp.float32)
    n_band = jnp.sum(bandf, axis=1)
    mean_mag_t = jnp.sum(mag[None, :] * bandf, axis=1) / jnp.maximum(n_band, 1.0)
    rel = jnp.abs(mean_mag_t - med_mag) / jnp.maximum(mean_mag_t, 1e-6)
    # a consistent cell keeps most members in the trimmed band AND has a
    # stable trimmed mean; an inconsistent cell loses half its members or
    # drifts
    frac_in_band = n_band / jnp.maximum(n_cell, 1.0)
    # dispersion bound: a cell with a real dominant flow has MAD far below
    # the flow magnitude; random-flow cells have MAD ~ image scale
    mad_ok = mad <= validation_th * jnp.maximum(med_mag, 80.0)
    valid = (
        (n_cell >= min_per_cell)
        & (rel < validation_th)
        & (frac_in_band > 0.5)
        & mad_ok
    )

    cell_flow = jnp.stack([med_dx, med_dy], axis=-1).reshape(gy, gx, 2)
    cell_rad = (3.0 * mad + 8.0).reshape(gy, gx)
    validg = valid.reshape(gy, gx)

    # fill invalid cells by distance-weighted average of valid cells
    yy, xx = jnp.meshgrid(jnp.arange(gy), jnp.arange(gx), indexing="ij")
    coords = jnp.stack([yy, xx], axis=-1).reshape(C, 2).astype(jnp.float32)
    d2 = jnp.sum(
        (coords[:, None, :] - coords[None, :, :]) ** 2, axis=-1
    )  # (C, C)
    wgt = jnp.where(validg.reshape(1, C), 1.0 / (1.0 + d2), 0.0)
    wsum = jnp.maximum(jnp.sum(wgt, axis=1), 1e-9)
    fill_flow = (wgt @ cell_flow.reshape(C, 2)) / wsum[:, None]
    fill_rad = (wgt @ cell_rad.reshape(C)) / wsum
    any_valid = jnp.any(validg)
    flow_out = jnp.where(
        validg.reshape(C, 1), cell_flow.reshape(C, 2), fill_flow
    ).reshape(gy, gx, 2)
    # invalid cells get inflated uncertainty (x2, like the reference's
    # distance-dependent radius growth in interpolStatOptFlow)
    rad_out = jnp.where(
        validg.reshape(C), cell_rad.reshape(C), 2.0 * fill_rad
    ).reshape(gy, gx)
    rad_out = jnp.where(any_valid, rad_out, jnp.full_like(rad_out, 1e6))
    return SOFField(flow=flow_out, radius=rad_out, valid=validg)


def sof_predict(field: SOFField, pts1: jax.Array, cell_px: int):
    """Predicted positions + radii for query points via bilinear field lookup."""
    gy, gx = field.radius.shape
    # cell-center continuous coords
    fy = jnp.clip(pts1[:, 1] / cell_px - 0.5, 0.0, gy - 1.0)
    fx = jnp.clip(pts1[:, 0] / cell_px - 0.5, 0.0, gx - 1.0)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, gy - 1)
    x1 = jnp.minimum(x0 + 1, gx - 1)
    wy = fy - y0
    wx = fx - x0

    def lerp(arr):
        a = arr[y0, x0]
        b = arr[y0, x1]
        c = arr[y1, x0]
        d = arr[y1, x1]
        if arr.ndim == 3:
            wy_, wx_ = wy[:, None], wx[:, None]
        else:
            wy_, wx_ = wy, wx
        return (
            a * (1 - wy_) * (1 - wx_)
            + b * (1 - wy_) * wx_
            + c * wy_ * (1 - wx_)
            + d * wy_ * wx_
        )

    pred = pts1 + lerp(field.flow)
    rad = lerp(field.radius)
    return pred, rad


def sof_spatial_penalty(
    field: SOFField, pts1: jax.Array, pts2: jax.Array, cell_px: int
) -> jax.Array:
    """(N1, N2) penalty matrix: 0 inside the predicted radius, +big outside.

    Feeds match_descriptors(spatial_penalty=...) to reproduce GMbSOF's
    guided matching (search only near the SOF-predicted position).
    """
    pred, rad = sof_predict(field, pts1, cell_px)
    d2 = jnp.sum((pred[:, None, :] - pts2[None, :, :]) ** 2, axis=-1)
    return jnp.where(d2 <= (rad[:, None] ** 2), 0.0, 1e9)


def sof_filter_matches(
    pts1: jax.Array,
    pts2: jax.Array,
    mask: jax.Array,
    shape: tuple[int, int],
    cell_px: int = 100,
    validation_th: float = 0.3,
) -> jax.Array:
    """Filter existing matches by SOF-field consistency.

    Reference: filterMatchesSOF (correspondences.cpp:521).
    """
    field = sof_statistics(
        pts1, pts2, mask, shape, cell_px, validation_th
    )
    pred, rad = sof_predict(field, pts1, cell_px)
    d = jnp.linalg.norm(pts2 - pred, axis=-1)
    return mask.astype(bool) & (d <= rad)


# ---------------------------------------------------------------------------
# VFC — vector field consensus
# ---------------------------------------------------------------------------


class VFCResult(NamedTuple):
    inlier_mask: jax.Array  # (N,) bool
    probabilities: jax.Array  # (N,) posterior inlier probability
    field_values: jax.Array  # (N, 2) interpolated field at x1


@functools.partial(jax.jit, static_argnames=("iterations", "n_basis"))
def vfc_filter(
    pts1: jax.Array,
    pts2: jax.Array,
    mask: jax.Array,
    iterations: int = 30,
    beta: float = 0.1,
    lam: float = 3.0,
    gamma_init: float = 0.9,
    theta: float = 0.75,
    n_basis: int = 0,
) -> VFCResult:
    """Vector Field Consensus EM (reference: vfc.cpp class VFC).

    pts1, pts2: (N, 2) in roughly unit-normalized coordinates (the reference
    normalizes by image size first — callers here pass pixel coords scaled
    to [0,1]). ``n_basis`` = 0 selects the NORMAL variant (every point is a
    basis); n_basis > 0 selects SPARSE_VFC with the first K valid points as
    basis. Fixed ``iterations`` EM steps (the reference iterates to maxIter
    with early exit on tolerance; we run the fixed bound).
    """
    N = pts1.shape[0]
    maskf = mask.astype(jnp.float32)
    Y = pts2 - pts1  # flow vectors to regress

    # Gram matrices
    def gauss(a, b):
        d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
        return jnp.exp(-beta * d2)

    if n_basis and n_basis < N:
        # choose the first K valid points (order carries no bias here)
        order = jnp.argsort(~mask.astype(bool))  # valid first
        bidx = order[:n_basis]
        Xb = pts1[bidx]
    else:
        Xb = pts1
    K = gauss(Xb, Xb)  # (M, M)
    U = gauss(pts1, Xb)  # (N, M)
    M = Xb.shape[0]

    sigma2_0 = jnp.sum(maskf * jnp.sum(Y * Y, axis=-1)) / jnp.maximum(
        jnp.sum(maskf), 1.0
    )
    a_const = 1.0 / 4.0  # uniform outlier density on the unit square-ish

    def em_step(_, carry):
        C, P, sigma2, gamma = carry
        V = U @ C  # (N, 2) field values
        r2 = jnp.sum((Y - V) ** 2, axis=-1)
        # E-step: posterior inlier probability
        pin = gamma * jnp.exp(-r2 / (2.0 * sigma2)) / (2.0 * jnp.pi * sigma2)
        pout = (1.0 - gamma) * a_const
        P = jnp.where(maskf > 0, pin / jnp.maximum(pin + pout, 1e-30), 0.0)
        # M-step: weighted regularized least squares for C
        WU = U * P[:, None]  # (N, M)
        A = U.T @ WU + lam * sigma2 * K
        # trace-scaled jitter: with few flat Gaussian bases A is nearly
        # rank-deficient once sigma2 shrinks
        tr_A = jnp.trace(A) / M
        A = A + (1e-6 + 1e-4 * tr_A) * jnp.eye(M)
        b = WU.T @ Y
        C = jnp.linalg.solve(A, b)
        V = U @ C
        r2 = jnp.sum((Y - V) ** 2, axis=-1)
        sp = jnp.maximum(jnp.sum(P), 1e-6)
        sigma2 = jnp.maximum(jnp.sum(P * r2) / (2.0 * sp), 1e-8)
        gamma = jnp.clip(sp / jnp.maximum(jnp.sum(maskf), 1.0), 0.05, 0.95)
        return C, P, sigma2, gamma

    C0 = jnp.zeros((M, 2), jnp.float32)
    P0 = maskf
    C, P, sigma2, gamma = jax.lax.fori_loop(
        0, iterations, em_step, (C0, P0, sigma2_0, gamma_init)
    )
    V = U @ C
    inl = (P > theta) & mask.astype(bool)
    return VFCResult(inlier_mask=inl, probabilities=P, field_values=V)
