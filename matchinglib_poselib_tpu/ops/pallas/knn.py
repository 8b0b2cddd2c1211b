"""Fused tiled 2-NN descriptor search (Pallas TPU kernel).

The matching engine's hot op. The XLA path (ops/matching.py) materializes
the full (N1, N2) distance matrix in HBM before reducing it to the two
nearest neighbors per row; at pool/database scale (30k+ descriptors,
SURVEY.md §5.7) that matrix dominates HBM traffic. This kernel streams
(TN, TM) distance tiles through VMEM — one MXU contraction per tile — and
keeps only a running (best, second-best, indices) state per query row, so
the full matrix never exists.

Replaces the inner loops of every reference matcher backend (SURVEY.md
M4-M6, M12-M15; matchers.cpp:115-736) on TPU. The optional fused radius
gate reproduces GMbSOF guided matching (match_statOptFlow.cpp:4410):
candidates outside the SOF-predicted radius get +BIG before the reduction,
which removes the separate (N1, N2) penalty matrix of the XLA path.

Distance formulations (see ops/matching.py for the identities):
- binary: descriptors pre-mapped to ±1 bf16; ham = 0.5 * (bits - <s1, s2>)
  (exact in bf16: products are ±1, the f32 accumulator is integral).
- float: squared L2 = |a|^2 + |b|^2 - 2<a, b>, tile norms recomputed
  per tile (cheap next to the contraction).

Layout notes (TPU tiling, lane dim = 128):
- query-side auxiliary data rides in a (N1, 128) page: lanes 0..2 =
  predicted x, y, radius^2 — extracted as (TN, 1) slices, no transposes.
- candidate-side auxiliary data rides in (8, N2) pages: row 0 = column
  penalty (0 valid / BIG padded), rows 1..2 = keypoint x, y — extracted
  as (1, TM) slices.
- the running state lives in the output block itself ((TN, 128) f32,
  lanes 0..3 = d1, d2, i1, i2), initialized at the first column tile and
  revisited across the column sweep (grid iterates columns minor).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _knn2_kernel(binary: bool, bits: int, xy_mode: int):
    """Build the kernel body.

    Static: distance mode, bit count, radius gate. xy_mode: 0 = no gate,
    1 = radius per query row (forward guided matching), 2 = radius per
    candidate column (the mirrored gate of the cross-check direction).
    """

    def kernel(a_ref, bt_ref, caux_ref, qaux_ref, out_ref):
        j = pl.program_id(1)
        tn = a_ref.shape[0]
        tm = bt_ref.shape[1]

        a = a_ref[:]
        bt = bt_ref[:]  # (D, TM): candidates pre-transposed for the MXU
        # DEFAULT precision: bf16 operands feed the MXU natively with f32
        # accumulation (exact for ±1 signs); "highest" (the package default)
        # asks Mosaic for an fp32 contraction of bf16 vectors, which it
        # rejects ("Bad lhs type").
        dot = jnp.dot(
            a, bt,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        if binary:
            dist = 0.5 * (jnp.float32(bits) - dot)
        else:
            sq1 = jnp.sum(a.astype(jnp.float32) ** 2, axis=1, keepdims=True)
            sq2 = jnp.sum(bt.astype(jnp.float32) ** 2, axis=0, keepdims=True)
            dist = jnp.maximum(sq1 + sq2 - 2.0 * dot, 0.0)

        dist = dist + caux_ref[0:1, :]  # column validity penalty
        if xy_mode:
            dx = qaux_ref[:, 0:1] - caux_ref[1:2, :]
            dy = qaux_ref[:, 1:2] - caux_ref[2:3, :]
            r2 = qaux_ref[:, 2:3] if xy_mode == 1 else caux_ref[3:4, :]
            dist = jnp.where(dx * dx + dy * dy <= r2, dist, dist + BIG)

        col0 = (j * tm).astype(jnp.float32)
        col_ids = col0 + jax.lax.broadcasted_iota(
            jnp.int32, (tn, tm), dimension=1
        ).astype(jnp.float32)

        # tile-local top-2 (min + masked second min; ties -> lowest id)
        t1 = jnp.min(dist, axis=1, keepdims=True)
        i1t = jnp.min(
            jnp.where(dist == t1, col_ids, BIG), axis=1, keepdims=True
        )
        dist2 = jnp.where(col_ids == i1t, BIG, dist)
        t2 = jnp.min(dist2, axis=1, keepdims=True)
        i2t = jnp.min(
            jnp.where(dist2 == t2, col_ids, BIG), axis=1, keepdims=True
        )

        @pl.when(j == 0)
        def _():
            init = jnp.full((tn, _LANE), BIG, jnp.float32)
            out_ref[:] = init

        d1 = out_ref[:, 0:1]
        d2 = out_ref[:, 1:2]
        i1 = out_ref[:, 2:3]
        i2 = out_ref[:, 3:4]

        # merge two sorted pairs (d1<=d2, t1<=t2)
        run_first = d1 <= t1
        nd1 = jnp.minimum(d1, t1)
        ni1 = jnp.where(run_first, i1, i1t)
        nd2 = jnp.where(run_first, jnp.minimum(d2, t1), jnp.minimum(t2, d1))
        ni2 = jnp.where(
            run_first,
            jnp.where(d2 <= t1, i2, i1t),
            jnp.where(t2 <= d1, i2t, i1),
        )
        pad = jnp.zeros((tn, _LANE - 4), jnp.float32)
        out_ref[:] = jnp.concatenate([nd1, nd2, ni1, ni2, pad], axis=1)

    return kernel


def _knn2_kernel_packed(pack: float, xy_mode: int):
    """Packed binary kernel: one f32 carries (hamming, col_id).

    For ±1 sign descriptors, bits - <s1, s2> = 2 * hamming is an even
    integer in [0, 2*bits], so with pack = pack_cols / 2

        combined = (bits - dot) * pack + col_id
                 = hamming * pack_cols + col_id

    is exactly representable in f32 whenever the maximum value
    bits * pack_cols + (n2p - 1) stays within f32's 24-bit integer range
    (checked by the caller; pack_cols is the smallest power of two
    holding every column id, so the col field is untouched by the
    hamming term). A single running min then yields both the best
    distance AND its index with lowest-index tie-breaking for free. This
    cuts the VPU work per distance from ~12 elementwise ops (separate
    min/second-min/index selects of the general kernel below) to ~4,
    which is the difference between 30% and ~2x that MXU utilization:
    at D=256 the MXU contraction is only ~512 FLOPs per distance, so the
    VPU post-processing, not the matmul, bounds the kernel.

    The per-column constant bits*pack + col_id — or BIGC + bits*pack for
    invalid columns, so combined >= BIGC even at the maximal positive
    correlation dot = bits — is precomputed on row 4 of the caux page,
    making the in-kernel combine a single fused multiply-add.
    """

    def kernel(a_ref, bt_ref, caux_ref, qaux_ref, out_ref):
        j = pl.program_id(1)
        tn = a_ref.shape[0]
        tm = bt_ref.shape[1]

        dot = jnp.dot(
            a_ref[:], bt_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        # caux row 4 = bits*pack + global col id, or BIGC + bits*pack
        # when invalid
        combined = caux_ref[4:5, :] - dot * pack
        if xy_mode:
            dx = qaux_ref[:, 0:1] - caux_ref[1:2, :]
            dy = qaux_ref[:, 1:2] - caux_ref[2:3, :]
            r2 = qaux_ref[:, 2:3] if xy_mode == 1 else caux_ref[3:4, :]
            combined = jnp.where(
                dx * dx + dy * dy <= r2, combined, combined + BIGC
            )

        m1 = jnp.min(combined, axis=1, keepdims=True)
        m2 = jnp.min(
            jnp.where(combined == m1, BIGC, combined), axis=1, keepdims=True
        )

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.full((tn, _LANE), BIGC, jnp.float32)

        r1 = out_ref[:, 0:1]
        r2_ = out_ref[:, 1:2]
        nm1 = jnp.minimum(r1, m1)
        nm2 = jnp.minimum(jnp.maximum(r1, m1), jnp.minimum(r2_, m2))
        pad = jnp.zeros((tn, _LANE - 2), jnp.float32)
        out_ref[:] = jnp.concatenate([nm1, nm2, pad], axis=1)

    return kernel


BIGC = 2.0 ** 27  # invalid/gated sentinel, past any packed value


@functools.partial(
    jax.jit,
    static_argnames=("binary", "bits", "xy_mode", "tn", "tm", "interpret"),
)
def knn2(
    desc1: jax.Array,
    desc2: jax.Array,
    valid2: jax.Array,
    pred: jax.Array | None = None,
    rad2: jax.Array | None = None,
    pts2: jax.Array | None = None,
    *,
    binary: bool,
    bits: int = 0,
    xy_mode: int = 0,
    tn: int = 512,
    tm: int = 1024,
    interpret: bool = False,
):
    """Two nearest neighbors of every desc1 row among valid desc2 rows.

    desc1: (N1, D) — ±1 signs (binary=True) or float values.
    desc2: (N2, D); valid2: (N2,) bool.
    pred/rad2/pts2 (xy_mode != 0): positions (N1, 2)/(N2, 2) and squared
    search radius; candidates outside the circle are gated out (guided
    matching). xy_mode=1: rad2 is (N1,) per query; xy_mode=2: rad2 is
    (N2,) per candidate (mirrored gate for the cross-check direction).

    Returns (d_best, d_second, idx) each (N1,); idx int32 (-1 when no valid
    candidate was inside the gate — d_best >= BIG/2 then).
    """
    n1, d = desc1.shape
    n2 = desc2.shape[0]
    n1p = _round_up(max(n1, tn), tn)
    n2p = _round_up(max(n2, tm), tm)
    dp = _round_up(d, _LANE)

    cdtype = desc1.dtype
    a = jnp.zeros((n1p, dp), cdtype).at[:n1, :d].set(desc1)
    bt = jnp.zeros((dp, n2p), cdtype).at[:d, :n2].set(desc2.T)

    # packed fast path: binary descriptors whose (hamming, col) pair fits
    # one exact f32 (see _knn2_kernel_packed). pack_cols = smallest power
    # of two holding every column id; every packed integer up to
    # bits*pack_cols + n2p - 1 must be <= 2^24 (f32 exact-integer range).
    pack_cols = 1 << max(int(n2p - 1).bit_length(), 10)
    packed = binary and bits * pack_cols + n2p - 1 <= 2 ** 24
    pack = pack_cols / 2.0

    # candidate-side page: row 0 penalty, rows 1..2 keypoint x, y,
    # row 4 packed per-column constant bits*pack + col (packed path)
    caux = jnp.full((8, n2p), BIG, jnp.float32)
    caux = caux.at[0, :n2].set(jnp.where(valid2.astype(bool), 0.0, BIG))
    if packed:
        cols = jnp.arange(n2p, dtype=jnp.float32)
        # invalid sentinel BIGC + bits*pack: an invalid ±1 descriptor
        # column with maximal positive correlation (dot = bits) still
        # lands exactly on BIGC and is rejected by the strict < BIGC
        # decode; padded zero columns (dot = 0) land above BIGC
        c4 = jnp.full((n2p,), BIGC + bits * pack, jnp.float32)
        c4 = c4.at[:n2].set(
            jnp.where(
                valid2.astype(bool),
                jnp.float32(bits) * pack + cols[:n2],
                BIGC + bits * pack,
            )
        )
        caux = caux.at[4, :].set(c4)
    if xy_mode:
        caux = caux.at[1, :n2].set(pts2[:, 0].astype(jnp.float32))
        caux = caux.at[2, :n2].set(pts2[:, 1].astype(jnp.float32))
        if xy_mode == 2:
            caux = caux.at[3, :].set(-1.0)  # padded cols: empty gate
            caux = caux.at[3, :n2].set(rad2.astype(jnp.float32))

    # query-side page: lanes 0..2 = pred x, pred y, radius^2
    qaux = jnp.zeros((n1p, _LANE), jnp.float32)
    if xy_mode:
        qaux = qaux.at[:n1, 0].set(pred[:, 0].astype(jnp.float32))
        qaux = qaux.at[:n1, 1].set(pred[:, 1].astype(jnp.float32))
        if xy_mode == 1:
            qaux = qaux.at[:n1, 2].set(rad2.astype(jnp.float32))

    grid = (n1p // tn, n2p // tm)
    out = pl.pallas_call(
        _knn2_kernel_packed(pack, xy_mode)
        if packed
        else _knn2_kernel(binary, bits if binary else 0, xy_mode),
        out_shape=jax.ShapeDtypeStruct((n1p, _LANE), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (tn, dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (dp, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (8, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tn, _LANE), lambda i, j: (i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (tn, _LANE), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n1p * n2p * dp,
            bytes_accessed=(n1p * dp + n2p * dp) * a.dtype.itemsize
            + n1p * _LANE * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, bt, caux, qaux)

    if packed:
        m1 = out[:n1, 0]
        m2 = out[:n1, 1]
        ham1 = jnp.floor(m1 / pack_cols)
        col1 = m1 - ham1 * pack_cols
        # col1 < n2 always holds when m1 < BIGC (invalid/padded columns
        # carry the >= BIGC sentinel); keep the guard as defense against
        # out-of-range gathers downstream
        ok1 = (m1 < BIGC) & (col1 < n2)
        d_best = jnp.where(ok1, ham1, BIG)
        d_second = jnp.where(
            m2 < BIGC, jnp.floor(m2 / pack_cols), BIG
        )
        idx = jnp.where(ok1, col1.astype(jnp.int32), -1)
        return d_best, d_second, idx
    d_best = out[:n1, 0]
    d_second = out[:n1, 1]
    idx_f = out[:n1, 2]
    idx = jnp.where(idx_f >= BIG * 0.5, -1, idx_f).astype(jnp.int32)
    return d_best, d_second, idx


def use_pallas_default() -> bool:
    """Pallas path auto-selection: compiled on TPU backends only."""
    return jax.default_backend() == "tpu"
