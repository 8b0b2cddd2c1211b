"""Closed-form tiny linear algebra vs jnp.linalg (ops/smalllinalg.py)."""

import numpy as np
import jax.numpy as jnp

from matchinglib_poselib_tpu.ops import smalllinalg as sl


def test_eigh_sym3x3_matches_linalg(rng):
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    S = A + np.swapaxes(A, -1, -2)
    w, V = sl.eigh_sym3x3(jnp.asarray(S))
    w_ref = np.linalg.eigvalsh(S)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=2e-4)
    # eigenvector property: S v = w v, V orthonormal
    Sv = np.einsum("bij,bjk->bik", S, np.asarray(V))
    wV = np.asarray(w)[:, None, :] * np.asarray(V)
    np.testing.assert_allclose(Sv, wV, atol=5e-3)
    VtV = np.einsum("bij,bik->bjk", np.asarray(V), np.asarray(V))
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape),
                               atol=1e-4)


def test_eigh_sym3x3_repeated_eigenvalues():
    S = np.diag([2.0, 2.0, 5.0]).astype(np.float32)
    w, V = sl.eigh_sym3x3(jnp.asarray(S))
    np.testing.assert_allclose(np.asarray(w), [2.0, 2.0, 5.0], atol=1e-5)
    VtV = np.asarray(V).T @ np.asarray(V)
    np.testing.assert_allclose(VtV, np.eye(3), atol=1e-5)


def test_svd3x3_reconstructs(rng):
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    U, s, Vt = sl.svd3x3(jnp.asarray(A))
    rec = np.einsum("bij,bj,bjk->bik", np.asarray(U), np.asarray(s),
                    np.asarray(Vt))
    np.testing.assert_allclose(rec, A, atol=5e-4)
    s_ref = np.linalg.svd(A, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_ref, atol=2e-4)


def test_svd3x3_essential_projection(rng):
    """The call-site shape: project a noisy E to (s, s, 0) singular
    values; must agree with the jnp.linalg path to f32 tolerance."""
    for i in range(16):
        t = rng.normal(size=3)
        t /= np.linalg.norm(t)
        w = rng.normal(size=3) * 0.3
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        R = np.eye(3) + K  # roughly a rotation; enough for an E-like matrix
        E = (np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                       [-t[1], t[0], 0]]) @ R).astype(np.float32)
        E += rng.normal(scale=1e-3, size=(3, 3)).astype(np.float32)
        U, s, Vt = sl.svd3x3(jnp.asarray(E))
        m = 0.5 * (s[0] + s[1])
        E_proj = np.asarray(U) @ np.diag([m, m, 0.0]) @ np.asarray(Vt)
        Ur, sr, Vtr = np.linalg.svd(E)
        mr = 0.5 * (sr[0] + sr[1])
        E_ref = Ur @ np.diag([mr, mr, 0.0]) @ Vtr
        # projections agree up to global sign
        d = min(np.abs(E_proj - E_ref).max(), np.abs(E_proj + E_ref).max())
        assert d < 2e-4, (i, d)


def test_chol_solve_unrolled(rng):
    for n in (3, 5, 9):
        A = rng.normal(size=(n, n)).astype(np.float32)
        S = A @ A.T + n * np.eye(n, dtype=np.float32)
        b = rng.normal(size=n).astype(np.float32)
        x = sl.chol_solve_unrolled(jnp.asarray(S), jnp.asarray(b))
        np.testing.assert_allclose(
            S @ np.asarray(x), b, atol=1e-3 * np.abs(b).max() + 1e-4
        )


def test_min_eigvec_spd_matches_eigh(rng):
    """IRLS call-site shape: AtA of a 9-col design matrix with a
    well-separated small eigenvalue."""
    for _ in range(8):
        M = rng.normal(size=(200, 9)).astype(np.float32)
        # plant a near-null direction
        null = rng.normal(size=9).astype(np.float32)
        null /= np.linalg.norm(null)
        M -= np.outer(M @ null, null) * 0.9999
        AtA = M.T @ M
        v = np.asarray(sl.min_eigvec_spd(jnp.asarray(AtA)))
        w_ref, V_ref = np.linalg.eigh(AtA)
        v_ref = V_ref[:, 0]
        assert min(np.linalg.norm(v - v_ref),
                   np.linalg.norm(v + v_ref)) < 5e-3
