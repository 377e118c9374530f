"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np

from cmw_tpu.ops.spd_inverse import spd_inverse_pallas


def test_spd_inverse_pallas_matches_numpy():
    rng = np.random.default_rng(0)
    B, n = 3, 504
    A = rng.normal(size=(B, n, n)).astype(np.float32) * 0.02
    H = np.einsum("bij,bkj->bik", A, A) + np.eye(n, dtype=np.float32)
    # scale spread like the real ADMM KKT matrix (rho_eq rows)
    H[:, :50, :50] += 1e4 * np.eye(50, dtype=np.float32)
    X = np.asarray(spd_inverse_pallas(jnp.asarray(H), interpret=True))
    err = np.einsum("bij,bjk->bik", H, X) - np.eye(n, dtype=np.float32)
    assert np.abs(err).max() < 1e-4


def test_spd_inverse_pallas_aligned_size():
    rng = np.random.default_rng(1)
    B, n = 2, 256  # already a multiple of 128
    A = rng.normal(size=(B, n, n)).astype(np.float32) * 0.05
    H = np.einsum("bij,bkj->bik", A, A) + np.eye(n, dtype=np.float32)
    X = np.asarray(spd_inverse_pallas(jnp.asarray(H), interpret=True))
    err = np.einsum("bij,bjk->bik", H, X) - np.eye(n, dtype=np.float32)
    assert np.abs(err).max() < 1e-4
