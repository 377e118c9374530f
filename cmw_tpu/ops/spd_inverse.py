"""Batched SPD matrix inversion — Pallas TPU kernel.

The SQP's dominant cost is inverting the ADMM KKT matrix
M = H + sigma I + A^T rho A (one 504x504 SPD inverse per scenario per
solve). XLA's cholesky/triangular-solve lowering walks columns with a full
HBM round-trip per step (measured ~100 ms for [512, 504, 504] on v5e);
this kernel keeps each matrix VMEM-resident and reduces everything to
128-block MXU matmuls:

  1. block LDL^T factorization (unit block-lower L, SPD block-diagonal D)
     with the pivot-block inverses W_k = D_k^{-1} computed by Jacobi-scaled
     Newton-Schulz iteration (pure matmuls — no triangular base case, the
     thing TPUs are bad at),
  2. unit-block-triangular inversion X = L^{-1} (matmuls only),
  3. M^{-1} = X^T diag(W_k) X (matmuls only).

Shapes are padded to multiples of 128 at the call site; padding rows carry
an identity diagonal so the padded matrix stays SPD.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 128  # MXU panel


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_bf16(a, b):
    # bf16 operands, f32 accumulate; DEFAULT precision (fp32 contract
    # precision on bf16 inputs is rejected by Mosaic)
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )


def _ns_inverse(A, iters: int, f32_tail: int = 3):
    """Newton-Schulz SPD inverse of a (P, P) block, Jacobi-preconditioned.

    NS is self-correcting (quadratic contraction of ||I - A X||), so all but
    the last `f32_tail` iterations run their matmuls in bf16 — 4x MXU
    throughput on v5e — and the f32 tail restores full precision.
    """
    eye = jnp.eye(P, dtype=A.dtype)
    d = jnp.sum(A * eye, axis=1)  # diagonal (gather-free for TPU pallas)
    s = jax.lax.rsqrt(jnp.maximum(d, 1e-12))
    As = A * s[:, None] * s[None, :]
    # spectral upper bound ||As||_2 <= ||As||_1 = ||As||_inf (symmetric)
    a1 = jnp.max(jnp.sum(jnp.abs(As), axis=0))
    X = As / (a1 * a1)
    eye2 = 2.0 * jnp.eye(P, dtype=A.dtype)
    As_h = As.astype(jnp.bfloat16)
    for i in range(iters):
        if i < iters - f32_tail:
            Xh = X.astype(jnp.bfloat16)
            X = _dot_bf16(Xh, (eye2 - _dot_bf16(As_h, Xh)).astype(jnp.bfloat16))
        else:
            X = _dot(X, eye2 - _dot(As, X))
    return X * s[:, None] * s[None, :]


def _off_idx(nb):
    idx = {}
    c = 0
    for i in range(1, nb):
        for k in range(i):
            idx[(i, k)] = c
            c += 1
    return idx, c


def _kernel(nb: int, ns_iters: int, f32_tail: int, m_ref, out_ref, L, W, D, X):
    oi, _ = _off_idx(nb)
    blk = lambda r, i, j: r[0, i * P : (i + 1) * P, j * P : (j + 1) * P]

    # --- 1. block LDL^T --------------------------------------------------
    for k in range(nb):
        Dk = blk(m_ref, k, k)
        for j in range(k):
            G = _dot(L[oi[(k, j)]], D[j])  # L_kj D_j
            Dk = Dk - _dot(G, L[oi[(k, j)]].T)
        D[k] = Dk
        W[k] = _ns_inverse(Dk, ns_iters, f32_tail)
        for i in range(k + 1, nb):
            B = blk(m_ref, i, k)
            for j in range(k):
                G = _dot(L[oi[(i, j)]], D[j])
                B = B - _dot(G, L[oi[(k, j)]].T)
            L[oi[(i, k)]] = _dot(B, W[k])

    # --- 2. X = L^{-1} (unit block-lower) ---------------------------------
    for k in range(nb):
        for i in range(k + 1, nb):
            S = L[oi[(i, k)]]  # j == k term (X_kk = I)
            for j in range(k + 1, i):
                S = S + _dot(L[oi[(i, j)]], X[oi[(j, k)]])
            X[oi[(i, k)]] = -S

    # --- 3. M^{-1} = X^T diag(W) X ----------------------------------------
    for a in range(nb):
        for b in range(a, nb):
            S = None
            for k in range(b, nb):
                if k == a and k == b:
                    term = W[k]
                elif k == a:  # a == k < ... b <= k so only when a == b == k
                    term = _dot(W[k], X[oi[(k, b)]])
                elif k == b:
                    term = _dot(X[oi[(k, a)]].T, W[k])
                else:
                    term = _dot(X[oi[(k, a)]].T, _dot(W[k], X[oi[(k, b)]]))
                S = term if S is None else S + term
            out_ref[0, a * P : (a + 1) * P, b * P : (b + 1) * P] = S
            if b > a:
                out_ref[0, b * P : (b + 1) * P, a * P : (a + 1) * P] = S.T


@functools.partial(
    jax.jit, static_argnames=("ns_iters", "f32_tail", "interpret")
)
def spd_inverse_pallas(
    M, ns_iters: int = 16, f32_tail: int = 3, interpret: bool = False
):
    """Inverse of a batch of SPD matrices [B, n, n]; n padded to 128k."""
    B, n, n2 = M.shape
    assert n == n2
    npad = ((n + P - 1) // P) * P
    if npad != n:
        pad = npad - n
        M = jnp.pad(M, ((0, 0), (0, pad), (0, pad)))
        M = M.at[:, n:, n:].set(jnp.eye(pad, dtype=M.dtype))
    nb = npad // P
    noff = nb * (nb - 1) // 2

    out = pl.pallas_call(
        functools.partial(_kernel, nb, ns_iters, f32_tail),
        out_shape=jax.ShapeDtypeStruct((B, npad, npad), M.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, npad, npad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, npad, npad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((max(noff, 1), P, P), jnp.float32),  # L
            pltpu.VMEM((nb, P, P), jnp.float32),  # W
            pltpu.VMEM((nb, P, P), jnp.float32),  # D
            pltpu.VMEM((max(noff, 1), P, P), jnp.float32),  # X
        ],
        interpret=interpret,
    )(M)
    return out[:, :n, :n]
