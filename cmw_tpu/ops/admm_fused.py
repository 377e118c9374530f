"""Fused fixed-iteration ADMM — Pallas TPU kernel.

The XLA ADMM loop (cmpc/qp.py `admm_solve`) re-reads the [n, n] KKT inverse
from HBM on every iteration: with n=504 and 24 iterations that is ~25 MB of
HBM traffic per scenario per SQP iteration — the single largest cost in the
batched solve; the rest of the iteration body fragments into many small
kernels whose fixed launch cost dominates at batch scale.

This kernel runs ALL iterations inside one grid cell with the KKT inverse
`minv` [n, n] and the densified constraint matrix `A` [m, n]
(formulation.constraint_dense) VMEM-resident, so each matrix is read from
HBM exactly once per solve, and the whole loop is one kernel. Per iteration
the update is two A-GEMMs and one minv-GEMM plus elementwise clip/dual
steps (the OSQP-style scheme of qp.admm_solve, bit-for-bit the same math):

    rhs = sigma x - q + A^T (rho zc - y)
    x   = minv rhs
    ax  = A x
    zh  = alpha ax + (1-alpha) zc
    zc  = clip(zh + y/rho, l, u)
    y   = y + rho (zh - zc)

MXU shape: vectors are carried as 8 REPLICATED sublane rows ([8, n] blocks)
so every dot is an (8, n) x (n, n) matmul — the minimum efficient MXU tile
— instead of a (1, n) GEMV, which Mosaic lowers to the (much slower) VPU
and which violates the (8, 128) block-divisibility rule outright. The 8x
redundant vector FLOPs are noise next to the matrix reads.

Shapes are padded to lane multiples (128) at the call site; all padding is
zeros (pad rho_inv = 0) so padded entries stay identically zero through the
iteration. Batched via the grid.

Replaces the inner QP loop of the reference's CasADi `sqpmethod` / osqp
(centroidal_mpc.ini:13-15) on the TPU hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8  # replicated sublane rows per vector


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


def _kernel(iters, sigma, alpha, mxu_dtype, minv_ref, a_ref, q_ref, l_ref,
            u_ref, rho_ref, rinv_ref, x0_ref, zc0_ref, y0_ref,
            x_out, zc_out, y_out):
    Minv = minv_ref[0]  # [np, np] (symmetric)
    A = a_ref[0]  # [mp, np]
    q = q_ref[0]  # [SUB, np] (replicated rows)
    l = l_ref[0]  # [SUB, mp]
    u = u_ref[0]
    rho = rho_ref[0]
    rinv = rinv_ref[0]

    # MXU operand precision (mxu_dtype):
    #  "f32"    — exact f32 matmuls (Mosaic multi-pass; slowest)
    #  "bf16"   — cast the loop-invariant matrices AND the per-iteration
    #             vector operands to bf16; f32 accumulation. ~2x MXU rate,
    #             operands carry bf16 rounding (~3 decimal digits).
    #  "bf16x2" — split each matrix into hi + lo bf16 halves (the classic
    #             two-term Dekker split: hi = bf16(M), lo = bf16(M - hi))
    #             and accumulate both products in f32: near-f32 operand
    #             precision at 2 bf16 passes — still ~matching f32-pass
    #             cost on the matrix side but the VECTOR operand stays
    #             bf16-rounded, so accuracy sits between bf16 and f32.
    # The casts happen ONCE per grid cell (loop-invariant values live in
    # VMEM/registers across all `iters` iterations).
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    if mxu_dtype == "bf16":
        Mh, Ah = Minv.astype(bf16), A.astype(bf16)

        def mm(v, M, dims):
            return jax.lax.dot_general(
                v.astype(bf16), M[0], dims, preferred_element_type=f32
            )

        mats = ((Mh,), (Ah,))
    elif mxu_dtype == "bf16x2":
        Mh = Minv.astype(bf16)
        Ml = (Minv - Mh.astype(f32)).astype(bf16)
        Ah = A.astype(bf16)
        Al = (A - Ah.astype(f32)).astype(bf16)

        def mm(v, M, dims):
            hi, lo = M
            vb = v.astype(bf16)
            return jax.lax.dot_general(
                vb, hi, dims, preferred_element_type=f32
            ) + jax.lax.dot_general(vb, lo, dims, preferred_element_type=f32)

        mats = ((Mh, Ml), (Ah, Al))
    else:

        def mm(v, M, dims):
            return jax.lax.dot_general(
                v, M[0] if isinstance(M, tuple) else M, dims,
                preferred_element_type=f32,
            )

        mats = ((Minv,), (A,))
    Mop, Aop = mats

    def body(_, carry):
        x, zc, y = carry  # [SUB, np], [SUB, mp], [SUB, mp]
        w = rho * zc - y
        atw = mm(w, Aop, (((1,), (0,)), ((), ())))  # [SUB, np]
        rhs = sigma * x - q + atw
        x = mm(rhs, Mop, (((1,), (0,)), ((), ())))  # [SUB, np] (symmetric)
        ax = mm(x, Aop, (((1,), (1,)), ((), ())))  # [SUB, mp]
        zh = alpha * ax + (1.0 - alpha) * zc
        zc = jnp.clip(zh + y * rinv, l, u)
        y = y + rho * (zh - zc)
        return x, zc, y

    x, zc, y = jax.lax.fori_loop(
        0, iters, body, (x0_ref[0], zc0_ref[0], y0_ref[0])
    )
    x_out[0] = x
    zc_out[0] = zc
    y_out[0] = y


@functools.partial(
    jax.jit,
    static_argnames=("iters", "sigma", "alpha", "interpret", "mxu_dtype"),
)
def admm_fused_pallas(minv, A, q, l, u, rho, x0, zc0, y0,
                      iters: int, sigma: float = 1e-6, alpha: float = 1.6,
                      interpret: bool = False, mxu_dtype: str = "f32"):
    """Run `iters` ADMM iterations fully on-chip.

    minv [B, n, n], A [B, m, n], q/x0 [B, n], l/u/rho/zc0/y0 [B, m].
    Returns (x, zc, y) with the original (unpadded) shapes.
    """
    B, n, _ = minv.shape
    m = A.shape[1]
    npad = ((n + LANE - 1) // LANE) * LANE
    mpad = ((m + LANE - 1) // LANE) * LANE

    minv = _pad_to(_pad_to(minv, npad, 1), npad, 2)
    A = _pad_to(_pad_to(A, mpad, 1), npad, 2)

    def rep(v, size):
        v = _pad_to(v, size, 1)
        return jnp.broadcast_to(v[:, None, :], (B, SUB, size))

    q_r = rep(q, npad)
    x0_r = rep(x0, npad)
    l_r = rep(l, mpad)
    u_r = rep(u, mpad)
    rho_r = rep(rho, mpad)
    # pad 1/rho with zeros so padded zc stays pinned at clip(0, 0, 0) = 0
    rinv_r = rep(1.0 / rho, mpad)
    zc0_r = rep(zc0, mpad)
    y0_r = rep(y0, mpad)

    vec_n = pl.BlockSpec((1, SUB, npad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    vec_m = pl.BlockSpec((1, SUB, mpad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    x, zc, y = pl.pallas_call(
        functools.partial(_kernel, iters, sigma, alpha, mxu_dtype),
        out_shape=(
            jax.ShapeDtypeStruct((B, SUB, npad), minv.dtype),
            jax.ShapeDtypeStruct((B, SUB, mpad), minv.dtype),
            jax.ShapeDtypeStruct((B, SUB, mpad), minv.dtype),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, npad, npad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, npad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            vec_n, vec_m, vec_m, vec_m, vec_m, vec_n, vec_m, vec_m,
        ],
        out_specs=(vec_n, vec_m, vec_m),
        # minv (1 MB) + A (2.9 MB) double-buffered across grid cells plus the
        # loop-carried vectors exceed the 16 MB default scoped-vmem budget;
        # v5e/v5p have 128 MB physical VMEM, so raise the cap.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(minv, A, q_r, l_r, u_r, rho_r, rinv_r, x0_r, zc0_r, y0_r)
    return x[:, 0, :n], zc[:, 0, :m], y[:, 0, :m]
