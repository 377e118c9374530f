"""Batched symmetric matrix-vector product from a packed lower triangle —
Pallas TPU kernel for the ADMM x-update.

The ADMM loop's dominant HBM traffic is re-reading each item's [n, n] KKT
inverse on every iteration (cmpc/qp.py admm_solve; measured ~33 ms/solve
at batch 512 on v5e, ~90% of HBM bandwidth — the GEMV itself is at the
roofline). The inverse is SYMMETRIC, so only the lower triangle carries
information: packing its 128x128 blocks once per solve and reading only
those per iteration cuts the per-iteration traffic to nb(nb+1)/2 / nb^2
(= 10/16 at n=512), which is the only way left to beat the roofline at
f32 precision. Measured on v5e (batch 512, 2x24 iterations): 6,018
solves/s vs 5,884 dense (+2.3% end-to-end — the (8,128) MXU row padding
and per-cell grid overhead absorb most of the traffic saving; kept
opt-in via MPCConfig.xupdate_impl).

    out = M v,  M = sum over lower blocks (i,j):
      out_i += v_j @ B_ij^T          (the block itself)
      out_j += v_i @ B_ij   (i > j)  (its mirrored transpose)

Vectors ride as SUB=8 replicated sublane rows (same convention as
ops/admm_fused.py) so each block product is an (8,128)x(128,128) MXU op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128
SUB = 8


def tri_index(nb: int):
    """Lower-triangle block coordinates [(i, j) with j <= i], row-major."""
    return [(i, j) for i in range(nb) for j in range(i + 1)]


def pack_symmetric(M: jnp.ndarray) -> jnp.ndarray:
    """[B, n, n] symmetric (n % 128 == 0) -> packed [B, T, 128, 128] of the
    lower-triangle blocks. One full read of M; amortized over all ADMM
    iterations of the solve."""
    B, n, _ = M.shape
    nb = n // BLK
    blocks = [
        M[:, i * BLK : (i + 1) * BLK, j * BLK : (j + 1) * BLK]
        for (i, j) in tri_index(nb)
    ]
    return jnp.stack(blocks, axis=1)


def _kernel(nb, packed_ref, v_ref, out_ref):
    v = v_ref[0]  # [SUB, n]
    acc = [jnp.zeros((SUB, BLK), jnp.float32) for _ in range(nb)]
    for t, (i, j) in enumerate(tri_index(nb)):
        Bij = packed_ref[0, t]  # [BLK, BLK]
        vj = v[:, j * BLK : (j + 1) * BLK]
        # out_i += B_ij v_j  (rows: v_j @ B_ij^T)
        acc[i] = acc[i] + jax.lax.dot_general(
            vj, Bij, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if i != j:
            vi = v[:, i * BLK : (i + 1) * BLK]
            # out_j += B_ij^T v_i  (rows: v_i @ B_ij)
            acc[j] = acc[j] + jax.lax.dot_general(
                vi, Bij, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[0] = jnp.concatenate(acc, axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def symv_packed(packed: jnp.ndarray, v: jnp.ndarray, interpret: bool = False):
    """out = M v from the packed lower triangle.

    packed [B, T, 128, 128] (pack_symmetric), v [B, n] -> [B, n]."""
    B, T, _, _ = packed.shape
    nb = int(round((-1 + (1 + 8 * T) ** 0.5) / 2))
    assert nb * (nb + 1) // 2 == T, (T, nb)
    n = nb * BLK
    v_r = jnp.broadcast_to(v[:, None, :], (B, SUB, n))
    out = pl.pallas_call(
        functools.partial(_kernel, nb),
        out_shape=jax.ShapeDtypeStruct((B, SUB, n), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, BLK, BLK), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SUB, n), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(packed, v_r)
    return out[:, 0, :]
