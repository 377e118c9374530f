"""Pure-JAX MANN mixture-of-experts forward pass.

Exact re-implementation of the reference's ONNX graph
(config/robots/ergoCubGazeboV1/onnx_50_mann*.onnx, parsed by onnx_import;
architecture documented in SURVEY.md §2.1 R9):

  h   = W_in  @ x + b_in                      # input normalization (124)
  g   = elu(Wg0 h + bg0); g = elu(Wg1 g + bg1)
  w   = softmax(Wg2 g + bg2)                  # 4 expert weights
  Wk_ = sum_e w_e Wk[e]; bk_ = sum_e w_e bk[e]
  z   = elu(W0_ h + b0_); z = elu(W1_ z + b1_); z = W2_ z + b2_
  y   = W_out @ z + b_out                     # denormalization (91)

Weights import verbatim from the shipped ONNX files; the forward is
validated against a generic numpy interpreter of the graph itself
(onnx_ref.py) in tests. Batched over leading axes; the expert blend is an
einsum (dense on the MXU — no EP sharding needed at 0.2 M params).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cmw_tpu.mann.onnx_import import load_onnx_graph


class MANNWeights(NamedTuple):
    w_in: jnp.ndarray  # [124, 124]
    b_in: jnp.ndarray  # [124]
    gate_w: tuple  # ([32,124],[32,32],[4,32])
    gate_b: tuple  # ([32],[32],[4])
    expert_w: tuple  # ([4,128,124],[4,128,128],[4,91,128])
    expert_b: tuple  # ([4,128],[4,128],[4,91])
    w_out: jnp.ndarray  # [91, 91]
    b_out: jnp.ndarray  # [91]

    @property
    def in_size(self):
        return self.w_in.shape[1]

    @property
    def out_size(self):
        return self.w_out.shape[0]


def load_mann_weights(onnx_path: str, dtype=jnp.float32) -> MANNWeights:
    g = load_onnx_graph(onnx_path)
    init = g.initializers
    a = lambda k: jnp.asarray(np.asarray(init[k]), dtype)
    return MANNWeights(
        w_in=a("0.weight"),
        b_in=a("0.bias"),
        gate_w=(a("1.gn.w0"), a("1.gn.w1"), a("1.gn.w2")),
        gate_b=(
            a("1.gn.b0")[:, 0],
            a("1.gn.b1")[:, 0],
            a("1.gn.b2")[:, 0],
        ),
        expert_w=(a("1.mpn.w0"), a("1.mpn.w1"), a("1.mpn.w2")),
        expert_b=(
            a("1.mpn.b0")[..., 0],
            a("1.mpn.b1")[..., 0],
            a("1.mpn.b2")[..., 0],
        ),
        w_out=a("2.weight"),
        b_out=a("2.bias"),
    )


def mann_forward(w: MANNWeights, x):
    """x [..., 124] -> y [..., 91]. Gating + blended-expert MLP."""
    elu = jax.nn.elu
    h = jnp.einsum("ij,...j->...i", w.w_in, x) + w.b_in
    g = elu(jnp.einsum("ij,...j->...i", w.gate_w[0], h) + w.gate_b[0])
    g = elu(jnp.einsum("ij,...j->...i", w.gate_w[1], g) + w.gate_b[1])
    om = jax.nn.softmax(jnp.einsum("ij,...j->...i", w.gate_w[2], g) + w.gate_b[2], axis=-1)

    z = h
    for layer, (We, be) in enumerate(zip(w.expert_w, w.expert_b)):
        # blend experts then apply: sum_e om_e (We[e] z + be[e])
        z = jnp.einsum("...e,eij,...j->...i", om, We, z) + jnp.einsum(
            "...e,ei->...i", om, be
        )
        if layer < 2:
            z = elu(z)
    return jnp.einsum("ij,...j->...i", w.w_out, z) + w.b_out
