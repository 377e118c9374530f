"""Checkpoint / resume of the full control-loop state.

The reference has no checkpointing (SURVEY.md §5.4) — its closest analogs
are the NLP warm start (centroidal_mpc.ini:9), the MANN merge-point
re-rooting (CentroidalMPCBlock.cpp:464-468) and the first-iteration
bootstraps (WholeBodyQPBlock.cpp:1037-1080). Here the whole loop state is
one pytree (LoopState: integrators + contact plan + SQP/ADMM warm start +
MANN autoregression state + stabilizer integrators), so checkpointing is a
flatten→npz round-trip: long batched sweeps can be split across jobs and
an interactive session can be snapshotted and resumed bit-exactly.

Works for a single LoopState or any pytree of arrays (e.g. a vmapped
batch of states); dtypes and shapes are restored exactly.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

_MANIFEST_KEY = "__cmw_manifest__"
FORMAT_VERSION = 1


def save(path: str, state, meta: dict | None = None) -> None:
    """Save a pytree of arrays to `path` (npz) with its treedef."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    manifest = {
        "version": FORMAT_VERSION,
        "treedef": str(treedef),
        "n_leaves": len(leaves),
        "meta": meta or {},
    }
    arrays[_MANIFEST_KEY] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load(path: str, like):
    """Restore a pytree saved by `save`; `like` supplies the treedef
    (e.g. `ctl.initial_state()`), shapes/dtypes come from the file."""
    with np.load(path) as data:
        manifest = json.loads(bytes(data[_MANIFEST_KEY]).decode())
        leaves = [data[f"leaf_{i}"] for i in range(manifest["n_leaves"])]
    _, treedef = jax.tree.flatten(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template has {treedef.num_leaves}"
        )
    return jax.tree.unflatten(treedef, [jnp.asarray(l) for l in leaves])


def load_meta(path: str) -> dict:
    with np.load(path) as data:
        return json.loads(bytes(data[_MANIFEST_KEY]).decode())["meta"]
