"""Tensor-parallel parameter sharding over the mesh `tensor` axis.

The reference has no tensor parallelism (SURVEY.md §2.9: DP only); this is
the TPU-native extension for model variants whose attention/FFN weights
outgrow one chip's HBM. Megatron-style column/row split expressed as GSPMD
`PartitionSpec`s — place the params with these shardings and `jit` the
forward; XLA propagates the shardings and inserts the all-reduces that the
row-parallel (`proj`/`fc`) matmuls require. No model-code changes, and the
math is exactly the unsharded forward (equivalence-tested on a CPU mesh in
`tests/test_tensor_sharding.py`).

Rules (by Flax param path):
  * attention `qkv`      — column-parallel: kernel (C, 3C) split on the
    output dim, bias split likewise;
  * attention `proj`     — row-parallel: kernel (C, C) split on the input
    dim, bias replicated (XLA psums the partial outputs);
  * CCF_FFN `pwconv`     — column-parallel up-projection, with the hidden
    `dwconv` depthwise kernel and the hidden layer norms sharded to match;
  * CCF_FFN `fc`         — row-parallel down-projection;
  * everything else      — replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(path, leaf) -> P:
    names = tuple(
        p.key if hasattr(p, "key") else str(p) for p in path
    )
    ndim = leaf.ndim if hasattr(leaf, "ndim") else len(leaf.shape)
    axis = "tensor"
    in_attn = any("attn" in n for n in names)
    if len(names) >= 2:
        parent, last = names[-2], names[-1]
        # column-parallel: split the OUTPUT features
        if parent == "qkv" or parent == "pwconv":
            if last == "kernel":
                return P(*([None] * (ndim - 1) + [axis]))
            if last == "bias":
                return P(axis)
        # hidden-dim tensors of the FFN stay aligned with pwconv's split
        if parent == "dwconv" or (
            len(names) >= 3 and names[-3] == "dwconv"
        ):
            if last == "kernel":
                return P(*([None] * (ndim - 1) + [axis]))
            if last == "bias":
                return P(axis)
        if parent in ("norm1", "norm2") and any("mlp" in n for n in names):
            return P(axis)
        # row-parallel: split the INPUT features, replicate the bias
        if (parent == "proj" and in_attn) or parent == "fc":
            if last == "kernel":
                return P(*([axis] + [None] * (ndim - 1)))
            if last == "bias":
                return P()
    return P()


def tensor_param_specs(params) -> Any:
    """Pytree of `PartitionSpec`s (same structure as `params`) applying the
    Megatron column/row rules above; non-matmul params replicate."""
    return jax.tree_util.tree_map_with_path(_spec_for_path, params)


def shard_params_tensor(mesh: Mesh, params):
    """Place `params` on `mesh` with tensor-parallel shardings."""
    specs = tensor_param_specs(params)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs
    )
