"""Mesh + tensor-parallel sharding for the DiT.

The reference has NO parallelism of any kind (SURVEY.md §2.9); this module is
new TPU-first capability, not a port. Strategy:

* 2D mesh ("data", "model"). Guidance branches / batch ride the data axis;
  attention heads and the 16384-wide FFN shard over the model axis (classic
  megatron-style TP, expressed as NamedSharding on the stacked block params —
  XLA GSPMD inserts the all-reduces after to_out / project_out).
* The flat-tensor QK RMSNorm reduces over the full 4096 dim; with Q sharded
  by heads GSPMD turns the mean into a small all-reduce — semantics
  preserved.
* 19B bf16 weights (~38 GB) exceed one v5e core's 16 GB HBM, so TP sharding
  is REQUIRED for bf16, not an optimization (SURVEY.md §5 hard part 5).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, model: Optional[int] = None,
              devices=None) -> Mesh:
    """Create a (data, model) mesh. Default: all devices on the model axis."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if model is None:
        model = n // data
    need = data * model
    assert need <= n, f"mesh {data}x{model} needs {need} devices, have {n}"
    arr = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def _attn_spec():
    """Column-parallel QKV, row-parallel output projection."""
    return {
        "to_q": {"w": P(None, None, "model"), "b": P(None, "model")},
        "to_k": {"w": P(None, None, "model"), "b": P(None, "model")},
        "to_v": {"w": P(None, None, "model"), "b": P(None, "model")},
        "to_out": {"w": P(None, "model", None), "b": P(None, None)},
        "q_norm": {"w": P(None, "model")},
        "k_norm": {"w": P(None, "model")},
    }


def dit_param_specs(params) -> dict:
    """PartitionSpec pytree for the stacked-block DiT params.

    Block leaves carry a leading layer axis (never sharded). Replicated
    leaves get P() — small tables, embeddings, output head.
    """
    specs = {
        "patchify_proj": {"w": P(), "b": P()},
        "adaln_single": jax.tree.map(lambda _: P(), params["adaln_single"]),
        "caption_projection": jax.tree.map(
            lambda _: P(), params["caption_projection"]
        ),
        "blocks": {
            "attn1": _attn_spec(),
            "attn2": _attn_spec(),
            "ff": {
                "project_in": {"w": P(None, None, "model"), "b": P(None, "model")},
                "project_out": {"w": P(None, "model", None), "b": P(None, None)},
            },
            "scale_shift_table": P(),
        },
        "proj_out": {"w": P(), "b": P()},
        "scale_shift_table": P(),
    }
    return specs


def shard_dit_params(params, mesh: Mesh):
    """Place DiT params on the mesh with TP sharding."""
    specs = dit_param_specs(params)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda p: jax.device_put(p, NamedSharding(mesh, P())), tree
    )


def data_sharding(mesh: Mesh):
    """Sharding for (G, ...) guidance-batched activations: G on data axis."""
    return NamedSharding(mesh, P("data"))
