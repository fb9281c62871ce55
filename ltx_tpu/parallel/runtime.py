"""Multi-host / multi-slice distributed runtime.

The reference is a single-process, single-device program (SURVEY.md §5.8:
no distributed backend of any kind); everything here is new TPU-native
capability. One v5e-8 host needs none of it — `sharding.make_mesh` /
`pipeline.make_pp_mesh` suffice. This module adds the two pieces that turn
those single-host meshes into fleet meshes:

* `initialize_distributed()` — thin, idempotent wrapper over
  `jax.distributed.initialize`. Every host of a multi-host slice (v5e-16+)
  or multi-slice deployment calls it before touching devices; after it,
  `jax.devices()` is the GLOBAL device list and the existing mesh builders
  work unchanged.
* `make_hybrid_mesh()` — a (data, model) or (data, pipe) mesh laid out so
  the model/pipe axis always rides ICI (within a slice) and only the OUTER
  part of the data axis crosses DCN (between slices). This is the
  scaling-book recipe: the frequent collectives (TP all-reduces after
  to_out/project_out, PP ppermute hops, ring-attention permutes) are
  ICI-resident; DCN only carries the infrequent data-parallel work
  (gradient all-reduce once per train step; nothing at inference — guidance
  rows never talk to each other).

The DCN boundary is expressed by device ORDER inside a single named axis,
not by an extra mesh axis, so every existing partition spec
(`sharding.transformer_param_specs`, `pipeline.pp_param_specs`, the train
step's dp+tp specs) works on a hybrid mesh verbatim. XLA sees which
collectives span slices from the device assignment and lowers hierarchical
(ICI-then-DCN) reductions on its own.

Offline testing: real slice topology comes from `device.slice_index`; CPU
virtual devices don't carry one, so `slices=` lets tests (and the dryrun)
declare contiguous device groups as pseudo-slices and validate the layout
logic — the placement invariants are asserted either way.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ltx_tpu.core.errors import InvalidConfigurationError

log = logging.getLogger("ltx_tpu")

_INITIALIZED = False


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           local_device_ids=None) -> bool:
    """Initialize JAX's multi-process runtime; returns True if it did.

    No-ops (returns False) when called twice, or when nothing indicates a
    multi-process deployment (no args AND no cluster env — on real Cloud
    TPU pods `jax.distributed.initialize()` auto-detects from the metadata
    server, so bare calls are safe there and CLI callers pass
    --coordinator explicitly elsewhere).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return False
    has_env = bool(os.environ.get("COORDINATOR_ADDRESS")
                   or os.environ.get("JAX_COORDINATOR_ADDRESS")
                   or os.environ.get("TPU_WORKER_HOSTNAMES")
                   or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and num_processes is None and not has_env:
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    log.info("jax.distributed initialized: process %d/%d, %d local / %d "
             "global devices", jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())
    return True


def _group_by_slice(devices, slices: Optional[int]):
    """-> list of per-slice device lists, ICI-contiguous within each."""
    if slices is None:
        idx = [getattr(d, "slice_index", None) for d in devices]
        if any(i is None for i in idx):
            return [list(devices)]           # single slice (or CPU test)
        groups: dict = {}
        for d, i in zip(devices, idx):
            groups.setdefault(i, []).append(d)
        return [groups[k] for k in sorted(groups)]
    n = len(devices)
    if n % slices:
        raise InvalidConfigurationError(
            f"{n} devices do not split into {slices} equal slices")
    per = n // slices
    return [list(devices[i * per:(i + 1) * per]) for i in range(slices)]


def make_hybrid_mesh(data: int = 1, model: Optional[int] = None,
                     axis_names: Sequence[str] = ("data", "model"),
                     devices=None, slices: Optional[int] = None) -> Mesh:
    """(data, model) mesh with the model axis ICI-resident.

    data must be a multiple of the slice count: each slice contributes
    `data/slices` rows of `model` ICI-connected devices, and rows are
    ordered slice-major so the data axis's outer stride is the only thing
    crossing DCN. With one slice this reduces to `sharding.make_mesh`'s
    layout exactly.

    axis_names=("data", "pipe") builds the pipeline-parallel variant —
    GPipe's ppermute hops then also stay on ICI.
    """
    devices = list(devices) if devices is not None else jax.devices()
    groups = _group_by_slice(devices, slices)
    n_slice = len(groups)
    per_slice = len(groups[0])
    if any(len(g) != per_slice for g in groups):
        raise InvalidConfigurationError(
            "slices contribute unequal device counts: "
            f"{[len(g) for g in groups]}")
    n = n_slice * per_slice
    if model is None:
        model = n // data
    if data * model > n:
        raise InvalidConfigurationError(
            f"mesh {data}x{model} needs {data * model} devices, "
            f"have {n} across {n_slice} slice(s)")
    if data * model < n:
        # subset meshes allowed (make_mesh parity): trim each slice equally
        if (data * model) % n_slice:
            raise InvalidConfigurationError(
                f"mesh {data}x{model} does not trim evenly over "
                f"{n_slice} slices")
        per_slice = data * model // n_slice
        groups = [g[:per_slice] for g in groups]
    if data % n_slice:
        raise InvalidConfigurationError(
            f"data axis {data} must be a multiple of the slice count "
            f"{n_slice} (the model axis may not cross DCN)")
    if model > per_slice:
        raise InvalidConfigurationError(
            f"model axis {model} exceeds one slice's {per_slice} devices — "
            "it would cross DCN; shard data or pipe across slices instead")
    rows_per_slice = data // n_slice
    arr = np.empty((data, model), dtype=object)
    for s, g in enumerate(groups):
        block = np.asarray(g, dtype=object).reshape(rows_per_slice, model)
        arr[s * rows_per_slice:(s + 1) * rows_per_slice] = block
    return Mesh(arr, tuple(axis_names))


def process_local_batch(local_data, mesh: Mesh, axis: str = "data"):
    """Assemble a GLOBAL batch-sharded jax.Array from per-process data.

    Training input pipeline for multi-host: each process loads only its
    own batch rows (global_batch/process_count) and this stitches them
    into one global array sharded over `axis`. Single-process it is just
    device_put with the batch sharding.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(local_data, sh)
    global_shape = (local_data.shape[0] * jax.process_count(),
                    *local_data.shape[1:])
    return jax.make_array_from_process_local_data(sh, local_data,
                                                  global_shape)
