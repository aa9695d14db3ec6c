"""Device-mesh data parallelism — the TPU-native replacement for DDP/NCCL.

Rebuild target C4 / §2c of SURVEY.md: the reference's only parallelism is
PyTorch DDP over NCCL (README.md:29 "支持pytorch DDP多GPU分布式训练"). Here the
same semantics (identical global batch, averaged gradients) come from GSPMD:

* one `Mesh(devices, ('data',))` over all chips (ICI within a slice);
* the batch is sharded on `data`, params/opt-state replicated;
* `jax.jit` partitions the step function and XLA inserts the gradient
  all-reduce over ICI automatically — no process groups, no hand-written
  collectives. Multi-host extends the same mesh via
  `jax.distributed.initialize()` (DCN across slices).

A `model` axis is left possible (mesh_shape=(dp, mp)) but unused — the
reference has no TP/PP (SURVEY.md §2c) and detector convs don't need it.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(num_devices: Optional[int] = None,
                axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Shard every array in the batch pytree with its leading dim split
    over `data`.

    Single-process: arrays hold the GLOBAL batch → plain device_put.
    Multi-process (the DDP/DistributedSampler analog): each process holds
    its LOCAL slice of the global batch (global_batch // process_count
    rows, see ``TrainLoader(shard=...)``) and the slices are assembled
    into one global array — the jitted step then runs the same SPMD
    program as the single-process path, gradient all-reduce riding
    ICI/DCN. Global leading dim must divide the mesh size.

    On a 2-D data×spatial mesh (parallel/spatial.py), the NHWC ``image``
    entry additionally shards its H axis over ``spatial``; every other
    entry replicates over the spatial axis (P('data') on a 2-D mesh)."""
    sh = batch_sharding(mesh, axis_name)
    spatial = "spatial" in mesh.axis_names

    def sharding_for(k, x):
        if spatial and k == "image" and getattr(x, "ndim", 0) == 4:
            return NamedSharding(mesh, P(axis_name, "spatial"))
        return sh

    if not isinstance(batch, dict):
        if jax.process_count() > 1:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    sh, np.asarray(x)), batch)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(
            sharding_for(k, np.asarray(v)), np.asarray(v))
            for k, v in batch.items()}
    return {k: jax.device_put(v, sharding_for(k, v))
            for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    if jax.process_count() > 1:
        # COMMITTED single-device leaves (e.g. an orbax-restored TrainState)
        # cannot be device_put onto a sharding spanning other hosts' devices
        # — jax raises "does not support cross-host device transfers". Pull
        # to host once: every rank holds the SAME state (fresh init by
        # identical seed, or the same checkpoint — run_train's resume guard
        # verifies it), so the local put assembles the replicated global
        # array without any wire transfer. Uncommitted fresh-init leaves
        # take this path too; the extra device_get is once per run.
        tree = jax.device_get(tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host init — the reference's torchrun process-group bootstrap
    (SURVEY.md §3.1) maps to this single call; afterwards `jax.devices()`
    spans every host and `create_mesh()` builds the global mesh (gradient
    all-reduce rides ICI within a slice, DCN/Gloo across hosts).

    With no arguments it initialises ONLY when the environment carries
    explicit cluster markers (SLURM/OMPI/torchrun-style vars, a
    coordinator address, TPU-pod worker lists) and is an immediate no-op
    otherwise: `jax.distributed.initialize()`'s own auto-detection can
    BLOCK for minutes on hosts without cloud metadata (it probes the GCE
    metadata service), which would hang every single-host `run_train`.
    Explicit arguments bootstrap an ad-hoc cluster (tested via a real
    2-process CPU cluster in tests/test_multihost.py). Returns True when
    a multi-process runtime is active."""
    import os
    if coordinator_address is None and num_processes is None:
        if jax.process_count() > 1:
            return True                       # already initialised
        markers = ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE", "NPROC",
                   "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                   "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                   "CLOUD_TPU_TASK_ID")
        if not any(os.environ.get(m) for m in markers):
            return False                      # plain single host
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError):
        # A FAILED bootstrap of an intended cluster must not degrade to N
        # independent full-data trainings (each host would then train the
        # whole dataset and overwrite the shared ckpt_dir): re-raise when
        # the caller explicitly asked for a cluster, or when ANY of the
        # ambient markers that triggered init above says this is a
        # multi-task launch — unless the runtime is in fact already
        # initialised with a cluster (repeat init_distributed calls raise
        # RuntimeError benignly).
        expected = num_processes or 0
        if not expected:  # first size-carrying env marker wins
            for m in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE", "NPROC"):
                v = os.environ.get(m)
                if v and v.isdigit() and int(v) > 0:
                    expected = int(v)
                    break
        if not expected:
            hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
            expected = len([h for h in hosts.split(",") if h.strip()])
        if expected > 1 and jax.process_count() != expected:
            raise
        if jax.process_count() == 1:
            if coordinator_address is not None:
                raise  # explicit ad-hoc cluster requested but init failed
            # size-less cluster markers (an address / pod task id implies a
            # cluster without encoding how many processes it has)
            sizeless = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                        "MEGASCALE_COORDINATOR_ADDRESS", "CLOUD_TPU_TASK_ID")
            if not expected and any(os.environ.get(m) for m in sizeless):
                raise
        return jax.process_count() > 1  # single-process / already initialised
    return jax.process_count() > 1
