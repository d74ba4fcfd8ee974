"""Device mesh and sharding helpers.

The reference's distributed layer is torch DDP over NCCL with
launcher-specific process wiring (apis/mmdet_train.py:93-102,
tools/train.py:181-219). The TPU-native equivalent is a `jax.sharding`
mesh: data parallel over ICI within a host, extended over DCN hosts via
`jax.distributed.initialize` (SURVEY.md §2.5). Gradient reduction,
loss-normaliser sums, and eval gathers are XLA collectives inserted by
pjit from these shardings — there is no NCCL-style hand-written
communication anywhere in the framework.

An optional second `cam` axis shards the camera dimension of
images/features for high-res configs (the SURVEY §5 scaling plan);
`__graft_entry__.dryrun_multichip` validates it.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_cam_shards: int = 1, devices=None
) -> Mesh:
    """1-D `data` mesh, or 2-D (data, cam) when num_cam_shards > 1."""
    devices = np.array(devices if devices is not None else jax.devices())
    if num_cam_shards == 1:
        return Mesh(devices, ("data",))
    assert len(devices) % num_cam_shards == 0
    return Mesh(
        devices.reshape(-1, num_cam_shards), ("data", "cam")
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis (and the camera axis on 2-D meshes)."""
    if "cam" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "cam"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put_batch_array(v, sharding: NamedSharding):
    """Place one host batch array on the mesh.

    Single process: the host value IS the global value — plain
    device_put. Multi-process: each process's host pipeline produces
    only its LOCAL rows of the global batch (the sampler yields
    bs_local items per rank), so the global array must be assembled
    from per-process shards (the JAX-native equivalent of the
    reference's per-rank DataLoader under DDP, apis/mmdet_train.py:
    93-135)."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(v)
        )
    return jax.device_put(v, sharding)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Put a host batch dict onto the mesh with batch-axis sharding.

    `gt_depth` lists are sharded per level; everything else shards on
    axis 0 (+ camera axis for image-like arrays on 2-D meshes).
    Multi-process: each process contributes its local rows (see
    `_put_batch_array`); camera-axis sharding is an intra-host layout
    and is not combined with multi-process feeding.
    """
    data_sh = batch_sharding(mesh)
    data_only = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1 and "cam" in mesh.axis_names:
        raise NotImplementedError(
            "camera-axis sharding is single-process (intra-host) only"
        )
    out = {}
    for k, v in batch.items():
        if isinstance(v, list):
            out[k] = [_put_batch_array(x, data_only) for x in v]
        elif hasattr(v, "ndim") and v.ndim >= 2 and "cam" in mesh.axis_names:
            out[k] = jax.device_put(v, data_sh)
        else:
            out[k] = _put_batch_array(v, data_only)
    return out


def host_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Align all processes at the coordinator service (no device
    collective involved). No-op when not running under
    `jax.distributed`."""
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


def warm_mesh_collectives(mesh: Mesh) -> None:
    """Initialise every CPU (gloo) communicator clique the training
    program will use, while the hosts are still aligned.

    Gloo context creation has a hard ~30 s peer deadline baked into
    XLA (`make_gloo_tcp_collectives` exposes no timeout), and per-host
    compile/tracing skew easily exceeds it — observed as 'Gloo context
    initialization failed: DEADLINE_EXCEEDED' at the first global
    device_put / train-step psum in the two-process CI run. Running one
    tiny collective per clique here (full-mesh psum + cross-host
    replication pairs) right after a coordinator barrier leaves warm,
    cached contexts that later first-uses reuse regardless of skew.
    No-op single-process and on TPU pods this is a harmless microscopic
    warmup step."""
    if jax.process_count() == 1:
        return
    host_barrier("simpb_mesh_warmup")
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh.axis_names[0]))
    n_local = mesh.devices.size // jax.process_count()
    g = jax.make_array_from_process_local_data(
        data, np.zeros((n_local,), np.float32)
    )
    np.asarray(jax.jit(lambda x: x.sum(), out_shardings=repl)(g))
    np.asarray(jax.device_put(np.float32(0), repl))
    host_barrier("simpb_mesh_warmup_done")


def initialize_multihost(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host (DCN) initialisation — the reference's launcher matrix
    (pytorch/slurm/mpi/mpi_nccl, tools/train.py:181-219) collapses to one
    call here; TPU pod runtimes usually autodetect all arguments.

    After initialisation the hosts are re-aligned at the coordinator
    and one tiny allgather runs while they are aligned: the CPU (gloo)
    collective backend's context init has a hard ~30 s peer deadline,
    so the first collective must not happen at a point where hosts have
    drifted minutes apart (per-host compile/tracing skew does exactly
    that — observed as 'Gloo context initialization failed:
    DEADLINE_EXCEEDED' in the two-process CI run). Warming the context
    here removes the constraint from all later collectives."""
    if coordinator is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        host_barrier("simpb_collectives_warmup")
        multihost_utils.process_allgather(np.zeros((1,), np.int32))
