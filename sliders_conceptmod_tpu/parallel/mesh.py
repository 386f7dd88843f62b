"""Device mesh + sharding helpers — the framework's distributed layer.

The reference has NO distributed support (single CUDA ordinal,
``train_lora_xl.py:418``; SURVEY §2.2 absence inventory). This module is the
TPU-native plan from SURVEY §2.2:

* a (data, model) ``jax.sharding.Mesh`` over all visible devices,
* data parallelism for ESD training: the per-step independent samples
  (pair, timestep, noise) shard over the ``data`` axis; LoRA params and the
  frozen UNet replicate; XLA inserts the gradient ``psum`` from the sharding
  annotations (no hand-written collectives needed at this scale),
* ``model`` axis reserved for tensor-parallel sharding of SDXL attention
  heads / MLPs (>16 GB-per-chip configs) — plumbing is in place, default 1.

Single-chip (and CPU test) meshes are the degenerate 1×1 case, so every
code path is identical from laptop CPU to a v5e pod slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

_DISTRIBUTED = {"initialized": False}


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Join a multi-host JAX runtime — the comm-backend row of SURVEY §2.2
    (the reference is single-process, single-GPU; NCCL's role here is played
    by the JAX distributed service + XLA collectives over ICI/DCN).

    After this call ``jax.devices()`` is GLOBAL across all processes, so
    :func:`make_mesh` lays the (data, model) axes over every chip in the
    slice and the SAME single-controller program runs unchanged — collectives
    are inserted by XLA from sharding annotations alone.

    On Cloud TPU pods all three arguments autodetect (call with none). For
    manual bring-up (or the CPU multi-process test) pass the coordinator's
    ``host:port``, the world size, and this process's rank. Idempotent:
    repeat calls no-op.
    """
    if _DISTRIBUTED["initialized"]:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _DISTRIBUTED["initialized"] = True


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Block until every process reaches this barrier — over the
    coordination-service gRPC channel (NOT a device collective), so it can
    re-synchronize ranks whose XLA compile times diverged arbitrarily BEFORE
    the first Gloo/ICI collective executes. Gloo's context init carries a
    fixed ~30 s deadline; on a shared-core host two ranks' cold trainer
    compiles serialize and can skew past it (VERDICT r4 weak #1), so the
    trainers AOT-compile and then cross this barrier before step 1. No-op in
    single-process runs."""
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_ms))


def training_mesh_from_config(tpu_cfg, samples_per_step: int) -> Mesh | None:
    """The trainer CLIs' shared mesh bring-up from the yaml ``tpu:`` block:
    join a multi-host world first when configured (coordinator_address /
    num_processes / process_id), then build the (data, model) mesh when the
    runtime has >1 device and the config asks for DP (samples_per_step > 1)
    or TP (mesh_model > 1). Single-device runs return None — the exact
    1-chip graph."""
    if getattr(tpu_cfg, "coordinator_address", None) or getattr(tpu_cfg, "num_processes", None):
        init_distributed(
            tpu_cfg.coordinator_address, tpu_cfg.num_processes, tpu_cfg.process_id
        )
    mesh_model = max(getattr(tpu_cfg, "mesh_model", 1), 1)
    if jax.device_count() <= 1 or (samples_per_step <= 1 and mesh_model <= 1):
        return None
    if mesh_model > 1 and jax.process_count() > 1:
        raise NotImplementedError(
            "multi-host tensor parallelism is not wired — shard the model "
            "axis within one host (mesh_model <= local devices)"
        )
    # the data axis shards samples_per_step rows, so it must divide them —
    # otherwise the with_sharding_constraint inside the first train step
    # fails with a cryptic trace-time error far from the yaml that caused it
    data = getattr(tpu_cfg, "mesh_data", -1)
    if data in (-1, 0, None):
        import math

        data = max(jax.device_count() // mesh_model, 1)
        if samples_per_step % data:
            # auto-sizing only ever shrinks to a divisor; say so out loud
            data = math.gcd(samples_per_step, data)
            print(
                f"[mesh] tpu.samples_per_step={samples_per_step} is not divisible by "
                f"the {jax.device_count() // mesh_model}-device data axis — using "
                f"mesh_data={data} (set tpu.mesh_data or raise samples_per_step to "
                "use every chip)"
            )
    elif samples_per_step % data:
        raise ValueError(
            f"tpu.samples_per_step={samples_per_step} must be divisible by "
            f"tpu.mesh_data={data} (each data-axis chip takes an equal share "
            "of the per-step samples)"
        )
    # a shrunk data axis uses the first data*model devices; the rest idle
    return make_mesh(data, mesh_model, devices=jax.devices()[: data * mesh_model])


def place_training_state(mesh: Mesh, base_params, lora_params, opt_state, bank,
                         tp: bool = False):
    """Place the four training trees on the mesh (every host holds identical
    values — one checkpoint, one seed): the frozen base replicates (or
    tensor-shards its weight output dims when ``tp``); adapter params,
    optimizer state and the prompt bank replicate."""
    base_place = tp_shard_tree if tp else replicate_host_tree
    return (
        base_place(base_params, mesh),
        replicate_host_tree(lora_params, mesh),
        replicate_host_tree(opt_state, mesh),
        replicate_host_tree(bank, mesh),
    )


def replicate_host_tree(tree, mesh: Mesh):
    """Replicate host-identical values onto a (possibly multi-process) mesh.

    Every process holds the same host value (the common trainer case: params
    loaded from one checkpoint, PRNG keys derived from one seed), so the
    global array is assembled per-shard from the local copy. Single-process
    meshes degrade to a plain replicated ``device_put``.
    """
    if jax.process_count() == 1:
        return replicate_tree(tree, mesh)
    sharding = replicated(mesh)

    def place(a):
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])

    return jax.tree.map(place, tree)


def data_shard_host_tree(tree, mesh: Mesh):
    """Shard dim 0 of host-identical arrays over the ``data`` axis of a
    (possibly multi-process) mesh. Each process holds the full value and
    contributes only the rows its local devices own."""
    if jax.process_count() == 1:
        return jax.tree.map(lambda a: jax.device_put(a, data_sharded(mesh)), tree)
    sharding = data_sharded(mesh)

    def place(a):
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])

    return jax.tree.map(place, tree)


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """data=-1: all remaining devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_keys(keys: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a [n_samples, ...] PRNG-key array with dim 0 over the data axis."""
    return jax.device_put(keys, data_sharded(mesh))


def replicate_tree(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def tp_shard_tree(tree, mesh: Mesh):
    """Tensor-parallel placement: shard every weight's OUTPUT (last) dim over
    the ``model`` axis when divisible (matmul kernels, conv O-dim, and the
    matching 1-D bias/scale rows); everything else replicates. XLA inserts
    the collectives from these shardings alone — the forward needs no edits
    (validated in tests/test_tensor_parallel.py). This is how >1-chip params
    (flux-schnell: 23.8 GB bf16, BASELINE.md HBM table) fit a v5e slice."""
    m = mesh.shape[MODEL_AXIS]

    def rule(a):
        if a.ndim >= 2 and a.shape[-1] % m == 0:
            return NamedSharding(mesh, P(*([None] * (a.ndim - 1) + [MODEL_AXIS])))
        if a.ndim == 1 and a.shape[0] % m == 0:
            return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree.map(lambda a: jax.device_put(a, rule(a)), tree)
