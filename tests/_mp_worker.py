"""Worker for tests/test_multiprocess.py — one rank of a 2-process CPU mesh.

Run by the test with JAX_PLATFORMS=cpu and 4 virtual devices per process, so
the global mesh is 8 devices across 2 OS processes. Exercises the multi-host
path of parallel/mesh.py end-to-end: init_distributed (the comm-backend row
of SURVEY §2.2), a global (data,) mesh, host-replicated params, data-sharded
batch, and the XLA-inserted gradient all-reduce — the same single-controller
program every rank runs unchanged.

Prints ONE json line {"loss": .., "gsum": .., "psum": ..} for the test to
compare across ranks and against a numpy reference.
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

from sliders_conceptmod_tpu.parallel import mesh as mesh_lib


def run_trainer(coordinator: str, num_processes: int, process_id: int) -> None:
    """Full tiny trainer through the YAML/CLI surface on the multi-process
    world: tpu.coordinator_address joins the world inside trainer.train,
    tpu.samples_per_step=8 shards samples over the global 8-device mesh.
    Prints the per-step losses — the test compares ranks against each other
    and against a single-process 8-device run of the SAME config."""
    from pathlib import Path

    from sliders_conceptmod_tpu.core.config import load_config_from_yaml
    from sliders_conceptmod_tpu.core.prompts import load_prompts_from_yaml
    from sliders_conceptmod_tpu.train.trainer import train

    repo = Path(__file__).resolve().parents[1]
    config = load_config_from_yaml(str(repo / "data" / "config-tiny.yaml"))
    config.train.iterations = 3
    config.tpu.samples_per_step = 8
    config.tpu.coordinator_address = coordinator
    config.tpu.num_processes = num_processes
    config.tpu.process_id = process_id
    config.logging.verbose = False
    config.save.path = f"/tmp/mp_trainer_rank{process_id}"
    prompts = load_prompts_from_yaml(str(repo / "data" / "prompts-tiny.yaml"))
    result = train(config, prompts, rank=2, save_file=process_id == 0)
    assert jax.device_count() == 8, jax.device_count()
    print(json.dumps({"losses": [float(l) for l in result.losses]}))


def main() -> None:
    if sys.argv[1] == "trainer":
        run_trainer(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return
    coordinator, num_processes, process_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    mesh_lib.init_distributed(coordinator, num_processes, process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 8 // num_processes

    mesh = mesh_lib.make_mesh(data=8)

    # host-identical values, as in the trainers: params from one checkpoint,
    # batch rows derived from one seed
    w_host = np.arange(16, dtype=np.float32).reshape(4, 4) / 16.0
    x_host = np.arange(32, dtype=np.float32).reshape(8, 4) / 32.0

    with mesh:
        w = mesh_lib.replicate_host_tree(w_host, mesh)
        x = mesh_lib.data_shard_host_tree(x_host, mesh)

        @jax.jit
        def loss_and_grad(w, x):
            def loss_fn(w):
                return jnp.mean((x @ w) ** 2)

            return jax.value_and_grad(loss_fn)(w)

        loss, g = loss_and_grad(w, x)
        # loss/grads are fully replicated outputs (grad wrt a replicated
        # param — XLA inserted the cross-process all-reduce); every rank can
        # read them locally
        loss = float(loss)
        gsum = float(jnp.sum(g))

        # explicit collective: psum over the data axis via shard_map
        from functools import partial

        from jax.sharding import PartitionSpec as P

        @partial(jax.shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
        def total(rows):
            return jax.lax.psum(jnp.sum(rows), "data")

        psum_val = float(total(x))

    print(json.dumps({"loss": loss, "gsum": gsum, "psum": psum_val}))


if __name__ == "__main__":
    main()
