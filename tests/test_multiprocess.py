"""Multi-process comm backend (SURVEY §2.2 comm-backend row).

The reference has no distributed runtime at all; here the NCCL role is
played by jax.distributed + XLA collectives. This test stands up a REAL
2-process world on CPU (4 virtual devices each → one global 8-device mesh),
runs the same single-controller program on both ranks through
parallel/mesh.py's multi-host helpers, and checks both ranks agree with a
numpy reference — gradient all-reduce and an explicit shard_map psum
included. On TPU pods the identical code path rides ICI/DCN.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_matches_reference():
    port = _free_port()
    env = {
        **os.environ,
        "PYTHONPATH": str(REPO),  # repo only — drop the TPU-dialing sitecustomize
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_COMPILATION_CACHE_DIR": "",  # ranks must not race one cache dir
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_mp_worker.py"),
             f"127.0.0.1:{port}", "2", str(rank)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"rank failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # both ranks read identical replicated outputs
    assert outs[0] == outs[1]

    # numpy reference for the same computation
    w = np.arange(16, dtype=np.float32).reshape(4, 4) / 16.0
    x = np.arange(32, dtype=np.float32).reshape(8, 4) / 32.0
    y = x @ w
    loss_ref = float(np.mean(y**2))
    # d/dw mean((xw)^2) = 2/(n_elems) * x^T (xw)
    g_ref = 2.0 / y.size * (x.T @ y)
    np.testing.assert_allclose(outs[0]["loss"], loss_ref, rtol=1e-6)
    np.testing.assert_allclose(outs[0]["gsum"], float(g_ref.sum()), rtol=1e-6)
    np.testing.assert_allclose(outs[0]["psum"], float(x.sum()), rtol=1e-6)


def test_two_process_trainer_matches_single_process():
    """The flagship claim, end-to-end: the SAME yaml config trains on a
    2-process world (4 devices each) purely via the tpu: block —
    coordinator_address joins the world inside trainer.train, samples_per_step
    shards over the global 8-device mesh — and the per-step losses match a
    single-process 8-device run of that config (same seed → same draws;
    psum order differs, so float tolerance)."""
    port = _free_port()
    env = {
        **os.environ,
        "PYTHONPATH": str(REPO),
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_COMPILATION_CACHE_DIR": "",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_mp_worker.py"),
             "trainer", f"127.0.0.1:{port}", "2", str(rank)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"rank failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert outs[0]["losses"] == outs[1]["losses"]  # replicated outputs agree

    # single-process reference on its own virtual 8-device runtime
    ref = subprocess.run(
        [sys.executable, "-c",
         "import json, jax;"
         "from sliders_conceptmod_tpu.core.config import load_config_from_yaml;"
         "from sliders_conceptmod_tpu.core.prompts import load_prompts_from_yaml;"
         "from sliders_conceptmod_tpu.train.trainer import train;"
         "c = load_config_from_yaml('data/config-tiny.yaml');"
         "c.train.iterations = 3; c.tpu.samples_per_step = 8;"
         "c.logging.verbose = False; c.save.path = '/tmp/mp_trainer_ref';"
         "p = load_prompts_from_yaml('data/prompts-tiny.yaml');"
         "r = train(c, p, rank=2, save_file=False);"
         "print(json.dumps([float(l) for l in r.losses]))"],
        env={**env, "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        cwd=str(REPO), capture_output=True, text=True, timeout=600,
    )
    assert ref.returncode == 0, ref.stderr[-3000:]
    ref_losses = json.loads(ref.stdout.strip().splitlines()[-1])
    np.testing.assert_allclose(outs[0]["losses"], ref_losses, rtol=1e-4)
