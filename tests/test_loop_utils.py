"""MetricsLogger buffering: the hot loop must not sync per step (BASELINE.md:
the per-step float() host sync cost the flagship CLI 4.04 vs 5.94 steps/s)."""

import json

import jax.numpy as jnp

from sliders_conceptmod_tpu.train.loop_utils import MetricsLogger


def _metrics(i):
    return {"loss": jnp.float32(i * 0.5), "grad_norm": jnp.float32(i)}


def test_buffers_until_flush_every(tmp_path):
    lg = MetricsLogger(tmp_path, "t", verbose=False, flush_every=4)
    for i in range(3):
        lg.log(i, _metrics(i))
    # the first log only blocks for timing; all rows stay buffered
    assert lg.losses == [] and len(lg._pending) == 3
    lg.log(3, _metrics(3))  # 4th hits flush_every
    assert lg._pending == []
    assert lg.losses == [0.0, 0.5, 1.0, 1.5]


def test_verbose_flushes_every_step(tmp_path, capsys):
    lg = MetricsLogger(tmp_path, "v", verbose=True, flush_every=64)
    lg.log(0, _metrics(0))
    assert lg._pending == [] and lg.losses == [0.0]
    assert "loss*1k" in capsys.readouterr().out


def test_current_loss_forces_flush(tmp_path):
    lg = MetricsLogger(tmp_path, "c", flush_every=64)
    lg.log(0, _metrics(4))
    assert lg.current_loss() == 2.0
    assert lg._pending == []


def test_close_writes_all_rows_and_sps(tmp_path):
    lg = MetricsLogger(tmp_path, "r", flush_every=64)
    for i in range(5):
        lg.log(i, _metrics(i))
    sps = lg.close()
    rows = [json.loads(l) for l in open(tmp_path / "r_metrics.jsonl")]
    assert [r["step"] for r in rows[:-1]] == list(range(5))
    assert rows[2]["grad_norm"] == 2.0
    assert "steps_per_sec" in rows[-1]
    assert sps == rows[-1]["steps_per_sec"]
