"""Shared trainer-loop observability: metrics jsonl + steps/sec.

Performance note (measured on v5e, BASELINE.md): converting the loss to a
Python float every step (`float(metrics["loss"])`) blocks the host on the
device stream and collapses JAX's async-dispatch pipelining — the flagship
CLI measured 4.04 steps/s vs bench.py's 5.58 on the identical graph. The
logger therefore BUFFERS the device scalars and flushes them to host in
batches (one `jax.device_get` per `flush_every` steps); per-step host sync
only happens in verbose mode, where the user asked for per-step prints.
The reference has no equivalent (tqdm `loss.item()` per step,
train_lora_xl.py:342); buffering is a deliberate TPU-native deviation.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import List, Optional, Tuple

import jax


def resolution_bucket_picker(dynamic: bool, resolution: int, seed: int):
    """``(buckets, pick)`` for dynamic-resolution training.

    The reference draws a fresh (h, w) from the ±50 %/64px bucket range per
    ITERATION in every textslider trainer (train_util.py:1085-1097, consulted
    at train_lora_xl.py:186-200, train_lora_sd3.py:195-199,
    train_lora_flux.py:241-245, train_lora_cascade.py:181-185) — on XLA each
    distinct shape is a separate executable, so this quantizes the range to
    the fixed ≤4-shape set of diffusion/sampling.dynamic_resolution_buckets
    and the trainer keeps one compiled step per bucket (SURVEY §7.4 design).

    ``pick(i)`` is deterministic in ``(seed, i)`` so a resumed run replays
    the same bucket sequence. ``dynamic=False`` returns the single
    ``(resolution, resolution)`` bucket and ``pick=None``.
    """
    if not dynamic:
        return [(resolution, resolution)], None
    import numpy as np

    from sliders_conceptmod_tpu.diffusion.sampling import dynamic_resolution_buckets

    buckets = dynamic_resolution_buckets(resolution)

    def pick(step_i: int) -> int:
        return int(np.random.default_rng((seed, step_i)).integers(len(buckets)))

    return buckets, pick


class MetricsLogger:
    """Appends one JSON line per step next to the checkpoints; computes
    steps/sec excluding the compile step. Device scalars are buffered and
    transferred in batches so the hot loop never blocks on the host."""

    _KEYS = ("grad_norm", "loss_high", "loss_low", "similarity", "height", "width")

    def __init__(self, save_path, name: str, verbose: bool = False, flush_every: int = 64):
        self.path = Path(save_path)
        self.path.mkdir(parents=True, exist_ok=True)
        # line-buffered + an atexit hook: a crash mid-run (OOM, tunnel drop)
        # must not lose the buffered rows — the jsonl is the post-mortem
        self._f = open(self.path / f"{name}_metrics.jsonl", "a", buffering=1)
        import atexit

        atexit.register(self._flush_safe)
        self.verbose = verbose
        self.flush_every = max(int(flush_every), 1)
        self._t_start: Optional[float] = None
        self._n = 0
        self._pending: List[Tuple[int, dict]] = []
        self._last_loss: Optional[float] = None
        self.losses: List[float] = []

    def log(self, step: int, metrics: dict) -> None:
        if self._t_start is None:
            # first step just finished compiling — wait for it so steps/sec
            # excludes compile time, then start the clock
            jax.block_until_ready(metrics["loss"])
            self._t_start = time.time()
        else:
            self._n += 1
        self._pending.append((step, metrics))
        if self.verbose or len(self._pending) >= self.flush_every:
            self.flush()

    def flush(self) -> None:
        if not self._pending:
            return
        pending, self._pending = self._pending, []
        # one batched transfer for the whole buffer
        host = jax.device_get([m for _, m in pending])
        for (step, _), m in zip(pending, host):
            loss = float(m["loss"])
            self._last_loss = loss
            self.losses.append(loss)
            row = {"step": step, "loss": loss}
            for k in self._KEYS:
                if k in m:
                    row[k] = int(m[k]) if k in ("height", "width") else float(m[k])
            self._f.write(json.dumps(row) + "\n")
            if self.verbose:
                print(f"step {step} loss*1k {loss*1000:.4f}")

    def _flush_safe(self) -> None:
        """atexit hook: best-effort flush (the device may be gone)."""
        try:
            if not self._f.closed:
                self.flush()
        except Exception:
            pass

    def current_loss(self) -> Optional[float]:
        """Latest loss as a float — forces a flush (host sync); use sparingly."""
        self.flush()
        return self._last_loss

    def close(self) -> float:
        import atexit

        atexit.unregister(self._flush_safe)
        self.flush()
        sps = self._n / (time.time() - self._t_start) if self._t_start and self._n else float("nan")
        self._f.write(json.dumps({"steps_per_sec": sps}) + "\n")
        self._f.close()
        return sps
