"""Shared trainer-loop observability: metrics jsonl + steps/sec."""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional


class MetricsLogger:
    """Appends one JSON line per step next to the checkpoints; computes
    steps/sec excluding the compile step."""

    def __init__(self, save_path, name: str, verbose: bool = False):
        self.path = Path(save_path)
        self.path.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path / f"{name}_metrics.jsonl", "a")
        self.verbose = verbose
        self._t_start: Optional[float] = None
        self._n = 0

    def log(self, step: int, metrics: dict) -> float:
        loss = float(metrics["loss"])
        if self._t_start is None:
            self._t_start = time.time()  # first (compile) step just finished
        else:
            self._n += 1
        row = {"step": step, "loss": loss}
        for k in ("grad_norm", "loss_high", "loss_low", "similarity"):
            if k in metrics:
                row[k] = float(metrics[k])
        self._f.write(json.dumps(row) + "\n")
        if self.verbose:
            print(f"step {step} loss*1k {loss*1000:.4f}")
        return loss

    def close(self) -> float:
        sps = self._n / (time.time() - self._t_start) if self._t_start and self._n else float("nan")
        self._f.write(json.dumps({"steps_per_sec": sps}) + "\n")
        self._f.close()
        return sps
