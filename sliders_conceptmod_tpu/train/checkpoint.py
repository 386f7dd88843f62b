"""Deterministic resume checkpoints (orbax) — a capability the reference
lacks entirely (SURVEY §5: "No optimizer/step resume anywhere"; the
reference only dumps adapter weights, lora.py:274-291).

A resume checkpoint bundles (lora_params, opt_state, step, prng_key) so a
crashed run continues bit-identically. The portable artifact remains the
reference-schema ``.safetensors`` (adapters/lora.py save_weights); this
checkpoint is internal state only.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def save(path: str, lora_params, opt_state, step: int, key) -> None:
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "lora_params": lora_params,
        "opt_state": opt_state,
        "step": np.asarray(step),
        "key": jax.random.key_data(key) if jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key) else key,
    }
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()


def maybe_restore(resume_from, lora_params, opt_state, key):
    """``(lora_params, opt_state, start_step, key)`` — identity (step 0) when
    ``resume_from`` is falsy. The single resume entry point for trainer CLIs."""
    if not resume_from:
        return lora_params, opt_state, 0, key
    return restore(resume_from, lora_params, opt_state, key)


def save_resume(save_dir, name: str, lora_params, opt_state, next_step: int, key) -> None:
    """Write the ``{name}_resume`` checkpoint next to the weight saves."""
    save(os.path.join(str(save_dir), f"{name}_resume"), lora_params, opt_state, next_step, key)


def restore(path: str, lora_params_like, opt_state_like, key_like):
    ckptr = ocp.StandardCheckpointer()
    target = {
        "lora_params": lora_params_like,
        "opt_state": opt_state_like,
        "step": np.asarray(0),
        "key": jax.random.key_data(key_like)
        if jax.dtypes.issubdtype(key_like.dtype, jax.dtypes.prng_key)
        else key_like,
    }
    restored = ckptr.restore(os.path.abspath(path), target)
    key = restored["key"]
    if jax.dtypes.issubdtype(key_like.dtype, jax.dtypes.prng_key):
        key = jax.random.wrap_key_data(key)
    return restored["lora_params"], restored["opt_state"], int(restored["step"]), key
