"""Debug utilities — reference ``conceptmod/textsliders/debug_util.py:1-16``
(check_requires_grad / check_training_mode) re-thought for a functional
runtime: there is no mutable requires_grad/training-mode state in JAX, so the
meaningful checks are which params are in the *trainable* tree, their
dtypes, and their counts. ``flush()`` (reference flush.py:1-5,
torch.cuda.empty_cache) has no TPU meaning — XLA manages an arena — and is
a documented no-op.
"""

from __future__ import annotations

import jax


def check_trainable(lora_params, max_entries: int = 5) -> None:
    """Print the first trainable leaves (name, shape, dtype) — the
    functional analogue of check_requires_grad."""
    flat = jax.tree_util.tree_flatten_with_path(lora_params)[0]
    for keypath, leaf in flat[:max_entries]:
        name = "/".join(k.key if hasattr(k, "key") else str(k) for k in keypath)
        print(f"trainable: {name} {tuple(leaf.shape)} {leaf.dtype}")
    print(f"... {len(flat)} trainable leaves, {sum(l.size for _, l in flat):,} params")


def check_dtypes(params, max_entries: int = 5) -> None:
    """Summarize param dtypes — the analogue of check_training_mode
    (bf16 storage == the reference's model.eval().to(bf16) state)."""
    from collections import Counter

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    counts = Counter(str(l.dtype) for _, l in flat)
    total = sum(l.size for _, l in flat)
    print(f"param dtypes: {dict(counts)}; {total:,} params total")


def flush() -> None:
    """No-op on TPU (reference flush.py empties the CUDA cache; XLA's arena
    allocator needs no manual management)."""
