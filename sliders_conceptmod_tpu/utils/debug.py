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


def apply_tpu_runtime_flags(tpu) -> None:
    """Honor the yaml ``tpu:`` runtime knobs that must be set before any
    tracing/compilation happens. Called at the top of every trainer family's
    ``train()`` and by ``serve`` (previously only the SD1/XL trainer honored
    ``debug_nans``).

    - ``compilation_cache_dir``: persistent on-disk XLA executable cache
      (``jax_compilation_cache_dir``). A new HLO through this deployment's
      remote-compile service costs 10-30 min; with the cache, process
      restarts (serving redeploys, trainer relaunches, sweep re-runs) pay it
      once per executable instead of once per process.
    - ``persistent_cache_min_compile_seconds``: only executables that took at
      least this long to compile are written (default 1.0 — jax's own
      default; 0.0 caches everything, useful for tests).
    - ``debug_nans``: ``jax_debug_nans`` (reference debug_util analogue for
      numeric failures).
    """
    if tpu is None:
        return
    cache_dir = getattr(tpu, "compilation_cache_dir", None)
    if not cache_dir:
        ensure_default_compilation_cache()
    if cache_dir:
        import os

        jax.config.update("jax_compilation_cache_dir", os.path.expanduser(cache_dir))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(getattr(tpu, "persistent_cache_min_compile_seconds", 1.0)),
        )
        # jax memoizes its cache handle on FIRST use: if anything compiled
        # before this call (weightless init, an env-var cache dir), the
        # update above is silently ignored for the rest of the process —
        # drop the handle so the configured dir actually takes effect
        from jax.experimental.compilation_cache import compilation_cache as _cc

        _cc.reset_cache()
    if getattr(tpu, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)


def ensure_default_compilation_cache(default_dir: str = "/tmp/sliders_jax_cache") -> None:
    """Turn the persistent executable cache ON by default when nothing
    configured it (env or yaml). Every new HLO costs 10-30 min through this
    deployment's remote-compile service — even the pure-data-movement carve
    programs of the checkpoint loader cost ~60-75 s each at SDXL scale — so
    running processes without the cache silently multiplies every bring-up.
    No-op when ``jax_compilation_cache_dir`` is already set (the yaml
    ``tpu.compilation_cache_dir`` knob and explicit env vars win)."""
    import os

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    if getattr(jax.config, "jax_compilation_cache_dir", None):
        return
    jax.config.update("jax_compilation_cache_dir", default_dir)


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
