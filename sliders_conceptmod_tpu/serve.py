"""Minimal slider inference server — compiled sampler behind HTTP.

The reference has no serving story (single-GPU scripts only); this closes
the deployment loop for the TPU build: models load once, the two-phase
sampler compiles once, and each request pays only embedding encode + the
cached jitted sampler call. The slider scale rides the jit signature as a
traced per-row LoRA-overlay multiplier (all three families — SDXL, SD3,
Flux), so arbitrary float scales hit the same executable and no merged
param tree is ever materialized.

  python -m sliders_conceptmod_tpu.serve --base tiny-xl --slider s.safetensors --port 8500

  curl -s 'localhost:8500/generate?prompt=a+photo+of+a+person&scale=1.5&seed=7' > out.png
  curl -s localhost:8500/healthz

GET /generate params: prompt (required), scale (default 0), seed (default 0),
guidance (default 7.5), slider (default "default" — pick a registered
adapter). steps/start_noise/image_size are service-level flags (they shape
the compiled sampler, not a per-request knob).

Adapter management at runtime (the published collection grows daily — no
restart, the loaded base and compiled samplers stay warm):

  curl -X POST localhost:8500/sliders -d '{"name": "age", "path": "age.safetensors"}'
  curl -X DELETE localhost:8500/sliders/age
  curl localhost:8500/sliders          # LRU-ordered listing

``--max_sliders N`` bounds the registry with least-recently-used eviction
('default' is pinned).
"""

from __future__ import annotations

import argparse
import functools
import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import jax
import jax.numpy as jnp

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.cli.generate_images_xl import infer_network_settings, settings_from_tensors
from sliders_conceptmod_tpu.diffusion.sampling import get_add_time_ids
from sliders_conceptmod_tpu.infer.generate import (
    flip_step_for_start_noise,
    latents_to_images,
    sample_loop_scales,
)
from sliders_conceptmod_tpu.models import factory


class QueueFullError(Exception):
    """Backpressure: the micro-batcher's bounded queue is full — the caller
    should shed the request (HTTP 429) rather than let latency grow without
    bound. Unbounded admission under overload turns a throughput deficit
    into unbounded queue growth and eventual timeout-for-everyone; a bounded
    queue keeps p99 for ADMITTED requests flat."""


class MicroBatcher:
    """Dynamic request micro-batching: concurrent requests that arrive within
    a short window ride ONE batched sampler call. The v5e is latency-bound at
    batch 1 (BASELINE.md phase table: batch-4 UNet fwd ≈ batch-1 cost), so
    under concurrent load this approaches ``max_batch``× the single-stream
    throughput for free. Single-request latency cost is bounded by
    ``window_ms`` (paid only when a second request doesn't show up).

    ``run_batch(items) -> results`` executes a whole batch; a result item may
    be an ``Exception`` instance, which is raised only for ITS caller (the
    per-group failure containment of ``_run_grouped``). If ``run_batch``
    itself raises, the exception fans out to every waiting caller.

    ``max_queue`` bounds admission: when more than ``max_queue`` requests are
    already waiting, :meth:`submit` raises :class:`QueueFullError` instead of
    enqueueing (the HTTP layer maps it to 429). Latency/error observability
    rides on the instance: ``latencies`` (admit→result seconds, recent),
    ``rejected`` / ``errored`` lifetime counters, ``queue_depth()``."""

    def __init__(self, run_batch, max_batch: int = 4, window_ms: float = 8.0,
                 max_queue: int = 64):
        import collections
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue()
        self._run = run_batch
        self.max_batch = int(max_batch)
        self.max_queue = int(max_queue)
        self.window = float(window_ms) / 1000.0
        # observability: sizes of recent batch runs (bounded — a long-lived
        # server must not grow a list forever) + lifetime totals
        self.batch_sizes: "collections.deque" = collections.deque(maxlen=2048)
        self.latencies: "collections.deque" = collections.deque(maxlen=2048)
        self.total_batches = 0
        self.total_rows = 0
        self.rejected = 0
        self.errored = 0
        # admission check + counters run on concurrent HTTP handler threads:
        # an unlocked qsize-check-then-put admits up to (max_queue + threads)
        # and unlocked ``+=`` read-modify-writes undercount exactly during
        # the overload these metrics exist to measure
        self._stats_lock = threading.Lock()
        threading.Thread(target=self._worker, daemon=True, name="microbatcher").start()

    def queue_depth(self) -> int:
        return self._q.qsize()

    def submit(self, item):
        from concurrent.futures import Future

        fut: "Future" = Future()
        t0 = time.time()
        with self._stats_lock:
            if self._q.qsize() >= self.max_queue:
                self.rejected += 1
                raise QueueFullError(
                    f"micro-batch queue full ({self.max_queue} waiting) — retry later"
                )
            self._q.put((item, fut))
        try:
            res = fut.result()
        except Exception:
            with self._stats_lock:
                self.errored += 1
                self.latencies.append(time.time() - t0)
            raise
        with self._stats_lock:
            self.latencies.append(time.time() - t0)
        return res

    def _worker(self):
        import queue

        while True:
            batch = [self._q.get()]  # block for the first request
            deadline = time.time() + self.window
            while len(batch) < self.max_batch:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            self.batch_sizes.append(len(batch))
            self.total_batches += 1
            self.total_rows += len(batch)
            try:
                results = self._run([item for item, _ in batch])
                for (_, fut), res in zip(batch, results):
                    if isinstance(res, Exception):
                        fut.set_exception(res)
                    else:
                        fut.set_result(res)
            except Exception as e:  # noqa: BLE001 — fan out to all waiters
                for _, fut in batch:
                    fut.set_exception(e)


class _SliderRegistry:
    """Shared multi-adapter registry: ``name → (sites, lora_params, sample_fn)``.

    The collection this serves grows continuously (ntc-ai publishes new
    sliders daily over the same handful of bases), so adapters are managed at
    RUNTIME, not just at startup:

    * :meth:`add_slider` — register or replace (startup ``--add_slider`` and
      ``POST /sliders`` both land here);
    * :meth:`remove_slider` — drop an adapter; dropping the last reference
      lets JAX free its device arrays;
    * :meth:`list_sliders` — names in LRU order (most recently used last);
    * ``max_sliders`` — optional cap. Registering past it evicts the
      least-recently-USED adapter (use = a generate request routed to it).
      ``"default"`` is pinned and never evicted — requests that omit
      ``?slider=`` must keep working. The expensive part (the loaded base) is
      untouched by churn; LoRA factors are ~MBs each.

    Thread-safety: HTTP handler threads register/remove while the
    MicroBatcher worker resolves names — one lock guards the OrderedDict and
    :meth:`_resolve` copies the entry out under it.
    """

    def _te_entry(self, name: str):
        """(te-encode fn, version) for a slider with text-encoder parts,
        else None. Versions keep the per-(slider, prompt, scale) embedding
        cache honest across add/replace."""
        return self._te_encoders.get(name)

    def _register_te_parts(self, name: str, parts) -> None:
        """Bind a slider file's text-encoder parts (adapters/slider_file.py)
        to this service's encoders; requests for ``name`` then encode their
        prompts — INCLUDING the uncond row, the notrigger empty-prompt-drift
        mechanism — through the slider-merged encoder at the request scale."""
        if not getattr(parts, "has_te", False):
            self._te_encoders.pop(name, None)
            return
        self._te_version += 1
        self._te_encoders[name] = (self._make_te_encoder(parts), self._te_version)

    def _make_te_encoder(self, parts):
        """(prompt, scale) → embeddings through the slider-merged text
        encoders. Generic for dual-CLIP services (XL, SD3): the merge happens
        INSIDE one jitted call (params/factors as args, scale a traced
        scalar — one executable for every scale); the service supplies the
        family's encode math via ``_te_encode_core``."""
        te1, te2 = self.text_encoders
        te_parts = tuple(parts.te_parts)
        core = self._te_encode_core

        @jax.jit
        def _enc(p_list, lps, mult, ids1, ids2):
            ps = list(p_list)
            for part, lp in zip(te_parts, lps):
                ps[part.index] = part.peft.merge_lora_params(
                    ps[part.index], part.sites, lp, mult
                )
            return core(ps, ids1, ids2)

        lps = tuple(p.lora_params for p in te_parts)

        def fn(prompt: str, scale: float):
            return _enc(
                (te1.params, te2.params), lps, jnp.float32(scale),
                jnp.asarray(te1.tokenizer([prompt])),
                jnp.asarray(te2.tokenizer([prompt])),
            )

        return fn

    def _encode_te_impl(self, slider: str, version: int, prompt: str, scale: float):
        return self._te_encoders[slider][0](prompt, scale)

    def _encode_impl(self, prompt: str):  # every service family overrides
        raise NotImplementedError("service must implement _encode_impl")

    def _encode_row(self, prompt: str, slider: str, scale: float):
        """Per-row embeddings: te-merged at the row's scale when the row's
        slider carries te parts, else the plain (scale-independent) cache."""
        tep = self._te_entry(slider)
        if tep is None:
            return self._encode(prompt)
        return self._encode_te_cached(slider, tep[1], prompt, float(scale))

    @staticmethod
    def _row_slider(r) -> str:
        return r[4] if len(r) > 4 else "default"

    def _rows_need_te(self, padded) -> bool:
        return any(self._te_entry(self._row_slider(r)) for r in padded)

    def _registry_init(self, max_sliders: int | None = None,
                       cross_slider_stack: bool = True) -> None:
        # sliders with text-encoder parts (adapters/slider_file.py): name →
        # (jitted merge+encode fn, lora trees, version). Version bumps on
        # every (re)register so cached embeddings can't go stale.
        self._te_encoders: dict = {}
        self._te_version = 0
        # Embedding caches are built per INSTANCE: a class-level
        # functools.lru_cache keys on ``self`` and pins every service ever
        # constructed in the process (multi-GB param trees) until its entries
        # churn out of the shared 256 slots.
        self._encode = functools.lru_cache(maxsize=256)(self._encode_impl)
        self._encode_te_cached = functools.lru_cache(maxsize=256)(self._encode_te_impl)
        import collections
        import threading

        self._sliders: "collections.OrderedDict" = collections.OrderedDict()
        self._registry_lock = threading.Lock()
        self.max_sliders = max_sliders
        # False = always per-slider groups (the pre-stacking behavior; kept
        # as the measured A/B control and an escape hatch)
        self._stack_enabled = cross_slider_stack
        # cross-slider batching cache: sorted-names tuple → stacked entry
        # (adapters/lora.stack_adapters). Invalidated wholesale on ANY
        # registry mutation — a stale stack must never outlive a replaced or
        # evicted adapter (the generation counter closes the build-outside-
        # the-lock race) — and LRU-bounded: each entry holds fp32 device
        # copies of its member factors, so combos must not accumulate forever
        # on a long-lived server.
        self._stack_cache: "collections.OrderedDict" = collections.OrderedDict()
        self._stack_cache_max = 16
        self._registry_generation = 0
        self._stack_warned = False
        # jitted stacked samplers, cached per SITE SET (one function object →
        # jax.jit's shape-keyed cache dedups across slider combos)
        self._stacked_fns: dict = {}

    def _register(self, name: str, entry) -> None:
        with self._registry_lock:
            self._sliders[name] = entry
            self._sliders.move_to_end(name)
            if self.max_sliders is not None:
                evictable = [n for n in self._sliders if n not in (name, "default")]
                while len(self._sliders) > self.max_sliders and evictable:
                    evicted = evictable.pop(0)  # LRU order = dict order
                    del self._sliders[evicted]
                    # the te encoder (jitted merge+encode fn + device LoRA
                    # trees) must not outlive its registry entry
                    self._te_encoders.pop(evicted, None)
            self._stack_cache.clear()
            self._registry_generation += 1

    def _resolve(self, name: str):
        with self._registry_lock:
            if name not in self._sliders:
                raise KeyError(
                    f"unknown slider {name!r} (loaded: {sorted(self._sliders)})"
                )
            self._sliders.move_to_end(name)  # touch: protects hot adapters
            return self._sliders[name]

    def remove_slider(self, name: str) -> None:
        if name == "default":
            # 'default' is pinned: requests that omit ?slider= must keep
            # working (same contract the LRU eviction honors)
            raise ValueError("the 'default' slider is pinned and cannot be removed")
        with self._registry_lock:
            if name not in self._sliders:
                raise KeyError(f"unknown slider {name!r}")
            del self._sliders[name]
            self._te_encoders.pop(name, None)
            self._stack_cache.clear()
            self._registry_generation += 1

    def list_sliders(self) -> list:
        with self._registry_lock:
            return [
                {"name": n, "sites": len(entry[0]), "te": n in self._te_encoders}
                for n, entry in self._sliders.items()
            ]

    def _place_adapter(self, tree):
        """Mesh placement for adapter factors: TP-shard when the base is
        TP-sharded (the up factor's output block lives with its base kernel's
        shard; rank dims replicate), replicate on a DP mesh, identity off-mesh."""
        if getattr(self, "_mesh", None) is None:
            return tree
        from sliders_conceptmod_tpu.parallel import mesh as mesh_lib

        place = mesh_lib.tp_shard_tree if self._tp else mesh_lib.replicate_tree
        return place(tree, self._mesh)

    def _mesh_init(self, mesh_data: int, mesh_model: int, params, max_batch: int):
        """Shared DP/TP serving bring-up (every family service):
        ``mesh_data > 1`` shards micro-batched request rows over the data
        axis (rows are independent trajectories; params replicate; padding
        buckets scale to mesh multiples so chips carry equal rows);
        ``mesh_model > 1`` tensor-shards weight output dims
        (parallel/mesh.tp_shard_tree) for params that exceed one chip's HBM.
        They compose into a (data, model) mesh. Returns (placed_params,
        scaled_max_batch) and sets ``self._mesh/_tp/_buckets``."""
        self._mesh = None
        self._tp = mesh_model > 1
        self._buckets = self._BUCKETS
        if mesh_data > 1 or mesh_model > 1:
            from sliders_conceptmod_tpu.parallel import mesh as mesh_lib

            self._mesh = mesh_lib.make_mesh(
                data=mesh_data, model=mesh_model,
                devices=jax.devices()[: mesh_data * mesh_model],
            )
            self._buckets = tuple(b * mesh_data for b in self._BUCKETS)
            place = mesh_lib.tp_shard_tree if self._tp else mesh_lib.replicate_tree
            params = place(params, self._mesh)
            max_batch = max_batch * mesh_data
        return params, max_batch

    @staticmethod
    def _probe_vae(base: str, family: str):
        """Load the VAE when the base directory ships one; None = weightless
        smoke (the preview renderer below)."""
        import os as _os

        if _os.path.isdir(_os.path.join(str(base), "vae")):
            return factory._load_or_init_vae(base, family, jnp.float32)
        return None

    @staticmethod
    def _latents_preview(lat) -> list:
        """Weightless smoke: render the first 3 latent channels normalized."""
        import numpy as np

        imgs = []
        for row in np.asarray(lat, np.float32)[:, :3]:
            a = (row - row.min()) / max(float(row.max() - row.min()), 1e-6)
            imgs.append(np.round(np.transpose(a, (1, 2, 0)) * 255).astype(np.uint8))
        return imgs

    # rows pad to the next bucket so at most len(_BUCKETS) executables compile
    _BUCKETS = (1, 2, 4)

    def _bucket_for(self, n: int) -> int:
        if n <= self._buckets[-1]:
            return next(b for b in self._buckets if b >= n)
        # overflow: round up to a bucket-granule multiple (the granule is
        # mesh_data when sharded) so rows stay chip-divisible
        g = self._buckets[0]
        return -(-n // g) * g

    def _stacked_entry(self, names: tuple):
        """Stacked (cross-slider) entry for a sorted names tuple, or None when
        the adapters can't stack (different module sets — e.g. different
        train_methods). Raises KeyError if a name vanished from the registry
        (caller falls back to per-slider groups, poisoning only its rows).

        The stacked arrays pad the adapter axis to a power-of-two bucket
        (zero adapters are exact no-ops) and the jitted sampler is cached per
        SITE SET, so executables stay bounded: one per (site set, S-bucket,
        rank-max, row-bucket) — shapes, not slider identities.

        The stack is built OUTSIDE the registry lock (device transfers); the
        generation counter snapshot makes the later insert safe — if any
        registry mutation landed meanwhile, this (already-stale) stack is
        served once but never cached."""
        from sliders_conceptmod_tpu.adapters import lora as lora_lib

        _missing = object()
        with self._registry_lock:
            cached = self._stack_cache.get(names, _missing)
            if cached is not _missing:
                self._stack_cache.move_to_end(names)
                for n in names:  # a stacked use touches every member's LRU slot
                    if n in self._sliders:
                        self._sliders.move_to_end(n)
                return cached
            generation = self._registry_generation
            entries = []
            for n in names:
                if n not in self._sliders:
                    raise KeyError(f"unknown slider {n!r}")
                self._sliders.move_to_end(n)  # a stacked use touches the LRU
                entries.append(self._sliders[n])
        ref_sites = entries[0][0]
        if any(
            not lora_lib.sites_stack_compatible(ref_sites, e[0]) for e in entries[1:]
        ):
            value = None
        else:
            s_bucket = 1 << (len(names) - 1).bit_length()  # next power of two
            ref_sites, stacked = lora_lib.stack_adapters(
                [(e[0], e[1]) for e in entries], pad_to=s_bucket
            )
            stacked = self._place_adapter(stacked)
            sample_fn = self._stacked_sampler(ref_sites)
            value = (ref_sites, stacked, sample_fn, {n: i for i, n in enumerate(names)})
        with self._registry_lock:
            if self._registry_generation == generation:
                self._stack_cache[names] = value
                self._stack_cache.move_to_end(names)
                while len(self._stack_cache) > self._stack_cache_max:
                    self._stack_cache.popitem(last=False)
        return value

    def _run_grouped(self, reqs, run_group) -> list:
        """Shared micro-batch protocol for every family service: group requests by
        guidance (a traced per-batch scalar in the CFG combine), pad each
        group to a bucket size, run
        ``run_group(padded_reqs, guidance, entry, adapter_idx) -> images``,
        PNG-encode, and route results back by request index.

        Rows for DIFFERENT sliders ride ONE call when the adapters stack
        (S-LoRA-style heterogeneous batching: stacked rank-r factors +
        per-row adapter_idx, adapters/lora.stack_adapters) — the latency-
        bound chip sees one batched trajectory instead of one per slider.
        Incompatible adapters (different site sets) fall back to per-slider
        groups. Numerics: a stacked row reproduces its solo-request image up
        to executable-level float jitter (a few uint8 LSB — bounded in
        tests/test_stacked_adapters.py), not bitwise; bit-exact replay of a
        request is guaranteed only against the same batch shape and routing. A failing group (e.g. its slider was deleted between
        fail-fast and worker run) poisons ONLY its own requests: the
        exception is returned as those rows' result values (MicroBatcher
        raises it for exactly those callers)."""
        from PIL import Image

        out: dict = {}
        by_g: dict = {}
        # with a STATIC (compiled-in) guidance, per-request guidance values
        # are ignored by the sampler — don't let them split the micro-batch
        static_g = getattr(self, "_static_guidance", None)
        for i, r in enumerate(reqs):
            slider_name = r[4] if len(r) > 4 else "default"
            gkey = static_g if static_g is not None else r[3]
            by_g.setdefault(gkey, []).append((i, r, slider_name))
        for guidance, rows in by_g.items():
            names = tuple(sorted({s for _, _, s in rows}))
            groups = []  # (rows, entry-or-name, idx_list | None)
            stacked = None
            if len(names) > 1 and getattr(self, "_stack_enabled", True):
                try:
                    stacked = self._stacked_entry(names)
                except KeyError:  # vanished name: per-slider groups poison
                    stacked = None  # exactly the affected rows below
                except Exception as e:  # noqa: BLE001 — a real stacking bug:
                    # fall back so traffic survives, but say so ONCE — silent
                    # degradation would make every A/B measure the control arm
                    stacked = None
                    if not self._stack_warned:
                        self._stack_warned = True
                        print(f"[serve] cross-slider stacking failed ({e!r}) — "
                              "falling back to per-slider batches")
            if stacked is not None:
                _, slp, fn, name_to_idx = stacked
                groups.append(
                    (rows, (None, slp, fn), [name_to_idx[s] for _, _, s in rows])
                )
            else:
                by_s: dict = {}
                for row in rows:
                    by_s.setdefault(row[2], []).append(row)
                for sname, srows in by_s.items():
                    groups.append((srows, sname, None))
            for srows, entry_or_name, idx in groups:
                try:
                    entry = (
                        entry_or_name
                        if idx is not None
                        else self._resolve(entry_or_name)
                    )
                    n = len(srows)
                    bucket = self._bucket_for(n)
                    padded = [r for _, r, _ in srows] + [srows[-1][1]] * (bucket - n)
                    if idx is not None:
                        idx = idx + [idx[-1]] * (bucket - n)
                    imgs = run_group(padded, guidance, entry, adapter_idx=idx)
                    for (i, _, _), img in zip(srows, imgs[:n]):
                        buf = io.BytesIO()
                        Image.fromarray(img).save(buf, format="PNG")
                        out[i] = buf.getvalue()
                except Exception as e:  # noqa: BLE001 — contain to this group
                    for i, _, _ in srows:
                        out[i] = e
        return [out[i] for i in range(len(reqs))]

    def _generate_batch(self, reqs) -> list:
        return self._run_grouped(reqs, self._sample_group)

    def generate(self, prompt: str, scale: float, seed: int, guidance: float,
                 slider: str = "default") -> bytes:
        self._resolve(slider)  # fail fast on unknown names (raises KeyError)
        req = (prompt, float(scale), int(seed), float(guidance), slider)
        if self._batcher is not None:
            return self._batcher.submit(req)
        res = self._generate_batch([req])[0]
        if isinstance(res, Exception):
            raise res
        return res

    # single-slider conveniences (the "default" registration)
    @property
    def sites(self):
        return self._sliders["default"][0]

    @property
    def lora_params(self):
        return self._sliders["default"][1]

    @property
    def _sample(self):
        return self._sliders["default"][2]


class SliderService(_SliderRegistry):
    """SDXL slider serving: two-phase DDIM sampler with the slider applied
    through the apply-time LoRA overlay — the scale rides the jit signature
    as a (1,)-row multiplier, so EVERY float scale hits one executable and no
    merged tree (5.1 GB at SDXL scale) is ever materialized. The pre-flip
    structure-preservation phase (reference generate_images_xl.py:324-328) is
    a traced gate inside the sampler. ``quantize_base``/``w8a8``: int8 frozen
    UNet Dense kernels / + per-token int8 activations (adapters/quant.py).
    ``microbatch``: concurrent requests ride one batched sampler call
    (:class:`MicroBatcher`; rows are padded to {1,2,4}-size buckets so at
    most three executables ever compile)."""

    def __init__(self, base: str, slider_path: str, image_size: int = 512, steps: int = 25,
                 start_noise: float = 750, quantize_base: bool = False, w8a8: bool = False,
                 microbatch: bool = True, batch_window_ms: float = 8.0, max_batch: int = 4,
                 mesh_data: int = 1, mesh_model: int = 1, max_sliders: int | None = None,
                 max_queue: int = 64,
                 cross_slider_stack: bool = True, static_guidance: float | None = None):
        self.image_size = image_size
        self.steps = steps
        # turbo-style serving (reference demo_SDXL_Turbo.ipynb: 4 steps,
        # guidance <= 1): a STATIC guidance compiles the sampler with the
        # Python float — <= 1 takes sample_loop_scales' cond-only fast path
        # (half the UNet rows per step); per-request ?guidance= is then
        # ignored. None (default) keeps guidance traced and per-request.
        self._static_guidance = static_guidance
        t0 = time.time()
        (self.tokenizers, self.text_encoders, self.unet, self.scheduler, self.vae) = factory.load_models_xl(
            base, scheduler_name="ddim", weight_dtype=jnp.bfloat16, with_vae=True,
            quantize_base=quantize_base or w8a8,
        )
        self.unet.act_quant = bool(w8a8)
        self.schedule = self.scheduler.set_timesteps(steps)
        self.flip = flip_step_for_start_noise(self.schedule, start_noise)
        self._unet_apply = self.unet.apply_fn()

        # DP/TP serving bring-up — shared helper (_SliderRegistry._mesh_init)
        self.unet.params, max_batch = self._mesh_init(
            mesh_data, mesh_model, self.unet.params, max_batch
        )

        # multi-slider registry: the ecosystem this serves (ntc-ai publishes
        # thousands of sliders over ONE base) wants many adapters per loaded
        # base. Each slider gets its own jitted sampler closure (the site
        # list is trace-static); identically-structured sliders (same rank +
        # key set — the common case for a published collection) dedup in
        # XLA's compile cache, and the big cost — the 5.1 GB base — is loaded
        # exactly once. LoRA factors are ~MBs per slider.
        self._registry_init(max_sliders, cross_slider_stack)
        self.add_slider("default", slider_path)

        # eager per-op dispatch made every NEW prompt cost ~9s on TPU;
        # jitted (params as args) it's one executable reused per prompt
        core = self._te_encode_core
        self._encode_jit = jax.jit(lambda p1, p2, ids1, ids2: core((p1, p2), ids1, ids2))
        self._batcher = (
            MicroBatcher(self._generate_batch, max_batch=max_batch, window_ms=batch_window_ms,
                         max_queue=max_queue)
            if microbatch
            else None
        )
        self.load_seconds = time.time() - t0

    def add_slider(self, name: str, slider_path: str) -> None:
        """Register a slider checkpoint under ``name`` (requests select it
        with ``?slider=name``). Accepts raw unet sliders, raw notrigger
        text-encoder saves, and combine_loras outputs — te parts merge into
        the CLIP towers per request at the request's scale
        (adapters/slider_file.py)."""
        from sliders_conceptmod_tpu.adapters import slider_file as sfile

        parts = sfile.load_slider_file(
            slider_path, [te.params for te in self.text_encoders]
        )
        sites, lora_params = [], {}
        if parts.unet is not None:
            train_method, network_type, rank, alpha = infer_network_settings(slider_path)
            exact = settings_from_tensors(parts.unet)
            if exact is not None:
                rank, alpha = exact
            targets = lora_lib.UNET_TARGET_REPLACE_MODULE_TRANSFORMER + (
                lora_lib.UNET_TARGET_REPLACE_MODULE_CONV if network_type == "c3lier" else []
            )
            all_sites = lora_lib.create_sites(
                self.unet.params, rank=rank, alpha=alpha, target_replace=targets,
                train_method=train_method,
            )
            sites = lora_lib.filter_sites_to_keys(parts.unet.keys(), all_sites)
            if not sites:
                raise ValueError(f"No matching LoRA keys between UNet and {slider_path}")
            lora_params = self._place_adapter(
                lora_lib.load_weights_from_tensors(parts.unet, sites)
            )
        elif not parts.has_te:
            raise ValueError(
                f"{slider_path} carries neither unet nor text-encoder slider parts"
            )
        unet_apply = self._unet_apply
        scheduler, schedule, flip = self.scheduler, self.schedule, self.flip
        static_g = self._static_guidance

        @jax.jit
        def _sample(params_base, lp, scale_vec, latents, text_emb, added, key, guidance):
            # base params through the SIGNATURE: closure capture baked the
            # 5.13GB frozen UNet into the executable as constants (repo
            # convention — see CLAUDE.md). The slider scale is a traced row
            # multiplier — overlay ≡ merge up to bf16 rounding
            # (tests/test_lora_overlay.py), so any float scale reuses this
            # one executable with no merged-tree materialization.
            g = guidance if static_g is None else static_g
            return sample_loop_scales(
                unet_apply, params_base, sites, lp, scale_vec, flip, scheduler, schedule,
                latents, text_emb, key, guidance_scale=g, added_cond_kwargs=added,
            )

        self._register(name, (sites, lora_params, _sample))
        self._register_te_parts(name, parts)

    def _stacked_sampler(self, sites):
        """One jitted heterogeneous-adapter sampler per SITE SET (cross-slider
        batching, :meth:`_SliderRegistry._stacked_entry`) — same sampler as
        :meth:`add_slider`'s but the overlay routes each row through its own
        stacked adapter via ``adapter_idx``."""
        cache_key = tuple(s.lora_name for s in sites)
        fn = self._stacked_fns.get(cache_key)
        if fn is not None:
            return fn
        unet_apply = self._unet_apply
        scheduler, schedule, flip = self.scheduler, self.schedule, self.flip
        sites = tuple(sites)
        static_g = self._static_guidance

        @jax.jit
        def _sample(params_base, lp, scale_vec, adapter_idx, latents, text_emb,
                    added, key, guidance):
            g = guidance if static_g is None else static_g
            return sample_loop_scales(
                unet_apply, params_base, sites, lp, scale_vec, flip, scheduler, schedule,
                latents, text_emb, key, guidance_scale=g, added_cond_kwargs=added,
                adapter_idx=adapter_idx,
            )

        self._stacked_fns[cache_key] = _sample
        return _sample

    def _te_encode_core(self, ps, ids1, ids2):
        """SDXL prompt-encode math (factory.encode_prompts_xl): concat
        penultimate hidden states; pooled = te2's projected pool."""
        from sliders_conceptmod_tpu.models.clip import penultimate_hidden_state

        te1_model, te2_model = (te.model for te in self.text_encoders)
        o1 = te1_model.apply({"params": ps[0]}, ids1)
        o2 = te2_model.apply({"params": ps[1]}, ids2)
        text = jnp.concatenate(
            [penultimate_hidden_state(o1), penultimate_hidden_state(o2)], axis=-1
        )
        pooled = o2.projected if o2.projected is not None else o2.pooled_output
        return text, pooled

    def _encode_impl(self, prompt: str):
        te1, te2 = self.text_encoders
        text, pooled = self._encode_jit(
            te1.params,
            te2.params,
            jnp.asarray(te1.tokenizer([prompt])),
            jnp.asarray(te2.tokenizer([prompt])),
        )
        return text, pooled

    def _sample_group(self, padded, guidance, entry, adapter_idx=None) -> list:
        """One same-guidance padded group through one sampler call — per-row
        ``adapter_idx`` routes heterogeneous-slider rows through the stacked
        adapters (the shared protocol lives in
        :meth:`_SliderRegistry._run_grouped`)."""
        _, lora_params, sample_fn = entry
        bucket = len(padded)

        if self._rows_need_te(padded):
            # per-row te-merged embeddings: uncond AND cond go through the
            # row's slider-merged encoder at the row's scale
            unconds = [self._encode_row("", self._row_slider(r), r[1]) for r in padded]
            conds = [self._encode_row(r[0], self._row_slider(r), r[1]) for r in padded]
            emb = jnp.concatenate([t for t, _ in unconds] + [t for t, _ in conds], axis=0)
            pooled_rows = [p for _, p in unconds] + [p for _, p in conds]
        else:
            text_u, pooled_u = self._encode("")
            conds = [self._encode(p) for p, *_ in padded]
            emb = jnp.concatenate(
                [jnp.tile(text_u, (bucket, 1, 1))] + [t for t, _ in conds], axis=0
            )
            pooled_rows = [jnp.tile(pooled_u, (bucket, 1))] + [p for _, p in conds]
        added = {
            "text_embeds": jnp.concatenate(pooled_rows, axis=0),
            "time_ids": jnp.tile(
                jnp.asarray(get_add_time_ids(self.image_size, self.image_size)),
                (2 * bucket, 1),
            ),
        }
        res = self.image_size // 8
        latents = jnp.concatenate(
            [
                jax.random.normal(jax.random.PRNGKey(r[2]), (1, 4, res, res), jnp.float32)
                for r in padded
            ],
            axis=0,
        ) * self.schedule.init_noise_sigma
        scales = jnp.asarray([r[1] for r in padded], jnp.float32)
        # one stacked key PER ROW from each request's own seed: a row's
        # stochastic-scheduler noise (euler_a/ddpm) must depend only on its
        # (prompt, scale, seed), never on which concurrent requests it got
        # batched with or its row position — the seed-reproducibility
        # contract (schedulers._draw_step_noise)
        row_keys = jnp.stack([jax.random.PRNGKey(r[2]) for r in padded])
        idx_arr = None if adapter_idx is None else jnp.asarray(adapter_idx, jnp.int32)
        if self._mesh is not None:
            from sliders_conceptmod_tpu.parallel import mesh as mesh_lib

            shard = mesh_lib.data_sharded(self._mesh)
            latents = jax.device_put(latents, shard)
            emb = jax.device_put(emb, shard)
            added = {k: jax.device_put(v, shard) for k, v in added.items()}
            scales = jax.device_put(scales, shard)
            row_keys = jax.device_put(row_keys, shard)
            if idx_arr is not None:
                idx_arr = jax.device_put(idx_arr, shard)
        if idx_arr is None:
            final = sample_fn(
                self.unet.params, lora_params, scales,
                latents.astype(jnp.bfloat16), emb, added,
                row_keys, guidance,
            )
        else:
            final = sample_fn(
                self.unet.params, lora_params, scales, idx_arr,
                latents.astype(jnp.bfloat16), emb, added,
                row_keys, guidance,
            )
        return latents_to_images(self.vae.decode, final, self.vae.config.scaling_factor)


class SD1SliderService(SliderService):
    """SD1.x/2.x slider serving: single CLIP tower, no added conditioning.

    Parity target: the reference's SD1 sampler is the raw LMS loop in
    ``eval-scripts/generate_images_sd1.py:43-215``; serving reuses the shared
    DDIM ``sample_loop_scales`` trajectory (overlay ≡ merge,
    tests/test_lora_overlay.py) like every other family — deliberate
    deviation: one sampler surface across families, scheduler selectable at
    construction. Inherits the registry/micro-batch/stacking machinery and
    ``add_slider``/``_stacked_sampler`` unchanged from :class:`SliderService`
    (the jitted samplers are family-generic; SD1 rows just carry
    ``added=None``)."""

    def __init__(self, base: str, slider_path: str, image_size: int = 512, steps: int = 50,
                 start_noise: float = 750, quantize_base: bool = False, w8a8: bool = False,
                 microbatch: bool = True, batch_window_ms: float = 8.0, max_batch: int = 4,
                 mesh_data: int = 1, mesh_model: int = 1, max_sliders: int | None = None,
                 max_queue: int = 64, cross_slider_stack: bool = True,
                 static_guidance: float | None = None, v2: bool = False, v_pred: bool = False):
        self.image_size = image_size
        self.steps = steps
        self._static_guidance = static_guidance
        t0 = time.time()
        tok, te, self.vae, self.unet, self.scheduler = factory.load_models(
            base, scheduler_name="ddim", v2=v2, v_pred=v_pred,
            weight_dtype=jnp.bfloat16, with_vae=True,
            quantize_base=quantize_base or w8a8,
        )
        self.tokenizers = [tok]
        self.text_encoders = [te]
        self.unet.act_quant = bool(w8a8)
        self.schedule = self.scheduler.set_timesteps(steps)
        self.flip = flip_step_for_start_noise(self.schedule, start_noise)
        self._unet_apply = self.unet.apply_fn()

        self.unet.params, max_batch = self._mesh_init(
            mesh_data, mesh_model, self.unet.params, max_batch
        )
        self._registry_init(max_sliders, cross_slider_stack)
        self.add_slider("default", slider_path)

        core = self._te_encode_core
        self._encode_jit = jax.jit(lambda p, ids: core([p], ids))
        self._batcher = (
            MicroBatcher(self._generate_batch, max_batch=max_batch, window_ms=batch_window_ms,
                         max_queue=max_queue)
            if microbatch
            else None
        )
        self.load_seconds = time.time() - t0

    def _te_encode_core(self, ps, ids):
        """SD1/2 prompt encode (factory.encode_prompts): final hidden state."""
        from sliders_conceptmod_tpu.models.clip import clip_skip_hidden_state

        (te_model,) = (te.model for te in self.text_encoders)
        return clip_skip_hidden_state(te_model.apply({"params": ps[0]}, ids), None)

    def _make_te_encoder(self, parts):
        """Single-tower variant of the dual-CLIP merge+encode closure."""
        (te,) = self.text_encoders
        te_parts = tuple(parts.te_parts)
        core = self._te_encode_core

        @jax.jit
        def _enc(p, lps, mult, ids):
            ps = [p]
            for part, lp in zip(te_parts, lps):
                ps[part.index] = part.peft.merge_lora_params(
                    ps[part.index], part.sites, lp, mult
                )
            return core(ps, ids)

        lps = tuple(p.lora_params for p in te_parts)

        def fn(prompt: str, scale: float):
            return _enc(te.params, lps, jnp.float32(scale),
                        jnp.asarray(te.tokenizer([prompt])))

        return fn

    def _encode_impl(self, prompt: str):
        (te,) = self.text_encoders
        return self._encode_jit(te.params, jnp.asarray(te.tokenizer([prompt])))

    def _sample_group(self, padded, guidance, entry, adapter_idx=None) -> list:
        """Same protocol as the XL group runner minus the added conditioning
        (SD1 UNets take no text_embeds/time_ids)."""
        _, lora_params, sample_fn = entry
        bucket = len(padded)

        if self._rows_need_te(padded):
            unconds = [self._encode_row("", self._row_slider(r), r[1]) for r in padded]
            conds = [self._encode_row(r[0], self._row_slider(r), r[1]) for r in padded]
            emb = jnp.concatenate(unconds + conds, axis=0)
        else:
            text_u = self._encode("")
            conds = [self._encode(p) for p, *_ in padded]
            emb = jnp.concatenate([jnp.tile(text_u, (bucket, 1, 1))] + conds, axis=0)
        res = self.image_size // 8
        latents = jnp.concatenate(
            [
                jax.random.normal(jax.random.PRNGKey(r[2]), (1, 4, res, res), jnp.float32)
                for r in padded
            ],
            axis=0,
        ) * self.schedule.init_noise_sigma
        scales = jnp.asarray([r[1] for r in padded], jnp.float32)
        row_keys = jnp.stack([jax.random.PRNGKey(r[2]) for r in padded])
        idx_arr = None if adapter_idx is None else jnp.asarray(adapter_idx, jnp.int32)
        if self._mesh is not None:
            from sliders_conceptmod_tpu.parallel import mesh as mesh_lib

            shard = mesh_lib.data_sharded(self._mesh)
            latents = jax.device_put(latents, shard)
            emb = jax.device_put(emb, shard)
            scales = jax.device_put(scales, shard)
            row_keys = jax.device_put(row_keys, shard)
            if idx_arr is not None:
                idx_arr = jax.device_put(idx_arr, shard)
        if idx_arr is None:
            final = sample_fn(
                self.unet.params, lora_params, scales,
                latents.astype(jnp.bfloat16), emb, None, row_keys, guidance,
            )
        else:
            final = sample_fn(
                self.unet.params, lora_params, scales, idx_arr,
                latents.astype(jnp.bfloat16), emb, None, row_keys, guidance,
            )
        return latents_to_images(self.vae.decode, final, self.vae.config.scaling_factor)


class FluxSliderService(_SliderRegistry):
    """Flux slider serving (schnell/dev): few-step flow sampler with the
    slider applied through the apply-time LoRA overlay — the scale rides the
    jit signature as a per-row multiplier, so EVERY float scale hits one
    executable and no merged tree is ever materialized (no LRU needed).
    ``quantize_base=True`` serves full-depth schnell from one 16 GB v5e
    (int8 frozen base, adapters/quant.py)."""

    def __init__(self, base: str, slider_path: str, image_size: int = 512, steps: int = 8,
                 start_noise: float = 800, quantize_base: bool = False, w8a8: bool = False,
                 microbatch: bool = True, batch_window_ms: float = 8.0, max_batch: int = 4,
                 mesh_data: int = 1, mesh_model: int = 1, max_sliders: int | None = None,
                 max_queue: int = 64,
                 cross_slider_stack: bool = True):
        from sliders_conceptmod_tpu.diffusion.flow_match import FlowMatchScheduler, calculate_shift
        from sliders_conceptmod_tpu.models.flux import pack_latents, prepare_latent_image_ids, unpack_latents

        self.image_size = image_size
        self.steps = steps
        t0 = time.time()
        # w8a8: per-token dynamic int8 activations — base matmuls run
        # int8×int8 on the MXU at 2× the bf16 rate (implies quantize_base)
        _, self._encode_raw, self.transformer, scheduler = factory.load_models_flux(
            base, weight_dtype=jnp.bfloat16, quantize_base=quantize_base or w8a8
        )
        self.transformer.act_quant = bool(w8a8)
        # DP/TP serving bring-up (shared _mesh_init). mesh_model=2 bf16 is the
        # full-depth schnell route WITHOUT int8 (23.8 GB params / 2 chips,
        # BASELINE.md HBM table); --quantize_base remains the single-chip route.
        self.transformer.params, max_batch = self._mesh_init(
            mesh_data, mesh_model, self.transformer.params, max_batch
        )
        cfg = self.transformer.config
        is_tiny = "tiny" in str(base).lower()
        self.vae_scale = 2 if is_tiny else 8
        self.latent_channels = cfg.in_channels // 4
        self.gh = self.gw = image_size // self.vae_scale // 2
        self._pack, self._unpack = pack_latents, unpack_latents

        self.schedule = scheduler.set_timesteps(steps, mu=calculate_shift(self.gh * self.gw))
        from sliders_conceptmod_tpu.infer.generate_flow import flip_step_for_start_noise as _flow_flip

        self.flip = _flow_flip(self.schedule, start_noise)
        self._image_ids = jnp.asarray(prepare_latent_image_ids(self.gh, self.gw))
        # multi-slider registry (same design as SliderService.add_slider):
        # one loaded base, many LoRA adapters routed per request by name
        self._registry_init(max_sliders, cross_slider_stack)
        self.add_slider("default", slider_path)
        self.vae = self._probe_vae(base, "flux")
        self._batcher = (
            MicroBatcher(self._generate_batch, max_batch=max_batch, window_ms=batch_window_ms,
                         max_queue=max_queue)
            if microbatch
            else None
        )
        self.load_seconds = time.time() - t0

    def add_slider(self, name: str, slider_path: str) -> None:
        """Register a '-'-delimited Flux slider checkpoint under ``name``.
        Combined files / raw notrigger te saves (te1=CLIP, te2=T5) are
        accepted when the base was loaded from a real checkpoint (the
        weightless stub has no encoder params to merge into)."""
        from sliders_conceptmod_tpu.adapters import slider_file as sfile
        from sliders_conceptmod_tpu.infer.generate_flow import make_packed_overlay_sampler

        parts = sfile.load_slider_file(
            slider_path,
            getattr(self._encode_raw, "text_encoder_params", None),
            te2_is_t5=True,
        )
        sites, lora_params = [], {}
        if parts.unet is not None:
            rank, alpha = 4, 1.0
            exact = settings_from_tensors(parts.unet)
            if exact is not None:
                rank, alpha = exact
            all_sites = lora_lib.create_sites(
                self.transformer.params, rank=rank, alpha=alpha, target_replace=["Attention"],
                train_method="full", delimiter="-",
            )
            sites = lora_lib.filter_sites_to_keys(parts.unet.keys(), all_sites)
            if not sites:
                raise ValueError(
                    f"No matching LoRA keys between transformer and {slider_path} "
                    "(is this a '-'-delimited Flux slider checkpoint?)"
                )
            lora_params = self._place_adapter(
                lora_lib.load_weights_from_tensors(parts.unet, sites)
            )
        elif not parts.has_te:
            raise ValueError(
                f"{slider_path} carries neither transformer nor text-encoder slider parts"
            )
        sample_fn = make_packed_overlay_sampler(
            self.transformer.apply_fn(), sites, self.schedule, self.flip,
            self._image_ids, self.transformer.config.guidance_embeds,
        )
        self._register(name, (sites, lora_params, sample_fn))
        self._register_te_parts(name, parts)

    def _make_te_encoder(self, parts):
        """Flux override: (te1=CLIP pooled, te2=T5 sequence — reference
        notrigger FLUX.1 prefixes, train_notrigger.py:184-196). Same design
        as the generic dual-CLIP path: the factor merge happens INSIDE one
        jitted call with the scale a traced scalar — one executable for every
        (prompt, scale), never an eager T5-XXL forward on the serving hot
        path."""
        enc = self._encode_raw
        base = tuple(enc.text_encoder_params)
        te_parts = tuple(parts.te_parts)
        core = enc.encode_core

        @jax.jit
        def _enc(ps, lps, mult, clip_ids, t5_ids):
            ps = list(ps)
            for part, lp in zip(te_parts, lps):
                ps[part.index] = part.peft.merge_lora_params(
                    ps[part.index], part.sites, lp, mult
                )
            return core(ps, clip_ids, t5_ids)

        lps = tuple(p.lora_params for p in te_parts)

        def fn(prompt: str, scale: float):
            clip_ids, t5_ids = enc.tokenize(prompt)
            text, pooled = _enc(base, lps, jnp.float32(scale), clip_ids, t5_ids)
            return text[None], pooled[None]

        return fn

    def _stacked_sampler(self, sites):
        """One jitted heterogeneous-adapter packed sampler per SITE SET
        (cross-slider batching, :meth:`_SliderRegistry._stacked_entry`)."""
        from sliders_conceptmod_tpu.infer.generate_flow import make_packed_overlay_sampler

        cache_key = tuple(s.lora_name for s in sites)
        fn = self._stacked_fns.get(cache_key)
        if fn is None:
            fn = make_packed_overlay_sampler(
                self.transformer.apply_fn(), tuple(sites), self.schedule, self.flip,
                self._image_ids, self.transformer.config.guidance_embeds, indexed=True,
            )
            self._stacked_fns[cache_key] = fn
        return fn

    def _encode_impl(self, prompt: str):
        text, pooled = self._encode_raw(prompt)
        return text[None], pooled[None]

    def _sample_group(self, padded, guidance, entry, adapter_idx=None) -> list:
        """One same-guidance padded group through one packed flow sampler
        call (flow-match Euler is deterministic — no per-row noise keys
        needed); per-row ``adapter_idx`` routes heterogeneous-slider rows
        through the stacked adapters (the shared grouping/bucketing/routing
        protocol lives in :meth:`_SliderRegistry._run_grouped`)."""
        import numpy as np

        _, lora_params, sample_fn = entry
        if self._rows_need_te(padded):
            conds = [self._encode_row(r[0], self._row_slider(r), r[1]) for r in padded]
        else:
            conds = [self._encode(p) for p, *_ in padded]
        text = jnp.concatenate([t for t, _ in conds], axis=0)
        pooled = jnp.concatenate([p for _, p in conds], axis=0)
        latents = jnp.concatenate(
            [
                jax.random.normal(
                    jax.random.PRNGKey(r[2]),
                    (1, self.latent_channels, self.gh * 2, self.gw * 2), jnp.float32,
                )
                for r in padded
            ],
            axis=0,
        )
        tokens = self._pack(latents).astype(jnp.bfloat16)
        scales = jnp.asarray([r[1] for r in padded], jnp.float32)
        idx_arr = None if adapter_idx is None else jnp.asarray(adapter_idx, jnp.int32)
        if self._mesh is not None:
            from sliders_conceptmod_tpu.parallel import mesh as mesh_lib

            shard = mesh_lib.data_sharded(self._mesh)
            tokens = jax.device_put(tokens, shard)
            text = jax.device_put(text, shard)
            pooled = jax.device_put(pooled, shard)
            scales = jax.device_put(scales, shard)
            if idx_arr is not None:
                idx_arr = jax.device_put(idx_arr, shard)
        if idx_arr is None:
            final = sample_fn(
                self.transformer.params, lora_params, scales, tokens, text, pooled,
                jnp.float32(guidance),
            )
        else:
            final = sample_fn(
                self.transformer.params, lora_params, scales, idx_arr, tokens, text,
                pooled, jnp.float32(guidance),
            )
        lat = self._unpack(final, self.gh * 2, self.gw * 2)
        if self.vae is not None:
            from sliders_conceptmod_tpu.infer.generate_flow import sd3_latents_to_images

            return sd3_latents_to_images(
                self.vae.decode, lat, self.vae.config.scaling_factor,
                self.vae.config.shift_factor,
            )
        return self._latents_preview(lat)


class SD3SliderService(_SliderRegistry):
    """SD3 (MMDiT) slider serving: CFG flow-Euler sampler with the slider
    applied through the apply-time LoRA overlay — the scale rides the jit
    signature as a per-row multiplier (CFG-doubled inside the sampler), so
    every float scale hits one executable and no merged tree (4.1 GB at
    SD3-Medium scale) is ever materialized. Same registry surface as the
    XL/Flux services: micro-batching, runtime adapter management,
    cross-slider stacking, DP/TP meshes, ``quantize_base``/``w8a8``."""

    def __init__(self, base: str, slider_path: str, image_size: int = 512, steps: int = 28,
                 start_noise: float = 750, quantize_base: bool = False, w8a8: bool = False,
                 microbatch: bool = True, batch_window_ms: float = 8.0, max_batch: int = 4,
                 mesh_data: int = 1, mesh_model: int = 1, max_sliders: int | None = None,
                 max_queue: int = 64,
                 cross_slider_stack: bool = True, static_guidance: float | None = None):
        from sliders_conceptmod_tpu.infer.generate_flow import flip_step_for_start_noise as _flow_flip

        self.image_size = image_size
        self.steps = steps
        # static guidance compiles in (per-request ?guidance= ignored); <= 1
        # takes sample_flow_loop's static cond-only path — half the MMDiT
        # rows per step (few-step distilled serving)
        self._static_guidance = static_guidance
        t0 = time.time()
        self.tokenizers, self.text_encoders, self.transformer, scheduler = factory.load_models_sd3(
            base, weight_dtype=jnp.bfloat16, quantize_base=quantize_base or w8a8
        )
        self.transformer.act_quant = bool(w8a8)
        # DP/TP serving bring-up — shared helper (_SliderRegistry._mesh_init)
        self.transformer.params, max_batch = self._mesh_init(
            mesh_data, mesh_model, self.transformer.params, max_batch
        )
        self.latent_res = image_size // 8
        self._t5_seq_len = 4 if "tiny" in str(base).lower() else 256
        self.schedule = scheduler.set_timesteps(steps)
        self.flip = _flow_flip(self.schedule, start_noise)
        self._registry_init(max_sliders, cross_slider_stack)
        self.add_slider("default", slider_path)
        self.vae = self._probe_vae(base, "sd3")

        # eager per-op text-tower dispatch costs seconds per NEW prompt on
        # TPU (same lesson as the XL service) — jit with params as args
        core = self._te_encode_core
        self._encode_jit = jax.jit(lambda p1, p2, ids1, ids2: core((p1, p2), ids1, ids2))
        self._batcher = (
            MicroBatcher(self._generate_batch, max_batch=max_batch, window_ms=batch_window_ms,
                         max_queue=max_queue)
            if microbatch
            else None
        )
        self.load_seconds = time.time() - t0

    def _make_sampler(self, sites, indexed: bool):
        from sliders_conceptmod_tpu.infer.generate_flow import sample_flow_loop

        apply_fn = self.transformer.apply_fn()
        schedule, flip = self.schedule, self.flip
        sites = tuple(sites)
        static_g = self._static_guidance
        # static guidance <= 1: sample_flow_loop statically slices the cond
        # rows (B model rows, not 2B) — the overlay multipliers must NOT be
        # CFG-doubled then
        cfg_rows = static_g is None or float(static_g) > 1.0

        def _run(base, lp, scale_vec, adapter_idx, latents, text, pooled, guidance):
            # the service always sends [2B] uncond++cond embeddings; with a
            # traced (or >1 static) guidance the model rows are CFG-doubled —
            # double the per-row multipliers (and routing) to match
            row = jnp.concatenate([scale_vec] * 2) if cfg_rows else scale_vec
            idx2 = adapter_idx
            if adapter_idx is not None and cfg_rows:
                idx2 = jnp.concatenate([adapter_idx] * 2)
            return sample_flow_loop(
                apply_fn, base, base, flip, schedule, latents, text, pooled,
                guidance_scale=guidance if static_g is None else static_g,
                slider_overlay=lambda: lora_lib.lora_overlay(sites, lp, row, adapter_idx=idx2),
            )

        if indexed:

            @jax.jit
            def sample_indexed(base, lp, scale_vec, adapter_idx, latents, text, pooled, guidance):
                return _run(base, lp, scale_vec, adapter_idx, latents, text, pooled, guidance)

            return sample_indexed

        @jax.jit
        def sample(base, lp, scale_vec, latents, text, pooled, guidance):
            return _run(base, lp, scale_vec, None, latents, text, pooled, guidance)

        return sample

    def add_slider(self, name: str, slider_path: str) -> None:
        """Register a '-'-delimited SD3 slider checkpoint under ``name``.
        Accepts combined files (combine_loras outputs) and raw notrigger te
        saves — te parts merge into the clip_l/clip_g towers per request."""
        from sliders_conceptmod_tpu.adapters import slider_file as sfile

        parts = sfile.load_slider_file(
            slider_path, [te.params for te in self.text_encoders]
        )
        sites, lora_params = [], {}
        if parts.unet is not None:
            rank, alpha = 4, 1.0
            exact = settings_from_tensors(parts.unet)
            if exact is not None:
                rank, alpha = exact
            all_sites = lora_lib.create_sites(
                self.transformer.params, rank=rank, alpha=alpha, target_replace=["Attention"],
                train_method="full", delimiter="-",
            )
            sites = lora_lib.filter_sites_to_keys(parts.unet.keys(), all_sites)
            if not sites:
                raise ValueError(
                    f"No matching LoRA keys between transformer and {slider_path} "
                    "(is this a '-'-delimited SD3 slider checkpoint?)"
                )
            lora_params = self._place_adapter(
                lora_lib.load_weights_from_tensors(parts.unet, sites)
            )
        elif not parts.has_te:
            raise ValueError(
                f"{slider_path} carries neither transformer nor text-encoder slider parts"
            )
        self._register(name, (sites, lora_params, self._make_sampler(sites, indexed=False)))
        self._register_te_parts(name, parts)

    def _stacked_sampler(self, sites):
        """One jitted heterogeneous-adapter sampler per SITE SET
        (cross-slider batching, :meth:`_SliderRegistry._stacked_entry`)."""
        cache_key = tuple(s.lora_name for s in sites)
        fn = self._stacked_fns.get(cache_key)
        if fn is None:
            fn = self._make_sampler(sites, indexed=True)
            self._stacked_fns[cache_key] = fn
        return fn

    def _te_encode_core(self, ps, ids1, ids2):
        """SD3 prompt-encode math (factory.encode_prompts_sd3, T5 dropped —
        reference model_util.py:217-236): concat CLIP penultimate states,
        zero-pad to joint_attention_dim, append a zero T5 segment; pooled =
        concat of both projected pooled outputs."""
        from sliders_conceptmod_tpu.models.clip import penultimate_hidden_state

        te1_model, te2_model = (te.model for te in self.text_encoders)
        jad, t5_len = self.transformer.config.joint_attention_dim, self._t5_seq_len
        o1 = te1_model.apply({"params": ps[0]}, ids1)
        o2 = te2_model.apply({"params": ps[1]}, ids2)
        clip_embeds = jnp.concatenate(
            [penultimate_hidden_state(o1), penultimate_hidden_state(o2)], axis=-1
        )
        if clip_embeds.shape[-1] < jad:
            clip_embeds = jnp.pad(
                clip_embeds, ((0, 0), (0, 0), (0, jad - clip_embeds.shape[-1]))
            )
        t5_zeros = jnp.zeros((clip_embeds.shape[0], t5_len, jad), clip_embeds.dtype)
        pooled = [
            o.projected if o.projected is not None else o.pooled_output
            for o in (o1, o2)
        ]
        return (
            jnp.concatenate([clip_embeds, t5_zeros], axis=1),
            jnp.concatenate(pooled, axis=-1),
        )

    def _encode_impl(self, prompt: str):
        te1, te2 = self.text_encoders
        return self._encode_jit(
            te1.params,
            te2.params,
            jnp.asarray(te1.tokenizer([prompt])),
            jnp.asarray(te2.tokenizer([prompt])),
        )

    def _sample_group(self, padded, guidance, entry, adapter_idx=None) -> list:
        """One same-guidance padded group through one CFG flow sampler call
        (flow-match Euler is deterministic — no per-row noise keys needed)."""
        import numpy as np

        _, lora_params, sample_fn = entry
        bucket = len(padded)
        if self._rows_need_te(padded):
            # per-row te-merged embeddings (uncond AND cond at the row scale)
            unconds = [self._encode_row("", self._row_slider(r), r[1]) for r in padded]
            conds = [self._encode_row(r[0], self._row_slider(r), r[1]) for r in padded]
            text = jnp.concatenate([t for t, _ in unconds] + [t for t, _ in conds], axis=0)
            pooled = jnp.concatenate([p for _, p in unconds] + [p for _, p in conds], axis=0)
        else:
            text_u, pooled_u = self._encode("")
            conds = [self._encode(p) for p, *_ in padded]
            text = jnp.concatenate(
                [jnp.tile(text_u, (bucket, 1, 1))] + [t for t, _ in conds], axis=0
            )
            pooled = jnp.concatenate(
                [jnp.tile(pooled_u, (bucket, 1))] + [p for _, p in conds], axis=0
            )
        latents = jnp.concatenate(
            [
                jax.random.normal(
                    jax.random.PRNGKey(r[2]),
                    (1, self.transformer.config.in_channels, self.latent_res, self.latent_res),
                    jnp.float32,
                )
                for r in padded
            ],
            axis=0,
        )
        scales = jnp.asarray([r[1] for r in padded], jnp.float32)
        idx_arr = None if adapter_idx is None else jnp.asarray(adapter_idx, jnp.int32)
        if self._mesh is not None:
            from sliders_conceptmod_tpu.parallel import mesh as mesh_lib

            shard = mesh_lib.data_sharded(self._mesh)
            latents = jax.device_put(latents, shard)
            text = jax.device_put(text, shard)
            pooled = jax.device_put(pooled, shard)
            scales = jax.device_put(scales, shard)
            if idx_arr is not None:
                idx_arr = jax.device_put(idx_arr, shard)
        if idx_arr is None:
            final = sample_fn(
                self.transformer.params, lora_params, scales,
                latents.astype(jnp.bfloat16), text, pooled, jnp.float32(guidance),
            )
        else:
            final = sample_fn(
                self.transformer.params, lora_params, scales, idx_arr,
                latents.astype(jnp.bfloat16), text, pooled, jnp.float32(guidance),
            )
        if self.vae is not None:
            from sliders_conceptmod_tpu.infer.generate_flow import sd3_latents_to_images

            return sd3_latents_to_images(
                self.vae.decode, final, self.vae.config.scaling_factor,
                self.vae.config.shift_factor,
            )
        return self._latents_preview(final)


def detect_family(base: str) -> str:
    """Family autodetect from the base path — the single source for serve and
    cli/bench_serve (xl | sd3 | flux | sd1)."""
    base_l = str(base).lower()
    if "flux" in base_l:
        return "flux"
    if "sd3" in base_l or "stable-diffusion-3" in base_l:
        return "sd3"
    if any(
        tag in base_l
        for tag in ("sd1", "v1-4", "v1-5", "stable-diffusion-v1", "sd2", "v2-1",
                    "stable-diffusion-2")
    ):
        return "sd1"
    return "xl"


def make_handler(service: SliderService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            print(f"[serve] {fmt % args}")

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            # POST /sliders {"name": ..., "path": ...} — register a new
            # adapter over the already-loaded base WITHOUT a restart (the
            # collection grows daily; the 5.1 GB base + compiled sampler stay
            # warm). Replacing an existing name swaps the adapter atomically.
            if urlparse(self.path).path != "/sliders":
                self.send_response(404)
                self.end_headers()
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                spec = json.loads(self.rfile.read(length) or b"{}")
                name, path = spec["name"], spec["path"]
            except (ValueError, KeyError) as e:
                self._json(400, {"error": f"body must be JSON with name+path ({e})"})
                return
            try:
                service.add_slider(str(name), str(path))
            except (ValueError, OSError, KeyError) as e:
                self._json(400, {"error": str(e)})
                return
            self._json(200, {"sliders": service.list_sliders()})

        def do_DELETE(self):
            # DELETE /sliders/<name> — drop an adapter; its device arrays
            # free once in-flight batches drain.
            url = urlparse(self.path)
            prefix = "/sliders/"
            if not url.path.startswith(prefix):
                self.send_response(404)
                self.end_headers()
                return
            try:
                service.remove_slider(url.path[len(prefix):])
            except KeyError as e:
                self._json(404, {"error": str(e)})
                return
            except ValueError as e:  # pinned 'default'
                self._json(400, {"error": str(e)})
                return
            self._json(200, {"sliders": service.list_sliders()})

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/healthz":
                info = {"status": "ok", "load_seconds": round(service.load_seconds, 1)}
                info["sliders"] = sorted(e["name"] for e in service.list_sliders())
                body = json.dumps(info).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
                return
            if url.path == "/sliders":
                self._json(200, {"sliders": service.list_sliders()})
                return
            if url.path == "/metrics":
                # micro-batcher observability: whether concurrent load is
                # actually riding batched sampler calls (mean_batch → the
                # throughput story of BASELINE.md's serving A/Bs)
                m = {"sliders": len(service.list_sliders()),
                     "stacked_combos_cached": sum(
                         v is not None for v in service._stack_cache.values()
                     )}
                b = getattr(service, "_batcher", None)
                if b is not None:
                    recent = list(b.batch_sizes)
                    lats = sorted(b.latencies)

                    def pct(q):
                        if not lats:
                            return 0.0
                        return round(lats[min(int(q * (len(lats) - 1) + 0.5), len(lats) - 1)], 4)

                    total = b.total_rows + b.rejected
                    m.update(
                        microbatch=True,
                        total_batches=b.total_batches,
                        total_rows=b.total_rows,
                        mean_batch=round(sum(recent) / max(len(recent), 1), 3),
                        max_batch=b.max_batch,
                        # overload observability (VERDICT r2 task 8): admitted-
                        # request latency percentiles, queue depth right now,
                        # and the shed/error story
                        queue_depth=b.queue_depth(),
                        max_queue=b.max_queue,
                        p50_seconds=pct(0.50),
                        p99_seconds=pct(0.99),
                        rejected=b.rejected,
                        errored=b.errored,
                        error_rate=round((b.rejected + b.errored) / max(total, 1), 4),
                    )
                else:
                    m["microbatch"] = False
                self._json(200, m)
                return
            if url.path == "/generate":
                q = parse_qs(url.query)
                prompt = q.get("prompt", [None])[0]
                if not prompt:
                    self.send_response(400)
                    self.end_headers()
                    self.wfile.write(b'{"error": "prompt required"}')
                    return
                try:
                    scale = float(q.get("scale", ["0"])[0])
                    seed = int(q.get("seed", ["0"])[0])
                    guidance = float(q.get("guidance", ["7.5"])[0])
                except ValueError:
                    self.send_response(400)
                    self.end_headers()
                    self.wfile.write(b'{"error": "bad numeric parameter"}')
                    return
                slider = q.get("slider", [None])[0]
                t0 = time.time()
                try:
                    if slider is not None:
                        png = service.generate(prompt, scale, seed, guidance, slider=slider)
                    else:
                        png = service.generate(prompt, scale, seed, guidance)
                except QueueFullError as e:
                    # backpressure: bounded queue full — shed with 429 so the
                    # client can retry, instead of queueing unboundedly
                    self.send_response(429)
                    self.send_header("Retry-After", "1")
                    self.end_headers()
                    self.wfile.write(json.dumps({"error": str(e)}).encode())
                    return
                except (KeyError, TypeError) as e:
                    self.send_response(400)
                    self.end_headers()
                    self.wfile.write(json.dumps({"error": str(e)}).encode())
                    return
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("X-Generate-Seconds", f"{time.time()-t0:.2f}")
                self.end_headers()
                self.wfile.write(png)
                return
            self.send_response(404)
            self.end_headers()

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="stabilityai/stable-diffusion-xl-base-1.0")
    ap.add_argument("--slider", required=True)
    ap.add_argument(
        "--add_slider", action="append", default=[], metavar="NAME=PATH",
        help="register extra sliders over the same base (repeatable); "
        "requests pick one with ?slider=NAME — the production shape for a "
        "published collection (thousands of adapters, one loaded base)",
    )
    ap.add_argument("--port", type=int, default=8500)
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=None, help="default 25 (xl) / 28 (sd3) / 8 (flux)")
    ap.add_argument("--start_noise", type=float, default=None, help="default 750 (xl/sd3) / 800 (flux)")
    ap.add_argument(
        "--family", choices=["xl", "sd3", "flux", "sd1"], default=None,
        help="auto-detected from --base when omitted",
    )
    ap.add_argument(
        "--quantize_base", action="store_true",
        help="int8 frozen base (adapters/quant.py) — full-depth flux-schnell "
        "serves from one 16 GB v5e; on xl it frees ~2.1 GiB HBM",
    )
    ap.add_argument(
        "--w8a8", action="store_true",
        help="W8A8 — per-token dynamic int8 activations on top of the int8 "
        "base; MXU matmuls at 2× the bf16 rate (implies --quantize_base)",
    )
    ap.add_argument(
        "--no_microbatch", action="store_true",
        help="disable dynamic request micro-batching (concurrent requests "
        "riding one batched sampler call; batch-4 ≈ batch-1 cost)",
    )
    ap.add_argument(
        "--batch_window_ms", type=float, default=8.0,
        help="micro-batch gather window — the max extra latency a lone "
        "request pays waiting for company",
    )
    ap.add_argument(
        "--mesh_model", type=int, default=1,
        help="TP serving: shard weight output dims over an N-chip mesh model "
        "axis (parallel/mesh.tp_shard_tree) — serves params too big for one "
        "chip (full-depth flux bf16 needs 2); composes with --mesh_data",
    )
    ap.add_argument(
        "--static_guidance", type=float, default=None,
        help="compile the XL/SD3 sampler with a FIXED guidance instead of a "
        "traced per-request one; <= 1 takes the cond-only fast path (half "
        "the model rows — the few-step distilled serving mode, pair with "
        "--steps 4); "
        "per-request ?guidance= is ignored",
    )
    ap.add_argument(
        "--v2", action="store_true",
        help="sd1 family only: SD2.x base (OpenCLIP tower, SD2.1 UNet widths)",
    )
    ap.add_argument(
        "--v_pred", action="store_true",
        help="sd1 family only: v-prediction scheduler (SD2.x 768-v bases)",
    )
    ap.add_argument(
        "--no_stack", action="store_true",
        help="disable cross-slider (stacked heterogeneous adapter) batching "
        "— mixed-slider micro-batches split per slider (the A/B control)",
    )
    ap.add_argument(
        "--max_sliders", type=int, default=None,
        help="cap the adapter registry; registering past it (POST /sliders) "
        "evicts the least-recently-used adapter ('default' is pinned)",
    )
    ap.add_argument(
        "--mesh_data", type=int, default=1,
        help="DP serving: shard micro-batched rows over an N-chip mesh data "
        "axis (params replicate; buckets scale to mesh multiples) — serving "
        "throughput scales with chips while latency stays batch-1",
    )
    ap.add_argument(
        "--max_queue", type=int, default=64,
        help="bounded admission: requests past this many waiting are shed "
        "with HTTP 429 (backpressure keeps admitted-request p99 flat under "
        "overload instead of growing the queue without bound)",
    )
    ap.add_argument(
        "--compilation_cache_dir", default=None,
        help="persistent on-disk XLA executable cache: redeploys reuse "
        "compiled samplers instead of paying the 10-30 min remote compile "
        "per process (utils/debug.apply_tpu_runtime_flags)",
    )
    args = ap.parse_args()

    if args.compilation_cache_dir:
        from types import SimpleNamespace

        from sliders_conceptmod_tpu.utils.debug import apply_tpu_runtime_flags

        apply_tpu_runtime_flags(
            SimpleNamespace(compilation_cache_dir=args.compilation_cache_dir)
        )

    family = args.family or detect_family(args.base)
    if args.static_guidance is not None and family == "flux":
        ap.error("--static_guidance applies to CFG families (xl/sd3); flux "
                 "schnell has no CFG batch and dev's guidance embedding is "
                 "already a cheap per-request input")
    if family == "sd3":
        service = SD3SliderService(
            args.base, args.slider, args.image_size,
            args.steps if args.steps is not None else 28,
            args.start_noise if args.start_noise is not None else 750,
            quantize_base=args.quantize_base, w8a8=args.w8a8,
            microbatch=not args.no_microbatch, batch_window_ms=args.batch_window_ms,
            mesh_data=args.mesh_data, mesh_model=args.mesh_model,
            max_sliders=args.max_sliders, cross_slider_stack=not args.no_stack,
            max_queue=args.max_queue,
            static_guidance=args.static_guidance,
        )
    elif family == "flux":
        service = FluxSliderService(
            args.base, args.slider, args.image_size,
            args.steps if args.steps is not None else 8,
            args.start_noise if args.start_noise is not None else 800,
            quantize_base=args.quantize_base, w8a8=args.w8a8,
            microbatch=not args.no_microbatch, batch_window_ms=args.batch_window_ms,
            mesh_data=args.mesh_data, mesh_model=args.mesh_model,
            max_sliders=args.max_sliders, cross_slider_stack=not args.no_stack,
            max_queue=args.max_queue,
        )
    elif family == "sd1":
        service = SD1SliderService(
            args.base, args.slider, args.image_size,
            args.steps if args.steps is not None else 50,
            args.start_noise if args.start_noise is not None else 750,
            quantize_base=args.quantize_base, w8a8=args.w8a8,
            microbatch=not args.no_microbatch, batch_window_ms=args.batch_window_ms,
            mesh_data=args.mesh_data, mesh_model=args.mesh_model,
            max_sliders=args.max_sliders, cross_slider_stack=not args.no_stack,
            max_queue=args.max_queue,
            static_guidance=args.static_guidance,
            v2=args.v2, v_pred=args.v_pred,
        )
    else:
        service = SliderService(
            args.base, args.slider, args.image_size,
            args.steps if args.steps is not None else 25,
            args.start_noise if args.start_noise is not None else 750,
            quantize_base=args.quantize_base, w8a8=args.w8a8,
            microbatch=not args.no_microbatch, batch_window_ms=args.batch_window_ms,
            mesh_data=args.mesh_data, mesh_model=args.mesh_model,
            max_sliders=args.max_sliders, cross_slider_stack=not args.no_stack,
            max_queue=args.max_queue,
            static_guidance=args.static_guidance,
        )
    for spec in args.add_slider:
        name, _, path = spec.partition("=")
        if not path:
            ap.error(f"--add_slider takes NAME=PATH, got {spec!r}")
        service.add_slider(name, path)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(service))
    print(f"slider server on :{args.port} (models loaded in {service.load_seconds:.1f}s)")
    server.serve_forever()


if __name__ == "__main__":
    main()
