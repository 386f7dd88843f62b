"""Load-bench the slider service: concurrent request throughput + latency.

TPU deployment extension (no reference counterpart — the reference has no
serving story at all). Fires ``--requests`` generations from
``--concurrency`` client threads at an in-process service (default) or an
already-running server (``--url``), and prints ONE JSON line with request
throughput, latency percentiles, and the micro-batcher's observed batch
sizes — the number that shows whether concurrent load actually rides the
batched sampler call (BASELINE.md: batch-4 UNet fwd ≈ batch-1 cost on v5e,
so the expected effect is ~``max_batch``× the single-stream req/s).

  # in-process, tiny smoke (CPU):
  PYTHONPATH= JAX_PLATFORMS=cpu python -m sliders_conceptmod_tpu.cli.bench_serve \\
      --base tiny-xl --slider /tmp/slider.safetensors --image_size 64 --steps 2 \\
      --requests 8 --concurrency 4

  # against a running server:
  python -m sliders_conceptmod_tpu.cli.bench_serve --url http://localhost:8500 \\
      --requests 32 --concurrency 4
"""

from __future__ import annotations

import argparse
import json
import time
from concurrent.futures import ThreadPoolExecutor


def _percentile(sorted_vals, q):
    if not sorted_vals:
        return 0.0
    i = min(int(q * (len(sorted_vals) - 1) + 0.5), len(sorted_vals) - 1)
    return sorted_vals[i]


def run(args):
    prompts = ["a photo of a person", "a photo of a car", "a photo of a room", "a photo of the sky"]
    scales = [-2.0, -1.0, 0.0, 1.0, 2.0]

    if args.slider == "synth" and not args.url:
        # synthesize a random rank-4 slider matching --base (shape-only work:
        # sites come from eval_shape'd params, only the small LoRA factors
        # materialize) so the bench needs no pre-trained checkpoint
        import tempfile

        import jax
        import jax.numpy as jnp

        from sliders_conceptmod_tpu.adapters import lora as lora_lib
        from sliders_conceptmod_tpu.models import factory

        from sliders_conceptmod_tpu.serve import detect_family

        family = args.family or detect_family(args.base)
        if family == "flux":
            _, _, bundle, _ = factory.load_models_flux(args.base, weight_dtype=jnp.bfloat16)
            sites = lora_lib.create_sites(
                bundle.params, rank=4, alpha=1.0, target_replace=["Attention"],
                train_method="full", delimiter="-",
            )
        elif family == "sd3":
            _, _, bundle, _ = factory.load_models_sd3(args.base, weight_dtype=jnp.bfloat16)
            sites = lora_lib.create_sites(
                bundle.params, rank=4, alpha=1.0, target_replace=["Attention"],
                train_method="full", delimiter="-",
            )
        elif family == "sd1":
            _, _, _, bundle, _ = factory.load_models(
                args.base, weight_dtype=jnp.bfloat16, with_vae=True
            )
            sites = lora_lib.create_sites(
                bundle.params, rank=4, alpha=1.0,
                target_replace=lora_lib.UNET_TARGET_REPLACE_MODULE_TRANSFORMER,
                train_method="full",
            )
        else:
            _, _, bundle, _, _ = factory.load_models_xl(
                args.base, weight_dtype=jnp.bfloat16, with_vae=True
            )
            sites = lora_lib.create_sites(
                bundle.params, rank=4, alpha=1.0,
                target_replace=lora_lib.UNET_TARGET_REPLACE_MODULE_TRANSFORMER,
                train_method="full",
            )
        lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
        lp = jax.tree.map(lambda a: a + 0.01, lp)
        path = tempfile.mktemp(suffix="_bench_slider.safetensors")
        lora_lib.save_weights(path, sites, lp)
        del bundle, lp
        args.slider = path

    if args.url:
        from urllib.parse import quote
        from urllib.request import urlopen

        from urllib.error import HTTPError

        shed = []

        def one(i):
            p, s = prompts[i % len(prompts)], scales[i % len(scales)]
            t0 = time.time()
            try:
                body = urlopen(
                    f"{args.url}/generate?prompt={quote(p)}&scale={s}&seed={i}"
                    f"&guidance={args.guidance}",
                    timeout=600,
                ).read()
            except HTTPError as e:
                if e.code == 429:  # bounded-queue shed — measured, not fatal
                    shed.append(i)
                    return None
                raise
            assert body[:8] == b"\x89PNG\r\n\x1a\n", "non-PNG response"
            return time.time() - t0

        service = None
    else:
        from sliders_conceptmod_tpu.serve import (
            FluxSliderService, SD1SliderService, SD3SliderService, SliderService,
            detect_family,
        )

        family = args.family or detect_family(args.base)

        cls = {
            "flux": FluxSliderService, "sd3": SD3SliderService, "sd1": SD1SliderService,
        }.get(family, SliderService)
        service = cls(
            args.base, args.slider, args.image_size, args.steps,
            microbatch=not args.no_microbatch, batch_window_ms=args.batch_window_ms,
            cross_slider_stack=not args.no_stack,
            max_batch=args.max_batch, max_queue=args.max_queue,
        )

        # multi-slider traffic: register N-1 extra synthesized adapters (the
        # published-collection shape); requests round-robin across them.
        # Compatible adapters STACK into one call (cross-slider batching,
        # serve._stacked_entry), so this measures heterogeneous-adapter
        # batching under concurrent load (mean_batch stays ~concurrency).
        slider_names = ["default"]
        if args.num_sliders > 1:
            import tempfile

            import jax

            from sliders_conceptmod_tpu.adapters import lora as lora_lib

            for k in range(1, args.num_sliders):
                lp_k = jax.tree.map(lambda a, _k=k: a + 0.01 * _k, service.lora_params)
                path_k = tempfile.mktemp(suffix=f"_bench_slider{k}.safetensors")
                lora_lib.save_weights(path_k, service.sites, lp_k)
                service.add_slider(f"s{k}", path_k)
                slider_names.append(f"s{k}")

        from sliders_conceptmod_tpu.serve import QueueFullError

        shed = []

        def one(i):
            p, s = prompts[i % len(prompts)], scales[i % len(scales)]
            t0 = time.time()
            try:
                png = service.generate(
                    p, scale=s, seed=i, guidance=args.guidance,
                    slider=slider_names[i % len(slider_names)],
                )
            except QueueFullError:
                # bounded-queue backpressure (HTTP 429 equivalent): record the
                # shed, don't fail the bench — overload runs MEASURE shedding
                shed.append(i)
                return None
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
            return time.time() - t0

    # warm-up: compile every padding bucket the run will hit (and the text
    # towers) outside the timed window
    with ThreadPoolExecutor(args.concurrency) as pool:
        list(pool.map(one, range(min(args.concurrency, args.requests))))
    # the warm-up itself can shed near the queue bound — reset shed
    # accounting so the reported rates cover the timed run only (matching
    # 'requests'/'completed')
    shed.clear()
    rejected_before = (
        service._batcher.rejected
        if service is not None and getattr(service, "_batcher", None) is not None
        else 0
    )

    # sample queue depth during the run (overload observability: growth vs
    # bounded shedding); only meaningful in-process with the micro-batcher
    depth_samples = []
    stop_sampling = False
    sampler_thread = None
    if service is not None and getattr(service, "_batcher", None) is not None:
        import threading

        def _sample_depth():
            while not stop_sampling:
                depth_samples.append(service._batcher.queue_depth())
                time.sleep(0.05)

        sampler_thread = threading.Thread(target=_sample_depth, daemon=True)
        sampler_thread.start()

    t0 = time.time()
    with ThreadPoolExecutor(args.concurrency) as pool:
        results = list(pool.map(one, range(args.requests)))
    wall = time.time() - t0
    stop_sampling = True
    if sampler_thread is not None:
        sampler_thread.join(timeout=1)
    lat = sorted(r for r in results if r is not None)

    completed = len(lat)
    out = {
        "metric": "serve_requests_per_sec",
        "value": round(completed / wall, 4),
        "unit": "req/s",
        "vs_baseline": 0.0,
        "requests": args.requests,
        "concurrency": args.concurrency,
        "p50_s": round(_percentile(lat, 0.50), 3),
        "p95_s": round(_percentile(lat, 0.95), 3),
        "microbatch": not args.no_microbatch and not args.url,
        "num_sliders": args.num_sliders if not args.url else 1,
        "cross_slider_stack": not args.no_stack and not args.url,
    }
    if args.url:
        out["shed_429"] = len(shed)
    if service is not None and getattr(service, "_batcher", None) is not None:
        b = service._batcher
        sizes = b.batch_sizes
        out["mean_batch"] = round(sum(sizes) / max(len(sizes), 1), 2)
        out["p99_s"] = round(_percentile(lat, 0.99), 3)
        out["shed_429"] = b.rejected - rejected_before
        out["max_queue"] = b.max_queue
        out["max_queue_depth_seen"] = max(depth_samples, default=0)
        out["completed"] = completed
    print(json.dumps(out))
    return out


def build_parser():
    p = argparse.ArgumentParser(prog="benchServe")
    p.add_argument("--base", default="tiny-xl")
    p.add_argument(
        "--slider", default=None,
        help="slider checkpoint; 'synth' synthesizes a random rank-4 slider "
        "for --base (required unless --url)",
    )
    p.add_argument("--url", default=None, help="bench a running server instead of in-process")
    p.add_argument("--family", choices=["xl", "sd3", "flux", "sd1"], default=None)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--guidance", type=float, default=7.5)
    p.add_argument("--requests", type=int, default=16)
    p.add_argument("--concurrency", type=int, default=4)
    p.add_argument("--no_microbatch", action="store_true")
    p.add_argument("--max_batch", type=int, default=4)
    p.add_argument(
        "--max_queue", type=int, default=64,
        help="bounded admission (serve --max_queue): overload sheds instead "
        "of queueing unboundedly; sheds are counted, not failures",
    )
    p.add_argument(
        "--no_stack", action="store_true",
        help="disable cross-slider stacked batching (per-slider groups — "
        "the A/B control for --num_sliders runs)",
    )
    p.add_argument("--batch_window_ms", type=float, default=8.0)
    p.add_argument(
        "--num_sliders", type=int, default=1,
        help="in-process only: register N sliders (N-1 synthesized from the "
        "first) and round-robin requests across them — the published-"
        "collection traffic shape; compatible adapters stack into one "
        "batched call (S-LoRA-style cross-slider batching)",
    )
    return p


if __name__ == "__main__":
    args = build_parser().parse_args()
    if not args.url and not args.slider:
        raise SystemExit("--slider is required for in-process mode")
    run(args)
