"""SliderService — load-once serving via the traced-scale overlay (serve.py).

Tiny weightless family end-to-end: PNG bytes out, every float scale reuses
ONE executable (no merged trees), scale actually changes the image, and the
W8A8 flag plumbs through.
"""

import io

import numpy as np

import jax
import pytest


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.serve import SliderService

    path = tmp_path_factory.mktemp("serve") / "slider.safetensors"
    _, _, unet, _ = factory.load_models_xl("tiny-xl")
    sites = lora_lib.create_sites(unet.params, rank=2, alpha=1.0, train_method="full")
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
    # fresh init has zero up-factors (delta ≡ 0 at any scale) — shift them so
    # the slider visibly bites; start_noise above t0 keeps it on all steps
    lp = jax.tree.map(lambda a: a + 0.1, lp)
    lora_lib.save_weights(path, sites, lp)
    return SliderService("tiny-xl", str(path), image_size=64, steps=2, start_noise=1100)


def test_generate_returns_png(service):
    png = service.generate("a cat", scale=1.0, seed=3, guidance=7.5)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_xl_scale_changes_output_one_executable(service):
    """The traced-scale overlay: arbitrary float scales hit the SAME compiled
    sampler (no merged trees, no per-scale recompiles) and still change the
    image."""
    n0 = service._sample._cache_size()
    a = service.generate("a cat", scale=-3.0, seed=3, guidance=7.5)
    b = service.generate("a cat", scale=3.0, seed=3, guidance=7.5)
    c = service.generate("a cat", scale=0.7321, seed=3, guidance=7.5)
    assert a != b  # same seed, different slider scale -> different image
    assert c[:8] == b"\x89PNG\r\n\x1a\n"
    assert service._sample._cache_size() == max(n0, 1)  # one executable for all scales


def test_xl_w8a8_service_smoke(tmp_path_factory):
    """--w8a8 on the XL service: flag plumbs to the bundle; tiny kernels sit
    below QUANT_MIN_ELEMS so this smokes the wiring end-to-end."""
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.serve import SliderService

    path = tmp_path_factory.mktemp("serve_w8a8") / "slider.safetensors"
    _, _, unet, _ = factory.load_models_xl("tiny-xl")
    sites = lora_lib.create_sites(unet.params, rank=2, alpha=1.0, train_method="full")
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
    lora_lib.save_weights(path, sites, lp)
    svc = SliderService("tiny-xl", str(path), image_size=64, steps=2, w8a8=True)
    assert svc.unet.act_quant
    png = svc.generate("a cat", scale=1.0, seed=3, guidance=7.5)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


@pytest.fixture(scope="module")
def flux_service(tmp_path_factory):
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.serve import FluxSliderService

    path = tmp_path_factory.mktemp("serve_flux") / "flux_slider.safetensors"
    _, _, tr, _ = factory.load_models_flux("tiny-flux")
    sites = lora_lib.create_sites(
        tr.params, rank=2, alpha=1.0, target_replace=["Attention"],
        train_method="full", delimiter="-",
    )
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
    lp = jax.tree.map(lambda a: a + 0.1, lp)
    lora_lib.save_weights(path, sites, lp)
    # start_noise above t0 => the slider rides the WHOLE trajectory, so the
    # scale visibly moves the 8-bit rendered output
    return FluxSliderService(
        "tiny-flux", str(path), image_size=16, steps=2, start_noise=1100,
        quantize_base=True,
    )


def test_flux_generate_returns_png(flux_service):
    png = flux_service.generate("a cat", scale=1.0, seed=3, guidance=3.5)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_flux_scale_changes_output(flux_service):
    a = flux_service.generate("a cat", scale=-4.0, seed=3, guidance=3.5)
    b = flux_service.generate("a cat", scale=4.0, seed=3, guidance=3.5)
    assert a != b  # same seed, different slider scale -> different image


@pytest.fixture(scope="module")
def sd1_service(tmp_path_factory):
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.serve import SD1SliderService

    path = tmp_path_factory.mktemp("serve_sd1") / "sd1_slider.safetensors"
    _, _, unet, _ = factory.load_models("tiny")
    sites = lora_lib.create_sites(unet.params, rank=2, alpha=1.0, train_method="full")
    lp = jax.tree.map(lambda a: a + 0.1, lora_lib.init_lora_params(jax.random.PRNGKey(0), sites))
    lora_lib.save_weights(path, sites, lp)
    return SD1SliderService("tiny", str(path), image_size=64, steps=2, start_noise=1100)


def test_sd1_generate_returns_png(sd1_service):
    png = sd1_service.generate("a cat", scale=1.0, seed=3, guidance=7.5)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_sd1_scale_changes_output_one_executable(sd1_service):
    n0 = sd1_service._sample._cache_size()
    a = sd1_service.generate("a cat", scale=-3.0, seed=3, guidance=7.5)
    b = sd1_service.generate("a cat", scale=3.0, seed=3, guidance=7.5)
    c = sd1_service.generate("a cat", scale=0.7321, seed=3, guidance=7.5)
    assert a != b
    assert c[:8] == b"\x89PNG\r\n\x1a\n"
    assert sd1_service._sample._cache_size() == max(n0, 1)


def test_sd1_batched_requests_match_solo(sd1_service):
    """Concurrent mixed-scale requests through the SD1 micro-batcher route
    each caller its own image."""
    import threading

    outs = {}

    def client(scale, seed):
        outs[(scale, seed)] = sd1_service.generate("a cat", scale=scale, seed=seed, guidance=7.5)

    threads = [
        threading.Thread(target=client, args=args)
        for args in ((-2.0, 3), (2.0, 3), (0.0, 9))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(v[:8] == b"\x89PNG\r\n\x1a\n" for v in outs.values())
    assert outs[(-2.0, 3)] != outs[(2.0, 3)]
    assert outs[(0.0, 9)] != outs[(2.0, 3)]


def test_sd1_te_slider(sd1_service, tmp_path_factory):
    """A text-encoder-only slider file registers on the SD1 service (the
    single-tower _make_te_encoder override) and changes the image."""
    from safetensors.numpy import save_file

    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.adapters import slider_file as sfile
    from sliders_conceptmod_tpu.models import factory

    d = tmp_path_factory.mktemp("sd1_te")
    _, te, _, _ = factory.load_models("tiny")
    sites = lora_lib.create_sites(
        te.params, rank=2, alpha=1.0,
        target_replace=["CLIPAttention", "CLIPSdpaAttention"],
        prefix="lora_te1", train_method="full",
        name_path_prefix=sfile.CLIP_NAME_PATH_PREFIX,
    )
    lp = jax.tree.map(lambda a: a + 0.15, lora_lib.init_lora_params(jax.random.PRNGKey(5), sites))
    path = d / "te1_only.safetensors"
    save_file(lora_lib.state_dict_numpy(sites, lp), str(path))
    sd1_service.add_slider("te", str(path))
    try:
        with_te = sd1_service.generate("a dog", scale=1.5, seed=11, guidance=7.5, slider="te")
        plain = sd1_service.generate("a dog", scale=1.5, seed=11, guidance=7.5)
        assert with_te[:8] == b"\x89PNG\r\n\x1a\n"
        assert with_te != plain
    finally:
        sd1_service.remove_slider("te")


def test_microbatcher_gathers_and_routes():
    """Concurrent submits within the window ride ONE run_batch call; results
    route back to their callers in order; exceptions fan out."""
    import threading
    import time as _time

    from sliders_conceptmod_tpu.serve import MicroBatcher

    calls = []

    def run_batch(items):
        calls.append(list(items))
        _time.sleep(0.02)
        return [x * 10 for x in items]

    mb = MicroBatcher(run_batch, max_batch=4, window_ms=150.0)
    results = {}

    def client(x):
        results[x] = mb.submit(x)

    threads = [threading.Thread(target=client, args=(i,)) for i in (1, 2, 3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == {1: 10, 2: 20, 3: 30}
    assert len(calls) <= 2  # 3 concurrent submits gathered into 1 (rarely 2) runs
    assert sum(len(c) for c in calls) == 3

    def boom(items):
        raise RuntimeError("sampler exploded")

    mb2 = MicroBatcher(boom, max_batch=2, window_ms=1.0)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="exploded"):
        mb2.submit(1)


def test_xl_batched_requests_match_solo(service):
    """Three concurrent requests (mixed scales, same guidance) through the
    micro-batched service return valid PNGs, and the batched path's padding
    buckets never leak padded rows (each caller gets its own image)."""
    import threading

    outs = {}

    def client(scale, seed):
        outs[(scale, seed)] = service.generate("a cat", scale=scale, seed=seed, guidance=7.5)

    threads = [
        threading.Thread(target=client, args=args)
        for args in ((-2.0, 3), (2.0, 3), (0.0, 9))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(v[:8] == b"\x89PNG\r\n\x1a\n" for v in outs.values())
    # different scales at the same seed differ; so do different seeds
    assert outs[(-2.0, 3)] != outs[(2.0, 3)]
    assert outs[(0.0, 9)] != outs[(2.0, 3)]


def test_xl_mixed_guidance_splits_groups(service):
    """Mixed guidance values cannot share one CFG combine — the batch splits
    into per-guidance sub-batches, each caller still gets a valid PNG."""
    reqs = [("a cat", 1.0, 3, 7.5), ("a dog", 1.0, 4, 5.0), ("a cow", -1.0, 5, 7.5)]
    outs = service._generate_batch(reqs)
    assert len(outs) == 3
    assert all(o[:8] == b"\x89PNG\r\n\x1a\n" for o in outs)


def test_xl_multi_slider_registry(service, tmp_path_factory):
    """add_slider registers a second adapter over the SAME loaded base; requests
    route by name, unknown names fail loudly, and the two sliders produce
    different images at the same (prompt, scale, seed)."""
    from sliders_conceptmod_tpu.adapters import lora as lora_lib

    path = tmp_path_factory.mktemp("serve_multi") / "other.safetensors"
    sites = lora_lib.create_sites(
        service.unet.params, rank=2, alpha=1.0, train_method="full"
    )
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(7), sites)
    lp = jax.tree.map(lambda a: a - 0.1, lp)
    lora_lib.save_weights(path, sites, lp)

    service.add_slider("other", str(path))
    a = service.generate("a cat", scale=2.0, seed=3, guidance=7.5)
    b = service.generate("a cat", scale=2.0, seed=3, guidance=7.5, slider="other")
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    assert a != b  # different adapter weights -> different image
    with pytest.raises(KeyError):
        service.generate("a cat", scale=1.0, seed=3, guidance=7.5, slider="nope")


def test_flux_batched_requests(flux_service):
    """Micro-batched flux service: concurrent requests (mixed scales) return
    valid, per-caller-distinct PNGs through one packed sampler call."""
    import threading

    outs = {}

    def client(scale, seed):
        outs[(scale, seed)] = flux_service.generate("a cat", scale=scale, seed=seed, guidance=3.5)

    threads = [
        threading.Thread(target=client, args=args)
        for args in ((-4.0, 3), (4.0, 3), (0.0, 9))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(v[:8] == b"\x89PNG\r\n\x1a\n" for v in outs.values())
    assert outs[(-4.0, 3)] != outs[(4.0, 3)]


def test_flux_multi_slider_registry(flux_service, tmp_path_factory):
    """Flux service: add_slider registers a second adapter over the loaded
    transformer; routing by name yields a different image."""
    from sliders_conceptmod_tpu.adapters import lora as lora_lib

    path = tmp_path_factory.mktemp("serve_flux_multi") / "other.safetensors"
    sites = lora_lib.create_sites(
        flux_service.transformer.params, rank=2, alpha=1.0,
        target_replace=["Attention"], train_method="full", delimiter="-",
    )
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(11), sites)
    lp = jax.tree.map(lambda a: a - 0.15, lp)
    lora_lib.save_weights(path, sites, lp)

    flux_service.add_slider("other", str(path))
    a = flux_service.generate("a cat", scale=3.0, seed=3, guidance=3.5)
    b = flux_service.generate("a cat", scale=3.0, seed=3, guidance=3.5, slider="other")
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    assert a != b
    with pytest.raises(KeyError):
        flux_service.generate("a cat", scale=1.0, seed=3, guidance=3.5, slider="nope")


def test_xl_dp_serving_matches_unsharded(service, tmp_path_factory):
    """mesh_data=2: micro-batched rows shard over the mesh data axis (params
    replicated). Same request → same image as the unsharded service (rows are
    independent trajectories; sharding must not change the math), buckets
    scale to mesh multiples, and concurrent mixed-scale requests all route."""
    import numpy as np
    from PIL import Image

    from sliders_conceptmod_tpu.serve import SliderService

    # reuse the module fixture's slider checkpoint via its default registration
    path = tmp_path_factory.mktemp("serve_dp") / "slider.safetensors"
    from sliders_conceptmod_tpu.adapters import lora as lora_lib

    lora_lib.save_weights(path, service.sites, service.lora_params)
    dp = SliderService(
        "tiny-xl", str(path), image_size=64, steps=2, start_noise=1100,
        microbatch=False, mesh_data=2,
    )
    assert dp._buckets == (2, 4, 8)
    a = service.generate("a cat", scale=2.0, seed=3, guidance=7.5)
    b = dp.generate("a cat", scale=2.0, seed=3, guidance=7.5)
    img_a = np.asarray(Image.open(io.BytesIO(a)), np.int16)
    img_b = np.asarray(Image.open(io.BytesIO(b)), np.int16)
    assert img_a.shape == img_b.shape
    # bf16 trajectories under a different partitioning: allow tiny pixel drift
    assert np.mean(np.abs(img_a - img_b)) < 2.0
    # a 3-request batch pads to the 4-row bucket and every caller routes
    outs = dp._generate_batch(
        [("a cat", -2.0, 3, 7.5), ("a dog", 2.0, 4, 7.5), ("a cow", 0.5, 5, 7.5)]
    )
    assert len(outs) == 3
    assert all(o[:8] == b"\x89PNG\r\n\x1a\n" for o in outs)
    assert outs[0] != outs[1]
    # TP on the conv-heavy UNet: kernel O-dims shard over the model axis
    tp = SliderService(
        "tiny-xl", str(path), image_size=64, steps=2, start_noise=1100,
        microbatch=False, mesh_model=2,
    )
    c = tp.generate("a cat", scale=2.0, seed=3, guidance=7.5)
    img_c = np.asarray(Image.open(io.BytesIO(c)), np.int16)
    assert np.mean(np.abs(img_a - img_c)) < 2.0


def test_flux_tp_serving_matches_unsharded(flux_service, tmp_path_factory):
    """mesh_model=2: transformer weight output dims shard over the model axis
    (the full-depth-schnell-without-int8 route — 23.8 GB bf16 / 2 chips).
    Same request → same image as the unsharded service."""
    import numpy as np
    from PIL import Image

    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.serve import FluxSliderService

    path = tmp_path_factory.mktemp("serve_flux_tp") / "slider.safetensors"
    lora_lib.save_weights(path, flux_service.sites, flux_service.lora_params)
    # dedicated bf16 unsharded reference (the module fixture is int8-based —
    # quantization error would contaminate the sharding-equivalence check)
    ref = FluxSliderService(
        "tiny-flux", str(path), image_size=16, steps=2, start_noise=1100,
        microbatch=False,
    )
    tp = FluxSliderService(
        "tiny-flux", str(path), image_size=16, steps=2, start_noise=1100,
        microbatch=False, mesh_model=2,
    )
    a = ref.generate("a cat", scale=4.0, seed=3, guidance=3.5)
    b = tp.generate("a cat", scale=4.0, seed=3, guidance=3.5)
    img_a = np.asarray(Image.open(io.BytesIO(a)), np.int16)
    img_b = np.asarray(Image.open(io.BytesIO(b)), np.int16)
    assert img_a.shape == img_b.shape
    assert np.mean(np.abs(img_a - img_b)) < 2.0
    # hybrid 2×2 (data × model) also compiles and routes
    hy = FluxSliderService(
        "tiny-flux", str(path), image_size=16, steps=2, start_noise=1100,
        microbatch=False, mesh_data=2, mesh_model=2,
    )
    assert hy._buckets == (2, 4, 8)
    c = hy.generate("a cat", scale=4.0, seed=3, guidance=3.5)
    img_c = np.asarray(Image.open(io.BytesIO(c)), np.int16)
    assert np.mean(np.abs(img_a - img_c)) < 2.0


def test_bench_serve_cli_smoke(tmp_path):
    """cli/bench_serve in-process: JSON metrics out, micro-batcher actually
    gathered concurrent requests (mean_batch > 1 at concurrency 3)."""
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.cli.bench_serve import build_parser, run
    from sliders_conceptmod_tpu.models import factory

    path = tmp_path / "slider.safetensors"
    _, _, unet, _ = factory.load_models_xl("tiny-xl")
    sites = lora_lib.create_sites(unet.params, rank=2, alpha=1.0, train_method="full")
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(0), sites)
    lora_lib.save_weights(path, sites, lp)

    out = run(build_parser().parse_args([
        "--base", "tiny-xl", "--slider", str(path),
        "--image_size", "64", "--steps", "2",
        "--requests", "6", "--concurrency", "3", "--batch_window_ms", "200",
    ]))
    assert out["value"] > 0 and out["requests"] == 6
    assert out["mean_batch"] > 1.0  # concurrency rode the batched sampler


def test_registry_lru_eviction():
    """max_sliders caps the registry: registering past it evicts the
    least-recently-USED adapter, 'default' is pinned, and resolution
    touches protect hot adapters."""
    from sliders_conceptmod_tpu.serve import _SliderRegistry

    reg = _SliderRegistry()
    reg._registry_init(max_sliders=3)
    for name in ("default", "a", "b"):
        reg._register(name, ([name], None, None))
    reg._resolve("a")  # touch: 'a' is now hotter than 'b'
    reg._register("c", (["c"], None, None))  # over cap -> evict 'b' (coldest)
    names = [e["name"] for e in reg.list_sliders()]
    assert "b" not in names and set(names) == {"default", "a", "c"}

    # default is pinned even when it is the coldest entry
    reg._resolve("a"), reg._resolve("c")
    reg._register("d", (["d"], None, None))
    names = [e["name"] for e in reg.list_sliders()]
    assert "default" in names and "a" not in names  # 'a' was coldest evictable

    with pytest.raises(KeyError):
        reg._resolve("nope")
    reg.remove_slider("c")
    assert "c" not in [e["name"] for e in reg.list_sliders()]
    with pytest.raises(KeyError):
        reg.remove_slider("c")


def test_http_runtime_slider_management(service, tmp_path_factory):
    """End-to-end over HTTP: POST /sliders registers a new adapter on the
    live server (no restart), /generate routes to it, GET /sliders lists it,
    DELETE /sliders/<name> drops it and subsequent requests 400."""
    import json as json_lib
    import threading
    from http.server import ThreadingHTTPServer
    from urllib.request import Request, urlopen
    from urllib.error import HTTPError

    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.serve import make_handler

    path = tmp_path_factory.mktemp("serve_http") / "hot.safetensors"
    sites = lora_lib.create_sites(
        service.unet.params, rank=2, alpha=1.0, train_method="full"
    )
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(11), sites)
    lp = jax.tree.map(lambda a: a + 0.05, lp)
    lora_lib.save_weights(path, sites, lp)

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        body = json_lib.dumps({"name": "hot", "path": str(path)}).encode()
        with urlopen(Request(f"{base}/sliders", data=body, method="POST")) as r:
            names = [e["name"] for e in json_lib.loads(r.read())["sliders"]]
        assert "hot" in names

        with urlopen(f"{base}/generate?prompt=a+cat&scale=1.5&seed=3&slider=hot") as r:
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"

        with urlopen(Request(f"{base}/sliders/hot", method="DELETE")) as r:
            names = [e["name"] for e in json_lib.loads(r.read())["sliders"]]
        assert "hot" not in names

        with pytest.raises(HTTPError) as ei:
            urlopen(f"{base}/generate?prompt=a+cat&scale=1.5&seed=3&slider=hot")
        assert ei.value.code == 400
        with pytest.raises(HTTPError) as ei:
            urlopen(Request(f"{base}/sliders/hot", method="DELETE"))
        assert ei.value.code == 404
        with pytest.raises(HTTPError) as ei:
            urlopen(Request(f"{base}/sliders", data=b"not json", method="POST"))
        assert ei.value.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_remove_default_slider_refused(service):
    """'default' is pinned: DELETE-ing it would permanently break the
    no-?slider= path, so remove_slider refuses loudly."""
    with pytest.raises(ValueError, match="pinned"):
        service.remove_slider("default")
    assert "default" in [e["name"] for e in service.list_sliders()]


def test_microbatcher_per_item_exceptions():
    """A result item that is an Exception is raised only for ITS caller —
    the per-group failure containment protocol of _run_grouped."""
    import threading

    from sliders_conceptmod_tpu.serve import MicroBatcher

    def run_batch(items):
        return [KeyError("bad slider") if x == "bad" else x * 2 for x in items]

    mb = MicroBatcher(run_batch, max_batch=4, window_ms=150.0)
    results, errors = {}, {}

    def client(x):
        try:
            results[x] = mb.submit(x)
        except Exception as e:  # noqa: BLE001
            errors[x] = e

    threads = [threading.Thread(target=client, args=(x,)) for x in ("ok", "bad", "fine")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == {"ok": "okok", "fine": "finefine"}
    assert isinstance(errors["bad"], KeyError)
    # bounded observability: deque, plus lifetime totals
    assert mb.total_rows == 3 and mb.total_batches >= 1
    assert mb.batch_sizes.maxlen is not None


def test_failing_group_contained_to_its_requests(service):
    """A batch mixing a good request and one whose slider vanished between
    fail-fast and worker run: the good request still gets its PNG; only the
    bad group's callers see the error (no whole-batch blast radius)."""
    reqs = [
        ("a cat", 1.0, 3, 7.5, "default"),
        ("a dog", 1.0, 4, 7.5, "vanished-between-failfast-and-run"),
    ]
    outs = service._generate_batch(reqs)
    assert outs[0][:8] == b"\x89PNG\r\n\x1a\n"
    assert isinstance(outs[1], KeyError)


def test_xl_static_guidance_turbo_mode(service, tmp_path_factory):
    """static_guidance <= 1 compiles the cond-only fast path (half the UNet
    rows — the SDXL-Turbo serving shape): PNGs out, scale still bites, and
    per-request guidance is ignored (same image for any ?guidance=)."""
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.serve import SliderService

    path = tmp_path_factory.mktemp("serve_turbo") / "slider.safetensors"
    lora_lib.save_weights(path, service.sites, service.lora_params)
    turbo = SliderService(
        "tiny-xl", str(path), image_size=64, steps=2, start_noise=1100,
        microbatch=False, static_guidance=1.0,
    )
    a = turbo.generate("a cat", scale=-3.0, seed=3, guidance=7.5)
    b = turbo.generate("a cat", scale=3.0, seed=3, guidance=7.5)
    assert a[:8] == b"\x89PNG\r\n\x1a\n"
    assert a != b  # slider still bites without CFG
    # guidance is compiled in: requests with different guidance agree exactly
    c = turbo.generate("a cat", scale=3.0, seed=3, guidance=2.0)
    assert b == c


def test_http_metrics_endpoint(service):
    """GET /metrics exposes micro-batcher observability (batch sizes are the
    throughput story of the serving A/Bs) without touching the sampler."""
    import json as json_lib
    import threading
    from http.server import ThreadingHTTPServer
    from urllib.request import urlopen

    from sliders_conceptmod_tpu.serve import make_handler

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        m = json_lib.loads(urlopen(f"http://127.0.0.1:{port}/metrics").read())
        assert m["sliders"] >= 1
        assert "stacked_combos_cached" in m
        if m["microbatch"]:
            assert m["total_batches"] >= 0 and "mean_batch" in m
    finally:
        server.shutdown()
        server.server_close()


def test_xl_te_slider_serving(service, tmp_path_factory):
    """A combined/te slider registered at runtime: requests encode through
    the slider-merged CLIP towers at the request scale (the in-framework
    notrigger consumption loop, adapters/slider_file.py)."""
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.adapters import slider_file as sfile
    from sliders_conceptmod_tpu.models import factory
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("te_serve")
    _, text_encoders, _, _ = factory.load_models_xl("tiny-xl")
    sds = {}
    for idx, te in enumerate(text_encoders):
        sites = lora_lib.create_sites(
            te.params, rank=2, alpha=1.0,
            target_replace=["CLIPAttention", "CLIPSdpaAttention"],
            prefix=f"lora_te{idx + 1}", train_method="full",
            name_path_prefix=sfile.CLIP_NAME_PATH_PREFIX,
        )
        lp = lora_lib.init_lora_params(jax.random.PRNGKey(idx), sites)
        lp = jax.tree.map(lambda a: a + 0.15, lp)
        sds.update(lora_lib.state_dict_numpy(sites, lp))
    path = d / "te_only.safetensors"
    save_file(sds, str(path))

    service.add_slider("te", str(path))
    try:
        listing = {e["name"]: e for e in service.list_sliders()}
        assert listing["te"]["te"] is True
        assert listing["default"]["te"] is False
        a = service.generate("a cat", scale=-2.0, seed=3, guidance=7.5, slider="te")
        b = service.generate("a cat", scale=2.0, seed=3, guidance=7.5, slider="te")
        assert a[:8] == b"\x89PNG\r\n\x1a\n"
        # te-only slider (no unet part): the difference is the text encoding
        assert a != b
        # non-te slider requests still work alongside
        c = service.generate("a cat", scale=1.0, seed=3, guidance=7.5)
        assert c[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        service.remove_slider("te")
    assert all(e["name"] != "te" for e in service.list_sliders())


def test_xl_te_slider_batched_with_plain(service, tmp_path_factory):
    """Mixed micro-batch: a te-slider row and a plain-slider row grouped into
    one window must each match their solo results."""
    import concurrent.futures as cf

    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.adapters import slider_file as sfile
    from sliders_conceptmod_tpu.models import factory
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("te_mix")
    _, text_encoders, _, _ = factory.load_models_xl("tiny-xl")
    te0 = text_encoders[0]
    sites = lora_lib.create_sites(
        te0.params, rank=2, alpha=1.0,
        target_replace=["CLIPAttention", "CLIPSdpaAttention"],
        prefix="lora_te1", train_method="full",
        name_path_prefix=sfile.CLIP_NAME_PATH_PREFIX,
    )
    lp = jax.tree.map(lambda a: a + 0.15, lora_lib.init_lora_params(jax.random.PRNGKey(5), sites))
    path = d / "te1_only.safetensors"
    save_file(lora_lib.state_dict_numpy(sites, lp), str(path))
    service.add_slider("temix", str(path))
    try:
        solo_te = service.generate("a dog", scale=1.5, seed=11, guidance=7.5, slider="temix")
        solo_plain = service.generate("a dog", scale=1.5, seed=11, guidance=7.5)
        with cf.ThreadPoolExecutor(2) as ex:
            f1 = ex.submit(service.generate, "a dog", 1.5, 11, 7.5, "temix")
            f2 = ex.submit(service.generate, "a dog", 1.5, 11, 7.5, "default")
            got_te, got_plain = f1.result(), f2.result()
        def arr(png):
            from PIL import Image
            return np.asarray(Image.open(io.BytesIO(png)), np.float32)
        # batched rows reproduce solo results up to executable-level jitter
        assert np.abs(arr(got_te) - arr(solo_te)).mean() < 3.0
        assert np.abs(arr(got_plain) - arr(solo_plain)).mean() < 3.0
        # and the te slider genuinely changed the image vs the plain one
        assert solo_te != solo_plain
    finally:
        service.remove_slider("temix")


def test_overload_bounded_queue_sheds(tmp_path_factory):
    """Backpressure under overload (VERDICT r2 task 8): with a tiny bounded
    queue, a burst larger than (in-flight + queue) sheds QueueFullError for
    the excess, every ADMITTED request completes, and the metrics surface
    p99 + rejection counts."""
    import concurrent.futures as cf

    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.serve import QueueFullError, SliderService

    path = tmp_path_factory.mktemp("overload") / "slider.safetensors"
    _, _, unet, _ = factory.load_models_xl("tiny-xl")
    sites = lora_lib.create_sites(unet.params, rank=2, alpha=1.0, train_method="full")
    lp = jax.tree.map(lambda a: a + 0.1, lora_lib.init_lora_params(jax.random.PRNGKey(0), sites))
    lora_lib.save_weights(path, sites, lp)
    svc = SliderService(
        "tiny-xl", str(path), image_size=64, steps=2, start_noise=1100,
        max_batch=2, max_queue=2, batch_window_ms=50.0,
    )
    # warm the compile so the burst hits a fast sampler (otherwise every
    # request parks in the first compile and the queue bound is all we test)
    svc.generate("warm", scale=0.0, seed=0, guidance=7.5)

    n = 16
    results = []
    with cf.ThreadPoolExecutor(n) as ex:
        futs = [
            ex.submit(svc.generate, f"prompt {i}", 1.0, i, 7.5) for i in range(n)
        ]
        for f in futs:
            try:
                results.append(f.result())
            except QueueFullError:
                results.append("shed")
    pngs = [r for r in results if isinstance(r, bytes)]
    sheds = [r for r in results if r == "shed"]
    assert all(p[:8] == b"\x89PNG\r\n\x1a\n" for p in pngs)
    assert len(pngs) + len(sheds) == n
    assert sheds, "a 16-burst against queue=2 must shed something"
    assert pngs, "admitted requests must still complete"
    b = svc._batcher
    assert b.rejected == len(sheds)
    assert b.queue_depth() == 0  # drained after the burst
    assert len(b.latencies) >= len(pngs)
    # after the burst the service still works
    again = svc.generate("after", scale=1.0, seed=3, guidance=7.5)
    assert again[:8] == b"\x89PNG\r\n\x1a\n"


def test_metrics_endpoint_overload_fields(service):
    """GET /metrics carries the overload observability fields."""
    import json as _json
    import threading
    from urllib.request import urlopen

    from sliders_conceptmod_tpu.serve import make_handler
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        service.generate("metrics probe", scale=0.5, seed=1, guidance=7.5)
        m = _json.loads(urlopen(f"http://127.0.0.1:{port}/metrics", timeout=30).read())
        for key in ("p50_seconds", "p99_seconds", "rejected", "errored",
                    "error_rate", "queue_depth", "max_queue"):
            assert key in m, key
        assert m["p99_seconds"] >= m["p50_seconds"] >= 0
        assert m["error_rate"] <= 1.0
    finally:
        httpd.shutdown()


def test_lru_eviction_drops_te_encoder():
    """max_sliders eviction must drop the evicted name's te encoder too —
    the (jitted merge+encode fn, device LoRA trees) tuple would otherwise
    outlive its registry entry forever on a long-lived server."""
    from sliders_conceptmod_tpu.serve import _SliderRegistry

    class R(_SliderRegistry):
        def _make_te_encoder(self, parts):
            return lambda prompt, scale: (prompt, scale)

        def _encode_impl(self, prompt):
            return prompt

    class TeParts:
        has_te = True
        te_parts: list = []

    r = R()
    r._registry_init(max_sliders=2)
    for name in ("default", "a", "b", "c"):
        r._register(name, ((), {}, None))
        r._register_te_parts(name, TeParts())
    names = {e["name"] for e in r.list_sliders()}
    assert names == {"default", "c"}  # 'default' pinned; a, b LRU-evicted
    assert set(r._te_encoders) == names


def test_flux_te_encoder_jitted_matches_eager():
    """FluxSliderService._make_te_encoder: the jitted merge-inside encoder
    (scale a traced scalar, one executable for every (prompt, scale)) must
    reproduce the eager merged-params encode exactly — the serving hot path
    may never pay a per-scale eager T5 forward (reference notrigger FLUX.1
    te2=T5 prefixes, train_notrigger.py:184-196)."""
    import types

    import jax.numpy as jnp

    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.adapters import slider_file as sfile
    from sliders_conceptmod_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
    from sliders_conceptmod_tpu.models.t5 import T5Config, T5EncoderModel
    from sliders_conceptmod_tpu.models.tokenizer import HashTokenizer
    from sliders_conceptmod_tpu.serve import FluxSliderService

    # hand-built equivalent of factory.load_models_flux's real-checkpoint
    # encode stack (te1=CLIP pooled, te2=T5 sequence)
    clip_cfg = CLIPTextConfig.tiny()
    clip_model = CLIPTextEncoder(clip_cfg, dtype=jnp.float32)
    clip_tok = HashTokenizer(vocab_size=clip_cfg.vocab_size, max_length=8, bos=0, eos=1, pad=0)
    clip_params = clip_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"]
    t5_cfg = T5Config.tiny()
    t5_model = T5EncoderModel(t5_cfg, dtype=jnp.float32)
    t5_tok = HashTokenizer(vocab_size=t5_cfg.vocab_size, max_length=8, bos=0, eos=1, pad=0)
    t5_params = t5_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))["params"]

    def encode_core(params_list, clip_ids, t5_ids):
        clip_p, t5_p = params_list
        text = t5_model.apply({"params": t5_p}, t5_ids)[0]
        pooled = clip_model.apply({"params": clip_p}, clip_ids).pooled_output[0]
        return text, pooled

    def tokenize(prompt):
        return jnp.asarray(clip_tok([prompt])), jnp.asarray(t5_tok([prompt]))

    enc = types.SimpleNamespace(
        encode_core=encode_core,
        tokenize=tokenize,
        text_encoder_params=[clip_params, t5_params],
    )

    sites = lora_lib.create_sites(
        t5_params, rank=2, alpha=1.0, target_replace=["T5Attention"],
        prefix="lora_te2", train_method="t5attn",
        name_path_prefix=sfile.T5_NAME_PATH_PREFIX,
    )
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(2), sites)
    lp = jax.tree.map(lambda a: a + 0.1, lp)
    parts = sfile.SliderParts(
        unet=None,
        te_parts=[sfile.load_te_part(
            t5_params, lora_lib.state_dict_numpy(sites, lp), index=1, is_t5=True
        )],
    )

    fn = FluxSliderService._make_te_encoder(types.SimpleNamespace(_encode_raw=enc), parts)
    clip_ids, t5_ids = tokenize("a cat")
    for scale in (-1.5, 0.0, 2.0):
        text_j, pooled_j = fn("a cat", scale)
        merged = parts.merged_text_encoder_params(enc.text_encoder_params, scale)
        text_e = t5_model.apply({"params": merged[1]}, t5_ids)[0][None]
        pooled_e = clip_model.apply({"params": merged[0]}, clip_ids).pooled_output[0][None]
        np.testing.assert_allclose(np.asarray(text_j), np.asarray(text_e), rtol=3e-5, atol=3e-6)
        np.testing.assert_allclose(np.asarray(pooled_j), np.asarray(pooled_e), rtol=3e-5, atol=3e-6)


def test_sd2_service_v2_vpred(tmp_path_factory):
    """SD2.x serving (r5, VERDICT r4 weak #4): the --v2/--v_pred route
    through SD1SliderService end-to-end on the tiny weightless family — a
    v2-layout (OpenCLIP text tower) single-file checkpoint loads, the
    scheduler runs v-prediction, and the slider scale changes the PNG."""
    from sliders_conceptmod_tpu.adapters import lora as lora_lib
    from sliders_conceptmod_tpu.io import ldm_export as le
    from sliders_conceptmod_tpu.models import factory
    from sliders_conceptmod_tpu.serve import SD1SliderService

    d = tmp_path_factory.mktemp("serve_sd2")
    _, te, vae, unet, _ = factory.load_models("tiny", with_vae=True)
    base = d / "tiny-sd2.safetensors"
    le.save_ldm_checkpoint(
        str(base), le.export_ldm_checkpoint(unet.params, te.params, vae.params, v2=True)
    )
    sites = lora_lib.create_sites(unet.params, rank=2, alpha=1.0, train_method="full")
    lp = jax.tree.map(lambda a: a + 0.1, lora_lib.init_lora_params(jax.random.PRNGKey(0), sites))
    slider = d / "sd2_slider.safetensors"
    lora_lib.save_weights(str(slider), sites, lp)

    svc = SD1SliderService(
        str(base), str(slider), image_size=64, steps=2, start_noise=1100,
        v2=True, v_pred=True,
    )
    assert svc.schedule.prediction_type == "v_prediction"
    a = svc.generate("a cat", scale=-2.0, seed=3, guidance=7.5)
    b = svc.generate("a cat", scale=2.0, seed=3, guidance=7.5)
    assert a[:8] == b"\x89PNG\r\n\x1a\n" and b[:8] == b"\x89PNG\r\n\x1a\n"
    assert a != b  # the slider scale reaches the v-pred sampler

    # v_pred=False on the same base is a DIFFERENT trajectory (epsilon
    # stepping) — guard that the flag actually selects the prediction type
    svc_eps = SD1SliderService(
        str(base), str(slider), image_size=64, steps=2, start_noise=1100,
        v2=True, v_pred=False,
    )
    assert svc_eps.schedule.prediction_type == "epsilon"
    c = svc_eps.generate("a cat", scale=2.0, seed=3, guidance=7.5)
    assert c != b
