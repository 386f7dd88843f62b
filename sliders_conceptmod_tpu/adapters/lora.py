"""LoRA slider adapters as functional param overlays.

Semantic-parity target: reference ``conceptmod/textsliders/lora.py``.
The reference monkey-patches ``forward`` of targeted Linear/Conv2d modules
(``lora.py:129-138``) and flips a Python-side multiplier on/off around
forward passes (``lora.py:292-301``). That design is hostile to XLA — it
mutates module state between traced calls.

TPU-native design here: a LoRA is a *pytree of (down, up) factors* plus a
static list of :class:`LoRASite` descriptors. ``merge_lora_params`` folds
``W + mult·(α/r)·(up∘down)`` into a copy of the base param tree inside the
jitted step, with ``mult`` a traced scalar — so one compiled UNet serves
teacher (base params) and student (merged params), and the inference-time
per-step scale flip (reference ``generate_images_xl.py:324-328``) is a
``jnp.where`` on the multiplier instead of Python mutation. For rank≪dim the
merge is O(r·in·out) FLOPs per site — noise next to a UNet forward.

Key-schema parity: exported safetensors use the exact reference key set
``lora_unet_<path>.lora_down.weight / .lora_up.weight / .alpha`` with
torch-layout tensors (``lora.py:239-240, 274-291``), so sliders trained here
load in diffusers/the reference and vice versa.

Site selection reproduces ``create_modules`` (``lora.py:194-251``):
class-name target matching, train-method parent-name filters
(``lora.py:207-224``), ``add_``-skip, ``xattn-strict`` child ``out``-skip,
``noxattn-hspace(-last)`` mid-block restriction, name dedup, and the conv
rank clamp ``min(rank, in, out)`` (``lora.py:100-106``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Reference lora.py:15-30
UNET_TARGET_REPLACE_MODULE_TRANSFORMER = ["Attention"]
UNET_TARGET_REPLACE_MODULE_CONV = [
    "ResnetBlock2D",
    "Downsample2D",
    "Upsample2D",
    "DownBlock2D",
    "UpBlock2D",
]
LORA_PREFIX_UNET = "lora_unet"
DEFAULT_TARGET_REPLACE = UNET_TARGET_REPLACE_MODULE_TRANSFORMER

TRAINING_METHODS = (
    "t5attn",
    "noxattn",
    "innoxattn",
    "selfattn",
    "xattn",
    "full",
    "xattn-strict",
    "noxattn-hspace",
    "noxattn-hspace-last",
)

# children of each targeted diffusers module class that are Linear/Conv2d,
# keyed by how they appear in this repo's flax param tree
_ATTENTION_CHILDREN = ("to_q", "to_k", "to_v", "to_out_0")
_RESNET_CHILDREN = ("conv1", "conv2", "time_emb_proj", "conv_shortcut")
_CLIP_ATTN_CHILDREN = ("q_proj", "k_proj", "v_proj", "out_proj")

_TRAILING_INT = re.compile(r"^(.*)_(\d+)$")


def _dotted(segments: Sequence[str]) -> str:
    """flax path segments -> diffusers dotted module name.

    ``down_blocks_0`` -> ``down_blocks.0``; ``to_out_0`` -> ``to_out.0``;
    names without a trailing ``_<int>`` pass through.
    """
    out = []
    for seg in segments:
        m = _TRAILING_INT.match(seg)
        if m:  # only the trailing index is dotted (matches torch naming)
            seg = m.group(1) + "." + m.group(2)
        out.append(seg)
    return ".".join(out)


@dataclass(frozen=True)
class LoRASite:
    """One adapted Linear/Conv — static metadata (hashable, jit-safe)."""

    module_path: Tuple[str, ...]  # flax path to the adapted module
    lora_name: str  # reference key, e.g. lora_unet_down_blocks_0_..._to_q
    kind: str  # "dense" | "conv"
    rank: int
    alpha: float
    in_dim: int
    out_dim: int
    kernel_size: Tuple[int, int] = (1, 1)

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def _classify_module(module_path: Tuple[str, ...]) -> Optional[Tuple[str, str, str]]:
    """Return (target_class, parent_dotted_name, child_name) for a module path
    that is a Linear/Conv child of a targetable diffusers class, else None."""
    if len(module_path) < 2:
        return None
    child = module_path[-1]
    parent_seg = module_path[-2]

    if parent_seg in ("attn1", "attn2", "attn", "attention") and child in _ATTENTION_CHILDREN:
        # "attn" is the MMDiT joint-attention module name (SD3/Flux); its
        # context-stream children (add_q_proj/..., to_add_out) are excluded
        # by the reference's 'add_' child skip (lora.py:227-228).
        # "attention" is the Stage-C AttnBlock's inner module (models/cascade.py)
        return "Attention", _dotted(module_path[:-1]), _dotted((child,))
    if parent_seg.startswith("resnets_") and child in _RESNET_CHILDREN:
        return "ResnetBlock2D", _dotted(module_path[:-1]), _dotted((child,))
    if parent_seg.startswith("downsamplers_") and child == "conv":
        return "Downsample2D", _dotted(module_path[:-1]), child
    if parent_seg.startswith("upsamplers_") and child == "conv":
        return "Upsample2D", _dotted(module_path[:-1]), child
    if parent_seg == "self_attn" and child in _CLIP_ATTN_CHILDREN:
        return "CLIPAttention", _dotted(module_path[:-1]), child
    if parent_seg == "SelfAttention" and child in ("q", "k", "v", "o"):
        return "T5Attention", _dotted(module_path[:-1]), child
    return None


def _passes_train_method(train_method: str, parent_name: str, child_name: str) -> bool:
    """Reference create_modules filters, lora.py:207-238."""
    if train_method in ("noxattn", "noxattn-hspace", "noxattn-hspace-last"):
        if "attn2" in parent_name or "time_embed" in parent_name:
            return False
    elif train_method == "innoxattn":
        if "attn2" in parent_name:
            return False
    elif train_method == "selfattn":
        if "attn1" not in parent_name:
            return False
    elif train_method in ("xattn", "xattn-strict"):
        if "attn2" not in parent_name:
            return False
    elif train_method == "t5attn":  # reference dora.py:242-244
        if "SelfAttention" not in parent_name:
            return False
    elif train_method == "full":
        pass
    else:
        raise NotImplementedError(f"train_method: {train_method} is not implemented.")

    if "add_" in child_name:
        return False
    if train_method == "xattn-strict" and "out" in child_name:
        return False
    if train_method == "noxattn-hspace" and "mid_block" not in parent_name:
        return False
    if train_method == "noxattn-hspace-last":
        if "mid_block" not in parent_name or ".1" not in parent_name or "conv2" not in child_name:
            return False
    return True


def _iter_kernel_paths(params) -> List[Tuple[Tuple[str, ...], jnp.ndarray]]:
    out = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for keypath, leaf in flat:
        segs = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        if segs and segs[-1] == "kernel":
            out.append((segs[:-1], leaf))
    return out


def create_sites(
    unet_params,
    rank: int = 4,
    alpha: float = 1.0,
    target_replace: Sequence[str] = DEFAULT_TARGET_REPLACE,
    prefix: str = LORA_PREFIX_UNET,
    train_method: str = "full",
    name_path_prefix: Sequence[str] = (),
    delimiter: str = "_",
) -> List[LoRASite]:
    """Walk a flax param tree and emit LoRA sites — reference create_modules
    semantics (lora.py:194-251) over param paths instead of named_modules.

    ``DownBlock2D``/``UpBlock2D`` entries in ``target_replace`` add only
    modules already matched via ResnetBlock2D/Downsample2D/Upsample2D (the
    reference dedups these by name, lora.py:247-249), so they need no extra
    handling here.
    """
    targets = set(target_replace)
    if "DownBlock2D" in targets or "UpBlock2D" in targets:
        targets.update(("ResnetBlock2D", "Downsample2D", "Upsample2D"))

    sites: List[LoRASite] = []
    seen = set()
    for module_path, kernel in _iter_kernel_paths(unet_params):
        info = _classify_module(module_path)
        if info is None:
            continue
        target_class, parent_name, child_name = info
        if target_class not in targets:
            continue
        if not _passes_train_method(train_method, parent_name, child_name):
            continue

        # name_path_prefix restores torch-module-path segments that the flax
        # tree doesn't carry (e.g. CLIP's "text_model.encoder" wrapper, so
        # text-encoder keys read lora_te1_text_model_encoder_layers_0_...).
        # The reference builds "prefix.module.path" then replaces "." with the
        # delimiter (lora.py:239-240) — "_" for UNet/CLIP, "-" for SD3/Flux.
        dotted_name = _dotted(tuple(name_path_prefix) + module_path)
        lora_name = (prefix + "." + dotted_name).replace(".", delimiter)
        if lora_name in seen:
            continue
        seen.add(lora_name)

        if kernel.ndim == 2:  # Dense [in, out]
            in_dim, out_dim = int(kernel.shape[0]), int(kernel.shape[1])
            sites.append(
                LoRASite(module_path, lora_name, "dense", rank, alpha, in_dim, out_dim)
            )
        elif kernel.ndim == 4:  # Conv [kh, kw, in, out]
            kh, kw, in_dim, out_dim = (int(s) for s in kernel.shape)
            r = min(rank, in_dim, out_dim)  # reference lora.py:104-106
            sites.append(
                LoRASite(module_path, lora_name, "conv", r, alpha, in_dim, out_dim, (kh, kw))
            )
    return sites


# ---------------------------------------------------------------------------
# params: init / merge / export
# ---------------------------------------------------------------------------


def init_lora_params(key: jax.Array, sites: Sequence[LoRASite], dtype=jnp.float32) -> Dict:
    """kaiming_uniform(a=1) down, zeros up — reference lora.py:122-124.

    torch kaiming_uniform(a=1) bound = sqrt(3 / fan_in); fan_in is the
    torch-layout weight fan-in: ``in`` for Linear, ``in·kh·kw`` for Conv.
    """
    params = {}
    keys = jax.random.split(key, max(len(sites), 1))
    for site, k in zip(sites, keys):
        if site.kind == "dense":
            fan_in = site.in_dim
            down_shape = (site.in_dim, site.rank)
            up_shape = (site.rank, site.out_dim)
        else:
            kh, kw = site.kernel_size
            fan_in = site.in_dim * kh * kw
            down_shape = (kh, kw, site.in_dim, site.rank)
            up_shape = (1, 1, site.rank, site.out_dim)
        bound = (3.0 / fan_in) ** 0.5
        params[site.lora_name] = {
            "down": jax.random.uniform(k, down_shape, dtype, minval=-bound, maxval=bound),
            "up": jnp.zeros(up_shape, dtype),
        }
    return params


def _tree_at(tree, path):
    for seg in path:
        tree = tree[seg]
    return tree


def _delta_kernel(site: LoRASite, leaf: Dict) -> jnp.ndarray:
    """(α/r)·(up∘down) in the base kernel's layout."""
    down, up = leaf["down"], leaf["up"]
    if site.kind == "dense":
        delta = down @ up  # [in, r] @ [r, out]
    else:
        # conv-down (kh,kw,in,r) followed by 1x1 conv-up (r,out) composes to a
        # single conv kernel: einsum over rank.
        delta = jnp.einsum("hwir,ro->hwio", down, up[0, 0])
    return delta * site.scale


def lora_overlay(sites: Sequence[LoRASite], lora_params: Dict, row_scale, adapter_idx=None):
    """Apply-time adapter overlay with a PER-ROW slider multiplier.

    Returns a flax ``intercept_methods`` context: inside it, every adapted
    module's output becomes ``org(x) + row_scale·(α/r)·up(down(x))`` — the
    reference's forward-hook formula (lora.py:134-138) — where ``row_scale``
    is a [B] vector broadcast over the output's trailing dims. Rows with
    scale 0 are exactly the slider-off model, so one batched call can carry
    teacher (off) and student (on) rows against a SINGLE weight stream —
    the graph-level fusion ``ESDConfig.fuse_teacher_student`` uses.

    ``adapter_idx`` switches to the HETEROGENEOUS-adapter path
    (S-LoRA/punica-style): ``lora_params`` leaves then carry a stacked
    leading adapter axis (built by :func:`stack_adapters`) and
    ``adapter_idx`` is a [B] int vector routing each row through ITS OWN
    adapter — rows serving different sliders share one batched call against
    a single base-weight stream. The per-adapter α/r gain is already folded
    into the stacked up factors, so this path applies NO ``site.scale``.

    Equivalent to :func:`merge_lora_params` for uniform scales
    (tests/test_lora_overlay.py); conv sites use the base conv's own
    stride/padding for the down conv (reference lora.py:108-114).
    """
    import flax.linen as nn

    by_path = {s.module_path: s for s in sites}
    row_scale = jnp.asarray(row_scale)
    if adapter_idx is not None:
        adapter_idx = jnp.asarray(adapter_idx)

    def _conv_geometry(mod):
        strides = mod.strides if mod.strides is not None else (1, 1)
        if isinstance(strides, int):
            strides = (strides, strides)
        padding = mod.padding
        if isinstance(padding, int):
            padding = ((padding, padding), (padding, padding))
        return strides, padding

    def interceptor(next_fun, args, kwargs, context):
        out = next_fun(*args, **kwargs)
        if context.method_name != "__call__":
            return out
        site = by_path.get(tuple(context.module.path))
        if site is None:
            return out
        leaf = lora_params[site.lora_name]
        x = args[0]
        down = leaf["down"].astype(jnp.float32)
        up = leaf["up"].astype(jnp.float32)
        if adapter_idx is not None:
            # per-row adapter routing: gather each row's own factors from the
            # stacked [S, ...] arrays (rank-r MBs — the gather is trivial next
            # to the base matmul's weight stream)
            dg = jnp.take(down, adapter_idx, axis=0)
            ug = jnp.take(up, adapter_idx, axis=0)
            if site.kind == "dense":
                h = jnp.einsum("b...i,bir->b...r", x.astype(jnp.float32), dg)
                lora_out = jnp.einsum("b...r,bro->b...o", h, ug)
            else:
                strides, padding = _conv_geometry(context.module)

                def one(xb, kd, ku):
                    hb = jax.lax.conv_general_dilated(
                        xb[None], kd, window_strides=strides, padding=padding,
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                    return jax.lax.conv_general_dilated(
                        hb, ku, window_strides=(1, 1), padding="VALID",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )[0]

                lora_out = jax.vmap(one)(x.astype(jnp.float32), dg, ug)
            gain = 1.0  # α/r folded into the stacked up factors (stack_adapters)
        elif site.kind == "dense":
            lora_out = (x.astype(jnp.float32) @ down) @ up
            gain = site.scale
        else:
            strides, padding = _conv_geometry(context.module)
            h = jax.lax.conv_general_dilated(
                x.astype(jnp.float32),
                down,
                window_strides=strides,
                padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            lora_out = jax.lax.conv_general_dilated(
                h,
                up,
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            gain = site.scale
        scale = row_scale.reshape((-1,) + (1,) * (out.ndim - 1)).astype(jnp.float32)
        return out + (scale * gain * lora_out).astype(out.dtype)

    return nn.intercept_methods(interceptor)


def sites_stack_compatible(a: Sequence[LoRASite], b: Sequence[LoRASite]) -> bool:
    """True when two adapters target the SAME module set with the same
    kind/dims — the precondition for stacking them into one batched call
    (ranks and alphas may differ; :func:`stack_adapters` pads/folds those)."""
    if len(a) != len(b):
        return False
    return all(
        sa.module_path == sb.module_path
        and sa.kind == sb.kind
        and sa.in_dim == sb.in_dim
        and sa.out_dim == sb.out_dim
        and sa.kernel_size == sb.kernel_size
        for sa, sb in zip(a, b)
    )


def stack_adapters(entries: Sequence[Tuple[Sequence[LoRASite], Dict]], pad_to: int = 0):
    """Stack S compatible adapters into per-site ``[S, ...]`` factor arrays
    for per-row adapter routing (``lora_overlay(..., adapter_idx=...)``) —
    the S-LoRA/punica idea rebuilt for XLA: heterogeneous requests batch into
    ONE sampler call, each row gathering its own rank-r factors while the
    base weights stream once.

    ``entries`` is a sequence of ``(sites, lora_params)`` pairs whose site
    lists must be pairwise :func:`sites_stack_compatible`. Differing ranks
    zero-pad to the max (exact — zero rank columns are no-ops) and each
    adapter's own α/r gain folds into its up factor, so the indexed overlay
    applies no ``site.scale``. ``pad_to > S`` appends all-zero adapters
    (identity rows) so the stacked shapes land on a bucket and at most a few
    executables ever compile.

    Returns ``(ref_sites, stacked_params)``; ``ref_sites`` is the first
    entry's site list (module routing only — its alpha/rank are NOT applied).
    """
    if not entries:
        raise ValueError("stack_adapters needs at least one adapter")
    ref_sites = list(entries[0][0])
    for sites_i, _ in entries[1:]:
        if not sites_stack_compatible(ref_sites, sites_i):
            raise ValueError(
                "adapters target different module sets/dims — serve them in "
                "separate groups (sites_stack_compatible is the precondition)"
            )
    S = max(len(entries), pad_to)
    stacked: Dict = {}
    for j, ref in enumerate(ref_sites):
        r_max = max(int(e[0][j].rank) for e in entries)
        downs, ups = [], []
        for sites_i, params_i in entries:
            site = sites_i[j]
            leaf = params_i[site.lora_name]
            down = jnp.asarray(leaf["down"], jnp.float32)
            up = jnp.asarray(leaf["up"], jnp.float32) * site.scale  # fold α/r
            pad = r_max - int(site.rank)
            if pad:
                # rank axis: last for down ([in,r] / [kh,kw,in,r]), first/third
                # for up ([r,out] / [1,1,r,out])
                down = jnp.pad(down, [(0, 0)] * (down.ndim - 1) + [(0, pad)])
                up_pad = [(0, 0)] * up.ndim
                up_pad[-2] = (0, pad)
                up = jnp.pad(up, up_pad)
            downs.append(down)
            ups.append(up)
        while len(downs) < S:  # zero adapters: exact no-op rows
            downs.append(jnp.zeros_like(downs[0]))
            ups.append(jnp.zeros_like(ups[0]))
        stacked[ref.lora_name] = {"down": jnp.stack(downs), "up": jnp.stack(ups)}
    return ref_sites, stacked


def merge_lora_params(base_params, sites: Sequence[LoRASite], lora_params: Dict, multiplier):
    """Return a param tree with ``W + multiplier·(α/r)·up∘down`` at each site.

    ``multiplier`` may be a traced scalar (the slider scale). Matches the
    reference forward ``org(x) + up(down(x))·mult·scale`` (lora.py:134-138)
    exactly for Linear and for Conv (conv∘1x1-conv == conv with composed
    kernel, same stride/padding as the base conv — reference lora.py:108-114
    gives the down-conv the base conv's stride/padding).
    """
    merged = base_params
    for site in sites:
        leaf = lora_params[site.lora_name]
        path = site.module_path + ("kernel",)
        kernel = _tree_at(base_params, path)
        if jnp.issubdtype(jnp.asarray(kernel).dtype, jnp.integer):
            # an int8 (quantized) base cannot hold a merged delta — the
            # astype below would TRUNCATE it silently; quantized bases must
            # go through the apply-time overlay instead (trace-time check)
            raise ValueError(
                f"cannot merge LoRA into integer (quantized) kernel at "
                f"{'/'.join(site.module_path)} — use the apply-time overlay "
                "(student_overlay / lora_overlay) over a quantized base"
            )

        def apply_at(tree, path, delta):
            seg, rest = path[0], path[1:]
            new = dict(tree)
            if rest:
                new[seg] = apply_at(tree[seg], rest, delta)
            else:
                new[seg] = tree[seg] + (multiplier * delta).astype(tree[seg].dtype)
            return new

        merged = apply_at(merged, path, _delta_kernel(site, leaf))
    return merged


# ---------------------------------------------------------------------------
# checkpoint I/O — exact reference key schema
# ---------------------------------------------------------------------------


def state_dict_numpy(sites: Sequence[LoRASite], lora_params: Dict, dtype=np.float32) -> Dict[str, np.ndarray]:
    """torch-layout state dict: reference lora.py:264-291 key/layout schema."""
    out = {}
    for site in sites:
        leaf = lora_params[site.lora_name]
        down = np.asarray(jax.device_get(leaf["down"]), dtype=dtype)
        up = np.asarray(jax.device_get(leaf["up"]), dtype=dtype)
        if site.kind == "dense":
            down_t = down.T  # [r, in]
            up_t = up.T  # [out, r]
        else:
            down_t = down.transpose(3, 2, 0, 1)  # [r, in, kh, kw]
            up_t = up.transpose(3, 2, 0, 1)  # [out, r, 1, 1]
        # safetensors serializes the raw buffer — transposed *views* must be
        # materialized or the data lands scrambled
        out[f"{site.lora_name}.lora_down.weight"] = np.ascontiguousarray(down_t)
        out[f"{site.lora_name}.lora_up.weight"] = np.ascontiguousarray(up_t)
        out[f"{site.lora_name}.alpha"] = np.asarray(site.alpha, dtype=dtype)
    return out


def save_weights(path: str, sites: Sequence[LoRASite], lora_params: Dict, dtype=np.float32, metadata=None):
    """Reference lora.py:274-291 — .safetensors or torch-pickle .pt."""
    sd = state_dict_numpy(sites, lora_params, dtype=dtype)
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import save_file

        save_file(sd, str(path), metadata)
    else:
        import torch

        torch.save({k: _numpy_to_torch(v) for k, v in sd.items()}, str(path))


def _numpy_to_torch(v):
    # torch.from_numpy rejects ml_dtypes bfloat16 arrays; reinterpret the raw
    # buffer as uint16 and view it back as torch.bfloat16 (bit-identical).
    import torch

    a = np.ascontiguousarray(v)
    if a.dtype == jnp.bfloat16:
        return torch.from_numpy(a.view(np.uint16)).view(torch.bfloat16)
    return torch.from_numpy(a)


def load_weights(path: str, sites: Sequence[LoRASite], dtype=jnp.float32) -> Dict:
    """Load a reference-schema checkpoint into the flax-layout overlay tree."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = {k: np.asarray(v) for k, v in load_file(str(path)).items()}
    else:
        import torch

        sd = {k: v.detach().cpu().float().numpy() for k, v in torch.load(str(path), weights_only=True).items()}
    return load_weights_from_tensors(sd, sites, dtype=dtype)


def load_weights_from_tensors(
    sd: Dict[str, np.ndarray], sites: Sequence[LoRASite], dtype=jnp.float32
) -> Dict:
    """Same as :func:`load_weights` but from an in-memory reference-schema
    dict (e.g. one part of a combined slider file split by
    ``adapters/slider_file.py``)."""
    params = {}
    for site in sites:
        down_t = sd[f"{site.lora_name}.lora_down.weight"]
        up_t = sd[f"{site.lora_name}.lora_up.weight"]
        if site.kind == "dense":
            down = down_t.T
            up = up_t.T
        else:
            down = down_t.transpose(2, 3, 1, 0)  # [kh, kw, in, r]
            up = up_t.transpose(2, 3, 1, 0)  # [1, 1, r, out]
        params[site.lora_name] = {
            "down": jnp.asarray(down, dtype),
            "up": jnp.asarray(up, dtype),
        }
    return params


def filter_sites_to_checkpoint(path: str, sites: Sequence[LoRASite]) -> List[LoRASite]:
    """Keep only sites whose factors exist in the checkpoint — makes
    inference robust to the reference's filename-sniffed train_method /
    network_type guesses (generate_images_xl.py:459-484) being broader than
    what was actually trained."""
    if str(path).endswith(".safetensors"):
        from safetensors import safe_open

        with safe_open(str(path), framework="numpy") as f:
            keys = set(f.keys())
    else:
        import torch

        keys = set(torch.load(str(path), weights_only=True).keys())
    return filter_sites_to_keys(keys, sites)


def filter_sites_to_keys(keys, sites: Sequence[LoRASite]) -> List[LoRASite]:
    """:func:`filter_sites_to_checkpoint` over an in-memory key set."""
    return [s for s in sites if f"{s.lora_name}.lora_down.weight" in set(keys)]


def sites_alpha_from_checkpoint(path: str) -> Dict[str, float]:
    """Read per-site alpha values from a checkpoint (for rank/alpha inference
    at inference time, reference generate_images_xl.py:459-484). Accepts both
    checkpoint formats save_weights emits (.safetensors / torch-pickle)."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(str(path))
    else:
        import torch

        # .detach().cpu().float(): torch bf16 tensors raise TypeError under
        # .numpy(); only scalar alphas are needed so filter before converting
        sd = {
            k: v.detach().cpu().float().numpy()
            for k, v in torch.load(str(path), weights_only=True).items()
            if k.endswith(".alpha")
        }
    return {
        k[: -len(".alpha")]: float(np.asarray(v).reshape(()))
        for k, v in sd.items()
        if k.endswith(".alpha")
    }
