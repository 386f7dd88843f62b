"""Split multi-part slider files and apply text-encoder slider parts.

Closes the notrigger pipeline loop IN-framework: the reference trains
text-encoder sliders (``conceptmod/notrigger/train_notrigger.py:184-196``,
prefixes ``lora_te1``/``lora_te2``) and merges them with a UNet/transformer
slider into one file (``combine_loras.py:26-62``) whose consumption it then
delegates to external diffusers/PEFT loaders. Here the same artifacts load
back into OUR CLIP/T5 encoders so `generate_images_*` / `serve` apply them
at sampling time.

Key formats recognized (all may coexist in one file):

* raw UNet/transformer slider — ``lora_unet<d><path>.lora_down.weight`` with
  delimiter ``d`` ``_`` (SD1/XL) or ``-`` (SD3/Flux), as written by
  ``adapters/lora.save_weights`` (reference ``lora.py:239-240``);
* raw notrigger text-encoder slider — ``lora_te1_…`` / ``lora_te2_…``
  (reference ``train_notrigger.py:184-196``);
* combined-file parts (reference ``combine_loras.py:26-44`` renames):
  ``transformer.<dotted>.lora_A/lora_B`` ← ``lora_unet-…`` with
  ``_down→_A``/``_up→_B``; ``lora_te3_…`` ← the second encoder's
  ``lora_te2_…`` (CLIP te2 for SDXL, T5 for Flux) — both are mapped BACK to
  canonical internal keys here, so one loader serves raw and combined files.

Combined-file strengths: the reference combiner folds the per-part strength
into the ``_down``/``_A`` factors (``combine_loras.py:57-60``), so a split
part needs no extra scaling — the runtime slider multiplier composes on top.

Text-encoder parts have no ``start_noise`` gating: prompt embeddings are
computed once per trajectory, so the slider multiplier applies to the
ENCODE, uniformly over all denoise steps (this mirrors how diffusers/PEFT
applies text-encoder LoRA strength when loading a combined file). The empty
(unconditional) prompt is also encoded through the merged encoder — that is
the notrigger mechanism itself: the slider makes the empty prompt drift
toward the concept (reference ``train_notrigger.py:296-334``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from sliders_conceptmod_tpu.adapters import lora as lora_lib

# torch-module-path segments absent from the flax param tree (see
# cli/train_notrigger.py): CLIP keys read lora_teN_text_model_encoder_…,
# T5 keys read lora_te2_encoder_block_…
CLIP_NAME_PATH_PREFIX = ("text_model", "encoder")
T5_NAME_PATH_PREFIX = ("encoder",)

_SUFFIXES = (".lora_down.weight", ".lora_up.weight", ".alpha", ".dora_scale")
_PEFT_TO_CANON = {
    ".lora_A.weight": ".lora_down.weight",
    ".lora_B.weight": ".lora_up.weight",
    ".alpha": ".alpha",
    ".dora_scale": ".dora_scale",
}


def read_tensors(path: str) -> Dict[str, np.ndarray]:
    """safetensors / torch-pickle checkpoint → numpy dict (fp32)."""
    p = str(path)
    if p.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return {k: np.asarray(v) for k, v in load_file(p).items()}
    import torch

    data = torch.load(p, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().float().numpy() for k, v in data.items()}


def _split_suffix(key: str, table=_PEFT_TO_CANON) -> Optional[Tuple[str, str]]:
    for suf, canon in table.items():
        if key.endswith(suf):
            return key[: -len(suf)], canon
    return None


def split_parts(sd: Dict[str, np.ndarray]) -> Dict[str, Dict[str, np.ndarray]]:
    """Split a slider state dict into canonical-keyed parts.

    Returns ``{"unet": {...}, "te1": {...}, "te2": {...}}`` — every part in
    the internal/reference schema (``lora_unet…``/``lora_te1_…``/
    ``lora_te2_…`` + ``.lora_down/.lora_up/.alpha/.dora_scale``). Empty
    parts are omitted. ``lora_te3_`` (combined-file second encoder,
    reference combine_loras.py:37-38) maps back to the ``te2`` slot.
    Unrecognized keys raise — silently dropping slider weights would
    generate wrong images with no signal.
    """
    parts: Dict[str, Dict[str, np.ndarray]] = {}

    def put(part: str, key: str, v):
        parts.setdefault(part, {})[key] = v

    for k, v in sd.items():
        if k.startswith("transformer."):
            # inverse of combine_loras.py:29-33 (lora_unet-…, _down→_A,
            # _up→_B, -→.): only '-'-delimited SD3/Flux unet keys survive
            # that rename, so '.' → '-' is the exact inverse
            rest = k[len("transformer."):]
            split = _split_suffix(rest)
            if split is None:
                raise ValueError(f"unrecognized slider key: {k!r}")
            module, canon = split
            put("unet", "lora_unet-" + module.replace(".", "-") + canon, v)
        elif k.startswith("lora_unet"):
            if not any(k.endswith(s) for s in _SUFFIXES):
                raise ValueError(f"unrecognized slider key: {k!r}")
            put("unet", k, v)
        elif k.startswith("lora_te1_"):
            put("te1", k, v)
        elif k.startswith("lora_te2_"):
            put("te2", k, v)
        elif k.startswith("lora_te3_"):
            # combined files: second encoder was renamed te2→te3
            put("te2", "lora_te2_" + k[len("lora_te3_"):], v)
        else:
            raise ValueError(f"unrecognized slider key: {k!r}")
    return parts


def infer_rank_alpha(part: Dict[str, np.ndarray]) -> Tuple[int, float]:
    """rank from a down factor's torch layout [r, in]; alpha from the first
    ``.alpha`` entry (default = rank → scale 1, matching reference
    generate_images_xl.py:459-484 fallbacks)."""
    rank = None
    alpha = None
    for k, v in part.items():
        if rank is None and k.endswith(".lora_down.weight"):
            rank = int(np.asarray(v).shape[0])
        if alpha is None and k.endswith(".alpha"):
            alpha = float(np.asarray(v).reshape(()))
    if rank is None:
        raise ValueError("slider part has no .lora_down.weight entries")
    return rank, float(rank if alpha is None else alpha)


def part_is_dora(part: Dict[str, np.ndarray]) -> bool:
    return any(k.endswith(".dora_scale") for k in part)


@dataclass
class TEPart:
    """A loaded text-encoder slider part, bound to one encoder's params."""

    index: int  # which text encoder (0 = te1, 1 = te2/T5)
    sites: List[lora_lib.LoRASite]
    lora_params: Dict
    peft: object  # adapters.lora or adapters.dora module

    def merged_params(self, base_params, multiplier):
        """base params with the slider folded in at ``multiplier`` —
        reference forward formula y = Wx + mult·(α/r)·up(down(x))."""
        return self.peft.merge_lora_params(base_params, self.sites, self.lora_params, multiplier)


def load_te_part(
    te_params,
    part: Dict[str, np.ndarray],
    index: int,
    is_t5: bool = False,
    dtype=None,
) -> TEPart:
    """Bind a ``lora_te{1,2}`` tensor part to a text encoder's param tree.

    Sites are recreated over the encoder params with the notrigger
    trainer's prefix/name-path rules and filtered to the keys present —
    robust to any train_method the part was trained with.
    """
    import jax.numpy as jnp

    rank, alpha = infer_rank_alpha(part)
    prefix = f"lora_te{index + 1}"
    if is_t5:
        target_replace: Sequence[str] = ["T5Attention"]
        name_path_prefix: Sequence[str] = T5_NAME_PATH_PREFIX
        train_method = "t5attn"
    else:
        target_replace = ["CLIPAttention", "CLIPSdpaAttention"]
        name_path_prefix = CLIP_NAME_PATH_PREFIX
        train_method = "full"

    dora = part_is_dora(part)
    if dora:
        from sliders_conceptmod_tpu.adapters import dora as peft_mod
    else:
        peft_mod = lora_lib

    sites = peft_mod.create_sites(
        te_params,
        rank=rank,
        alpha=alpha,
        target_replace=target_replace,
        prefix=prefix,
        train_method=train_method,
        name_path_prefix=name_path_prefix,
    )
    sites = lora_lib.filter_sites_to_keys(part.keys(), sites)
    if not sites:
        raise ValueError(
            f"no matching {prefix} keys between the text encoder and the slider part "
            f"(part keys e.g. {sorted(part)[:2]})"
        )
    # every checkpoint key must land on a created site — the same
    # no-silent-drop invariant split_parts enforces for unet keys: a te part
    # trained over modules these rules don't create (or a foreign suffix)
    # would otherwise apply PARTIALLY and generate wrong images with no
    # signal
    matched = {s.lora_name for s in sites}
    unmatched = sorted(k for k in part if k.rsplit(".", 2)[0] not in matched)
    if unmatched:
        raise ValueError(
            f"{len(unmatched)} {prefix} slider keys match no {train_method} site "
            f"over this text encoder (e.g. {unmatched[:3]}) — refusing to apply "
            "a partial text-encoder slider"
        )
    # per-site alpha exactness: reference checkpoints may carry per-site
    # alphas; rebuild sites with each one's own alpha when they differ
    alphas = {
        k[: -len(".alpha")]: float(np.asarray(v).reshape(()))
        for k, v in part.items()
        if k.endswith(".alpha")
    }
    sites = [
        lora_lib.LoRASite(
            s.module_path, s.lora_name, s.kind,
            s.rank, alphas.get(s.lora_name, s.alpha),
            s.in_dim, s.out_dim, s.kernel_size,
        )
        for s in sites
    ]
    kwargs = {"dtype": dtype} if dtype is not None else {}
    lora_params = peft_mod.load_weights_from_tensors(part, sites, **kwargs)
    return TEPart(index=index, sites=sites, lora_params=lora_params, peft=peft_mod)


@dataclass
class SliderParts:
    """All parts of one slider file, split and bound."""

    unet: Optional[Dict[str, np.ndarray]]  # canonical-key tensors (or None)
    te_parts: List[TEPart] = field(default_factory=list)

    @property
    def has_te(self) -> bool:
        return bool(self.te_parts)

    def merged_text_encoder_params(self, te_params_list: Sequence, multiplier) -> List:
        """Per-encoder param trees with every bound te part merged at
        ``multiplier`` (encoders without a part pass through untouched)."""
        out = list(te_params_list)
        for p in self.te_parts:
            out[p.index] = p.merged_params(out[p.index], multiplier)
        return out


def load_slider_file(
    path: str,
    text_encoder_params: Optional[Sequence] = None,
    te2_is_t5: bool = False,
    dtype=None,
) -> SliderParts:
    """Read + split a slider file; bind te parts to the given encoders.

    ``text_encoder_params`` — list of param trees (te1[, te2]). A file with
    te parts but no encoders passed raises: the caller would silently drop
    the text-encoder half of the slider otherwise.
    """
    parts = split_parts(read_tensors(path))
    te_parts: List[TEPart] = []
    for slot, index in (("te1", 0), ("te2", 1)):
        if slot not in parts:
            continue
        if text_encoder_params is None or index >= len(text_encoder_params):
            raise ValueError(
                f"slider file {path} carries a {slot} text-encoder part but the "
                f"caller provided no matching text encoder"
            )
        te_parts.append(
            load_te_part(
                text_encoder_params[index],
                parts[slot],
                index,
                is_t5=te2_is_t5 and index == 1,
                dtype=dtype,
            )
        )
    return SliderParts(unet=parts.get("unet"), te_parts=te_parts)
