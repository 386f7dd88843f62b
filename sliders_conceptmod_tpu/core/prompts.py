"""Prompt schema + the 5-prompt ESD slider loss.

Semantics parity target: reference ``conceptmod/textsliders/prompt_util.py``:
* ``PromptSettings`` defaulting rules (:63-88): positive←target,
  unconditional←"", neutral←unconditional,
* attribute fan-out (:177-201): each attribute is prefixed (``f"{att} {p}"``)
  onto all five prompts, multiplying the settings list,
* the ESD epsilon-matching loss (:134-161):
    erase:   MSE(target, neutral - g * (positive - negative))
    enhance: MSE(target, neutral + g * (positive - negative))
  The 4-prompt upstream variant (trainscripts/imagesliders/prompt_util.py:113-134)
  is recovered by passing negative=unconditional.

TPU-first design: embeddings live in stacked arrays so a whole bank of prompt
pairs can be indexed with a traced integer inside a jitted train step
(``jnp.take`` along a leading pair axis) instead of Python-side dict lookups.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass
from typing import Dict, List, Literal, Optional

import jax
import jax.numpy as jnp
import yaml
from pydantic import BaseModel, model_validator

ACTION_TYPES = Literal["erase", "enhance"]


class PromptSettings(BaseModel):
    """One slider concept spec — YAML-parity with reference prompt_util.py:63-88."""

    target: str
    positive: Optional[str] = None  # if None, target is used
    negative: Optional[str] = None  # 5th prompt (fork extension); None → unconditional
    unconditional: str = ""
    neutral: Optional[str] = None  # if None, unconditional is used
    action: ACTION_TYPES = "erase"
    guidance_scale: float = 1.0
    resolution: int = 512
    dynamic_resolution: bool = False
    batch_size: int = 1
    dynamic_crops: bool = False  # only used for XL

    @model_validator(mode="before")
    @classmethod
    def fill_prompts(cls, values):
        keys = values.keys()
        if "target" not in keys:
            raise ValueError("target must be specified")
        if "positive" not in keys or values.get("positive") is None:
            values["positive"] = values["target"]
        if "unconditional" not in keys or values.get("unconditional") is None:
            values["unconditional"] = ""
        if "neutral" not in keys or values.get("neutral") is None:
            values["neutral"] = values["unconditional"]
        # fork extension: 5th prompt defaults to unconditional, making the
        # 5-prompt loss collapse to the upstream 4-prompt one.
        if "negative" not in keys or values.get("negative") is None:
            values["negative"] = values["unconditional"]
        return values


def load_prompts_from_yaml(path, attributes: Optional[List[str]] = None) -> List[PromptSettings]:
    """Reference prompt_util.py:177-201 incl. attribute fan-out."""
    attributes = attributes or []
    with open(path, "r") as f:
        prompts = yaml.safe_load(f)
    if not prompts:
        raise ValueError("prompts file is empty")
    if attributes:
        newprompts = []
        for prompt in prompts:
            # validate first so the defaulted fields exist before prefixing —
            # the reference prefixes raw dict entries and crashes when a yaml
            # omits a key; we fan out over the *defaulted* settings instead.
            base = PromptSettings(**prompt).model_dump()
            for att in attributes:
                copy_ = copy.deepcopy(base)
                for k in ("target", "positive", "neutral", "negative", "unconditional"):
                    copy_[k] = att + " " + copy_[k]
                newprompts.append(copy_)
        return [PromptSettings(**p) for p in newprompts]
    return [PromptSettings(**copy.deepcopy(p)) for p in prompts]


# ---------------------------------------------------------------------------
# Embedding containers
# ---------------------------------------------------------------------------

PROMPT_ROLES = ("target", "positive", "negative", "unconditional", "neutral")


@dataclass
class PromptEmbeds:
    """Encoded prompt: SD1/2 carry text_embeds only; XL adds pooled_embeds.

    Mirrors reference PromptEmbedsXL (prompt_util.py:18-24) but is a pytree
    (both fields are jnp arrays or None) so it can flow through jit.
    """

    text_embeds: jnp.ndarray
    pooled_embeds: Optional[jnp.ndarray] = None


class PromptEmbedsCache:
    """Keyed by prompt string — reference prompt_util.py:50-61."""

    def __init__(self):
        self.prompts: Dict[str, PromptEmbeds] = {}

    def __setitem__(self, name: str, value: PromptEmbeds) -> None:
        self.prompts[name] = value

    def __getitem__(self, name: str) -> Optional[PromptEmbeds]:
        return self.prompts.get(name)


@dataclass
class PromptEmbedsPair:
    """The five embeddings + loss settings for one slider concept.

    Reference prompt_util.py:91-174. ``loss`` computes the ESD target in
    fp32 regardless of compute dtype (loss accuracy matters more than speed
    on a [B,4,H,W] elementwise op).
    """

    target: PromptEmbeds
    positive: PromptEmbeds
    unconditional: PromptEmbeds
    neutral: PromptEmbeds
    negative: PromptEmbeds

    guidance_scale: float = 1.0
    resolution: int = 512
    dynamic_resolution: bool = False
    batch_size: int = 1
    dynamic_crops: bool = False
    action: str = "erase"

    settings: Optional[PromptSettings] = None

    @classmethod
    def from_settings(cls, cache: PromptEmbedsCache, settings: PromptSettings) -> "PromptEmbedsPair":
        return cls(
            target=cache[settings.target],
            positive=cache[settings.positive],
            unconditional=cache[settings.unconditional],
            neutral=cache[settings.neutral],
            negative=cache[settings.negative],
            guidance_scale=settings.guidance_scale,
            resolution=settings.resolution,
            dynamic_resolution=settings.dynamic_resolution,
            batch_size=settings.batch_size,
            dynamic_crops=settings.dynamic_crops,
            action=settings.action,
            settings=settings,
        )

    def embeddings(self):
        return [self.target, self.positive, self.negative, self.unconditional, self.neutral]


def esd_loss_target(
    positive_latents: jnp.ndarray,
    neutral_latents: jnp.ndarray,
    negative_latents: jnp.ndarray,
    guidance_scale: jnp.ndarray | float,
    action_sign: jnp.ndarray | float,
) -> jnp.ndarray:
    """The regression target ``neutral ± g * (positive - negative)``.

    ``action_sign`` is -1.0 for "erase", +1.0 for "enhance" (reference
    prompt_util.py:134-161) — a traced scalar so erase/enhance share one
    compiled step.
    """
    return neutral_latents + action_sign * guidance_scale * (positive_latents - negative_latents)


def esd_loss(
    target_latents: jnp.ndarray,
    positive_latents: jnp.ndarray,
    neutral_latents: jnp.ndarray,
    negative_latents: jnp.ndarray,
    guidance_scale: jnp.ndarray | float,
    action_sign: jnp.ndarray | float,
) -> jnp.ndarray:
    """MSE against the ESD target, computed in fp32."""
    tgt = esd_loss_target(
        positive_latents.astype(jnp.float32),
        neutral_latents.astype(jnp.float32),
        negative_latents.astype(jnp.float32),
        guidance_scale,
        action_sign,
    )
    diff = target_latents.astype(jnp.float32) - jax.lax.stop_gradient(tgt)
    return jnp.mean(diff * diff)


def action_sign(action: str) -> float:
    if action == "erase":
        return -1.0
    if action == "enhance":
        return 1.0
    raise ValueError("action must be erase or enhance")
