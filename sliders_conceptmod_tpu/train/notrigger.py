"""notrigger: text-encoder-only sliders trained in embedding space.

Semantics-parity target: reference ``conceptmod/notrigger/train_notrigger.py``.
Trains LoRA/DoRA inside a CLIP text encoder so the *empty prompt* drifts
toward a positive concept at slider +1 and a negative concept at −1:

* two encoder copies — trainable (adapter-merged) and static
  (train_notrigger.py:96-182); static target embeddings are
  ``hidden_states[-1]`` of the positive/negative/neutral prompts (:244-277),
* +1 branch: encode "" with multiplier +1; loss is MSE toward the positive
  embedding when no negative exists, else ``fixed_distance_loss`` with the
  step-0 distance / 20 (:45-64,303-310); cosine-similarity regularizers pull
  the learned direction away from the negative direction (:315-325),
* −1 branch mirrors it (:335-362),
* when both signs train, the backward loss is the *normalized distance
  curriculum*: ``w_p·pperc + w_n·nperc + (1−w_r)·similarity`` where
  ``pperc = ‖pos − trainable_pos‖ / (distance1·20)`` (:400-439). Note the
  reference's ``scale_factor = 1+4(1−e^{−diff/.05})`` multiplies both the
  numerator and denominator of w_p/w_n and cancels exactly — the effective
  weights are ``balance/(balance_p+balance_n)``; reproduced faithfully,
* attribute stabilization exists but the reference hard-resets
  ``attributes = []`` (:270, SURVEY §2.4) — same default here,
* SGD + 100-step linear warmup then constant (:216-229), grad clip-value
  1.0 (:444), early exit when the reconstruction loss stalls (:389-393).

TPU-first: the trainable-encoder forwards at ±1 are two adapter merges of
one compiled encoder; the whole iteration is one jitted function. distance1/2
are computed once up front (a single extra jitted forward), not inside the
step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from sliders_conceptmod_tpu.adapters import lora as lora_lib

CLIP_TARGET_REPLACE = ["CLIPAttention", "CLIPSdpaAttention"]
SPLIT = 20  # reference train_notrigger.py:278 ``split = 20``


def fixed_distance_loss(trainable, target, fixed_distance):
    """Reference train_notrigger.py:45-64: move toward ``target`` by a
    clamped fixed distance along the difference direction. The reference does
    NOT detach the constructed target — gradients flow through direction and
    the clamp, and so do they here."""
    diff = target - trainable
    current = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    direction = diff / (current + 1e-8)
    clamped = jnp.clip(fixed_distance[..., None], -current, current)
    moved_target = trainable + direction * clamped
    return jnp.mean((trainable - moved_target) ** 2)


def _cos_map(a, b):
    """Elementwise pseudo-cosine — the reference applies
    ``F.cosine_similarity(v1.unsqueeze(0), v2.unsqueeze(0))`` which reduces
    over the *singleton* dim 1 (train_notrigger.py:319-321), degenerating to
    an elementwise sign-agreement map (a·b)/max(|a|·|b|, 1e-8). Reproduced
    verbatim rather than "fixed" to a vector cosine."""
    return (a * b) / jnp.maximum(jnp.abs(a) * jnp.abs(b), 1e-8)


def _cos_terms(v1, v2, v1r):
    diff_term = jnp.abs(jnp.mean(_cos_map(v1, v2) - _cos_map(v1r, v2)))
    mean_term = jnp.mean(_cos_map(v1, v2))
    return diff_term + mean_term


@dataclass(frozen=True)
class NoTriggerConfig:
    lambda_similarity: float = 0.1  # λp = λn (reference :279-280)
    has_positive: bool = True
    has_negative: bool = True
    # attribute stabilization λs = 5e-4/len(attributes) (reference :281-285).
    # NOTE: the reference hard-resets attributes=[] (:270, SURVEY §2.4) so
    # this path is dormant there; here it is functional when attribute
    # embeddings are provided. Applied every step (the reference's
    # stabilize_every periodicity is vacuous at its shipped setting).
    lambda_stabilize: float = 0.0


def make_notrigger_step(
    encode_hidden: Callable,  # (params, input_ids) -> hidden_states[-1]
    sites,
    optimizer,
    cfg: NoTriggerConfig,
    neutral_ids: jnp.ndarray,  # tokenized ""
    pos_target: Optional[jnp.ndarray],  # static hidden_states[-1] embeddings
    neg_target: Optional[jnp.ndarray],
    neutral_target: jnp.ndarray,
    distance1: Optional[jnp.ndarray],
    distance2: Optional[jnp.ndarray],
    merge_fn=None,
    attribute_ids: Optional[jnp.ndarray] = None,  # [A, S] tokenized attributes
    attribute_targets: Optional[jnp.ndarray] = None,  # [A, S, D] static embeds
):
    merge = merge_fn if merge_fn is not None else lora_lib.merge_lora_params
    λ = cfg.lambda_similarity
    both = cfg.has_positive and cfg.has_negative

    @jax.jit
    def step(base_params, lora_params, opt_state):
        def branch_embs(lp, multiplier):
            params = merge(base_params, sites, lp, multiplier)
            return encode_hidden(params, neutral_ids)

        def loss_fn(lp):
            metrics = {}
            ploss = nloss = similarity = jnp.asarray(0.0)
            pperc = nperc = jnp.asarray(0.0)

            if cfg.has_positive:
                tp = branch_embs(lp, 1.0)
                if not cfg.has_negative:
                    ploss = jnp.mean((pos_target - tp) ** 2)
                else:
                    ploss = fixed_distance_loss(tp, pos_target, distance1)
                    v1 = tp - neutral_target
                    v2 = neg_target - neutral_target
                    v1r = pos_target - neutral_target
                    preg = _cos_terms(v1, v2, v1r)
                    preg += 1.0 / (jnp.mean((tp - neg_target) ** 2) + 1e-8)
                    similarity = similarity + λ * preg
                pperc = jnp.linalg.norm(pos_target - tp) / (distance1 * SPLIT) if cfg.has_negative else jnp.asarray(0.0)
                metrics["pdist"] = jnp.linalg.norm(pos_target - tp)

            if cfg.has_negative:
                tn = branch_embs(lp, -1.0)
                if not cfg.has_positive:
                    nloss = jnp.mean((neg_target - tn) ** 2)
                else:
                    nloss = fixed_distance_loss(tn, neg_target, distance2)
                    v1 = tn - neutral_target
                    v2 = pos_target - neutral_target
                    v1r = neg_target - neutral_target
                    nreg = _cos_terms(v1, v2, v1r)
                    nreg += 1.0 / (jnp.mean((tn - pos_target) ** 2) + 1e-8)
                    similarity = similarity + λ * nreg
                nperc = jnp.linalg.norm(neg_target - tn) / (distance2 * SPLIT) if cfg.has_positive else jnp.asarray(0.0)
                metrics["ndist"] = jnp.linalg.norm(neg_target - tn)

            if attribute_ids is not None and cfg.lambda_stabilize > 0:
                # attribute stabilization: Σ‖enc_trainable(attr) − static‖₂
                # at multiplier +1 (reference :327-331)
                attr_params = merge(base_params, sites, lp, 1.0)
                attr_embs = encode_hidden(attr_params, attribute_ids)
                stab = jnp.sqrt(jnp.sum((attr_embs - attribute_targets) ** 2))
                metrics["stabilize"] = stab
                similarity = similarity + cfg.lambda_stabilize * stab

            if both:
                # normalized-distance curriculum (reference :420-439; the
                # scale_factor cancels in w_p/w_n)
                denom = pperc + nperc + 1e-12
                w_p = pperc / denom
                w_n = nperc / denom
                w_r = jnp.minimum(0.95, (pperc + nperc) / 2)
                loss = w_p * pperc + w_n * nperc
                total = loss + (1.0 - w_r) * similarity
                metrics.update({"w_p": w_p, "w_n": w_n, "w_r": w_r})
            elif cfg.has_positive:
                loss = ploss
                total = ploss
            else:
                loss = nloss
                total = nloss
            metrics.update({"loss": loss, "similarity": similarity})
            return total, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(lora_params)
        updates, opt_state = optimizer.update(grads, opt_state, lora_params)
        lora_params = optax.apply_updates(lora_params, updates)
        return lora_params, opt_state, metrics

    return step


def initial_distances(encode_hidden, base_params, sites, lora_params, neutral_ids, pos_target, neg_target, merge_fn=None):
    """Step-0 anchor distances ``‖target − trainable‖ / 20`` (reference
    :303-305,343-345)."""
    merge = merge_fn if merge_fn is not None else lora_lib.merge_lora_params
    d1 = d2 = None
    if pos_target is not None:
        tp = encode_hidden(merge(base_params, sites, lora_params, 1.0), neutral_ids)
        d1 = jnp.linalg.norm(pos_target - tp) / SPLIT
    if neg_target is not None:
        tn = encode_hidden(merge(base_params, sites, lora_params, -1.0), neutral_ids)
        d2 = jnp.linalg.norm(neg_target - tn) / SPLIT
    return d1, d2
