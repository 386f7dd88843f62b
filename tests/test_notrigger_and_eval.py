"""notrigger training math + eval model (CLIP vision / LPIPS) smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
from sliders_conceptmod_tpu.train import notrigger as nt
from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer


def test_fixed_distance_loss_matches_reference_formula():
    """loss = mean((direction·clamped)²) with grads through everything
    (reference train_notrigger.py:45-64)."""
    key = jax.random.PRNGKey(0)
    trainable = jax.random.normal(key, (1, 8, 16))
    target = trainable + 2.0  # distance along all-ones direction
    fixed = jnp.asarray(0.5)
    loss = nt.fixed_distance_loss(trainable, target, fixed)
    # direction is unit; target moved 0.5 along it; per-element diff =
    # 0.5/sqrt(16) -> loss = (0.5/4)^2
    np.testing.assert_allclose(float(loss), (0.5 / 4) ** 2, rtol=1e-5)
    g = jax.grad(lambda t: nt.fixed_distance_loss(t, target, fixed))(trainable)
    assert np.isfinite(np.asarray(g)).all()


def test_cos_map_is_elementwise_sign_agreement():
    """The reference's cosine_similarity over a singleton dim degenerates to
    elementwise sign agreement (train_notrigger.py:319-321)."""
    a = jnp.asarray([1.0, -2.0, 3.0])
    b = jnp.asarray([2.0, 1.0, -3.0])
    np.testing.assert_allclose(np.asarray(nt._cos_map(a, b)), [1.0, -1.0, -1.0], atol=1e-6)


def test_notrigger_step_decreases_distance():
    cfg = CLIPTextConfig.tiny(hidden_size=16)
    model = CLIPTextEncoder(cfg)
    neutral_ids = jnp.zeros((1, 8), jnp.int32).at[0, 0].set(5)
    params = model.init(jax.random.PRNGKey(0), neutral_ids)["params"]

    def encode_hidden(p, ids):
        return model.apply({"params": p}, ids).hidden_states[-1]

    pos_ids = jnp.zeros((1, 8), jnp.int32).at[0, 0].set(7)
    neg_ids = jnp.zeros((1, 8), jnp.int32).at[0, 0].set(9)
    pos_target = encode_hidden(params, pos_ids)
    neg_target = encode_hidden(params, neg_ids)
    neutral_target = encode_hidden(params, neutral_ids)

    sites = lora_lib.create_sites(
        params, rank=2, target_replace=nt.CLIP_TARGET_REPLACE, prefix="lora_te1",
        name_path_prefix=("text_model", "encoder"),
    )
    assert sites and all("text_model_encoder_layers" in s.lora_name for s in sites)
    lp = lora_lib.init_lora_params(jax.random.PRNGKey(1), sites)

    opt = get_optimizer("sgd", get_lr_schedule("constant", 3e-2, 100), grad_clip_value=1.0)
    opt_state = opt.init(lp)
    d1, d2 = nt.initial_distances(encode_hidden, params, sites, lp, neutral_ids, pos_target, neg_target)
    step = nt.make_notrigger_step(
        encode_hidden, sites, opt,
        nt.NoTriggerConfig(lambda_similarity=0.0),
        neutral_ids, pos_target, neg_target, neutral_target, d1, d2,
    )

    first = None
    for i in range(10):
        lp, opt_state, metrics = step(params, lp, opt_state)
        if first is None:
            first = float(metrics["loss"])
    # curriculum loss starts at ~1.0 (w_p·1 + w_n·1 normalized) and must drop
    assert first == pytest.approx(1.0, abs=0.05)
    assert float(metrics["loss"]) < first


def test_clip_scorer_shapes():
    from sliders_conceptmod_tpu.models.clip_vision import CLIPScorer, CLIPVisionConfig

    vision_cfg = CLIPVisionConfig.tiny()
    text_cfg = CLIPTextConfig.tiny(projection_dim=16)
    model = CLIPScorer(vision_cfg, text_cfg)
    px = jnp.zeros((2, 3, 32, 32))
    ids = jnp.zeros((3, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), px, ids)["params"]
    logits = model.apply({"params": params}, px, ids)
    assert logits.shape == (2, 3)
    assert np.isfinite(np.asarray(logits)).all()


def test_lpips_architecture():
    from sliders_conceptmod_tpu.models.lpips import LPIPS, init_lpips_params

    model = LPIPS()
    params = init_lpips_params(jax.random.PRNGKey(0))
    a = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64))
    d_same = model.apply({"params": params}, a, a)
    d_diff = model.apply({"params": params}, a, -a)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    # random-init lin heads are signed, so only |d| > 0 is guaranteed (the
    # real lpips weights are non-negative)
    assert (np.abs(np.asarray(d_diff)) > 1e-8).all()
