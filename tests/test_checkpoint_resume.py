"""Deterministic resume: orbax checkpoint round-trips training state."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sliders_conceptmod_tpu.train import checkpoint as ckpt


def test_save_restore_roundtrip(tmp_path):
    lora_params = {
        "lora_unet_m": {
            "down": jax.random.normal(jax.random.PRNGKey(0), (8, 2)),
            "up": jnp.zeros((2, 8)),
        }
    }
    opt = optax.adamw(1e-3)
    opt_state = opt.init(lora_params)
    # advance once so moments are non-trivial
    grads = jax.tree.map(jnp.ones_like, lora_params)
    updates, opt_state = opt.update(grads, opt_state, lora_params)
    lora_params = optax.apply_updates(lora_params, updates)
    key = jax.random.PRNGKey(42)

    path = str(tmp_path / "resume_ckpt")
    ckpt.save(path, lora_params, opt_state, step=17, key=key)

    zeros = jax.tree.map(jnp.zeros_like, lora_params)
    zero_opt = opt.init(zeros)
    rp, ro, step, rkey = ckpt.restore(path, zeros, zero_opt, jax.random.PRNGKey(0))

    assert step == 17
    np.testing.assert_array_equal(np.asarray(rkey), np.asarray(key))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0),
        rp,
        lora_params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0),
        ro,
        opt_state,
    )


def test_cascade_cli_resume_is_bit_identical(tmp_path):
    """Interrupt/resume through the cascade CLI reproduces the one-shot run
    exactly: the resume checkpoint carries params, optimizer state, step, and
    the post-split PRNG key (deterministic resume, SURVEY §5)."""
    from sliders_conceptmod_tpu.cli import train_lora_cascade
    from sliders_conceptmod_tpu.core import config as config_util
    from sliders_conceptmod_tpu.core import prompts as prompt_util

    def make_config(path):
        config = config_util.load_config_from_yaml("data/config-tiny-cascade.yaml")
        config.train.iterations = 5
        config.save.per_steps = 2
        config.save.path = str(path)
        config.logging.verbose = False
        return config

    prompts = prompt_util.load_prompts_from_yaml("data/prompts-tiny.yaml", [])

    one_shot = train_lora_cascade.train(
        make_config(tmp_path / "a"), prompts, rank=2, save_file=False
    )

    # interrupted run: periodic .pt + resume checkpoint land at step 2/4
    cfg_b = make_config(tmp_path / "b")
    train_lora_cascade.train(cfg_b, prompts, rank=2, save_file=True)
    resume_dir = tmp_path / "b" / f"{cfg_b.save.name}_resume"
    assert resume_dir.exists()

    # resume from step 3 and run to completion; compare final state dicts
    resumed = train_lora_cascade.train(
        make_config(tmp_path / "c"), prompts, rank=2, save_file=False,
        resume_from=str(resume_dir),
    )
    assert set(one_shot) == set(resumed)
    for k in one_shot:
        np.testing.assert_array_equal(one_shot[k], resumed[k])
