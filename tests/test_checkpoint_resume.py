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
