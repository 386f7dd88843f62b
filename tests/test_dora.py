"""DoRA overlay: decomposition math, checkpoint schema, trainability."""

import jax
import jax.numpy as jnp
import numpy as np

from sliders_conceptmod_tpu.adapters import dora, lora


def _tree():
    key = jax.random.PRNGKey(0)
    return {
        "blocks_0": {
            "attn1": {
                "to_q": {"kernel": jax.random.normal(key, (8, 8)) * 0.3},
            }
        }
    }


def test_dora_scale_init_is_column_norm():
    """dora_scale init = per-input-column L2 norm of W (reference
    dora.py:97-107 — the fork norms per *input* column)."""
    tree = _tree()
    sites = dora.create_sites(tree, rank=2, train_method="full")
    dp = dora.init_lora_params(jax.random.PRNGKey(1), sites, base_params=tree)
    W = np.asarray(tree["blocks_0"]["attn1"]["to_q"]["kernel"])  # [in, out]
    expected = np.linalg.norm(W, axis=1, keepdims=True)  # [in, 1]
    np.testing.assert_allclose(
        np.asarray(dp[sites[0].lora_name]["dora_scale"]), expected, rtol=1e-6
    )


def test_dora_merge_matches_reference_formula():
    """merged W == W + mult·(α/r)·(decompose(W+BA) − W) with the norm
    detached (reference dora.py:124-134,142-162)."""
    tree = _tree()
    sites = dora.create_sites(tree, rank=2, alpha=4.0, train_method="full")
    site = sites[0]
    dp = dora.init_lora_params(jax.random.PRNGKey(1), sites, base_params=tree)
    dp[site.lora_name]["up"] = dp[site.lora_name]["up"] + 0.05  # non-zero delta

    W = tree["blocks_0"]["attn1"]["to_q"]["kernel"]
    leaf = dp[site.lora_name]
    mult = 0.6

    merged = dora.merge_lora_params(tree, sites, dp, mult)
    Wm = merged["blocks_0"]["attn1"]["to_q"]["kernel"]

    BA = leaf["down"] @ leaf["up"]
    Wp = W + BA
    norm = jnp.linalg.norm(Wp, axis=1, keepdims=True)
    decomposed = Wp * (leaf["dora_scale"] / norm)
    expected = W + mult * (site.alpha / site.rank) * (decomposed - W)
    np.testing.assert_allclose(np.asarray(Wm), np.asarray(expected), atol=1e-6)

    # multiplier 0 == identity
    merged0 = dora.merge_lora_params(tree, sites, dp, 0.0)
    np.testing.assert_allclose(
        np.asarray(merged0["blocks_0"]["attn1"]["to_q"]["kernel"]), np.asarray(W), atol=0
    )


def test_dora_checkpoint_schema_and_roundtrip(tmp_path):
    tree = _tree()
    sites = dora.create_sites(tree, rank=2, train_method="full")
    dp = dora.init_lora_params(jax.random.PRNGKey(1), sites, base_params=tree)
    path = str(tmp_path / "dora.safetensors")
    dora.save_weights(path, sites, dp)

    from safetensors.numpy import load_file

    sd = load_file(path)
    name = sites[0].lora_name
    assert f"{name}.lora_down.weight" in sd
    assert f"{name}.dora_scale" in sd
    assert sd[f"{name}.dora_scale"].shape == (1, 8)  # torch [1, in]

    dp2 = dora.load_weights(path, sites)
    for part in ("down", "up", "dora_scale"):
        np.testing.assert_allclose(
            np.asarray(dp[name][part]), np.asarray(dp2[name][part]), atol=1e-7
        )


def test_dora_gradients_flow_to_all_parts():
    tree = _tree()
    sites = dora.create_sites(tree, rank=2, train_method="full")
    dp = dora.init_lora_params(jax.random.PRNGKey(1), sites, base_params=tree)
    # zero-init up blocks gradient flow to down (standard LoRA property) —
    # perturb so every factor participates
    dp[sites[0].lora_name]["up"] = dp[sites[0].lora_name]["up"] + 0.05
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 8))

    def loss(p):
        merged = dora.merge_lora_params(tree, sites, p, 1.0)
        return jnp.sum((x @ merged["blocks_0"]["attn1"]["to_q"]["kernel"]) ** 2)

    g = jax.grad(loss)(dp)
    leaf = g[sites[0].lora_name]
    assert float(jnp.abs(leaf["dora_scale"]).sum()) > 0
    assert float(jnp.abs(leaf["down"]).sum()) > 0
    assert float(jnp.abs(leaf["up"]).sum()) > 0
