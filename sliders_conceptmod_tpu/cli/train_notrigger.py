"""CLI: notrigger text-encoder slider training.

Flag-surface parity: reference ``conceptmod/notrigger/train_notrigger.py:547-633``
(--config_file --alpha --rank --device --name --attributes --peft_type
--positive --negative --clip_index --model) plus the ``train_lora``
programmatic API (:507-545). ``--clip_index`` selects te1/te2 (prefix
``lora_te1``/``lora_te2``, reference :184-196); saves are per-index
``{name}_{index}_{i}steps.safetensors`` (:452-473).

Model switch (reference :96-176): SDXL/PonyXL (CLIP towers), SD3-Medium
(clip_l/clip_g towers), FLUX.1 (CLIP te1; T5 te2 via models/t5.py with the
``t5attn`` train method and ``lora_te2_encoder_…`` keys).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp

from sliders_conceptmod_tpu.adapters import lora as lora_lib
from sliders_conceptmod_tpu.core import config as config_util
from sliders_conceptmod_tpu.models import factory
from sliders_conceptmod_tpu.train import notrigger as nt
from sliders_conceptmod_tpu.train.optim import get_lr_schedule, get_optimizer

# torch-module-path segments missing from the flax tree — restores reference
# key parity: lora_te1_text_model_encoder_layers_0_self_attn_q_proj
CLIP_NAME_PATH_PREFIX = ("text_model", "encoder")


def train(
    config,
    positive=None,
    negative=None,
    clip_index: int = 0,
    peft_type: str = "lora",
    rank: int = 4,
    model: str = "SDXL",
    save_file: bool = True,
    on_step_complete=None,
    resume_from=None,
):
    if getattr(getattr(config, "tpu", None), "quantize_base", False) or getattr(
        getattr(config, "tpu", None), "w8a8_warmup", False
    ):
        raise NotImplementedError(
            "tpu.quantize_base / tpu.w8a8_warmup quantize a frozen diffusion transformer; the "
            "notrigger trainer touches only text encoders — set "
            "quantize_base: false."
        )
    from sliders_conceptmod_tpu.utils.debug import apply_tpu_runtime_flags

    apply_tpu_runtime_flags(getattr(config, "tpu", None))
    weight_dtype = config_util.parse_precision(config.train.precision)
    is_flux = model in ("FLUX.1", "tiny-flux")
    is_sd3 = model in ("SD3-Medium", "tiny-sd3")
    if not is_flux and not is_sd3 and model not in ("SDXL", "PonyXL", "tiny"):
        raise NotImplementedError(
            f"model={model} not supported (SDXL/PonyXL/SD3-Medium/FLUX.1)"
        )

    if is_flux and clip_index == 1:
        # FLUX te2 = T5 (reference train_notrigger.py:188-191 target
        # T5Attention); keys lora_te2_encoder_block_*_SelfAttention_*
        import jax.numpy as _jnp

        from sliders_conceptmod_tpu.models.t5 import T5Config, T5EncoderModel
        from sliders_conceptmod_tpu.models.tokenizer import HashTokenizer

        t5_cfg = T5Config.tiny() if "tiny" in model else T5Config.xxl()
        t5_model = T5EncoderModel(t5_cfg, dtype=weight_dtype)
        tok = HashTokenizer(max_length=16 if "tiny" in model else 512, vocab_size=t5_cfg.vocab_size, bos=0, eos=1, pad=0)
        # fused init+cast (factory._init_unet pattern): an uncast fp32
        # T5-XXL tree is 19GB — must come up at weight_dtype on a v5e
        def _init_cast():
            p = t5_model.init(jax.random.PRNGKey(0), _jnp.zeros((1, 8), _jnp.int32))["params"]
            return jax.tree.map(lambda a: a.astype(weight_dtype), p)

        params = jax.jit(_init_cast)()

        class _T5Bundle:
            model = t5_model
            tokenizer = tok

        te = _T5Bundle()
        te.params = params
        prefix = "lora_te2"
        target_replace_override = ["T5Attention"]
        name_path_prefix = ("encoder",)
        train_method_override = "t5attn"

        def encode_hidden(p, ids):
            return t5_model.apply({"params": p}, ids)

    elif is_sd3:
        # reference train_notrigger.py:148-176: SD3-Medium trains the slider
        # inside one of the pipeline's two CLIP towers (clip_l / clip_g)
        name = "tiny-sd3" if "tiny" in model else config.pretrained_model.name_or_path
        tokenizers, text_encoders, _tr, _sched = factory.load_models_sd3(
            name, weight_dtype=weight_dtype
        )
        te = text_encoders[clip_index]
        prefix = ["lora_te1", "lora_te2"][clip_index]
        target_replace_override = None
        name_path_prefix = CLIP_NAME_PATH_PREFIX
        train_method_override = None
    else:
        name = "tiny-xl" if model in ("tiny", "tiny-flux") else config.pretrained_model.name_or_path
        tokenizers, text_encoders, _unet, _sched = factory.load_models_xl(
            name, weight_dtype=weight_dtype
        )
        te = text_encoders[clip_index]
        prefix = ["lora_te1", "lora_te2"][clip_index]
        target_replace_override = None
        name_path_prefix = CLIP_NAME_PATH_PREFIX
        train_method_override = None

    if isinstance(positive, (list, tuple)):
        positive = ", ".join(positive)
    if positive == "":
        positive = None
    if isinstance(negative, (list, tuple)):
        negative = ", ".join(negative)
    if negative == "":
        negative = None
    if positive is None and negative is None:
        raise ValueError("at least one of positive/negative is required")

    if not (is_flux and clip_index == 1):

        def encode_hidden(params, ids):
            out = te.model.apply({"params": params}, ids)
            return out.hidden_states[-1]

    neutral_ids = jnp.asarray(te.tokenizer([""]))
    pos_target = encode_hidden(te.params, jnp.asarray(te.tokenizer([positive]))) if positive else None
    neg_target = encode_hidden(te.params, jnp.asarray(te.tokenizer([negative]))) if negative else None
    neutral_target = encode_hidden(te.params, neutral_ids)

    if peft_type == "dora":
        from sliders_conceptmod_tpu.adapters import dora as peft_mod
    else:
        peft_mod = lora_lib

    sites = peft_mod.create_sites(
        te.params,
        rank=rank,
        alpha=config.network.alpha,
        target_replace=target_replace_override or nt.CLIP_TARGET_REPLACE,
        prefix=prefix,
        train_method=train_method_override or config.network.training_method,
        name_path_prefix=name_path_prefix,
    )
    key = jax.random.PRNGKey(config.tpu.seed)
    key, k_init = jax.random.split(key)
    init_extra = {"base_params": te.params} if peft_type == "dora" else {}
    lora_params = peft_mod.init_lora_params(k_init, sites, **init_extra)

    # SGD + 100-step linear warmup then constant (reference :216-229)
    sched_fn = get_lr_schedule("constant_with_warmup", config.train.lr, config.train.iterations)
    optimizer = get_optimizer("sgd", sched_fn, grad_clip_value=1.0)
    opt_state = optimizer.init(lora_params)

    d1, d2 = nt.initial_distances(
        encode_hidden, te.params, sites, lora_params, neutral_ids, pos_target, neg_target,
        merge_fn=peft_mod.merge_lora_params,
    )
    ncfg = nt.NoTriggerConfig(
        lambda_similarity=config.train.lambda_similarity,
        has_positive=positive is not None,
        has_negative=negative is not None,
    )
    step = nt.make_notrigger_step(
        encode_hidden,
        sites,
        optimizer,
        ncfg,
        neutral_ids,
        pos_target,
        neg_target,
        neutral_target,
        d1,
        d2,
        merge_fn=peft_mod.merge_lora_params,
    )

    save_path = Path(config.save.path)
    # reference lora.py:274-283: exports cast to save.precision
    save_dtype = config_util.parse_save_precision(config.save.precision)
    from sliders_conceptmod_tpu.train.loop_utils import MetricsLogger

    logger = MetricsLogger(save_path, config.save.name, config.logging.verbose)
    from sliders_conceptmod_tpu.train import checkpoint as ckpt

    # the notrigger step is deterministic (no per-step RNG) — the checkpoint
    # key slot carries a placeholder
    lora_params, opt_state, start_step, _ = ckpt.maybe_restore(
        resume_from, lora_params, opt_state, jax.random.PRNGKey(0)
    )
    last_loss = None
    for i in range(start_step, config.train.iterations):
        lora_params, opt_state, metrics = step(te.params, lora_params, opt_state)
        logger.log(i, metrics)
        # stalled-loss early exit (reference :389-393)
        if i % 800 == 0 and i > 1000:
            cur = logger.current_loss()
            if last_loss is not None and last_loss == cur:
                print("loss stopped moving. exiting early.")
                break
            last_loss = cur
        if (
            save_file
            and config.save.per_steps
            and i % config.save.per_steps == 0
            and i != 0
            and i != config.train.iterations - 1
        ):
            save_path.mkdir(parents=True, exist_ok=True)
            peft_mod.save_weights(save_path / f"{config.save.name}_{clip_index}_{i}steps.safetensors",
                sites,
                lora_params, dtype=save_dtype)
            ckpt.save_resume(
                save_path, f"{config.save.name}_{clip_index}", lora_params, opt_state, i + 1,
                jax.random.PRNGKey(0),
            )
        if on_step_complete is not None:
            on_step_complete(i)

    logger.close()
    if save_file:
        save_path.mkdir(parents=True, exist_ok=True)
        peft_mod.save_weights(save_path / f"{config.save.name}_{clip_index}_last.safetensors", sites, lora_params, dtype=save_dtype)
        return None
    return peft_mod.state_dict_numpy(sites, lora_params)


def main(args):
    config = config_util.load_config_from_yaml(args.config_file)
    if args.name is not None:
        config.save.name = args.name
    config.network.alpha = args.alpha
    config.network.rank = args.rank
    config.save.name += f"_alpha{args.alpha}"
    config.save.name += f"_rank{args.rank}"
    config.save.name += f"_{config.network.training_method}"
    config.save.path += f"/{config.save.name}"
    positive = args.positive if args.positive is None else " ".join(args.positive)
    train(
        config,
        positive=positive,
        negative=args.negative,
        clip_index=args.clip_index,
        peft_type=args.peft_type,
        rank=args.rank,
        model=args.model,
        resume_from=getattr(args, "resume_from", None),
    )


def train_lora(
    target,
    positive,
    negative,
    unconditional,
    alpha=1.0,
    rank=4,
    device=0,
    name=None,
    attributes=None,
    batch_size=1,
    config_file="data/config-xl.yaml",
    resolution=512,
    steps=None,
    on_step_complete=None,
    clip_index=0,
    peft_type="lora",
    model="SDXL",
):
    """Programmatic API — reference train_notrigger.py:507-545 (the prompts
    yaml it writes is vestigial for notrigger; the trainer consumes
    positive/negative directly)."""
    config = config_util.load_config_from_yaml(config_file)
    if name is not None:
        config.save.name = name
    if steps is not None:
        config.train.iterations = steps
    config.network.alpha = alpha
    config.network.rank = rank
    config.save.name += f"_alpha{alpha}_rank{rank}_{config.network.training_method}"
    config.save.path += f"/{config.save.name}"
    return train(
        config,
        positive=[positive] if isinstance(positive, str) else positive,
        negative=negative,
        clip_index=clip_index,
        peft_type=peft_type,
        rank=rank,
        model=model,
        save_file=False,
        on_step_complete=on_step_complete,
    )


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", required=True)
    parser.add_argument("--alpha", type=float, required=True)
    parser.add_argument("--rank", type=int, default=4)
    parser.add_argument("--device", type=int, default=0, help="Ignored on TPU.")
    parser.add_argument("--name", type=str, default=None)
    parser.add_argument("--attributes", type=str, default=None)
    parser.add_argument("--peft_type", type=str, default="dora", help="dora (default) or lora")
    parser.add_argument(
        "--resume_from", type=str, default=None,
        help="orbax resume checkpoint dir (deterministic resume — SURVEY §5)",
    )
    parser.add_argument("--positive", type=str, nargs="+", default=None)
    parser.add_argument(
        "--model",
        type=str,
        default="SDXL",
        help="SDXL | PonyXL | SD3-Medium | FLUX.1 (tiny/tiny-sd3/tiny-flux for smoke)",
    )
    parser.add_argument("--negative", type=str, default=None)
    parser.add_argument("--clip_index", type=int, required=True)
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
