"""Config schema — YAML-compatible with the reference.

Schema parity target: reference ``conceptmod/textsliders/config_util.py:14-107``
(RootConfig pydantic tree) so that the reference's shipped YAML files
(``conceptmod/textsliders/data/config*.yaml``) parse verbatim.

Differences from the reference (deliberate):
* pydantic v2 (the environment ships v2; the reference used v1),
* ``parse_precision`` returns a ``jnp.dtype`` instead of a torch dtype,
* extra TPU-only knobs live in a separate optional ``tpu:`` block with
  defaults that reproduce reference behavior when absent.
"""

from __future__ import annotations

from typing import Literal, Optional

import jax.numpy as jnp
import yaml
from pydantic import BaseModel, ConfigDict

PRECISION_TYPES = Literal["fp32", "fp16", "bf16", "float32", "float16", "bfloat16"]
NETWORK_TYPES = Literal["lierla", "c3lier"]

# Reference conceptmod/textsliders/lora.py:32-47
TRAINING_METHODS = Literal[
    "noxattn",
    "innoxattn",
    "selfattn",
    "xattn",
    "full",
    "xattn-strict",
    "noxattn-hspace",
    "noxattn-hspace-last",
]


class PretrainedModelConfig(BaseModel):
    name_or_path: str
    v2: bool = False
    v_pred: bool = False
    clip_skip: Optional[int] = None


class NetworkConfig(BaseModel):
    type: NETWORK_TYPES = "lierla"
    rank: int = 4
    alpha: float = 1.0
    training_method: str = "full"


class TrainConfig(BaseModel):
    precision: PRECISION_TYPES = "bfloat16"
    # "wuerstchen" (cascade ratio-space DDPM) extends the reference's set
    # (config_util.py:30); the reference's cascade path never reaches its own
    # scheduler (SURVEY §2.4)
    noise_scheduler: Literal["ddim", "ddpm", "lms", "euler_a", "builtin", "wuerstchen"] = "ddim"

    iterations: int = 500
    lr: float = 1e-3
    eta_min: float = 1e-4
    lambda_similarity: float = 0.1
    optimizer: str = "adamw"
    optimizer_args: str = ""
    lr_scheduler: str = "constant"
    cfg: float = 1.0

    max_denoising_steps: int = 50


class SaveConfig(BaseModel):
    name: str = "untitled"
    path: str = "./output"
    per_steps: int = 200
    precision: PRECISION_TYPES = "float32"


class LoggingConfig(BaseModel):
    use_wandb: bool = False
    verbose: bool = False


class OtherConfig(BaseModel):
    use_xformers: bool = False


class TPUConfig(BaseModel):
    """TPU-native extensions (absent in reference; defaults = reference behavior)."""

    model_config = ConfigDict(extra="allow")

    mesh_data: int = -1  # -1: all devices on the data axis
    mesh_model: int = 1
    # multi-host: join a jax.distributed world before touching devices
    # (parallel/mesh.init_distributed — the comm-backend row of SURVEY §2.2).
    # On Cloud TPU pods leave all three unset per-host args autodetect; for
    # manual bring-up set coordinator "host:port" + world size + this rank
    # (rank/process_id usually per-host env, so CLI --process_id overlays it).
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    samples_per_step: int = 1  # independent ESD samples per step (DP axis)
    use_flash_attention: bool = True
    profile_dir: Optional[str] = None  # jax.profiler trace output
    debug_nans: bool = False
    # persistent on-disk XLA executable cache (jax_compilation_cache_dir):
    # a new HLO costs 10-30 min through the remote-compile service, so
    # serving redeploys / trainer relaunches should pay it once, not per
    # process (utils/debug.apply_tpu_runtime_flags)
    compilation_cache_dir: Optional[str] = None
    persistent_cache_min_compile_seconds: float = 1.0
    seed: int = 0
    # honor config.network.rank/alpha (the reference XL trainer ignores them
    # in favor of CLI/hardcoded values, reference train_lora_xl.py:94-105)
    honor_network_config: bool = True
    # sequence parallelism: route self-attention >= sp_min_seq tokens through
    # ring attention over the mesh data axis (ops/attention.sequence_parallel;
    # pays off multi-chip when one chip can't hold the O(S) activations)
    sequence_parallel: bool = False
    sp_min_seq: int = 4096
    # software-pipeline the gradient-stopped warm-up across step boundaries
    # (train/esd.py ESDConfig.pipeline_warmup). DEVIATION when on: the
    # warm-up sees adapter params one optimizer step stale.
    pipeline_warmup: bool = False
    # fuse the teacher branches + student prediction into one 4-row UNet call
    # via the apply-time LoRA overlay (identical math, one fewer weight
    # stream; LoRA + guidance==1 + samples_per_step==1 only)
    fuse_teacher_student: bool = False
    # store the FROZEN base as symmetric per-column int8 (adapters/quant.py,
    # QLoRA-style). Flux/SD3: full-depth Flux-schnell (23.8 GB bf16) fits one
    # 16 GB v5e at 11.9 GB. SD1/SDXL text sliders: a weight-streaming perf
    # lever (the ESD step is streaming-bound — BASELINE.md). The student LoRA
    # runs through the apply-time overlay so the int8 base is never merged
    # into; trainers that must merge (image-pair, cascade) refuse the knob.
    quantize_base: bool = False
    # W8A8 on the GRADIENT-STOPPED warm-up chain only (SD1/SDXL/SD3
    # trainers): per-token int8 activations + int8×int8 MXU matmuls at 2×
    # the bf16 rate on the latency-bound warm-up section. Over quantize_base
    # the warm-up reads the same int8 tree; WITHOUT quantize_base this is
    # the DUAL-TREE route (SD1/XL trainer.py): a one-time int8 copy of the
    # bf16 base serves only the warm-up chain (+2.7 GiB HBM for SDXL), so
    # the teacher target and student grads stay fully bf16-exact. DEVIATION
    # when on (either route): warm-up context latents carry ~1-2 % per-layer
    # rounding noise; teacher and student stay weight-only exact.
    w8a8_warmup: bool = False
    # student LoRA through the apply-time overlay instead of a per-step
    # merged tree (identical math — tests/test_esd_train.py). None = follow
    # quantize_base (an int8 base cannot host a merge). On a bf16 base this
    # is a perf knob: the overlay backward reaches the rank-r factors
    # directly (x^T(g·upᵀ) association), skipping the dense per-layer dL/dW'
    # weight-grad matmuls the merged path pays. LoRA only (DoRA must merge).
    student_overlay: Optional[bool] = None
    # warm-up chain under student_overlay: None = merged warm-up tree on a
    # bf16 base (the measured winner — the latency-bound warm-up keeps its
    # unbroken XLA fusions, only the student grad pass pays the overlay
    # interceptors; BASELINE.md r3 overlay A/B) and overlay warm-up over an
    # int8 base (the merged tree cannot exist there). true forces the
    # overlay on the warm-up too; false is refused over a quantized base.
    overlay_warmup: Optional[bool] = None
    # shared-prefix warm-up under DP (train/esd.py ESDConfig.share_warmup;
    # r5: also train/esd_sd3.py and train/esd_cascade.py): the
    # samples_per_step samples share ONE batch-1 warm-up chain to max(t_k),
    # each reading the trajectory snapshot at its own t_k (Cascade's fixed
    # t_to means one shared context, with per-sample PAIRS kept in the
    # tails). DEVIATIONS when on: per-step samples share one prompt pair
    # (SD1/XL/SD3) and one initial latent; warm-up noise correlates across
    # samples. Opt-in A/B against the latency-bound warm-up chain;
    # samples_per_step > 1 only.
    share_warmup: bool = False


class RootConfig(BaseModel):
    prompts_file: str
    pretrained_model: PretrainedModelConfig
    network: NetworkConfig

    train: Optional[TrainConfig] = None
    save: Optional[SaveConfig] = None
    logging: Optional[LoggingConfig] = None
    other: Optional[OtherConfig] = None
    tpu: Optional[TPUConfig] = None


def parse_precision(precision: str) -> jnp.dtype:
    """Reference config_util.py:78-86, mapped to JAX dtypes.

    fp16 maps to bfloat16: float16 has no TPU advantage and a narrower
    exponent range; bf16 is the TPU-native half precision.
    """
    if precision in ("fp32", "float32"):
        return jnp.float32
    if precision in ("fp16", "float16"):
        return jnp.bfloat16
    if precision in ("bf16", "bfloat16"):
        return jnp.bfloat16
    raise ValueError(f"Invalid precision type: {precision}")


def resolve_student_overlay(tpu_cfg, quantize_base: bool, peft_type: str, default_overlay=None):
    """``tpu.student_overlay`` / ``tpu.overlay_warmup`` resolution shared by
    every ESD trainer family (one place so the rules cannot drift between
    trainers). Returns ``(student_overlay, overlay_warmup)``.

    ``student_overlay``: ``None`` follows ``default_overlay`` when the caller
    supplies one (the SD1/XL trainers pass ``peft_type == 'lora'`` — the
    overlay student + merged warm-up split is the measured bf16 winner there,
    BASELINE.md r3 overlay A/B), else ``quantize_base`` (an int8 base cannot
    host a merged student). An explicit ``false`` with an int8 base is
    impossible for the same reason; DoRA is refused when explicitly requested
    (its norm decomposition needs the merged tree) and silently resolves to
    the merged path under a default.

    ``overlay_warmup``: ``None`` → ``True`` over a quantized base (the merged
    warm-up tree cannot exist), ``False`` over bf16 (the latency-bound
    warm-up chain keeps its unbroken XLA fusions; only the student grad path
    pays the interceptors — the +1.4%/+0.4% SDXL/SD1.5 winner). An explicit
    ``false`` with an int8 base is refused."""
    student_overlay = getattr(tpu_cfg, "student_overlay", None)
    if student_overlay is None:
        if default_overlay is not None:
            student_overlay = bool(default_overlay) or quantize_base
        else:
            student_overlay = quantize_base
    else:
        student_overlay = bool(student_overlay)
        if student_overlay and peft_type == "dora":
            raise NotImplementedError(
                "tpu.student_overlay supports LoRA only (DoRA's norm decomposition merges)"
            )
    if quantize_base and not student_overlay:
        raise ValueError(
            "tpu.student_overlay: false is incompatible with quantize_base: "
            "true — an int8 base cannot host the merged student"
        )
    if peft_type == "dora":
        student_overlay = False

    overlay_warmup = getattr(tpu_cfg, "overlay_warmup", None)
    if not student_overlay:
        if overlay_warmup:
            raise ValueError("tpu.overlay_warmup: true requires tpu.student_overlay: true")
        return False, None
    if overlay_warmup is None:
        overlay_warmup = bool(quantize_base)
    else:
        overlay_warmup = bool(overlay_warmup)
    if quantize_base and not overlay_warmup:
        raise ValueError(
            "tpu.overlay_warmup: false needs the merged warm-up tree — "
            "impossible over a quantized (int8) base"
        )
    return student_overlay, overlay_warmup


def parse_save_precision(precision: str):
    """Reference config_util.py:46-50 + lora.py:274-283 — the *export* dtype.

    Unlike :func:`parse_precision` (compute dtype, where fp16→bf16 because
    float16 has no TPU advantage), the saved checkpoint must carry the dtype
    the user configured: downstream torch/diffusers loaders read it verbatim.
    bfloat16 numpy arrays (ml_dtypes) round-trip through safetensors natively.
    """
    import numpy as np

    if precision in ("fp32", "float32", None, ""):
        return np.float32
    if precision in ("fp16", "float16"):
        return np.float16
    if precision in ("bf16", "bfloat16"):
        return jnp.bfloat16  # the ml_dtypes numpy scalar type
    raise ValueError(f"Invalid precision type: {precision}")


def load_config_from_yaml(config_path: str) -> RootConfig:
    """Reference config_util.py:89-107 — defaults filled for missing blocks."""
    with open(config_path, "r") as f:
        config = yaml.safe_load(f)

    root = RootConfig(**config)

    if root.train is None:
        root.train = TrainConfig()
    if root.save is None:
        root.save = SaveConfig()
    if root.logging is None:
        root.logging = LoggingConfig()
    if root.other is None:
        root.other = OtherConfig()
    if root.tpu is None:
        root.tpu = TPUConfig()

    return root
