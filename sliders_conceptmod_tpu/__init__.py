"""sliders_conceptmod_tpu — a TPU-native (JAX/Flax/Pallas/pjit) concept-slider framework.

A from-scratch rebuild of the capabilities of ntc-ai/sliders-conceptmod
(Concept Sliders: LoRA adaptors for precise control in diffusion models,
arXiv 2311.12092) designed TPU-first:

* compute path: JAX + Flax models, Pallas flash-attention, pjit/shard_map
  over device meshes (data + tensor axes),
* adapters: LoRA/DoRA as functional weight overlays merged into the frozen
  base parameters inside the jitted step (zero per-token overhead on the MXU),
* schedulers: pure-functional DDIM/DDPM/Euler-A/LMS with precomputed
  coefficient tables so samplers compile to a single `lax.scan`,
* checkpoints: safetensors adapter export bit-compatible with the reference
  key schema (``lora_unet_<path>.lora_down.weight`` …,
  cf. reference conceptmod/textsliders/lora.py:239-240).
"""

__version__ = "0.1.0"
