"""Synthesize the eval-scorer weight files for zero-egress hosts.

Writes a tiny ``transformers.CLIPModel`` directory plus random
torchvision-AlexNet / lpips-lin state dicts with the exact key/shape schema
of the published files (the same fixtures tests/test_eval_clis.py builds) —
so ``cli/acceptance.py`` can run all three stages (train → sweep → CLIP +
LPIPS CSVs) at full scale without pretrained assets. The CSVs then validate
the pipeline, not the metric values (BASELINE.md acceptance rows)."""

import sys
from pathlib import Path

import torch
from transformers import CLIPConfig, CLIPModel

out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/r5_scorers")
out.mkdir(parents=True, exist_ok=True)

cfg = CLIPConfig(
    text_config={
        "vocab_size": 49408, "hidden_size": 32, "intermediate_size": 64,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "max_position_embeddings": 77, "eos_token_id": 49407,
        "bos_token_id": 49406, "pad_token_id": 0, "hidden_act": "quick_gelu",
    },
    vision_config={
        "hidden_size": 32, "intermediate_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "image_size": 64, "patch_size": 16,
        "hidden_act": "quick_gelu",
    },
    projection_dim=16,
)
torch.manual_seed(0)
CLIPModel(cfg).save_pretrained(str(out / "tiny_clip"), safe_serialization=True)

alex = {}
# torchvision alexnet .features conv layers: idx (out, in, k)
for idx, out_c, in_c, k in [
    (0, 64, 3, 11), (3, 192, 64, 5), (6, 384, 192, 3), (8, 256, 384, 3), (10, 256, 256, 3)
]:
    alex[f"features.{idx}.weight"] = torch.randn(out_c, in_c, k, k) * 0.05
    alex[f"features.{idx}.bias"] = torch.randn(out_c) * 0.01
lin = {}
for i, c in enumerate([64, 192, 384, 256, 256]):
    lin[f"lin{i}.model.1.weight"] = torch.rand(1, c, 1, 1) * 0.1
torch.save(alex, str(out / "alexnet.pth"))
torch.save(lin, str(out / "lpips_alex.pth"))
print(f"scorer weights at {out}")
