"""Phase profile of the multi-GB single-file load (VERDICT r3 task 2).

Times each stage of factory.load_models_xl's single-file path separately on
the real checkpoint from scripts/full_checkpoint_drill.py:

  read    — native mmap open + full page-cache copy (io/native.py)
  convert — LDM→flax key mapping, lazy-transpose views (io/ldm_convert.py)
  pack    — bulk-chunk packing host memcpy (io/torch_convert.tree_to_jax,
            measured inside transfer)
  xfer    — device transfer + carve-program execute (tree_to_jax end-to-end)
  total   — factory.load_models_xl wall-clock (the drill's 'load' number)

Run on the TPU host:  python scripts/profile_load.py /tmp/drill/sdxl_drill.safetensors
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent executable cache: the carve programs are new HLOs per tree
# structure — without this every fresh process pays the remote-compile
# service for them (~60-75 s each at SDXL scale)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sliders_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/drill/sdxl_drill.safetensors"
    report = {"file_gb": os.path.getsize(path) / 1e9}

    from sliders_conceptmod_tpu.io.native import load_safetensors_native

    t0 = time.time()
    sd = load_safetensors_native(path)
    report["read_s"] = time.time() - t0
    report["read_MBps"] = report["file_gb"] * 1000 / report["read_s"]
    print(json.dumps(report), flush=True)

    from sliders_conceptmod_tpu.io.ldm_convert import convert_ldm_checkpoint

    t0 = time.time()
    trees = convert_ldm_checkpoint(sd)
    report["convert_s"] = time.time() - t0
    print(json.dumps(report), flush=True)

    import jax.numpy as jnp

    from sliders_conceptmod_tpu.io import torch_convert as tc

    for name in ("text_encoder", "text_encoder_2", "unet", "vae"):
        tree = trees.get(name)
        if not tree:
            continue
        t0 = time.time()
        dev = tc.tree_to_jax(tree, dtype=jnp.bfloat16)
        import jax

        jax.block_until_ready(dev)
        report[f"xfer_{name}_s"] = time.time() - t0
        del dev
        print(json.dumps(report), flush=True)

    report["sum_s"] = sum(v for k, v in report.items() if k.endswith("_s"))
    print("[profile_load] " + json.dumps(report), flush=True)
    with open("/tmp/profile_load.json", "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
