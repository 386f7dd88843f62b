"""A/B the multi-GB host→TPU transfer strategies on the real drill file.

  A. current bulk path: pack contiguous sources into ~256MB chunks (host
     memcpy) + chunked device_put + carve program (slice/transpose/cast)
  B. per-leaf async device_put of the CONTIGUOUS mmap-backed source views
     (zero host copies — the kernel pages file data straight into the DMA)
     + one jitted finish program (transpose/cast per leaf)

Run solo on the TPU host: python scripts/xfer_ab.py [unet|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def per_leaf_put(tree, dtype):
    import functools

    import jax
    import jax.numpy as jnp

    from sliders_conceptmod_tpu.io.torch_convert import _contiguous_source

    leaves, treedef = jax.tree.flatten(tree)
    srcs, invs = [], []
    for x in leaves:
        order, src = _contiguous_source(x)
        srcs.append(src)
        invs.append(tuple(int(i) for i in np.argsort(order)))
    # async per-leaf transfers of the contiguous sources
    dev = [jax.device_put(s) for s in srcs]

    key = tuple((str(s.dtype), s.shape, inv) for s, inv in zip(srcs, invs))

    @functools.lru_cache(maxsize=8)
    def finish_prog(key, dt):
        def fin(*xs):
            outs = []
            for x, (_, _, inv) in zip(xs, key):
                if inv != tuple(range(len(inv))):
                    x = jnp.transpose(x, inv)
                outs.append(x.astype(dt))
            return outs

        return jax.jit(fin, donate_argnums=tuple(range(len(key))))

    out = finish_prog(key, dtype)(*dev)
    return jax.tree.unflatten(treedef, out)


def main():
    import jax
    import jax.numpy as jnp

    from sliders_conceptmod_tpu.io import torch_convert as tc
    from sliders_conceptmod_tpu.io.ldm_convert import convert_ldm_checkpoint
    from sliders_conceptmod_tpu.io.native import load_safetensors_native

    path = "/tmp/drill/sdxl_drill.safetensors"
    t0 = time.time()
    sd = load_safetensors_native(path, copy=False)
    print(f"mmap views: {time.time()-t0:.2f}s", flush=True)
    reader = sd.pop("__reader__", None)
    t0 = time.time()
    trees = convert_ldm_checkpoint(sd)
    print(f"convert: {time.time()-t0:.2f}s", flush=True)

    which = sys.argv[1] if len(sys.argv) > 1 else "unet"
    names = ["unet"] if which == "unet" else ["text_encoder", "text_encoder_2", "unet", "vae"]

    for mode in ("B_perleaf", "A_chunks", "B_perleaf2", "A_chunks2"):
        total = 0.0
        for name in names:
            tree = trees[name]
            t0 = time.time()
            if mode.startswith("A"):
                dev = tc.tree_to_jax(tree, dtype=jnp.bfloat16)
            else:
                dev = per_leaf_put(tree, jnp.bfloat16)
            jax.block_until_ready(dev)
            dt = time.time() - t0
            total += dt
            nbytes = sum(x.nbytes for x in jax.tree.leaves(tree))
            print(f"{mode} {name}: {dt:.2f}s ({nbytes/1e6/dt:.0f} MB/s)", flush=True)
            del dev
        print(f"{mode} TOTAL: {total:.2f}s", flush=True)

    if reader is not None:
        reader.close()


if __name__ == "__main__":
    main()
