"""Unit tests for bench.py's analytic-FLOPs accounting and the UCE CLI's
folder-name convention (reference generate_images-uce.py:176-180)."""

import sys


def test_esd_step_flops_row_arithmetic():
    sys.path.insert(0, "/root/repo")
    from bench import esd_step_flops

    f = 2.0  # per-row forward FLOPs
    # g==1 cond-only: T/2 warm rows + 3 teacher + 3x student(1 row)
    assert esd_step_flops(f, warm_iters=6, use_cfg=False) == f * (6 + 3 + 3)
    # CFG: doubled warm rows, +uncond teacher row, doubled student
    assert esd_step_flops(f, warm_iters=6, use_cfg=True) == f * (12 + 4 + 6)
    # batch/samples scale linearly
    assert esd_step_flops(f, 6, False, b=2, samples=3) == f * 12 * 2 * 3


def test_fwd_flops_cpu_counts_dot():
    sys.path.insert(0, "/root/repo")
    import jax.numpy as jnp

    from bench import fwd_flops

    f = fwd_flops(lambda a, b: a @ b, jnp.zeros((64, 32)), jnp.zeros((32, 16)))
    assert f is not None and abs(f - 2 * 64 * 32 * 16) <= 2 * 64 * 32 * 16 * 0.01


def test_uce_scale_folder_names():
    from sliders_conceptmod_tpu.cli.generate_images_uce import scale_folder

    assert scale_folder(0.5) == "half"
    assert scale_folder(-0.5) == "-half"
    assert scale_folder(-2.0) == "-2"
    assert scale_folder(0.0) == "0"
    assert scale_folder(1.0) == "1"
