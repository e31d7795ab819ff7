"""Tests for the analytic MXU-FLOPs model (ops/flops.py).

The model must track the kernel's actual GEMM shapes — these tests pin the
hand-derivable cases and the structural invariants the bench relies on.
"""

import math

from signerf_tpu.models.nerfacto import NerfactoModelConfig
from signerf_tpu.ops.factor_grid import FactorGridConfig
from signerf_tpu.ops.flops import (
    breakdown_str,
    factor_encode_flops,
    mlp_flops,
    mxu_util,
    nerfacto_flops,
)


def test_mlp_flops_exact():
    # 128 -> 64 -> 16: 2*(128*64 + 64*16)
    assert mlp_flops([128, 64, 16]) == 2 * (128 * 64 + 64 * 16)


def test_factor_encode_small_only():
    # 2 levels, res 16/32 (both <= SMALL_MAX_RES), F=4:
    # one packed GEMM per axis: [2*4, round_up(48, 8)=48] -> 2*8*48 per axis.
    cfg = FactorGridConfig(num_levels=2, base_res=16, max_res=32, features_per_level=4)
    assert factor_encode_flops(cfg) == 3 * 2 * 8 * 48


def test_factor_encode_large_level():
    # Single 2048 level, F=16: r1 = ceil(2047/8) = 256 (already /8-aligned);
    # per axis t1 GEMM [9*16, 256] -> 2*144*256.
    cfg = FactorGridConfig(num_levels=1, base_res=2048, max_res=2048, features_per_level=16)
    assert factor_encode_flops(cfg) == 3 * 2 * (9 * 16) * 256


def test_nerfacto_flops_magnitude_and_ordering():
    fl = nerfacto_flops(NerfactoModelConfig())
    # Default model: ~50 MFLOP/ray render (see ops/flops.py docstring);
    # pin a sanity window so regressions in the model are loud.
    assert 10e6 < fl.render_per_ray < 200e6
    # Backward exists: train must cost 2-3x render.
    assert 2 * fl.render_per_ray < fl.train_per_ray <= 3 * fl.render_per_ray
    # Breakdown covers the whole budget.
    assert "field encode" in breakdown_str(fl)
    total = fl.nerf_samples * (fl.field_encode + fl.field_mlps) + sum(
        n * f for n, f in zip(fl.proposal_samples, fl.proposal)
    )
    assert total == fl.render_per_ray


def test_predict_normals_adds_head():
    base = nerfacto_flops(NerfactoModelConfig())
    with_n = nerfacto_flops(NerfactoModelConfig(predict_normals=True))
    assert with_n.field_mlps > base.field_mlps
    assert with_n.field_encode == base.field_encode


def test_mxu_util_formula():
    assert math.isclose(mxu_util(50e6, 1e6, 197e12), 100 * 50e12 / 197e12)


def test_sdxl_step_flops_magnitude():
    # 190 ms/step measured at ~54% MXU on v5e (197 TFLOP/s peak) => ~20 TFLOP.
    from signerf_tpu.diffusion.sdxl_pipeline import SDXL_UNET_CONFIG
    from signerf_tpu.ops.flops import sdxl_denoise_step_flops

    fl = sdxl_denoise_step_flops(SDXL_UNET_CONFIG, (128, 128))
    assert 14e12 < fl < 26e12, fl / 1e12


def test_unet_flops_tiny_by_hand():
    # Single block, no attention, layers_per_block=1: hand-derivable.
    import dataclasses

    from signerf_tpu.diffusion.unet import UNetConfig
    from signerf_tpu.ops.flops import unet_flops

    cfg = UNetConfig(
        block_out_channels=(8,),
        layers_per_block=1,
        transformer_layers=(0,),
        projection_class_embeddings_input_dim=16,
    )
    h = w = 4
    t = 32  # time_dim = 8*4
    expect = 0
    expect += 2 * (8 * t + t * t)  # time embed
    expect += 2 * (16 * t + t * t)  # add embed
    expect += 2 * 9 * 4 * 8 * h * w  # conv_in (in_channels=4)
    # down resnet 8->8: conv1 + time proj + conv2 (no shortcut)
    res = 2 * 9 * 8 * 8 * h * w + 2 * t * 8 + 2 * 9 * 8 * 8 * h * w
    expect += res
    # mid res x2 (8->8)
    expect += 2 * res
    # up path: layers_per_block+1 = 2 resnets with concat skips
    # residual stack: [(8 conv_in), (8 down res)]; both pops give cin=16
    res_up = (
        2 * 9 * 16 * 8 * h * w + 2 * t * 8 + 2 * 9 * 8 * 8 * h * w
        + 2 * 16 * 8 * h * w  # 1x1 shortcut (16 != 8)
    )
    expect += 2 * res_up
    expect += 2 * 9 * 8 * 4 * h * w  # conv_out
    got = unet_flops(cfg, (h, w))
    assert got == expect, (got, expect)


def test_controlnet_encoder_cheaper_than_full():
    from signerf_tpu.diffusion.sdxl_pipeline import SDXL_UNET_CONFIG
    from signerf_tpu.ops.flops import controlnet_flops, unet_flops

    full = unet_flops(SDXL_UNET_CONFIG, (64, 64))
    ctrl = controlnet_flops(SDXL_UNET_CONFIG, (64, 64))
    assert ctrl < full  # encoder-only core + stem < full UNet
