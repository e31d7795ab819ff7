"""Weight-conversion mapping tests: every flax leaf of the (tiny) SDXL tree
maps to a unique diffusers-style torch key, and a synthetic torch state
dict round-trips through the converter bit-exactly."""

import numpy as np
import pytest

from signerf_tpu.diffusion.sdxl_pipeline import (
    TINY_SDXL_CONFIG,
    SDXLInpaintPipeline,
)
from signerf_tpu.diffusion.weight_conversion import (
    convert_all,
    convert_component,
    expected_torch_keys,
)


@pytest.fixture(scope="module")
def params():
    return SDXLInpaintPipeline._random_init(TINY_SDXL_CONFIG, seed=0)


def make_fake_torch_sd(component, flax_params, seed=0):
    """Torch-layout state dict with random values matching flax shapes."""
    rng = np.random.RandomState(seed)
    sd = {}
    for tkey, (path, kind) in expected_torch_keys(component, flax_params).items():
        leaf = flax_params
        for k in path:
            leaf = leaf[k]
        shape = np.shape(leaf)
        if kind == "kernel" and len(shape) == 4:  # HWIO -> OIHW
            tshape = (shape[3], shape[2], shape[0], shape[1])
        elif kind == "kernel" and len(shape) == 2:
            tshape = (shape[1], shape[0])
        else:
            tshape = shape
        sd[tkey] = rng.randn(*tshape).astype(np.float32)
    return sd


class TestMapping:
    @pytest.mark.parametrize(
        "component", ["unet", "controlnet", "vae", "clip_l", "clip_g"]
    )
    def test_all_leaves_mapped_uniquely(self, params, component):
        keys = expected_torch_keys(component, params[component])
        # unique torch keys == number of flax leaves
        from signerf_tpu.diffusion.weight_conversion import _flatten

        assert len(keys) == len(_flatten(params[component]))

    def test_known_names_present(self, params):
        unet_keys = expected_torch_keys("unet", params["unet"])
        assert "conv_in.weight" in unet_keys
        assert "time_embedding.linear_1.weight" in unet_keys
        assert any("transformer_blocks.0.attn2.to_q" in k for k in unet_keys)
        assert any("ff.net.0.proj" in k for k in unet_keys)
        cn_keys = expected_torch_keys("controlnet", params["controlnet"])
        assert "controlnet_cond_embedding.conv_in.weight" in cn_keys
        assert "controlnet_mid_block.weight" in cn_keys
        vae_keys = expected_torch_keys("vae", params["vae"])
        assert "quant_conv.weight" in vae_keys
        assert "post_quant_conv.weight" in vae_keys
        assert any("mid_block.attentions.0.to_out.0" in k for k in vae_keys)
        clip_keys = expected_torch_keys("clip_g", params["clip_g"])
        assert "text_model.embeddings.token_embedding.weight" in clip_keys
        assert "text_projection.weight" in clip_keys
        assert any("self_attn.q_proj" in k for k in clip_keys)

    def test_convert_roundtrip_exact(self, params):
        for component in ["unet", "vae", "clip_l"]:
            sd = make_fake_torch_sd(component, params[component])
            converted = convert_component(component, params[component], sd)
            # verify one conv and one linear transform
            keys = expected_torch_keys(component, params[component])
            for tkey, (path, kind) in list(keys.items())[:50]:
                leaf = converted
                for k in path:
                    leaf = leaf[k]
                src = sd[tkey]
                if kind == "kernel" and src.ndim == 4:
                    np.testing.assert_array_equal(leaf, src.transpose(2, 3, 1, 0))
                elif kind == "kernel" and src.ndim == 2:
                    np.testing.assert_array_equal(leaf, src.T)
                else:
                    np.testing.assert_array_equal(leaf, src)

    def test_missing_key_raises_with_list(self, params):
        sd = make_fake_torch_sd("vae", params["vae"])
        sd.pop("quant_conv.weight")
        with pytest.raises(KeyError, match="quant_conv"):
            convert_component("vae", params["vae"], sd)

    def test_convert_all(self, params):
        sds = {c: make_fake_torch_sd(c, params[c]) for c in params}
        out = convert_all(params, sds)
        assert set(out) == set(params)
