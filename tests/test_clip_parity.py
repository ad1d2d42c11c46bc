"""Numerical parity: our CLIP ViT tower vs HF CLIPVisionModel (layer -2,
patch features — the LLaVA feature-select path)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llava_plus_tpu.models import clip_vit
from llava_plus_tpu.models.hf_import import (
    clip_config_from_hf,
    clip_params_from_state_dict,
)


@pytest.fixture(scope="module")
def hf_clip():
    import torch
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModel

    torch.manual_seed(0)
    cfg = HFConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=2,
        image_size=28,
        patch_size=14,
    )
    model = CLIPVisionModel(cfg).eval()
    return model, cfg


def _ours(hf_clip, select_layer):
    model, hf_cfg = hf_clip
    import dataclasses

    cfg = dataclasses.replace(
        clip_config_from_hf(hf_cfg.to_dict()), select_layer=select_layer
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = clip_params_from_state_dict(sd, cfg, dtype=jnp.float32)
    return params, cfg


@pytest.mark.parametrize("select_layer", [-2, -1, 1])
def test_hidden_layer_features_match(hf_clip, select_layer):
    import torch

    model, _ = hf_clip
    params, cfg = _ours(hf_clip, select_layer)

    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)

    with torch.no_grad():
        out = model(
            torch.tensor(imgs.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
    ref = out.hidden_states[select_layer].numpy()[:, 1:]  # patch features

    got = clip_vit.encode(params, cfg, jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5, rtol=1e-4)


def test_cls_patch_feature(hf_clip):
    import torch

    model, _ = hf_clip
    params, cfg = _ours(hf_clip, -2)
    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(1, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(
            torch.tensor(imgs.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
    ref = out.hidden_states[-2].numpy()
    got = clip_vit.encode(params, cfg, jnp.asarray(imgs), select_feature="cls_patch")
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5, rtol=1e-4)
