"""End-to-end training driver test: tiny model, real dataset files on disk,
checkpoint save + resume, stage-1 adapter-only save, LoRA path."""

import dataclasses
import json

import numpy as np
import pytest
from PIL import Image

from llava_plus_tpu.train.train import (
    DataArguments,
    ModelArguments,
    TrainingArguments,
    train,
)

from .test_preprocess import SpLikeTokenizer


@pytest.fixture()
def corpus(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    records = []
    for i in range(8):
        if i % 2 == 0:
            name = f"img{i}.png"
            Image.fromarray(
                rng.integers(0, 255, (40, 52, 3), dtype=np.uint8)
            ).save(img_dir / name)
            records.append({
                "image": name,
                "conversations": [
                    {"from": "human", "value": f"<image>\nwhat is {i}"},
                    {"from": "gpt", "value": f"it is thing {i}"},
                ],
            })
        else:
            records.append({
                "conversations": [
                    {"from": "human", "value": f"compute {i} plus {i}"},
                    {"from": "gpt", "value": f"the answer is {2*i}"},
                ],
            })
    data_path = tmp_path / "data.json"
    data_path.write_text(json.dumps(records))
    return data_path, img_dir


def _args(corpus, tmp_path, **kw):
    data_path, img_dir = corpus
    model_args = ModelArguments(tiny_debug_model=True, version="v1")
    data_args = DataArguments(
        data_path=str(data_path), image_folder=str(img_dir),
        image_aspect_ratio="pad",
    )
    training_args = TrainingArguments(
        output_dir=str(tmp_path / "out"),
        per_device_train_batch_size=4,
        model_max_length=96,
        max_steps=3,
        save_steps=2,
        bf16=False,
        gradient_checkpointing=False,
        dp=1, fsdp_axis=1, tp=1,
        **kw,
    )
    return model_args, data_args, training_args


def test_train_runs_and_checkpoints(corpus, tmp_path):
    model_args, data_args, training_args = _args(corpus, tmp_path)
    tok = SpLikeTokenizer()
    tok.model_max_length = 96
    params, cfg = train(model_args, data_args, training_args, tokenizer=tok)
    out = tmp_path / "out"
    cks = list(out.glob("checkpoint-*"))
    assert cks, "no checkpoints written"
    # HF export on final save
    assert (out / "hf_export" / "model.safetensors").exists()
    assert (out / "hf_export" / "config.json").exists()


def test_train_resume(corpus, tmp_path):
    model_args, data_args, training_args = _args(corpus, tmp_path)
    tok = SpLikeTokenizer()
    tok.model_max_length = 96
    train(model_args, data_args, training_args, tokenizer=tok)
    # resume: raise max_steps, training continues from step 3
    training_args2 = dataclasses.replace(training_args, max_steps=4)
    train(model_args, data_args, training_args2, tokenizer=tok)
    out = tmp_path / "out"
    steps = sorted(
        int(p.name.split("-")[1]) for p in out.glob("checkpoint-*")
    )
    assert 4 in steps


def test_stage1_adapter_only_save(corpus, tmp_path):
    model_args, data_args, training_args = _args(corpus, tmp_path)
    model_args = dataclasses.replace(model_args, tune_mm_mlp_adapter=True)
    tok = SpLikeTokenizer()
    tok.model_max_length = 96
    train(model_args, data_args, training_args, tokenizer=tok)
    assert (tmp_path / "out" / "mm_projector.bin").exists()


def test_lora_training(corpus, tmp_path):
    model_args, data_args, training_args = _args(
        corpus, tmp_path, lora_enable=True, lora_r=4, lora_alpha=8,
    )
    training_args = dataclasses.replace(training_args, save_steps=100)
    tok = SpLikeTokenizer()
    tok.model_max_length = 96
    train(model_args, data_args, training_args, tokenizer=tok)
    out = tmp_path / "out"
    assert (out / "adapter_model.safetensors").exists()
    assert (out / "adapter_config.json").exists()
    assert (out / "non_lora_trainables.bin").exists()


def test_pack_sequences_training(corpus, tmp_path):
    """--pack-sequences end-to-end: mixed image/text corpus packs into
    fixed rows and trains to completion with checkpoints + HF export."""
    model_args, data_args, training_args = _args(
        corpus, tmp_path, pack_sequences=True, pack_max_images=2,
    )
    tok = SpLikeTokenizer()
    tok.model_max_length = 96
    train(model_args, data_args, training_args, tokenizer=tok)
    out = tmp_path / "out"
    assert list(out.glob("checkpoint-*")), "no checkpoints written"
    assert (out / "hf_export" / "model.safetensors").exists()


def test_gradient_accumulation_training(corpus, tmp_path):
    """--gradient_accumulation_steps end-to-end: one optimizer step per
    K stacked micro-batches (regression: the flag existed but was
    silently ignored)."""
    model_args, data_args, training_args = _args(
        corpus, tmp_path, gradient_accumulation_steps=2,
    )
    training_args = dataclasses.replace(
        training_args, max_steps=2, per_device_train_batch_size=2,
    )
    tok = SpLikeTokenizer()
    tok.model_max_length = 96
    train(model_args, data_args, training_args, tokenizer=tok)
    assert (tmp_path / "out" / "checkpoint-2").exists()


def test_group_by_modality_sampler(corpus, tmp_path):
    model_args, data_args, training_args = _args(
        corpus, tmp_path, group_by_modality_length=True,
    )
    tok = SpLikeTokenizer()
    tok.model_max_length = 96
    train(model_args, data_args, training_args, tokenizer=tok)


def test_mpt_backbone_training(corpus, tmp_path):
    """LLaVA-MPT trains end-to-end (ref trains MPT-backbone llava via
    --version mpt): preprocess_mpt labels -> ALiBi forward/backward ->
    checkpoints."""
    model_args, data_args, training_args = _args(corpus, tmp_path)
    model_args = dataclasses.replace(
        model_args, tiny_debug_arch="mpt", version="mpt",
    )
    tok = SpLikeTokenizer()
    tok.model_max_length = 96
    tok.bos_token_id = None  # MPT's GPT-NeoX-style tokenizer has no BOS
    train(model_args, data_args, training_args, tokenizer=tok)
    out = tmp_path / "out"
    assert list(out.glob("checkpoint-*"))
    # the final HF export round-trips through our own importer
    from llava_plus_tpu.models.hf_import import (
        llava_config_from_hf_dir, llava_params_from_hf_dir,
    )

    cfg2 = llava_config_from_hf_dir(out / "hf_export")
    assert cfg2.language_model_type == "mpt"
    params2, _ = llava_params_from_hf_dir(out / "hf_export", dtype="float32")
    assert "wte" in params2["language_model"]


def test_freeze_mm_mlp_adapter(corpus, tmp_path):
    """--freeze_mm_mlp_adapter: the projector must not move while the LM
    does (ref train.py:945-948)."""
    model_args, data_args, training_args = _args(
        corpus, tmp_path, freeze_mm_mlp_adapter=True,
    )
    training_args = dataclasses.replace(training_args, max_steps=1,
                                        save_steps=100)
    tok = SpLikeTokenizer()
    tok.model_max_length = 96
    params, cfg = train(model_args, data_args, training_args, tokenizer=tok)

    import jax
    from llava_plus_tpu.models import llava as llava_model
    import jax.numpy as jnp
    fresh = llava_model.init_params(cfg, jax.random.PRNGKey(0),
                                    dtype=jnp.float32)
    proj_same = jax.tree.all(jax.tree.map(
        lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
        params["mm_projector"], fresh["mm_projector"],
    ))
    lm_moved = not jax.tree.all(jax.tree.map(
        lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
        params["language_model"], fresh["language_model"],
    ))
    assert proj_same and lm_moved
