"""Training driver: the two-stage visual instruction tuning recipes.

Rebuild of ``llava/train/train.py:805-1000`` + ``llava_trainer.py`` on the
jitted train step. The HF Trainer + DeepSpeed stack collapses into: build
params (HF import or fresh) -> place on the (dp, fsdp, tp) mesh -> loop
{sample, collate, step} -> orbax checkpoints (+ HF-format exports).

CLI mirrors the reference's argument surface (ModelArguments /
DataArguments / TrainingArguments) so the shell recipes port 1:1.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path
from typing import Optional

import numpy as np

from llava_plus_tpu import conversation as conversation_lib
from llava_plus_tpu.data.dataset import (
    DataConfig,
    LengthGroupedSampler,
    collate_batch,
    make_supervised_dataset,
)
from llava_plus_tpu.data.image_processing import processor_for_vision_tower
from llava_plus_tpu.models.configs import LlavaConfig, tiny_llava_config
from llava_plus_tpu.train.optimizer import OptimizerConfig, build_optimizer
from llava_plus_tpu.utils.logging import build_logger

logger = build_logger("train", "train.log")


@dataclasses.dataclass
class ModelArguments:
    model_name_or_path: Optional[str] = None
    version: str = "v1"
    vision_tower: Optional[str] = None
    mm_vision_select_layer: int = -2
    mm_vision_select_feature: str = "patch"
    mm_projector_type: str = "mlp2x_gelu"
    pretrain_mm_mlp_adapter: Optional[str] = None
    tune_mm_mlp_adapter: bool = False
    freeze_backbone: bool = False
    mm_use_im_start_end: bool = False
    mm_use_im_patch_token: bool = False
    tiny_debug_model: bool = False  # tests/CI: random tiny model
    tiny_debug_arch: str = "llama"  # "llama" | "mpt" backbone for it
    # accepted for reference-recipe compatibility; attention is always the
    # fused Pallas/XLA kernel here (no triton/torch impl to select)
    mpt_attn_impl: Optional[str] = "triton"


@dataclasses.dataclass
class DataArguments:
    data_path: str = ""
    image_folder: str = ""
    image_aspect_ratio: str = "square"
    lazy_preprocess: bool = True
    is_multimodal: bool = True


@dataclasses.dataclass
class TrainingArguments:
    output_dir: str = "./checkpoints/run"
    num_train_epochs: int = 1
    per_device_train_batch_size: int = 16
    gradient_accumulation_steps: int = 1
    learning_rate: float = 2e-5
    mm_projector_lr: Optional[float] = None
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    lr_scheduler_type: str = "cosine"
    model_max_length: int = 2048
    save_steps: int = 500
    logging_steps: int = 1
    group_by_modality_length: bool = False
    # batches prepared ahead on a producer thread so host work (PIL
    # decode, collate/pack) overlaps the device step; 0 = inline
    prefetch_batches: int = 2
    # pack several samples into each fixed [batch, model_max_length] row
    # (segment-id isolated, positions restart per sample; ONE compiled
    # step shape) — beats padding when samples are short vs max_length
    pack_sequences: bool = False
    pack_max_images: int = 2
    gradient_checkpointing: bool = True
    bf16: bool = True
    # 4/8 = QLoRA: quantize the frozen LM (blockwise int4 / per-channel int8)
    # and train only the adapters (ref train.py:814-831 bitsandbytes path).
    bits: int = 16
    # train everything EXCEPT the projector (ref train.py:945-948)
    freeze_mm_mlp_adapter: bool = False
    lora_enable: bool = False
    lora_r: int = 128
    lora_alpha: int = 256
    lora_dropout: float = 0.05
    # accepted for reference-recipe compatibility. optimizer is optax
    # adamw (== adamw_torch); QLoRA quantization here is blockwise int4 /
    # per-channel int8 (not nf4 double-quant — see docs/LoRA.md); LoRA
    # bias training is unsupported (PEFT default "none" is what exports)
    optim: str = "adamw_torch"
    remove_unused_columns: bool = False
    double_quant: bool = True
    quant_type: str = "nf4"
    lora_bias: str = "none"
    lora_weight_path: str = ""
    cache_dir: Optional[str] = None
    dp: int = 1
    fsdp_axis: Optional[int] = None
    tp: int = 1
    seed: int = 42
    max_steps: Optional[int] = None
    resume: bool = True


def build_model(model_args: ModelArguments, dtype):
    """Construct (params, cfg) per the stage recipes."""
    import jax
    import jax.numpy as jnp

    from llava_plus_tpu.models import llava as llava_model

    if model_args.tiny_debug_model or model_args.model_name_or_path is None:
        if model_args.tiny_debug_arch == "mpt":
            from llava_plus_tpu.models.configs import tiny_llava_mpt_config

            cfg = tiny_llava_mpt_config()
            vocab = cfg.mpt.vocab_size
        else:
            cfg = tiny_llava_config()
            vocab = cfg.text.vocab_size
        params = llava_model.init_params(
            cfg, jax.random.PRNGKey(0),
            jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
        )
        from llava_plus_tpu.data.debug_tokenizer import DebugTokenizer

        tok = DebugTokenizer(vocab_size=vocab)
        if model_args.tiny_debug_arch == "mpt":
            tok.bos_token_id = None  # MPT tokenizers carry no BOS
        return params, cfg, tok

    from llava_plus_tpu.models.builder import load_pretrained_model

    tokenizer, params, cfg, _proc, _ctx = load_pretrained_model(
        model_args.model_name_or_path, dtype=dtype
    )
    if model_args.pretrain_mm_mlp_adapter:
        import torch

        from llava_plus_tpu.models import hf_import

        sd = torch.load(model_args.pretrain_mm_mlp_adapter,
                        map_location="cpu", weights_only=True)
        sd = {k.replace("model.mm_projector.", ""): v for k, v in sd.items()}
        params["mm_projector"] = hf_import.projector_params_from_state_dict(
            sd, cfg.mm_projector_type, dtype=dtype
        )
    return params, cfg, tokenizer


def train(model_args: ModelArguments, data_args: DataArguments,
          training_args: TrainingArguments, tokenizer=None):
    import jax
    import jax.numpy as jnp

    from llava_plus_tpu.models.llava import MultimodalBatch
    from llava_plus_tpu.parallel.mesh import make_mesh
    from llava_plus_tpu.train import checkpoint as ckpt_lib
    from llava_plus_tpu.train.step import (
        init_opt_state, make_train_step, place_batch, place_params,
    )

    dtype = "bfloat16" if training_args.bf16 else "float32"
    params, cfg, loaded_tokenizer = build_model(model_args, dtype)
    tokenizer = tokenizer or loaded_tokenizer
    assert tokenizer is not None, "a tokenizer is required for training"

    conv = conversation_lib.conv_templates.get(
        model_args.version, conversation_lib.default_conversation
    )

    # dataset -------------------------------------------------------------
    data_cfg = DataConfig(
        data_path=data_args.data_path,
        image_folder=data_args.image_folder,
        image_aspect_ratio=(
            data_args.image_aspect_ratio
            if data_args.image_aspect_ratio != "square" else None
        ),
        is_multimodal=data_args.is_multimodal,
        mm_use_im_start_end=model_args.mm_use_im_start_end,
        conv_version=conv.version,
    )
    from llava_plus_tpu.data.image_processing import ClipImageProcessor

    if model_args.vision_tower:
        image_processor = processor_for_vision_tower(model_args.vision_tower)
    else:
        image_processor = ClipImageProcessor(
            shortest_edge=cfg.vision.image_size,
            crop_size=cfg.vision.image_size,
        )
    dataset = make_supervised_dataset(tokenizer, data_cfg, image_processor, conv)
    logger.info(f"train_dataset size: {len(dataset)}")

    batch_size = training_args.per_device_train_batch_size
    steps_per_epoch = max(len(dataset) // batch_size, 1)
    total_steps = training_args.max_steps or (
        steps_per_epoch * training_args.num_train_epochs
    )

    # optimizer -----------------------------------------------------------
    opt_cfg = OptimizerConfig(
        learning_rate=training_args.learning_rate,
        mm_projector_lr=training_args.mm_projector_lr,
        weight_decay=training_args.weight_decay,
        warmup_ratio=training_args.warmup_ratio,
        total_steps=total_steps,
        schedule="cosine" if training_args.lr_scheduler_type == "cosine" else "constant",
        train_language_model=not (
            model_args.tune_mm_mlp_adapter or model_args.freeze_backbone
        ),
        train_mm_projector=not training_args.freeze_mm_mlp_adapter,
        train_vision_tower=False,
    )
    if training_args.lora_bias != "none":
        logger.warning(
            "--lora-bias %r: only 'none' is supported (the PEFT export "
            "carries no bias terms); proceeding without bias training",
            training_args.lora_bias,
        )
    lora_cfg = None
    lora_params = None
    if training_args.lora_enable:
        from llava_plus_tpu.train.lora import LoraConfig, init_lora_params

        lora_cfg = LoraConfig(
            r=training_args.lora_r, alpha=training_args.lora_alpha,
            dropout=training_args.lora_dropout,
        )
        if training_args.bits in (4, 8):
            from llava_plus_tpu.ops.quant import quantize_llava_params

            params = quantize_llava_params(params, bits=training_args.bits)
        lora_params = init_lora_params(
            params["language_model"], lora_cfg, jax.random.PRNGKey(1)
        )
        opt_cfg = dataclasses.replace(opt_cfg, train_language_model=False)

    optimizer = build_optimizer(params, opt_cfg)

    # mesh + placement ----------------------------------------------------
    n_dev = len(jax.devices())
    fsdp = training_args.fsdp_axis or (n_dev // (training_args.dp * training_args.tp))
    mesh = make_mesh(training_args.dp, fsdp, training_args.tp)
    params = place_params(params, mesh, cfg)
    opt_state = init_opt_state(optimizer, params)

    accum = max(int(training_args.gradient_accumulation_steps), 1)
    step_fn = make_train_step(
        cfg, optimizer, remat=training_args.gradient_checkpointing,
        mesh=mesh, accum_steps=accum,
    )
    if training_args.lora_enable:
        from llava_plus_tpu.train.lora import apply_lora

        import optax as _optax

        lora_opt = _optax.adamw(training_args.learning_rate)
        lora_opt_state = lora_opt.init(lora_params)

        def lora_step(lora_params, lora_opt_state, base_params, batch):
            from llava_plus_tpu.train.step import (
                grads_and_metrics, loss_fn,
            )

            def loss(lp, mb):
                merged = dict(
                    base_params,
                    language_model=apply_lora(
                        base_params["language_model"], lp, lora_cfg
                    ),
                )
                return loss_fn(merged, cfg, mb,
                               remat=training_args.gradient_checkpointing)

            grads, metrics = grads_and_metrics(
                loss, lora_params, batch, accum
            )
            updates, lora_opt_state = lora_opt.update(
                grads, lora_opt_state, lora_params
            )
            lora_params = _optax.apply_updates(lora_params, updates)
            metrics = dict(metrics, grad_norm=_optax.global_norm(grads))
            return lora_params, lora_opt_state, metrics

        lora_step = jax.jit(lora_step, donate_argnums=(0, 1))

    # resume --------------------------------------------------------------
    start_step = 0
    out_dir = Path(training_args.output_dir)
    if training_args.resume:
        latest = ckpt_lib.latest_checkpoint(out_dir)
        if latest is not None:
            state, start_step = ckpt_lib.restore_train_state(
                latest, params, opt_state
            )
            params, opt_state = state["params"], state["opt_state"]
            logger.info(f"resumed from {latest} at step {start_step}")

    # sampler -------------------------------------------------------------
    if training_args.group_by_modality_length:
        sampler = LengthGroupedSampler(
            batch_size, world_size=1, lengths=dataset.modality_lengths,
            group_by_modality=True, seed=training_args.seed,
        )
    else:
        sampler = None

    # loop ----------------------------------------------------------------
    step = start_step
    rng = np.random.default_rng(training_args.seed)
    t_last = time.time()

    pad_id = getattr(tokenizer, "pad_token_id", 0) or 0

    def epoch_batches(order):
        """Batch arrays for one epoch pass: padded per-sample rows, or
        (``--pack-sequences``) fixed-shape rows packing a contiguous run
        of the sampler order (segment-id isolated; see data/packing.py)."""
        if training_args.pack_sequences:
            from llava_plus_tpu.data.packing import pack_instances

            i = 0
            while i < len(order):
                window = [dataset[j]
                          for j in order[i:i + batch_size * 16]]
                arrays, consumed = pack_instances(
                    window, rows=batch_size,
                    max_len=training_args.model_max_length,
                    num_patches=cfg.num_image_tokens,
                    image_size=cfg.vision.image_size,
                    max_images_per_row=training_args.pack_max_images,
                    pad_token_id=pad_id,
                )
                if consumed == 0:
                    break
                i += consumed
                yield arrays
            return
        for i in range(0, len(order) - batch_size + 1, batch_size):
            instances = [dataset[j] for j in order[i:i + batch_size]]
            yield collate_batch(
                instances,
                num_patches=cfg.num_image_tokens,
                max_len=training_args.model_max_length,
                image_size=cfg.vision.image_size,
                pad_token_id=pad_id,
            )

    def grouped_batches(order):
        """epoch_batches, stacked [accum, B, ...] when gradient
        accumulation is on (one optimizer step per group; ragged epoch
        tail dropped, as HF Trainer does)."""
        if accum == 1:
            yield from epoch_batches(order)
            return
        buf = []
        for arrays in epoch_batches(order):
            buf.append(arrays)
            if len(buf) == accum:
                yield {k: np.stack([b[k] for b in buf]) for k in buf[0]}
                buf = []

    def batches(order):
        """grouped_batches, optionally pulled ahead by a producer thread
        so image decode + collate/pack overlap the device step (the jitted
        step dispatches async; without prefetch the host serializes prep
        behind each step's metrics fetch)."""
        depth = training_args.prefetch_batches
        if depth <= 0:
            yield from grouped_batches(order)
            return
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=depth)
        stop = threading.Event()
        DONE = object()

        def produce():
            try:
                for item in grouped_batches(order):
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
                q.put(DONE)
            except BaseException as e:  # surface producer errors in-loop
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is DONE:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    while step < total_steps:
        order = list(iter(sampler)) if sampler is not None else list(
            rng.permutation(len(dataset))
        )
        for arrays in batches(order):
            if step >= total_steps:
                break
            batch = MultimodalBatch(**{
                k: jax.numpy.asarray(v) for k, v in arrays.items()
            })
            batch = place_batch(batch, mesh, accum_steps=accum)
            if training_args.lora_enable:
                lora_params, lora_opt_state, metrics = lora_step(
                    lora_params, lora_opt_state, params, batch
                )
            else:
                params, opt_state, metrics = step_fn(params, opt_state, batch)
            step += 1
            if step % training_args.logging_steps == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                dt = time.time() - t_last
                t_last = time.time()
                logger.info(
                    f"step {step}/{total_steps} loss={m['loss']:.4f} "
                    f"acc={m['accuracy']:.3f} gnorm={m['grad_norm']:.2f} "
                    f"({dt:.2f}s)"
                )
            if step % training_args.save_steps == 0:
                _save(params, opt_state, step, cfg, training_args,
                      model_args, lora_params, lora_cfg, tokenizer)

    _save(params, opt_state, step, cfg, training_args, model_args,
          lora_params, lora_cfg, tokenizer, final=True)
    return params, cfg


def _save(params, opt_state, step, cfg, training_args, model_args,
          lora_params, lora_cfg, tokenizer, final: bool = False):
    from llava_plus_tpu.train import checkpoint as ckpt_lib

    out_dir = Path(training_args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if model_args.tune_mm_mlp_adapter:
        # adapter-only save (ref llava_trainer.py:239-258)
        ckpt_lib.export_mm_projector_bin(
            params, out_dir / f"{ckpt_lib.CKPT_PREFIX}{step}" / "mm_projector.bin"
        )
        if final:
            ckpt_lib.export_mm_projector_bin(params, out_dir / "mm_projector.bin")
        return
    if lora_params is not None:
        from llava_plus_tpu.train.lora import save_peft_adapter

        from llava_plus_tpu.train.checkpoint import (
            projector_state_dict_from_params,
        )

        extra = projector_state_dict_from_params(params["mm_projector"])
        save_peft_adapter(lora_params, lora_cfg, out_dir, extra)
        cfg.save(out_dir / "config.json")
        return
    ckpt_lib.save_train_state(out_dir, step, params, opt_state, cfg)
    if final:
        ckpt_lib.export_hf_llava(params, cfg, out_dir / "hf_export", tokenizer)


def main():
    parser = argparse.ArgumentParser()
    for dc in (ModelArguments, DataArguments, TrainingArguments):
        for f in dataclasses.fields(dc):
            # accept both --snake-case and the reference recipes'
            # --snake_case (HfArgumentParser style) so shell scripts
            # written against the reference run verbatim
            names = ["--" + f.name.replace("_", "-")]
            if "_" in f.name:
                names.append("--" + f.name)
            ann = str(f.type)
            if f.type == bool or isinstance(f.default, bool):
                parser.add_argument(*names,
                                    type=lambda x: x.lower() == "true",
                                    default=f.default)
            elif f.default is not None:
                parser.add_argument(*names, type=type(f.default),
                                    default=f.default)
            else:
                # Optional[...] fields: recover the scalar type from the
                # annotation so "--max-steps 3" parses as int, not "3".
                typ = str
                if "int" in ann:
                    typ = int
                elif "float" in ann:
                    typ = float
                parser.add_argument(*names, type=typ, default=None)
    args = parser.parse_args()

    def pick(dc):
        return dc(**{
            f.name: getattr(args, f.name) for f in dataclasses.fields(dc)
        })

    train(pick(ModelArguments), pick(DataArguments), pick(TrainingArguments))


if __name__ == "__main__":
    main()
