"""On-chip training-step throughput bench (the README "Training" number).

Runs the real jitted train step (remat + AdamW + multimodal splice) on a
~0.9B-param debug LLaVA config at batch 8 x 1024 tokens and reports
tok/s/chip + model FLOP utilization. `--attn xla` times the pre-Pallas
attention path for comparison.

Usage: python tools/bench_train.py [--attn auto|xla] [--steps 5]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp


def debug_09b_config():
    import dataclasses

    from llava_plus_tpu.models.configs import (
        CLIP_VIT_L_336, LlamaConfig, LlavaConfig,
    )

    text = LlamaConfig(
        hidden_size=2048, intermediate_size=5504, num_hidden_layers=16,
        num_attention_heads=16, num_key_value_heads=16,
    )
    return LlavaConfig(text=text, vision=CLIP_VIT_L_336)


def make_batch(cfg, batch_size, seq_len):
    from llava_plus_tpu.constants import IMAGE_TOKEN_INDEX
    from llava_plus_tpu.data.multimodal import pad_images, plan_multimodal_batch
    from llava_plus_tpu.models.llava import MultimodalBatch

    rng = np.random.default_rng(0)
    n_patch = cfg.vision.num_patches
    img = cfg.vision.image_size
    n_text = seq_len - n_patch
    ids_list, labels_list, images = [], [], []
    for _ in range(batch_size):
        ids = np.concatenate(
            [[1, IMAGE_TOKEN_INDEX], rng.integers(3, 30000, size=n_text - 1)]
        )
        labs = np.concatenate([[-100, -100], ids[2:]])
        ids_list.append(ids)
        labels_list.append(labs)
        images.append(rng.normal(size=(1, img, img, 3)).astype(np.float32))
    plan = plan_multimodal_batch(
        ids_list, labels_list, num_patches=n_patch,
        max_len=seq_len, pad_to=seq_len,
    )
    imgs = pad_images(images, 1, (img, img, 3), np.float32)
    return MultimodalBatch(
        tokens=jnp.asarray(plan.tokens),
        positions=jnp.asarray(plan.positions),
        segment_ids=jnp.asarray(plan.segment_ids),
        images=jnp.asarray(imgs),
        image_pos=jnp.asarray(plan.image_pos),
        labels=jnp.asarray(plan.labels),
    )


def count_params(params):
    return sum(
        int(np.prod(a.shape)) for a in jax.tree.leaves(params)
        if hasattr(a, "shape")
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--attn", default="auto", choices=["auto", "xla"])
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=1024)
    args = p.parse_args()

    from llava_plus_tpu.models import llava as llava_model
    from llava_plus_tpu.train.optimizer import OptimizerConfig, build_optimizer
    from llava_plus_tpu.train.step import init_opt_state, make_train_step

    cfg = debug_09b_config()
    params = llava_model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    n_params = count_params(params)
    batch = make_batch(cfg, args.batch, args.seq)

    opt = build_optimizer(params, OptimizerConfig(
        learning_rate=2e-5, mm_projector_lr=2e-5, total_steps=1000,
    ))
    step = make_train_step(cfg, opt, attn_impl=args.attn, remat=True)
    opt_state = init_opt_state(opt, params)

    def sync(metrics):
        return float(np.asarray(jax.device_get(metrics["loss"])))

    t0 = time.perf_counter()
    params, opt_state, metrics = step(params, opt_state, batch)
    first_loss = sync(metrics)
    print(f"compile+step0: {time.perf_counter()-t0:.1f}s loss={first_loss:.4f}")

    t0 = time.perf_counter()
    losses = []
    for _ in range(args.steps):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(sync(metrics))
    dt = (time.perf_counter() - t0) / args.steps

    toks = args.batch * args.seq
    tok_s = toks / dt
    # 6*N*T model flops (fwd+bwd) + attention 0.5*14*B*T^2*H*D
    text = cfg.text
    attn_flops = 0.5 * 14 * args.batch * args.seq ** 2 * \
        text.num_attention_heads * text.head_dim * text.num_hidden_layers
    flops = 6 * n_params * toks + attn_flops
    peak = 197e12  # v5e bf16 peak
    print(f"params: {n_params/1e9:.2f}B  step: {dt*1e3:.0f} ms  "
          f"tok/s/chip: {tok_s:,.0f}  MFU: {flops/dt/peak*100:.1f}%")
    print(f"losses: {[round(l, 4) for l in losses]}")


if __name__ == "__main__":
    main()
