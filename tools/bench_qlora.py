"""On-chip 7B QLoRA training-step bench (VERDICT: demonstrate 7B training).

Runs the real QLoRA configuration — frozen int4-quantized LLaVA-1.5-7B base
+ LoRA r=128 adapters (ref scripts/finetune_qlora.sh) — on the single TPU
chip: the lazy LoRA path (ops/quant.matmul) never materializes the bf16
weights, so the whole step fits 16 GB. Reports tok/s/chip and the loss
trajectory (descending = adapters actually training).

Usage: python tools/bench_qlora.py [--batch 4] [--seq 1024] [--steps 4]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seq", type=int, default=1024)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--r", type=int, default=128)
    args = p.parse_args()

    import optax

    from llava_plus_tpu.models import llava as llava_model
    from llava_plus_tpu.models.configs import LLAVA_15_7B
    from llava_plus_tpu.ops.quant import quantize_llava_params
    from llava_plus_tpu.train.lora import LoraConfig, apply_lora, init_lora_params
    from llava_plus_tpu.train.step import loss_fn
    from tools.bench_train import count_params, make_batch

    cfg = LLAVA_15_7B
    print("init + int4 quantize 7B base...", flush=True)
    t0 = time.perf_counter()
    params = llava_model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = quantize_llava_params(params, bits=4)
    print(f"  {time.perf_counter()-t0:.0f}s", flush=True)

    lora_cfg = LoraConfig(r=args.r, alpha=2 * args.r)
    lora_params = init_lora_params(
        params["language_model"], lora_cfg, jax.random.PRNGKey(1)
    )
    n_lora = count_params(lora_params)

    batch = make_batch(cfg, args.batch, args.seq)
    opt = optax.adamw(2e-4)
    opt_state = opt.init(lora_params)

    def lora_step(lora_params, opt_state, base_params, batch):
        def loss(lp):
            merged = dict(
                base_params,
                language_model=apply_lora(
                    base_params["language_model"], lp, lora_cfg
                ),
            )
            return loss_fn(merged, cfg, batch, remat=True)

        (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(lora_params)
        updates, opt_state = opt.update(grads, opt_state, lora_params)
        lora_params = optax.apply_updates(lora_params, updates)
        return lora_params, opt_state, metrics

    step = jax.jit(lora_step, donate_argnums=(0, 1))

    def sync(metrics):
        return float(np.asarray(jax.device_get(metrics["loss"])))

    t0 = time.perf_counter()
    lora_params, opt_state, metrics = step(lora_params, opt_state, params, batch)
    l0 = sync(metrics)
    print(f"compile+step0: {time.perf_counter()-t0:.0f}s loss={l0:.4f}", flush=True)

    losses = [l0]
    t0 = time.perf_counter()
    for _ in range(args.steps):
        lora_params, opt_state, metrics = step(
            lora_params, opt_state, params, batch
        )
        losses.append(sync(metrics))
    dt = (time.perf_counter() - t0) / args.steps

    toks = args.batch * args.seq
    print(
        f"7B QLoRA (int4 base, LoRA r={args.r}, {n_lora/1e6:.0f}M adapter "
        f"params): step {dt*1e3:.0f} ms, {toks/dt:,.0f} tok/s/chip"
    )
    print(f"losses: {[round(l, 4) for l in losses]}")
    assert losses[-1] < losses[0], "loss did not descend"


if __name__ == "__main__":
    main()
