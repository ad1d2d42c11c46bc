"""On-chip sequence-packing measurement: REAL (supervised) tokens/sec of
the train step on a realistic mixed-length corpus, padded one-per-row vs
packed (`--pack-sequences`). Uses the 0.9B debug config like bench_train.py.

The corpus mirrors the reference finetune mix
(/root/reference/scripts/v1_5/finetune.sh trains llava_v1_5_mix665k:
~94% single-image samples whose conversations are mostly short QA, ~6%
text-only ShareGPT whose conversations run long) with lognormal text
lengths, so padded rows at the reference's 2048-token max_len genuinely
waste most of each step — the case --pack-sequences exists for. Round 4's
version used a uniform `--sample 320` corpus whose samples collapsed to
the 576-image-span minimum (3 supervised tokens each), measuring pure
packing overhead (CHIPBENCH r4: 0.70x). Usage: python tools/bench_pack.py
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np
import jax
import jax.numpy as jnp


def make_instances(cfg, n, rng, max_len):
    """Synthetic instruction-tuning mix with realistic length spread:
    94% single-image QA (text ~lognormal, median ~150 tokens) + 6%
    text-only conversations (median ~400). Labels supervise the answer
    spans (~60% of the text), mirroring preprocess_v1's masking."""
    from llava_plus_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX

    s = cfg.vision.image_size
    hi = min(30000, cfg.text.vocab_size - 1)
    insts = []
    for _ in range(n):
        multimodal = rng.random() < 0.94
        if multimodal:
            n_text = int(np.clip(rng.lognormal(np.log(150), 0.7), 32,
                                 max_len - cfg.num_image_tokens - 8))
            ids = np.concatenate(
                [[1, IMAGE_TOKEN_INDEX],
                 rng.integers(3, hi, size=n_text)]
            ).astype(np.int64)
            images = rng.normal(size=(1, s, s, 3)).astype(np.float32)
            prompt_len = 2 + int(n_text * 0.4)
        else:
            n_text = int(np.clip(rng.lognormal(np.log(400), 0.8), 64,
                                 max_len - 8))
            ids = np.concatenate(
                [[1], rng.integers(3, hi, size=n_text)]
            ).astype(np.int64)
            images = np.zeros((0, s, s, 3), np.float32)
            prompt_len = 1 + int(n_text * 0.4)
        labels = ids.copy()
        labels[:prompt_len] = IGNORE_INDEX
        insts.append({"input_ids": ids, "labels": labels, "images": images})
    return insts


def run(packed: bool, args):
    from llava_plus_tpu.models import llava as llava_model
    from llava_plus_tpu.models.llava import MultimodalBatch
    from llava_plus_tpu.data.dataset import collate_batch
    from llava_plus_tpu.data.packing import pack_instances
    from llava_plus_tpu.train.optimizer import (
        OptimizerConfig, build_optimizer,
    )
    from llava_plus_tpu.train.step import init_opt_state, make_train_step
    from bench_train import debug_09b_config

    if args.tiny:  # CPU smoke test of the corpus/pack/step plumbing
        from llava_plus_tpu.models.configs import tiny_llava_config

        cfg = tiny_llava_config()
    else:
        cfg = debug_09b_config()
    params = llava_model.init_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.bfloat16)
    opt = build_optimizer(params, OptimizerConfig(
        learning_rate=2e-5, mm_projector_lr=2e-5, total_steps=1000,
    ))
    opt_state = init_opt_state(opt, params)
    step = make_train_step(cfg, opt, attn_impl="auto", remat=True)

    rng = np.random.default_rng(0)
    kw = dict(num_patches=cfg.num_image_tokens, max_len=args.seq,
              image_size=cfg.vision.image_size)

    def next_batch():
        if packed:
            insts = make_instances(cfg, args.batch * 8, rng, args.seq)
            arrays, consumed = pack_instances(
                insts, rows=args.batch,
                max_images_per_row=args.pack_max_images, **kw)
        else:
            insts = make_instances(cfg, args.batch, rng, args.seq)
            arrays = collate_batch(insts, pad_to_multiple=args.seq, **kw)
        real = int((np.asarray(arrays["labels"]) != -100).sum())
        return MultimodalBatch(**{k: jnp.asarray(v)
                                  for k, v in arrays.items()}), real

    batch, _ = next_batch()
    params, opt_state, m = step(params, opt_state, batch)  # compile
    float(jax.device_get(m["loss"]))

    total_real = 0
    t0 = time.perf_counter()
    for _ in range(args.steps):
        batch, real = next_batch()
        total_real += real
        params, opt_state, m = step(params, opt_state, batch)
    loss = float(jax.device_get(m["loss"]))  # barrier
    dt = time.perf_counter() - t0
    print(f"{'packed' if packed else 'padded'}: "
          f"{total_real / dt:,.0f} real tok/s "
          f"({args.steps} steps, {dt:.2f}s, loss {loss:.3f})")
    return total_real / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--batch", type=int, default=8)
    # the reference's training max_len (scripts/v1_5/finetune.sh
    # --model_max_length 2048): the shape padding actually wastes at
    p.add_argument("--seq", type=int, default=2048)
    p.add_argument("--pack-max-images", type=int, default=2)
    p.add_argument("--tiny", action="store_true",
                   help="tiny config (CPU smoke test, not a measurement)")
    p.add_argument("--mode", choices=["padded", "packed", "both"],
                   default="both")
    args = p.parse_args()
    res = {}
    for mode in (["padded", "packed"] if args.mode == "both"
                 else [args.mode]):
        res[mode] = run(mode == "packed", args)
    if len(res) == 2:
        print(f"packing speedup on real tokens: "
              f"{res['packed'] / res['padded']:.2f}x")
        import json

        print("RESULT " + json.dumps({
            "padded_real_tok_s": round(res["padded"], 1),
            "packed_real_tok_s": round(res["packed"], 1),
            "speedup": round(res["packed"] / res["padded"], 3),
        }), flush=True)


if __name__ == "__main__":
    main()
