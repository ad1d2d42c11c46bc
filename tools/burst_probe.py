"""One-off burst diagnosis: warm 7B-int8 engine at 16 slots, submit 16
simultaneous arrivals, log per-prefill-iteration timing + every TTFT.
Not part of the bench; exists to localize where burst TTFT goes
(prefill program? admission batching? queue wait?)."""

import logging
import sys
import time

sys.path.insert(0, ".")

logging.basicConfig(level=logging.DEBUG, stream=sys.stderr,
                    format="%(asctime)s %(name)s %(message)s")
logging.getLogger("jax").setLevel(logging.WARNING)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import CACHE_LEN, PREFILL_LEN, _bench_prompt, build  # noqa: E402
from llava_plus_tpu.data.debug_tokenizer import DebugTokenizer  # noqa: E402
from llava_plus_tpu.serve.engine import BatchedEngine, Request  # noqa: E402


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "llava-1.5-7b-int8"
    cfg, params = build(model)
    rng = np.random.default_rng(0)
    img_size = cfg.vision.image_size
    prompt = _bench_prompt(cfg)

    def image():
        return rng.normal(size=(1, img_size, img_size, 3)).astype(np.float32)

    tok = DebugTokenizer(vocab_size=cfg.text.vocab_size)
    eng = BatchedEngine(
        params, cfg, tok, max_slots=16, max_seq_len=CACHE_LEN,
        prefill_bucket=256, cache_dtype=jnp.int8,
    )
    try:
        print(f"warmup: {eng.warmup(prompt_len=PREFILL_LEN):.1f}s",
              flush=True)
        reqs = [Request(prompt=prompt, images=image(), max_new_tokens=4)
                for _ in range(16)]
        t0 = time.perf_counter()
        for r in reqs:
            eng.submit(r)
        print(f"submit loop: {time.perf_counter() - t0:.3f}s", flush=True)
        for r in reqs:
            while r._chunks.get(timeout=600) is not None:
                pass
        for i, r in enumerate(reqs):
            print(f"req{i:02d} ttft={r.ttft:.3f}s")
    finally:
        eng.stop()


if __name__ == "__main__":
    main()
