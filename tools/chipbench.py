"""Measurement dossier: run every on-chip feature bench serially (ONE
process owns the tunneled TPU at a time) and write the results to
CHIPBENCH.json at the repo root — a COMMITTED artifact, so every feature
paragraph in the README cites a number of record instead of a log in
/tmp (VERDICT r3 items 2/3/4).

Stages (each is an independent subprocess; a failure is recorded, never
fatal):
  spec    tools/bench_spec.py    device-resident speculation vs plain
  pack    tools/bench_pack.py    packed vs padded train real-tok/s
  eval    tools/bench_eval.py    batched eval questions/s vs single
  prefix  tools/bench_prefix.py  multi-turn TTFT with/without page reuse
  int8f   bench.py -int8f        fused-qkv/gateup int8 decode verdict
  paged24 bench.py --paged b24   paged-pool occupancy-24 engine headline

Usage: python tools/chipbench.py [stage ...]   (default: all)
"""

import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
OUT = ROOT / "CHIPBENCH.json"

STAGES = [
    # paged occupancy first: decode cost/step ~= 12.5 ms scan tax +
    # 8.2 ms weight stream + B x 0.27 ms KV read, so aggregate tok/s
    # rises steeply with slots while the pool keeps HBM flat — the
    # headline's most likely mover.
    # paged32 does NOT fit: 32 slots x 8 pages x 128 tok x 270 KB/tok
    # ~= 8.8 GB pool + ~7 GB int8 weights leaves nothing for prefill
    # transients on the 16 GB chip.
    ("paged24", [sys.executable, "bench.py", "--model", "llava-1.5-7b-int8",
                 "--batch", "24", "--kv-int8", "--paged"], 2700),
    ("spec", [sys.executable, "tools/bench_spec.py"], 3600),
    ("prefix", [sys.executable, "tools/bench_prefix.py"], 3000),
    ("pack", [sys.executable, "tools/bench_pack.py"], 2400),
    ("eval", [sys.executable, "tools/bench_eval.py"], 3000),
    ("int8f", [sys.executable, "bench.py", "--model", "llava-1.5-7b-int8f",
               "--batch", "16", "--kv-int8", "--loaded-ttft"], 2400),
    # W8A8 prefill (commit 35123ba): same serving config as int8f plus
    # dynamic int8 activations on the prefill matmuls — the MXU's 2x
    # int8 path should cut TTFT; decode is untouched. Compare this
    # stage's loaded_ttft_p50_s / value against the int8f stage.
    ("w8a8", [sys.executable, "bench.py", "--model", "llava-1.5-7b-int8f",
              "--batch", "16", "--kv-int8", "--loaded-ttft", "--w8a8"],
     2400),
    # decode byte budget: full step vs isolated weight-stream / KV-read
    # programs at the headline config; backs the README's "where the
    # decode milliseconds go" table (VERDICT r4 item 6)
    ("profile", [sys.executable, "tools/profile_decode.py"], 2400),
]


def parse_result(stdout: str):
    """Last machine-readable line: 'RESULT {json}' (feature tools) or a
    bare JSON object line (bench.py)."""
    result = None
    for line in stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
        elif line.startswith("{"):
            try:
                result = json.loads(line)
            except json.JSONDecodeError:
                pass
    return result


def main():
    import os

    only = set(sys.argv[1:])
    stages = {}
    env = dict(os.environ)
    # failures must be diagnosable from the artifact alone: full
    # tracebacks (no JAX frame filtering), and the tail keeps the last
    # 4 KB of BOTH streams (round 4's paged24 crash recorded only TPU
    # log-permission noise; the actual exception was filtered away)
    env.setdefault("JAX_TRACEBACK_FILTERING", "off")
    # every stage recompiles the same 7B programs; the persistent XLA
    # cache (also used by bench.py / tpu_checks.py) cuts re-runs from
    # minutes of compile to seconds
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".xla_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    for name, cmd, tmo in STAGES:
        if only and name not in only:
            continue
        print(f"=== {name}: {' '.join(cmd[1:])}", flush=True)
        t0 = time.time()
        try:
            proc = subprocess.run(
                cmd, cwd=ROOT, capture_output=True, text=True, timeout=tmo,
                env=env,
            )
            rc, out, err = proc.returncode, proc.stdout, proc.stderr
        except subprocess.TimeoutExpired as e:
            rc = -1

            def _s(x):
                return x.decode() if isinstance(x, bytes) else (x or "")
            out = _s(e.stdout)
            err = _s(e.stderr) + f"\n[timeout after {tmo}s]"
        stages[name] = {
            "rc": rc,
            "seconds": round(time.time() - t0, 1),
            "result": parse_result(out),
            "tail": ("--- stdout ---\n" + out[-2048:]
                     + "\n--- stderr ---\n" + err[-4096:]) if rc != 0
                    else "\n".join(out.splitlines()[-8:]),
        }
        print(json.dumps({name: stages[name]["result"]}), flush=True)
        if rc != 0:
            print(f"--- {name} FAILED (rc={rc}):\n{stages[name]['tail']}",
                  flush=True)
        _write(stages)  # incremental: a later hang never loses this stage

    print(f"wrote {OUT}", flush=True)


def _write(stages):
    existing = {}
    if OUT.exists():
        # re-runs update stages in place, keeping earlier results
        existing = json.loads(OUT.read_text()).get("stages", {})
    existing.update(stages)
    OUT.write_text(json.dumps(
        {"chip": "tpu-v5e (1 chip, tunneled)", "stages": existing},
        indent=1,
    ) + "\n")


if __name__ == "__main__":
    main()
