"""LoRA: low-rank adaptation as a parameter-tree transform.

Replaces the reference's PEFT wrapping (``train.py:873-889``,
``find_all_linear_names`` excluding mm modules) with a functional design: the
base tree stays frozen, a parallel low-rank tree {a, b} trains, and the
effective weights ``W + (alpha/r) * a @ b`` are materialized inside the
compiled step (cost ~r/seq_len of a forward pass — negligible at r=128).

Checkpoint interop: PEFT ``adapter_model.safetensors`` +
``non_lora_trainables.bin`` merge on load (ref builder.py:49-82), and our
adapters export back to the same split layout.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 128
    alpha: int = 256
    dropout: float = 0.05  # reference default; dropout applied host-side if used

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


# Stacked LLaMA layer matrices targeted by LoRA (all linears except mm
# modules, matching find_all_linear_names, ref train.py:174-187).
LLAMA_TARGETS = (
    ("layers", "attn", "wq"),
    ("layers", "attn", "wk"),
    ("layers", "attn", "wv"),
    ("layers", "attn", "wo"),
    ("layers", "mlp", "w_gate"),
    ("layers", "mlp", "w_up"),
    ("layers", "mlp", "w_down"),
)


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def init_lora_params(
    lm_params, cfg: LoraConfig, key: jax.Array, dtype=jnp.float32,
    targets=LLAMA_TARGETS,
):
    """Create {path: {"a": [L, in, r], "b": [L, r, out]}} (a ~ N(0, 0.02),
    b = 0 so training starts at the base model)."""
    from llava_plus_tpu.ops import quant

    lora = {}
    keys = jax.random.split(key, len(targets))
    for k, path in zip(keys, targets):
        w = _get(lm_params, path)  # [L, in, out] (or a quantized dict)
        if quant.is_quantized(w):
            if quant.Q4KEY in w:  # [L, in/2, out] packed nibbles
                L, half_in, d_out = w[quant.Q4KEY].shape
                d_in = half_in * 2
            else:
                L, d_in, d_out = w[quant.QKEY].shape
        else:
            L, d_in, d_out = w.shape
        lora["/".join(path)] = {
            "a": (jax.random.normal(k, (L, d_in, cfg.r)) * 0.02).astype(dtype),
            "b": jnp.zeros((L, cfg.r, d_out), dtype),
        }
    return lora


def apply_lora(lm_params, lora_params, cfg: LoraConfig,
               materialize: bool = False):
    """Apply adapters to the base tree.

    Default (lazy): attach ``lora_a`` / ``lora_b`` (pre-scaled by alpha/r)
    next to each target weight; ``ops.quant.matmul`` then computes
    ``x @ W + (x @ a) @ b`` without ever materializing the effective weight.
    This is the QLoRA hot path — the frozen int4/int8 base stays quantized
    in HBM (like the reference's bitsandbytes 4-bit forward,
    ``train.py:814-831``), so 7B QLoRA fits one 16 GB chip.

    ``materialize=True`` builds real merged weights ``W + scaling * a @ b``
    (dequantizing a quantized base to bf16) — the checkpoint-merge path
    (the reference's PEFT merge_and_unload).
    """
    from llava_plus_tpu.ops import quant

    def copy_dicts(t):
        if isinstance(t, dict) and not quant.is_quantized(t):
            return {k: copy_dicts(v) for k, v in t.items()}
        return t

    out = copy_dicts(lm_params)
    for joined, ab in lora_params.items():
        path = tuple(joined.split("/"))
        w = _get(out, path)
        if not materialize:
            base = dict(w) if quant.is_quantized(w) else {quant.WKEY: w}
            base[quant.LORA_A] = ab["a"]
            base[quant.LORA_B] = ab["b"] * cfg.scaling
            _set(out, path, base)
            continue
        if quant.is_quantized(w):
            w = quant.dequantize_array(w, jnp.bfloat16)
        delta = jnp.einsum(
            "lir,lro->lio", ab["a"].astype(jnp.float32),
            ab["b"].astype(jnp.float32),
        ) * cfg.scaling
        _set(out, path, (w.astype(jnp.float32) + delta).astype(w.dtype))
    return out


def merge_lora_into_base(params, lora_params, cfg: LoraConfig):
    """Permanently merge adapters (the reference's merge_and_unload)."""
    merged_lm = apply_lora(
        params["language_model"], lora_params, cfg, materialize=True
    )
    return dict(params, language_model=merged_lm)


# ---------------------------------------------------------------------------
# PEFT checkpoint interop
# ---------------------------------------------------------------------------

_PEFT_NAME_MAP = {
    "q_proj": ("layers", "attn", "wq"),
    "k_proj": ("layers", "attn", "wk"),
    "v_proj": ("layers", "attn", "wv"),
    "o_proj": ("layers", "attn", "wo"),
    "gate_proj": ("layers", "mlp", "w_gate"),
    "up_proj": ("layers", "mlp", "w_up"),
    "down_proj": ("layers", "mlp", "w_down"),
}


def load_peft_adapter(adapter_dir, num_layers: int):
    """Read a PEFT LoRA dir -> (lora_tree_numpy, LoraConfig).

    PEFT stores per-layer ``...layers.N.self_attn.q_proj.lora_A.weight``
    [r, in] and ``lora_B.weight`` [out, r]; we transpose/stack to
    a [L, in, r], b [L, r, out].
    """
    import json

    adapter_dir = Path(adapter_dir)
    peft_cfg = json.loads((adapter_dir / "adapter_config.json").read_text())
    cfg = LoraConfig(r=peft_cfg["r"], alpha=peft_cfg["lora_alpha"])

    sd = {}
    st = adapter_dir / "adapter_model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file

        sd = load_file(str(st))
    else:
        import torch

        sd = {
            k: v.float().numpy()
            for k, v in torch.load(
                str(adapter_dir / "adapter_model.bin"),
                map_location="cpu", weights_only=True,
            ).items()
        }

    lora: Dict[str, dict] = {}
    for proj, path in _PEFT_NAME_MAP.items():
        a_list, b_list = [], []
        for i in range(num_layers):
            a_key = next(
                (k for k in sd if f"layers.{i}." in k and f"{proj}.lora_A" in k),
                None,
            )
            b_key = next(
                (k for k in sd if f"layers.{i}." in k and f"{proj}.lora_B" in k),
                None,
            )
            if a_key is None or b_key is None:
                break
            a_list.append(np.asarray(sd[a_key]).T)  # [in, r]
            b_list.append(np.asarray(sd[b_key]).T)  # [r, out]
        if len(a_list) == num_layers:
            lora["/".join(path)] = {
                "a": np.stack(a_list), "b": np.stack(b_list),
            }
    return lora, cfg


def merge_lora_checkpoint(adapter_dir, base_dir, dtype="bfloat16"):
    """The builder's LoRA load path: base + adapter + non_lora_trainables.
    Returns (tokenizer, merged_params, LlavaConfig)."""
    import json

    from llava_plus_tpu.models import hf_import
    from llava_plus_tpu.models.builder import load_tokenizer
    from llava_plus_tpu.models.configs import LlavaConfig

    adapter_dir = Path(adapter_dir)
    base_dir = Path(base_dir)

    cfg_d = json.loads((adapter_dir / "config.json").read_text())
    if "text" in cfg_d and isinstance(cfg_d["text"], dict):
        # our trainer writes the native nested LlavaConfig next to the
        # adapter; HF/PEFT checkpoints carry a flat HF config instead
        cfg = LlavaConfig.load(adapter_dir / "config.json")
        text_cfg = cfg.text
    else:
        text_cfg = hf_import.llama_config_from_hf(cfg_d)
        cfg = LlavaConfig(
            text=text_cfg,
            mm_projector_type=cfg_d.get("mm_projector_type", "linear"),
            mm_hidden_size=cfg_d.get("mm_hidden_size", 1024),
            image_aspect_ratio=cfg_d.get("image_aspect_ratio", "square"),
        )
    base_sd = hf_import.load_state_dict_dir(base_dir)
    lm = hf_import.llama_params_from_state_dict(base_sd, text_cfg, dtype=dtype)

    lora_np, lora_cfg = load_peft_adapter(adapter_dir, text_cfg.num_hidden_layers)
    lora = jax.tree.map(jnp.asarray, lora_np)
    lm = apply_lora(lm, lora, lora_cfg, materialize=True)

    # non-LoRA trainables: mm_projector (and possibly embed/norm)
    proj = {}
    nlt = adapter_dir / "non_lora_trainables.bin"
    vt_params = None
    if nlt.exists():
        import torch

        extra = torch.load(str(nlt), map_location="cpu", weights_only=True)
        extra = {
            k.replace("base_model.model.", "").replace("model.mm_projector.", ""):
                v.float().numpy()
            for k, v in extra.items()
            if "mm_projector" in k
        }
        proj = hf_import.projector_params_from_state_dict(
            extra, cfg.mm_projector_type, dtype=dtype
        )
    from llava_plus_tpu.models.builder import _load_vision_tower

    vt_params = _load_vision_tower(cfg_d, cfg, dtype)
    tokenizer = load_tokenizer(str(adapter_dir))
    params = {
        "language_model": lm, "vision_tower": vt_params, "mm_projector": proj,
    }
    return tokenizer, params, cfg


# ---------------------------------------------------------------------------
# Export (PEFT-compatible save)
# ---------------------------------------------------------------------------

def save_peft_adapter(lora_params, cfg: LoraConfig, out_dir,
                      extra_trainables: Optional[dict] = None):
    """Write adapter_config.json + adapter_model.safetensors (+ the
    non_lora_trainables.bin split the reference trainer produces)."""
    import json

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "adapter_config.json").write_text(json.dumps({
        "peft_type": "LORA", "r": cfg.r, "lora_alpha": cfg.alpha,
        "lora_dropout": cfg.dropout,
        "target_modules": sorted({p[-1] for p in _PEFT_NAME_MAP.values()}),
    }, indent=2))

    flat = {}
    inv = {"/".join(v): k for k, v in _PEFT_NAME_MAP.items()}
    for joined, ab in lora_params.items():
        proj = inv[joined]
        a = np.asarray(jax.device_get(ab["a"]), np.float32)
        b = np.asarray(jax.device_get(ab["b"]), np.float32)
        for i in range(a.shape[0]):
            prefix = f"base_model.model.model.layers.{i}.self_attn.{proj}" \
                if "attn" in joined else \
                f"base_model.model.model.layers.{i}.mlp.{proj}"
            flat[f"{prefix}.lora_A.weight"] = a[i].T.copy()
            flat[f"{prefix}.lora_B.weight"] = b[i].T.copy()
    from safetensors.numpy import save_file

    save_file(flat, str(out_dir / "adapter_model.safetensors"))
    if extra_trainables:
        import torch

        def to_torch(v):
            a = np.asarray(v)
            if a.dtype.name == "bfloat16":  # torch can't ingest ml_dtypes bf16
                return torch.from_numpy(a.astype(np.float32)).to(torch.bfloat16)
            return torch.tensor(a)

        torch.save(
            {k: to_torch(v) for k, v in extra_trainables.items()},
            str(out_dir / "non_lora_trainables.bin"),
        )
