"""Training objective: shifted cross-entropy with IGNORE_INDEX masking.

Matches HF causal-LM loss semantics used by the reference trainer
(labels aligned with inputs, shift inside the loss; masked positions =
IGNORE_INDEX — ref train.py preprocessing + HF LlamaForCausalLM loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from llava_plus_tpu.constants import IGNORE_INDEX


def cross_entropy_loss(
    logits: jax.Array,   # [B, T, V] fp32
    labels: jax.Array,   # [B, T] int32 (IGNORE_INDEX masked)
    ignore_index: int = IGNORE_INDEX,
):
    """Returns (mean_loss, metrics). Next-token: logits[t] predicts labels[t+1]."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0)

    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    token_logp = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    token_loss = -jnp.where(valid, token_logp, 0.0)

    n_valid = jnp.maximum(valid.sum(), 1)
    loss = token_loss.sum() / n_valid

    pred = jnp.argmax(shift_logits, axis=-1)
    acc = jnp.where(valid, pred == safe_labels, False).sum() / n_valid
    return loss, {"loss": loss, "accuracy": acc, "tokens": n_valid}
