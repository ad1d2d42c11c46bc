"""Optimizer construction: AdamW + cosine schedule + parameter groups.

Reproduces the reference trainer's optimizer surface
(``llava/train/llava_trainer.py:150-237``): a separate learning rate for the
mm_projector (``mm_projector_lr``), weight-decay exemption for norms/biases,
and component freezing (stage-1 trains the projector only; the vision tower
is always frozen in the published recipes).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 2e-5
    mm_projector_lr: Optional[float] = None
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    train_language_model: bool = True
    train_mm_projector: bool = True
    train_vision_tower: bool = False
    schedule: str = "cosine"  # "cosine" | "constant"
    # Adam first-moment dtype. None inherits the param dtype (bf16 in the
    # published recipes — both moments then cost 1x params each, which is
    # what lets 7B training fit v5e HBM); "float32" buys back first-moment
    # precision when a config has headroom.
    mu_dtype: Optional[str] = None


def _make_schedule(cfg: OptimizerConfig, peak_lr: float):
    warmup = max(int(cfg.total_steps * cfg.warmup_ratio), 0)
    if cfg.schedule == "constant":
        if warmup == 0:
            return optax.constant_schedule(peak_lr)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, peak_lr, warmup),
             optax.constant_schedule(peak_lr)],
            [warmup],
        )
    return optax.warmup_cosine_decay_schedule(
        init_value=peak_lr if warmup == 0 else 0.0, peak_value=peak_lr,
        warmup_steps=warmup,
        decay_steps=max(cfg.total_steps, warmup + 1),
        end_value=0.0,
    )


def param_labels(params) -> dict:
    """Label each leaf with its group: lm / projector / vision."""
    def label_tree(tree, label):
        return jax.tree.map(lambda _: label, tree)

    return {
        "language_model": label_tree(params["language_model"], "lm"),
        "mm_projector": label_tree(params["mm_projector"], "projector"),
        "vision_tower": label_tree(params["vision_tower"], "vision"),
    }


def build_optimizer(params, cfg: OptimizerConfig) -> optax.GradientTransformation:
    def adamw(peak_lr):
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                                mu_dtype=cfg.mu_dtype),
            optax.add_decayed_weights(
                cfg.weight_decay,
                mask=(lambda p: jax.tree.map(lambda a: a.ndim > 1, p))
                if cfg.weight_decay else None,
            ),
            optax.scale_by_schedule(_make_schedule(cfg, peak_lr)),
            optax.scale(-1.0),
        )

    proj_lr = cfg.mm_projector_lr or cfg.learning_rate
    transforms = {
        "lm": adamw(cfg.learning_rate) if cfg.train_language_model else optax.set_to_zero(),
        "projector": adamw(proj_lr) if cfg.train_mm_projector else optax.set_to_zero(),
        "vision": adamw(cfg.learning_rate) if cfg.train_vision_tower else optax.set_to_zero(),
    }
    return optax.multi_transform(transforms, param_labels(params))
