"""The compiled training step: loss -> grads -> optax update, under jit.

The reference's hot loop is HF Trainer + DeepSpeed ZeRO
(``llava/train/train.py:979-982``). Here one jitted function runs the whole
step; parallelism comes from placing params/batch with NamedShardings over
the (dp, fsdp, tp) mesh — XLA GSPMD then inserts the collectives ZeRO
performs by hand (all-gather params, reduce-scatter grads), and optimizer
moments inherit the parameter shardings (ZeRO optimizer-state sharding).
``remat=True`` replaces ``--gradient_checkpointing``.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llava_plus_tpu.models import llava as llava_model
from llava_plus_tpu.models.configs import LlavaConfig
from llava_plus_tpu.models.llava import MultimodalBatch
from llava_plus_tpu.parallel.mesh import shardings
from llava_plus_tpu.parallel.sharding import llava_param_specs
from llava_plus_tpu.train.objective import cross_entropy_loss


def loss_fn(params, cfg: LlavaConfig, batch: MultimodalBatch, *,
            attn_impl: str = "auto", remat: bool = True):
    logits, _ = llava_model.forward(
        params, cfg, batch, attn_impl=attn_impl, remat=remat
    )
    return cross_entropy_loss(logits, batch.labels)


def grads_and_metrics(loss_of, params, batch, accum_steps: int = 1):
    """``value_and_grad``, optionally accumulated over a leading
    micro-batch axis (``--gradient_accumulation_steps``, ref
    ``scripts/v1_5/*.sh``). ``loss_of(params, micro_batch)`` must return
    ``(loss, metrics)``.

    TPU shape: the K micro-batches arrive STACKED ([K, B, ...]) and a
    ``lax.scan`` walks them inside the one compiled step — fixed shapes,
    no per-micro host dispatch. Grads accumulate in f32 (K bf16 adds
    would drift) and divide by K, mirroring HF Trainer's mean-of-micro
    semantics; metric means are token-weighted so the logged loss equals
    the unaccumulated large-batch loss."""
    import jax.numpy as jnp

    vg = jax.value_and_grad(loss_of, has_aux=True)
    if accum_steps <= 1:
        (_, metrics), grads = vg(params, batch)
        return grads, dict(metrics)

    def body(acc, micro):
        (_, m), g = vg(params, micro)
        acc = jax.tree.map(lambda a, b: a + b.astype(a.dtype), acc, g)
        return acc, m

    zeros = jax.tree.map(
        lambda p: jnp.zeros(p.shape, jnp.float32), params
    )
    acc, ms = jax.lax.scan(body, zeros, batch)
    grads = jax.tree.map(
        lambda g, p: (g / accum_steps).astype(p.dtype), acc, params
    )
    w = ms["tokens"] / jnp.maximum(ms["tokens"].sum(), 1)
    metrics = {
        k: (v.sum() if k == "tokens" else (v * w).sum())
        for k, v in ms.items()
    }
    return grads, metrics


def make_train_step(
    cfg: LlavaConfig,
    optimizer: optax.GradientTransformation,
    *,
    attn_impl: str = "auto",
    remat: bool = True,
    mesh: Optional[Mesh] = None,
    accum_steps: int = 1,
):
    """Jitted (params, opt_state, batch) -> (params, opt_state, metrics).

    Sharding is carried by the input arrays (see :func:`place_params` /
    :func:`place_batch`); jit propagates it and donates the old buffers.
    Passing ``mesh`` additionally pins activation shardings at the module
    seams (``parallel.mesh.constrain``) so GSPMD keeps one consistent layout
    through the jvp/transpose graphs instead of emitting involuntary
    full-rematerialization reshards. ``accum_steps > 1`` expects the batch
    stacked [K, B, ...] and accumulates grads before the one optimizer
    update (see :func:`grads_and_metrics`).
    """
    from llava_plus_tpu.parallel.mesh import activate_mesh

    def step(params, opt_state, batch: MultimodalBatch):
        # activate_mesh binds at trace time: the constraint ops are baked
        # into the jaxpr here, not looked up at run time.
        with activate_mesh(mesh):
            grads, metrics = grads_and_metrics(
                lambda p, mb: loss_fn(
                    p, cfg, mb, attn_impl=attn_impl, remat=remat
                ),
                params, batch, accum_steps,
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        return params, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1))


def _quant_specs(spec):
    """Derive qvalue/scale PartitionSpecs from the bf16 weight's spec.

    int8/int4 tensors keep the weight's rank ([.., K, N] / flat [.., K/2, N]
    and [.., K/32, N]), so the weight's own spec applies; only the int8
    per-channel scale (size-1 contraction slot) replicates that dim.
    """
    s = tuple(spec) if spec is not None else ()
    lead, d_in, d_out = s[:-2], s[-2] if len(s) >= 2 else None, s[-1] if s else None
    return {
        "qvalue": P(*lead, d_in, d_out),
        "qvalue4": P(*lead, d_in, d_out),
        "scale8": P(*lead, None, d_out),
        "scale4": P(*lead, d_in, d_out),
    }


def place_params(params, mesh: Mesh, cfg: LlavaConfig):
    """device_put a param tree onto the mesh with the FSDP/TP rule table.

    Quantized leaves (QLoRA int8/int4 dicts) get specs derived from the
    bf16 weight's rule so the frozen base still shards over fsdp/tp.
    """
    from llava_plus_tpu.ops import quant

    specs = llava_param_specs(cfg)

    def walk(p, s):
        if quant.is_quantized(p):
            qs = _quant_specs(s)
            if quant.Q4KEY in p:
                return {
                    quant.Q4KEY: jax.device_put(
                        p[quant.Q4KEY], NamedSharding(mesh, qs["qvalue4"])),
                    quant.SKEY: jax.device_put(
                        p[quant.SKEY], NamedSharding(mesh, qs["scale4"])),
                }
            return {
                quant.QKEY: jax.device_put(
                    p[quant.QKEY], NamedSharding(mesh, qs["qvalue"])),
                quant.SKEY: jax.device_put(
                    p[quant.SKEY], NamedSharding(mesh, qs["scale8"])),
            }
        if isinstance(p, dict):
            # inference-fused matrices (quant.fuse_llama_matrices) share
            # the unfused key's rule (same dim semantics, wider output)
            alias = {"wqkv": "wq", "w_gateup": "w_gate"}

            def spec_for(k):
                if not isinstance(s, dict):
                    return s
                return s.get(k, s.get(alias.get(k, k)))

            return {k: walk(v, spec_for(k)) for k, v in p.items()}
        if isinstance(p, (list, tuple)):
            return type(p)(
                walk(v, s[i] if isinstance(s, (list, tuple)) else s)
                for i, v in enumerate(p)
            )
        return jax.device_put(p, NamedSharding(mesh, s))

    return walk(params, specs)


def init_opt_state(optimizer: optax.GradientTransformation, params):
    """Init optimizer state under jit so moment buffers inherit the
    parameters' NamedShardings (ZeRO-style optimizer sharding for free)."""
    return jax.jit(optimizer.init)(params)


def place_batch(batch: MultimodalBatch, mesh: Mesh,
                accum_steps: int = 1) -> MultimodalBatch:
    """Shard all batch arrays over the (dp, fsdp) data axes. With
    gradient accumulation the arrays carry a leading [K] micro-batch
    axis that every device walks together — only the batch axis (dim 1)
    shards."""
    spec = (P(None, ("dp", "fsdp")) if accum_steps > 1
            else P(("dp", "fsdp")))
    data = NamedSharding(mesh, spec)
    return jax.tree.map(lambda a: jax.device_put(a, data), batch)
