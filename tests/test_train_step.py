"""Training-step tests on the virtual 8-device CPU mesh.

Covers: loss decrease (overfit a tiny batch), freezing semantics (stage-1
projector-only), and numerical equivalence of the sharded (dp/fsdp/tp) step
vs the single-device step — the TPU analogue of "multi-node without a
cluster" (SURVEY.md §4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_plus_tpu.data.multimodal import pad_images, plan_multimodal_batch
from llava_plus_tpu.constants import IMAGE_TOKEN_INDEX
from llava_plus_tpu.models import llava as llava_model
from llava_plus_tpu.models.configs import tiny_llava_config
from llava_plus_tpu.models.llava import MultimodalBatch
from llava_plus_tpu.parallel.mesh import make_mesh
from llava_plus_tpu.train.optimizer import OptimizerConfig, build_optimizer
from llava_plus_tpu.train.step import (
    init_opt_state,
    make_train_step,
    place_batch,
    place_params,
)


def _tiny_batch(cfg, batch_size=8, seed=0):
    rng = np.random.default_rng(seed)
    n_patch = cfg.vision.num_patches
    ids_list, labels_list, images = [], [], []
    for i in range(batch_size):
        ids = [1, IMAGE_TOKEN_INDEX] + list(rng.integers(3, 100, size=6))
        labs = [-100, -100] + list(ids[2:])
        ids_list.append(np.array(ids))
        labels_list.append(np.array(labs))
        images.append(rng.normal(size=(1, 28, 28, 3)).astype(np.float32))
    plan = plan_multimodal_batch(
        ids_list, labels_list, num_patches=n_patch, max_len=64,
        pad_to=16,
    )
    imgs = pad_images(images, 1, (28, 28, 3))
    return MultimodalBatch(
        tokens=jnp.asarray(plan.tokens),
        positions=jnp.asarray(plan.positions),
        segment_ids=jnp.asarray(plan.segment_ids),
        images=jnp.asarray(imgs),
        image_pos=jnp.asarray(plan.image_pos),
        labels=jnp.asarray(plan.labels),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_llava_config()
    params = llava_model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    batch = _tiny_batch(cfg)
    return cfg, params, batch


def test_loss_decreases(setup):
    cfg, params, batch = setup
    opt_cfg = OptimizerConfig(
        learning_rate=1e-3, total_steps=20, warmup_ratio=0.0, schedule="constant"
    )
    opt = build_optimizer(params, opt_cfg)
    step = make_train_step(cfg, opt, remat=False)
    params = jax.tree.map(jnp.copy, params)
    opt_state = opt.init(params)
    losses = []
    for _ in range(8):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses


def test_stage1_freezes_lm(setup):
    cfg, params, batch = setup
    opt_cfg = OptimizerConfig(
        learning_rate=1e-3, total_steps=10, warmup_ratio=0.0,
        train_language_model=False, train_mm_projector=True,
    )
    opt = build_optimizer(params, opt_cfg)
    step = make_train_step(cfg, opt, remat=False)
    p0 = jax.tree.map(jnp.copy, params)
    opt_state = opt.init(p0)
    p1, _, _ = step(jax.tree.map(jnp.copy, p0), opt.init(p0), batch)
    # LM and vision unchanged
    for key in ("language_model", "vision_tower"):
        diff = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), p0[key], p1[key]
        )
        assert max(jax.tree.leaves(diff)) == 0.0
    # projector changed
    proj_diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        p0["mm_projector"], p1["mm_projector"],
    )
    assert max(jax.tree.leaves(proj_diff)) > 0.0


def test_remat_matches_no_remat(setup):
    cfg, params, batch = setup
    from llava_plus_tpu.train.step import loss_fn

    g1 = jax.grad(lambda p: loss_fn(p, cfg, batch, remat=False)[0])(params)
    g2 = jax.grad(lambda p: loss_fn(p, cfg, batch, remat=True)[0])(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4),
        g1, g2,
    )


@pytest.mark.parametrize("mesh_shape", [(1, 8, 1), (2, 2, 2), (1, 4, 2)])
def test_sharded_step_matches_single_device(setup, mesh_shape):
    cfg, params, batch = setup
    dp, fsdp, tp = mesh_shape
    opt_cfg = OptimizerConfig(
        learning_rate=1e-3, total_steps=10, warmup_ratio=0.0, schedule="constant"
    )
    opt = build_optimizer(params, opt_cfg)
    step = make_train_step(cfg, opt, remat=False)

    # single-device reference
    p_ref, s_ref, m_ref = step(
        jax.tree.map(jnp.copy, params), opt.init(params), batch
    )

    mesh = make_mesh(dp, fsdp, tp)
    p_sh = place_params(jax.tree.map(jnp.copy, params), mesh, cfg)
    opt_sh = init_opt_state(opt, p_sh)
    b_sh = place_batch(batch, mesh)
    p_out, s_out, m_out = step(p_sh, opt_sh, b_sh)

    np.testing.assert_allclose(
        float(m_out["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    flat_ref = jax.tree.leaves(p_ref)
    flat_out = jax.tree.leaves(jax.device_get(p_out))
    for a, b in zip(flat_ref, flat_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_gradient_accumulation_matches_combined_batch(setup):
    """K-step accumulation over equal-token micro-batches produces the
    same update as one step on the concatenated batch (HF semantics:
    mean of per-micro grads; equal token counts make that identical to
    the combined-batch grad)."""
    cfg, params, _ = setup
    # two micro-batches with IDENTICAL per-sample shapes -> equal tokens
    b1 = _tiny_batch(cfg, batch_size=4, seed=1)
    b2 = _tiny_batch(cfg, batch_size=4, seed=2)
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), b1, b2)
    combined = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], axis=0), b1, b2
    )

    opt = build_optimizer(params, OptimizerConfig(
        learning_rate=1e-3, total_steps=10,
    ))

    step_acc = make_train_step(cfg, opt, remat=False, accum_steps=2)
    step_one = make_train_step(cfg, opt, remat=False)

    # the steps donate their param/opt buffers; give each its own copy
    pa = jax.tree.map(jnp.array, params)
    po = jax.tree.map(jnp.array, params)
    p_acc, _, m_acc = step_acc(pa, init_opt_state(opt, pa), stacked)
    p_one, _, m_one = step_one(po, init_opt_state(opt, po), combined)

    np.testing.assert_allclose(
        float(m_acc["loss"]), float(m_one["loss"]), rtol=1e-5
    )
    assert int(m_acc["tokens"]) == int(m_one["tokens"])
    flat_a = jax.tree.leaves(p_acc)
    flat_o = jax.tree.leaves(p_one)
    for a, o in zip(flat_a, flat_o):
        np.testing.assert_allclose(np.asarray(a), np.asarray(o),
                                   rtol=2e-4, atol=2e-5)


def test_gradient_accumulation_on_mesh(setup):
    """Accumulated step under dp/fsdp sharding: leading micro axis stays
    unsharded, batch axis shards, loss matches the single-device result."""
    cfg, params, _ = setup
    b1 = _tiny_batch(cfg, batch_size=4, seed=1)
    b2 = _tiny_batch(cfg, batch_size=4, seed=2)
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), b1, b2)

    opt = build_optimizer(params, OptimizerConfig(
        learning_rate=1e-3, total_steps=10,
    ))
    ref_step = make_train_step(cfg, opt, remat=False, accum_steps=2)
    pr = jax.tree.map(jnp.array, params)
    _, _, m_ref = ref_step(pr, init_opt_state(opt, pr), stacked)

    mesh = make_mesh(2, 2, 2)
    p_sh = place_params(jax.tree.map(jnp.array, params), mesh, cfg)
    o_sh = init_opt_state(opt, p_sh)
    step = make_train_step(cfg, opt, remat=False, mesh=mesh, accum_steps=2)
    _, _, m = step(p_sh, o_sh, place_batch(stacked, mesh, accum_steps=2))
    np.testing.assert_allclose(
        float(m["loss"]), float(m_ref["loss"]), rtol=1e-4
    )
