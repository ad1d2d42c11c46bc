"""Image-splice planner + vectorized scatter fuse tests.

Verifies the host-side position map (data/multimodal.py) against a
straightforward per-sample expansion oracle, and that the device-side scatter
(models/llava.py:fuse) places projected image features exactly where the
reference's Python loop would (llava_arch.py:150-187).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from llava_plus_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from llava_plus_tpu.data.multimodal import pad_images, plan_multimodal_batch
from llava_plus_tpu.models import llava as llava_model
from llava_plus_tpu.models.configs import tiny_llava_config
from llava_plus_tpu.models.llava import MultimodalBatch

P = 4  # num_patches used in planner-only tests


def _oracle_expand(ids, labels, num_patches, max_len):
    """Independent oracle: literal per-token expansion."""
    out_ids, out_labs, img_slots = [], [], []
    for tok, lab in zip(ids, labels):
        if tok == IMAGE_TOKEN_INDEX:
            start = len(out_ids)
            img_slots.extend(range(start, start + num_patches))
            out_ids.extend([0] * num_patches)
            out_labs.extend([IGNORE_INDEX] * num_patches)
        else:
            out_ids.append(tok)
            out_labs.append(lab)
    return out_ids[:max_len], out_labs[:max_len], img_slots


def test_plan_matches_oracle():
    ids = [5, 6, IMAGE_TOKEN_INDEX, 7, 8]
    labs = [IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 7, 8]
    plan = plan_multimodal_batch(
        [np.array(ids)], [np.array(labs)], num_patches=P, max_len=64
    )
    o_ids, o_labs, o_slots = _oracle_expand(ids, labs, P, 64)
    L = len(o_ids)
    assert plan.lengths[0] == L
    assert plan.tokens[0, :L].tolist() == o_ids
    assert plan.labels[0, :L].tolist() == o_labs
    assert plan.image_pos[0].tolist()[:P] == o_slots
    assert plan.segment_ids[0, :L].tolist() == [1] * L
    assert plan.positions[0, :L].tolist() == list(range(L))


def test_plan_multi_image_and_padding():
    a = [1, IMAGE_TOKEN_INDEX, 2, IMAGE_TOKEN_INDEX, 3]
    b = [4, 5]
    plan = plan_multimodal_batch(
        [np.array(a), np.array(b)], num_patches=P, max_len=64
    )
    La = 3 + 2 * P
    assert plan.lengths.tolist() == [La, 2]
    T = plan.tokens.shape[1]
    # second sample: no images -> all drop slots
    assert (plan.image_pos[1] == T).all()
    # first image patches at 1..P, second at P+2..2P+1
    assert plan.image_pos[0, :P].tolist() == list(range(1, 1 + P))
    assert plan.image_pos[0, P : 2 * P].tolist() == list(range(P + 2, 2 * P + 2))
    # padding of sample b
    assert plan.segment_ids[1, 2:].sum() == 0


def test_plan_truncation_mid_image():
    ids = [1, 2, IMAGE_TOKEN_INDEX]
    plan = plan_multimodal_batch([np.array(ids)], num_patches=8, max_len=6)
    assert plan.lengths[0] == 6
    T = plan.tokens.shape[1]
    ip = plan.image_pos[0]
    # image starts at 2; only patches 0..3 fit in max_len 6
    assert ip[:4].tolist() == [2, 3, 4, 5]
    assert (ip[4:] == T).all()


def test_plan_left_padding():
    ids = [9, IMAGE_TOKEN_INDEX]
    plan = plan_multimodal_batch(
        [np.array(ids), np.array([1, 2, 3, 4, 5, 6, 7, 8])],
        num_patches=2, max_len=64, padding_side="left",
    )
    T = plan.tokens.shape[1]
    L = 3  # 1 text + 2 patches
    off = T - L
    assert plan.tokens[0, off] == 9
    assert plan.segment_ids[0, :off].sum() == 0
    assert plan.image_pos[0, :2].tolist() == [off + 1, off + 2]
    assert plan.positions[0, off:].tolist() == [0, 1, 2]


def test_device_fuse_places_features():
    cfg = tiny_llava_config()
    import jax

    params = llava_model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    n_patch = cfg.vision.num_patches  # 4 for 28/14
    ids = [3, IMAGE_TOKEN_INDEX, 4]
    plan = plan_multimodal_batch(
        [np.array(ids)], num_patches=n_patch, max_len=32
    )
    imgs = pad_images(
        [np.ones((1, 28, 28, 3), np.float32)], 1, (28, 28, 3)
    )
    batch = MultimodalBatch(
        tokens=jnp.asarray(plan.tokens),
        positions=jnp.asarray(plan.positions),
        segment_ids=jnp.asarray(plan.segment_ids),
        images=jnp.asarray(imgs),
        image_pos=jnp.asarray(plan.image_pos),
    )
    embeds = llava_model.fuse(params, cfg, batch)
    # direct computation of expected features
    feats = llava_model.encode_images(params, cfg, batch.images[0])
    np.testing.assert_allclose(
        np.asarray(embeds[0, 1 : 1 + n_patch]), np.asarray(feats[0]), rtol=1e-6
    )
    # text positions keep token embeddings
    emb3 = params["language_model"]["embed_tokens"][3]
    np.testing.assert_allclose(np.asarray(embeds[0, 0]), np.asarray(emb3))


def test_forward_shapes_and_finite():
    cfg = tiny_llava_config()
    import jax

    params = llava_model.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    n_patch = cfg.vision.num_patches
    plan = plan_multimodal_batch(
        [np.array([3, IMAGE_TOKEN_INDEX, 4]), np.array([5, 6, 7])],
        num_patches=n_patch, max_len=32,
    )
    imgs = pad_images(
        [np.zeros((1, 28, 28, 3), np.float32), None], 1, (28, 28, 3)
    )
    batch = MultimodalBatch(
        tokens=jnp.asarray(plan.tokens),
        positions=jnp.asarray(plan.positions),
        segment_ids=jnp.asarray(plan.segment_ids),
        images=jnp.asarray(imgs),
        image_pos=jnp.asarray(plan.image_pos),
    )
    logits, _ = llava_model.forward(params, cfg, batch)
    assert logits.shape == (2, plan.tokens.shape[1], cfg.text.vocab_size)
    assert bool(jnp.isfinite(logits).all())
