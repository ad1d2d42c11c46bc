"""Sequence packing (data/packing.py): shape/isolation invariants and the
key numerical property — the loss over packed rows equals the loss over
the same samples padded one-per-row (token set is identical; segment ids
isolate attention; boundary labels are masked)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_plus_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from llava_plus_tpu.data.packing import pack_instances
from llava_plus_tpu.data.dataset import collate_batch
from llava_plus_tpu.models import llava as llava_model
from llava_plus_tpu.models.configs import tiny_llava_config
from llava_plus_tpu.models.llava import MultimodalBatch
from llava_plus_tpu.train.step import loss_fn

CFG = tiny_llava_config()
NP_ = CFG.num_image_tokens
IMG = CFG.vision.image_size


def _inst(ids, image=False):
    ids = list(ids)
    labels = [IGNORE_INDEX] * 2 + ids[2:]
    inst = {"input_ids": np.asarray(ids, np.int64),
            "labels": np.asarray(labels, np.int64)}
    if image:
        rng = np.random.default_rng(abs(sum(ids)))
        inst["images"] = rng.normal(size=(1, IMG, IMG, 3)).astype(np.float32)
    return inst


def test_pack_two_short_samples_one_row():
    a = _inst([1, 5, 6, 7, 8])
    b = _inst([1, 9, 10, 11])
    arrays, consumed = pack_instances(
        [a, b], rows=1, max_len=16, num_patches=NP_, image_size=IMG,
    )
    assert consumed == 2
    seg = arrays["segment_ids"][0]
    assert list(seg[:9]) == [1] * 5 + [2] * 4
    assert (seg[9:] == 0).all()
    # positions restart per sample
    assert list(arrays["positions"][0][:9]) == [0, 1, 2, 3, 4, 0, 1, 2, 3]
    # each sample's first label masked (shifted-loss boundary guard)
    lab = arrays["labels"][0]
    assert lab[0] == IGNORE_INDEX and lab[5] == IGNORE_INDEX
    assert lab[7] == 10  # interior labels intact


def test_pack_overflow_goes_to_next_row_and_prefix_consumption():
    big = _inst([1] + list(range(3, 13)))   # 11 tokens
    small = _inst([1, 20, 21])              # 3 tokens
    arrays, consumed = pack_instances(
        [big, big, small], rows=2, max_len=12,
        num_patches=NP_, image_size=IMG,
    )
    # big fills row 0, second big fills row 1, small fits nowhere -> stop
    assert consumed == 2
    assert (arrays["segment_ids"] > 0).sum() == 22


def test_pack_oversize_first_sample_never_stalls():
    huge = _inst([1] + list(range(3, 40)))  # 38 tokens > max_len
    arrays, consumed = pack_instances(
        [huge], rows=1, max_len=16, num_patches=NP_, image_size=IMG,
    )
    assert consumed == 1
    assert (arrays["segment_ids"][0] > 0).sum() == 16  # truncated


def test_image_budget_respected():
    im1 = _inst([1, IMAGE_TOKEN_INDEX, 30, 31], image=True)
    arrays, consumed = pack_instances(
        [im1, im1, im1], rows=1, max_len=64,
        num_patches=NP_, image_size=IMG, max_images_per_row=2,
    )
    assert consumed == 2  # third image exceeds the row's image budget
    slots = arrays["image_pos"][0]
    assert (slots < 64).sum() == 2 * NP_


@pytest.mark.parametrize("with_images", [False, True])
def test_packed_loss_equals_unpacked(with_images):
    """THE packing correctness property: same samples, same loss."""
    params = llava_model.init_params(
        CFG, jax.random.PRNGKey(0), dtype=jnp.float32
    )
    insts = [
        _inst([1, IMAGE_TOKEN_INDEX, 40, 41, 42] if with_images
              else [1, 40, 41, 42, 43, 44], image=with_images),
        _inst([1, IMAGE_TOKEN_INDEX, 50, 51] if with_images
              else [1, 50, 51, 52], image=with_images),
        _inst([1, IMAGE_TOKEN_INDEX, 60, 61, 62, 63] if with_images
              else [1, 60, 61], image=with_images),
    ]
    # packing masks each sample's first label; mirror that in the
    # unpacked reference so the scored token sets are identical
    for inst in insts:
        inst["labels"][0] = IGNORE_INDEX

    packed, consumed = pack_instances(
        insts, rows=1, max_len=64, num_patches=NP_, image_size=IMG,
        max_images_per_row=3,
    )
    assert consumed == 3
    unpacked = collate_batch(
        insts, num_patches=NP_, max_len=64, image_size=IMG,
        pad_to_multiple=1, max_images=1,
    )

    def run(arrays):
        batch = MultimodalBatch(
            **{k: jnp.asarray(v) for k, v in arrays.items()}
        )
        loss, metrics = loss_fn(
            params, CFG, batch, attn_impl="xla", remat=False
        )
        return float(loss), int(metrics["tokens"])

    loss_p, n_p = run(packed)
    loss_u, n_u = run(unpacked)
    assert n_p == n_u  # identical scored-token sets
    np.testing.assert_allclose(loss_p, loss_u, rtol=2e-5, atol=2e-5)


def test_packed_loss_equals_unpacked_mpt():
    """Packing holds for the MPT backbone too: ALiBi bias is computed
    from per-sample RESTARTING positions and segment ids isolate rows, so
    the packed loss equals the padded one-per-row loss."""
    from llava_plus_tpu.models.configs import tiny_llava_mpt_config

    cfg = tiny_llava_mpt_config()
    params = llava_model.init_params(
        cfg, jax.random.PRNGKey(1), dtype=jnp.float32
    )
    insts = [
        _inst([1, IMAGE_TOKEN_INDEX, 40, 41, 42], image=True),
        _inst([1, IMAGE_TOKEN_INDEX, 50, 51], image=True),
    ]
    for inst in insts:
        inst["labels"][0] = IGNORE_INDEX

    kw = dict(num_patches=cfg.num_image_tokens,
              image_size=cfg.vision.image_size)
    packed, consumed = pack_instances(
        insts, rows=1, max_len=64, max_images_per_row=2, **kw,
    )
    assert consumed == 2
    unpacked = collate_batch(
        insts, max_len=64, pad_to_multiple=1, max_images=1, **kw,
    )

    def run(arrays):
        batch = MultimodalBatch(
            **{k: jnp.asarray(v) for k, v in arrays.items()}
        )
        loss, metrics = loss_fn(
            params, cfg, batch, attn_impl="xla", remat=False
        )
        return float(loss), int(metrics["tokens"])

    loss_p, n_p = run(packed)
    loss_u, n_u = run(unpacked)
    assert n_p == n_u
    np.testing.assert_allclose(loss_p, loss_u, rtol=2e-5, atol=2e-5)
