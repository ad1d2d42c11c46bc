"""Image preprocessing parity vs transformers.CLIPImageProcessor."""

import numpy as np
import pytest
from PIL import Image

from llava_plus_tpu.data.image_processing import (
    ClipImageProcessor,
    processor_for_vision_tower,
)
from llava_plus_tpu.mm_utils import process_images


def _rand_img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))


@pytest.mark.parametrize("size", [(640, 480), (336, 336), (200, 500), (1024, 768)])
def test_matches_hf_clip_processor(size):
    from transformers import CLIPImageProcessor as HFProc

    hf = HFProc(
        do_resize=True, size={"shortest_edge": 336},
        do_center_crop=True, crop_size={"height": 336, "width": 336},
        do_rescale=True, do_normalize=True, do_convert_rgb=True,
    )
    ours = ClipImageProcessor()
    img = _rand_img(*size)
    ref = hf(img, return_tensors="np")["pixel_values"][0]  # [3, H, W]
    got = ours(img)  # [H, W, 3]
    np.testing.assert_allclose(got.transpose(2, 0, 1), ref, atol=1e-5)


def test_processor_for_vision_tower():
    p = processor_for_vision_tower("openai/clip-vit-large-patch14-336")
    assert p.crop_size == 336
    p = processor_for_vision_tower("openai/clip-vit-large-patch14")
    assert p.crop_size == 224


def test_process_images_pad_mode():
    class Cfg:
        image_aspect_ratio = "pad"

    proc = ClipImageProcessor()
    imgs = [_rand_img(400, 200), _rand_img(100, 300, seed=1)]
    out = process_images(imgs, proc, Cfg())
    assert out.shape == (2, 336, 336, 3)


def test_process_images_default_mode():
    class Cfg:
        image_aspect_ratio = None

    proc = ClipImageProcessor()
    out = process_images([_rand_img(500, 400)], proc, Cfg())
    assert out.shape == (1, 336, 336, 3)
