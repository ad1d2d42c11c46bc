"""Native C++ image-preprocessing parity tests (skip when not built)."""

import numpy as np
import pytest
from PIL import Image

from llava_plus_tpu.data.image_processing import ClipImageProcessor
from llava_plus_tpu.data.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="libllava_img.so not built (make -C native)"
)


@pytest.mark.parametrize("shape", [(480, 640), (336, 336), (200, 500), (1024, 768)])
def test_clip_preprocess_matches_pil(shape):
    from llava_plus_tpu.data.native import clip_preprocess

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, shape + (3,), dtype=np.uint8)
    ref = ClipImageProcessor()(Image.fromarray(arr))
    got = clip_preprocess(arr)
    # within one uint8 level in normalized units
    assert np.abs(ref - got).max() <= 1.01 / 255 / 0.258


def test_batch_matches_single():
    from llava_plus_tpu.data.native import clip_preprocess, clip_preprocess_batch

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (4, 100, 160, 3), dtype=np.uint8)
    batch = clip_preprocess_batch(imgs)
    for i in range(4):
        np.testing.assert_array_equal(batch[i], clip_preprocess(imgs[i]))


def test_expand2square_matches_pil():
    from llava_plus_tpu.data.native import expand2square as native_sq

    from llava_plus_tpu.mm_utils import expand2square as pil_sq

    rng = np.random.default_rng(2)
    for shape in [(40, 100), (100, 40), (64, 64)]:
        a = rng.integers(0, 255, shape + (3,), dtype=np.uint8)
        ref = np.asarray(pil_sq(Image.fromarray(a), (10, 20, 30)))
        got = native_sq(a, (10, 20, 30))
        np.testing.assert_array_equal(ref, got)
