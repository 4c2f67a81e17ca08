"""SAM promptable segmentation: encoder/decoder pipeline + prompts."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sam():
    from drone_yolo_tpu.models.sam import SAM

    return SAM("sam_b", img_size=128)  # tiny for CPU: 8x8 embedding grid


def test_point_and_box_prompts(sam):
    img = (np.random.default_rng(0).random((96, 160, 3)) * 255).astype(np.uint8)
    masks, iou = sam(img, points=[[80, 48]])
    assert masks.shape == (3, 96, 160) and iou.shape == (3,)
    masks2, iou2 = sam.predict_prompts(box=[20, 20, 120, 80], multimask=False)
    assert masks2.shape == (1, 96, 160)
    # embedding reuse: second prompt on the same image must not re-encode
    assert sam._embed_cache is not None


def test_multi_point_prompts(sam):
    img = (np.random.default_rng(1).random((96, 96, 3)) * 255).astype(np.uint8)
    masks, iou = sam(img, points=[[30, 30], [60, 60]], labels=[1, 0])
    assert masks.shape[0] == 3


def test_window_partition_roundtrip():
    import jax.numpy as jnp

    from drone_yolo_tpu.models.sam.modules import window_partition, window_unpartition

    x = jnp.arange(2 * 10 * 13 * 4, dtype=jnp.float32).reshape(2, 10, 13, 4)
    w, pad_hw = window_partition(x, 7)
    y = window_unpartition(w, 7, pad_hw, (10, 13))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
