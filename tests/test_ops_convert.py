"""Exactness tests for the host-side conversion ops (ops/convert.py) against
the torch reference's implementations, called in-process on identical inputs."""

import numpy as np
import pytest

from refshim import load_reference

from drone_yolo_tpu.ops import (
    clean_str,
    clip_coords,
    masks2segments,
    regularize_rboxes,
    resample_segments,
    scale_coords,
    scale_image,
    segment2box,
    segments2boxes,
    xywhr2xyxyxyxy,
    xyxyxyxy2xywhr,
)

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="torch reference unavailable")


def _rops():
    from ultralytics.utils import ops as R

    return R


def test_segment2box_matches():
    R = _rops()
    rng = np.random.default_rng(0)
    for _ in range(20):
        seg = (rng.random((12, 2)) * 800 - 80).astype(np.float32)  # some outside
        np.testing.assert_allclose(segment2box(seg, 640, 640), R.segment2box(seg.copy(), 640, 640), atol=1e-5)


def test_segments2boxes_matches():
    R = _rops()
    rng = np.random.default_rng(1)
    segs = [(rng.random((k, 2)) * 640).astype(np.float32) for k in (5, 9, 3)]
    np.testing.assert_allclose(segments2boxes(segs), R.segments2boxes([s.copy() for s in segs]), atol=1e-4)


def test_resample_segments_matches():
    R = _rops()
    rng = np.random.default_rng(2)
    segs = [(rng.random((k, 2)) * 640).astype(np.float32) for k in (7, 31)]
    ours = resample_segments([s.copy() for s in segs], n=100)
    theirs = R.resample_segments([s.copy() for s in segs], n=100)
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_rbox_conversions_match():
    import torch

    R = _rops()
    rng = np.random.default_rng(3)
    rb = np.stack(
        [rng.uniform(100, 500, 16), rng.uniform(100, 500, 16), rng.uniform(20, 80, 16), rng.uniform(20, 80, 16), rng.uniform(0, np.pi / 2, 16)],
        axis=1,
    ).astype(np.float32)
    np.testing.assert_allclose(xywhr2xyxyxyxy(rb), R.xywhr2xyxyxyxy(rb.copy()), atol=1e-3)
    corners = xywhr2xyxyxyxy(rb).reshape(-1, 8)
    ours = xyxyxyxy2xywhr(corners)
    theirs = R.xyxyxyxy2xywhr(torch.from_numpy(corners)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-2)
    # regularize: round-trip through corners preserves the box set
    np.testing.assert_allclose(regularize_rboxes(rb), R.regularize_rboxes(torch.from_numpy(rb)).numpy(), atol=1e-5)


def test_scale_image_and_coords_match():
    import torch

    R = _rops()
    rng = np.random.default_rng(4)
    im = rng.random((128, 96, 3)).astype(np.float32)  # letterboxed
    out_ours = scale_image(im.copy(), (100, 60))
    out_ref = R.scale_image(im.copy(), (100, 60))
    np.testing.assert_allclose(out_ours, out_ref, atol=1e-5)

    coords = (rng.random((17, 2)) * 96).astype(np.float32)
    a = scale_coords((128, 96), coords.copy(), (100, 60))
    b = R.scale_coords((128, 96), torch.from_numpy(coords.copy()), (100, 60)).numpy()
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_masks2segments_matches():
    R = _rops()
    import torch

    m = np.zeros((2, 64, 64), np.uint8)
    m[0, 10:30, 10:30] = 1
    m[1, 5:15, 5:15] = 1
    m[1, 40:60, 40:60] = 1  # two blobs -> merged under 'all'
    for strategy in ("all", "largest"):
        ours = masks2segments(m, strategy=strategy)
        theirs = R.masks2segments(torch.from_numpy(m), strategy=strategy)
        for a, b in zip(ours, theirs):
            np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-5)


def test_clip_coords_and_clean_str():
    R = _rops()
    rng = np.random.default_rng(5)
    c = (rng.random((9, 2)) * 200 - 50).astype(np.float32)
    np.testing.assert_allclose(clip_coords(c.copy(), (100, 80)), R.clip_coords(c.copy(), (100, 80)), atol=0)
    s = "a|b@c#d!e$f%g"
    assert clean_str(s) == R.clean_str(s)
