"""On-device augmentation (`device_aug=True`, data/device_aug.py).

(a) the sum-of-quadrants decomposition equals scale_and_translate of the
    materialized 2S canvas (the linearity argument, checked numerically),
(b) identity params (scale=0, translate=0) make the mosaic an exact center
    crop of the canvas with exactly transformed boxes,
(c) HSV round-trip is the identity and matches cv2's conversion,
(d) zero-aug device path produces bit-identical batches to the host path:
    2-epoch trainer losses match between device_aug=True and False,
(e) default-hyp device-aug training runs with finite losses and the mosaic
    close recompile fires.
"""

import csv
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from make_dataset import make_dataset

rng_np = np.random.default_rng(0)


@pytest.mark.smoke
def test_quadrant_decomposition_matches_canvas():
    from drone_yolo_tpu.data.device_aug import _warp

    s = 32
    imgs = [rng_np.random((s, s, 3)).astype(np.float32) * 255 for _ in range(4)]
    canvas = np.zeros((2 * s, 2 * s, 3), np.float32)
    canvas[:s, :s] = imgs[0]
    canvas[:s, s:] = imgs[1]
    canvas[s:, :s] = imgs[2]
    canvas[s:, s:] = imgs[3]

    a = jnp.float32(0.73)
    t = (jnp.float32(0.55 * s), jnp.float32(0.47 * s))  # (ty, tx)
    # whole-canvas warp: x' = a*(x - s) + t  ->  translation = t - a*s
    ref = _warp(jnp.asarray(canvas), a, jnp.stack([t[0] - a * s, t[1] - a * s]), s)
    total = 0.0
    for k, (oy, ox) in enumerate([(0, 0), (0, s), (s, 0), (s, s)]):
        tk = jnp.stack([a * (oy - s) + t[0], a * (ox - s) + t[1]])
        total = total + _warp(jnp.asarray(imgs[k]), a, tk, s)
    np.testing.assert_allclose(np.asarray(total), np.asarray(ref), rtol=1e-5, atol=1e-3)

    # and the warp itself matches cv2.warpAffine INTER_LINEAR + borderValue
    import cv2

    m = np.array([[float(a), 0.0, float(t[1] - a * s)], [0.0, float(a), float(t[0] - a * s)]])
    cv_ref = cv2.warpAffine(
        canvas, m, (s, s), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT, borderValue=(114, 114, 114)
    )
    from drone_yolo_tpu.data.device_aug import _cover

    cov = 0.0
    for k, (oy, ox) in enumerate([(0, 0), (0, s), (s, 0), (s, s)]):
        tk = jnp.stack([a * (oy - s) + t[0], a * (ox - s) + t[1]])
        cov = cov + _cover(a, tk, s, s)
    filled = np.asarray(total) + 114.0 * (1.0 - np.asarray(cov))
    np.testing.assert_allclose(filled, cv_ref, atol=0.51)  # cv2 fixed-point interp


@pytest.mark.smoke
def test_identity_params_center_crop_and_boxes():
    from drone_yolo_tpu.data.device_aug import device_augment

    s, b, m = 32, 4, 3
    img = rng_np.integers(0, 255, (b, s, s, 3)).astype(np.uint8)
    boxes = np.tile(np.array([4.0, 6.0, 20.0, 26.0], np.float32), (b, m, 1))
    cls = np.zeros((b, m), np.float32)
    mask = np.ones((b, m), np.float32)
    batch = {
        "img": jnp.asarray(img, jnp.float32),
        "cls": jnp.asarray(cls),
        "bboxes": jnp.asarray(boxes),
        "mask": jnp.asarray(mask),
    }
    hyp = dict(
        mosaic=1.0, mosaic_center=0.0, scale=0.0, translate=0.0,
        hsv_h=0, hsv_s=0, hsv_v=0, fliplr=0, flipud=0,
    )
    out = device_augment(batch, jax.random.PRNGKey(0), hyp, mosaic_on=True)

    # canvas center crop: quadrants contribute their inner corners
    half = s // 2
    expect = np.zeros((b, s, s, 3), np.float32)
    for i in range(b):
        expect[i, :half, :half] = img[i, half:, half:]
        expect[i, :half, half:] = img[(i + 1) % b, half:, :half]
        expect[i, half:, :half] = img[(i + 2) % b, :half, half:]
        expect[i, half:, half:] = img[(i + 3) % b, :half, :half]
    np.testing.assert_allclose(np.asarray(out["img"]) * 255.0, expect, atol=1e-2)

    # boxes: x' = (x + ox - s) + s/2, clipped to [0, s]; all four groups present
    ob = np.asarray(out["bboxes"])
    om = np.asarray(out["mask"])
    assert ob.shape == (b, 4 * m, 4)
    np.testing.assert_allclose(ob[0, 0], np.clip(np.array([4, 6, 20, 26]) - half, 0, s), atol=1e-4)
    np.testing.assert_allclose(ob[0, m], np.clip(np.array([4 + half, 6 - half, 20 + half, 26 - half]), 0, s), atol=1e-4)
    # group-0 box gets clipped to 10x10 at the corner -> still a candidate
    assert om[0, 0] == 1.0


@pytest.mark.smoke
def test_jittered_center_matches_materialized_canvas():
    """Mosaic center jitter (reference _mosaic4 yc/xc draw): the masked
    sum-of-warps must equal cv2.warpAffine of an explicitly materialized 2S
    canvas with quadrants placed at offs[k] + c and cropped at the boundary."""
    import cv2

    from drone_yolo_tpu.data.device_aug import _cover, _warp

    s = 32
    imgs = [rng_np.random((s, s, 3)).astype(np.float32) * 255 for _ in range(4)]
    for cy, cx in [(-11.0, 7.0), (15.0, -16.0), (0.0, 12.0)]:
        canvas = np.full((2 * s, 2 * s, 3), 114.0, np.float32)
        for k, (oy, ox) in enumerate([(0, 0), (0, s), (s, 0), (s, s)]):
            qy, qx = int(oy + cy), int(ox + cx)
            y1, y2 = max(qy, 0), min(qy + s, 2 * s)
            x1, x2 = max(qx, 0), min(qx + s, 2 * s)
            canvas[y1:y2, x1:x2] = imgs[k][y1 - qy : y2 - qy, x1 - qx : x2 - qx]

        a = 0.8
        t = (0.52 * s, 0.44 * s)
        m = np.array([[a, 0.0, t[1] - a * s], [0.0, a, t[0] - a * s]])
        cv_ref = cv2.warpAffine(
            canvas, m, (s, s), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT, borderValue=(114, 114, 114)
        )

        af = jnp.float32(a)
        total, cov = 0.0, 0.0
        for k, (oy, ox) in enumerate([(0, 0), (0, s), (s, 0), (s, s)]):
            q = jnp.asarray([oy + cy, ox + cx], jnp.float32)
            tk = jnp.stack([af * (q[0] - s) + t[0], af * (q[1] - s) + t[1]])
            total = total + _warp(jnp.asarray(imgs[k]), af, tk, s, q, 2.0 * s)
            cov = cov + _cover(af, tk, s, s, q, 2.0 * s)
        ours = np.asarray(total) + 114.0 * (1.0 - np.asarray(cov))
        np.testing.assert_allclose(ours, cv_ref, atol=0.51)


@pytest.mark.smoke
def test_hsv_round_trip_and_cv2_parity():
    import cv2

    from drone_yolo_tpu.data.device_aug import hsv_to_rgb, rgb_to_hsv

    img = rng_np.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    f = jnp.asarray(img, jnp.float32)
    back = np.asarray(hsv_to_rgb(rgb_to_hsv(f)))
    np.testing.assert_allclose(back, img.astype(np.float32), atol=1e-3)

    ours = np.asarray(rgb_to_hsv(f))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
    # cv2 quantizes H to integers (0..179); S/V to 0..255
    assert np.abs(ours[..., 0] - ref[..., 0]).mean() < 1.0
    assert np.abs(ours[..., 1] - ref[..., 1]).mean() < 1.0
    np.testing.assert_allclose(ours[..., 2], ref[..., 2], atol=1.0)


NO_AUG = dict(
    mosaic=0.0, mixup=0.0, copy_paste=0.0, fliplr=0.0, flipud=0.0, hsv_h=0.0,
    hsv_s=0.0, hsv_v=0.0, translate=0.0, scale=0.0, degrees=0.0, shear=0.0,
    perspective=0.0, erasing=0.0, bgr=0.0, multi_scale=False, amp=False,
    nbs=8,
)


def _train(tmp_path, data_yaml, name, epochs=2, **kw):
    from drone_yolo_tpu import YOLO

    random.seed(0)
    np.random.seed(0)
    m = YOLO("yolov8n.yaml")
    m.train(
        data=str(data_yaml), epochs=epochs, imgsz=64, batch=8, workers=1,
        project=str(tmp_path), name=name, val=False, plots=False, verbose=False,
        warmup_epochs=0.0, seed=0, **kw,
    )
    rows = list(csv.DictReader(open(tmp_path / name / "results.csv")))
    return m, [
        float(r["train/box_loss"]) + float(r["train/cls_loss"]) + float(r["train/dfl_loss"])
        for r in rows
    ]


@pytest.mark.smoke
def test_mask_id_warp_mosaic_center_crop():
    """Overlap-ID masks through the device mosaic (nearest warp): with identity
    affine and mosaic_center=0 the result is the canvas center crop with
    companion IDs offset to their 4M slot groups."""
    from drone_yolo_tpu.data.device_aug import device_augment

    s, hm, b, m = 64, 16, 4, 3
    rng = np.random.default_rng(3)
    om = rng.integers(0, m + 1, (b, hm, hm)).astype(np.int32)
    batch = {
        "img": jnp.asarray(rng.integers(0, 255, (b, s, s, 3)), jnp.float32),
        "cls": jnp.zeros((b, m)),
        "bboxes": jnp.asarray(np.tile(np.array([8.0, 8.0, 40.0, 40.0], np.float32), (b, m, 1))),
        "mask": jnp.ones((b, m)),
        "masks": jnp.asarray(om),
    }
    hyp = dict(
        mosaic=1.0, mosaic_center=0.0, scale=0.0, translate=0.0,
        hsv_h=0, hsv_s=0, hsv_v=0, fliplr=0, flipud=0,
    )
    out = device_augment(batch, jax.random.PRNGKey(0), hyp, mosaic_on=True)
    got = np.asarray(out["masks"])
    half = hm // 2
    expect = np.zeros((b, hm, hm), np.int32)
    for i in range(b):
        offs = lambda ids, k: np.where(ids > 0, ids + k * m, 0)  # noqa: E731
        expect[i, :half, :half] = om[i, half:, half:]
        expect[i, :half, half:] = offs(om[(i + 1) % b, half:, :half], 1)
        expect[i, half:, :half] = offs(om[(i + 2) % b, :half, half:], 2)
        expect[i, half:, half:] = offs(om[(i + 3) % b, :half, :half], 3)
    np.testing.assert_array_equal(got, expect)
    assert out["cls"].shape == (b, 4 * m)


@pytest.mark.smoke
def test_keypoints_affine_flip_and_visibility():
    """Pose keypoints: affine matches the box transform, out-of-frame points
    lose visibility, lr-flip mirrors x and applies flip_idx."""
    from drone_yolo_tpu.data.device_aug import device_augment

    s, b, m, k = 64, 2, 2, 4
    kp = np.zeros((b, m, k, 3), np.float32)
    kp[..., 0] = np.array([10.0, 30.0, 50.0, 62.0])
    kp[..., 1] = np.array([12.0, 20.0, 40.0, 60.0])
    kp[..., 2] = 2.0
    batch = {
        "img": jnp.asarray(np.random.default_rng(0).integers(0, 255, (b, s, s, 3)), jnp.float32),
        "cls": jnp.zeros((b, m)),
        "bboxes": jnp.asarray(np.tile(np.array([8.0, 8.0, 40.0, 40.0], np.float32), (b, m, 1))),
        "mask": jnp.ones((b, m)),
        "keypoints": jnp.asarray(kp),
    }
    # identity affine, forced lr flip with a reversing flip_idx
    hyp = dict(
        mosaic=0.0, mosaic_center=0.0, scale=0.0, translate=0.0,
        hsv_h=0, hsv_s=0, hsv_v=0, fliplr=1.0, flipud=0,
        flip_idx=(3, 2, 1, 0),
    )
    out = device_augment(batch, jax.random.PRNGKey(1), hyp, mosaic_on=False)
    got = np.asarray(out["keypoints"])
    # x -> s - x then keypoint order reversed
    exp_x = (s - kp[..., 0])[:, :, ::-1]
    np.testing.assert_allclose(got[..., 0], exp_x, atol=1e-4)
    np.testing.assert_allclose(got[..., 1], kp[..., 1][:, :, ::-1], atol=1e-4)
    assert (got[..., 2] == 2.0).all()  # all in-frame after flip

    # scale pushes the far keypoint out of frame -> visibility drops to 0
    hyp2 = dict(hyp, fliplr=0.0, scale=0.0, translate=0.0)
    kp2 = kp.copy()
    kp2[..., 0] = np.array([10.0, 30.0, 50.0, 70.0])  # 70 > 64: outside
    out2 = device_augment({**batch, "keypoints": jnp.asarray(kp2)}, jax.random.PRNGKey(1), hyp2, mosaic_on=False)
    vis = np.asarray(out2["keypoints"])[..., 2]
    assert (vis[:, :, 3] == 0.0).all() and (vis[:, :, :3] == 2.0).all()


@pytest.mark.smoke
def test_device_mixup_blends_and_concats():
    from drone_yolo_tpu.data.device_aug import device_augment

    s, b, m = 32, 4, 2
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (b, s, s, 3)).astype(np.float32)
    batch = {
        "img": jnp.asarray(img),
        "cls": jnp.asarray(np.arange(b * m, dtype=np.float32).reshape(b, m)),
        "bboxes": jnp.asarray(np.tile(np.array([4.0, 4.0, 20.0, 20.0], np.float32), (b, m, 1))),
        "mask": jnp.ones((b, m)),
    }
    hyp = dict(
        mosaic=0.0, mosaic_center=0.0, scale=0.0, translate=0.0,
        hsv_h=0, hsv_s=0, hsv_v=0, fliplr=0, flipud=0, mixup=1.0,
    )
    out = device_augment(batch, jax.random.PRNGKey(2), hyp, mosaic_on=False)
    assert out["cls"].shape == (b, 2 * m)
    # companion slots carry the rolled labels and stay active
    np.testing.assert_allclose(np.asarray(out["cls"])[:, m:], np.roll(np.arange(b * m).reshape(b, m), -1, 0))
    assert np.asarray(out["mask"]).sum() == b * 2 * m
    # blended image is a strict convex combination (beta(32,32) keeps r in (0,1))
    blend = np.asarray(out["img"]) * 255.0
    comp = np.roll(img, -1, 0)
    lo = np.minimum(img, comp) - 0.6
    hi = np.maximum(img, comp) + 0.6
    assert (blend >= lo).all() and (blend <= hi).all()
    assert not np.allclose(blend, img, atol=0.5)  # actually mixed


def test_zero_aug_device_path_matches_host_path(tmp_path):
    yaml_path = make_dataset(tmp_path / "d", n_train=8, n_val=4, size=96, nc=4, seed=5)
    _, host = _train(tmp_path, yaml_path, "host", device_aug=False, **NO_AUG)
    _, dev = _train(tmp_path, yaml_path, "dev", device_aug=True, **NO_AUG)
    assert len(host) == len(dev) >= 2
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-4)


def test_device_aug_default_hyps_trains_finite(tmp_path):
    yaml_path = make_dataset(tmp_path / "d", n_train=8, n_val=4, size=96, nc=4, seed=6)
    m, losses = _train(
        tmp_path, yaml_path, "aug", epochs=3, device_aug=True, close_mosaic=1,
        mosaic=1.0, scale=0.5, translate=0.1, fliplr=0.5, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4,
        mixup=0.0, copy_paste=0.0, flipud=0.0, degrees=0.0, shear=0.0, perspective=0.0,
        erasing=0.0, bgr=0.0, multi_scale=False, amp=False, nbs=8,
    )
    assert len(losses) == 3 and all(np.isfinite(v) for v in losses)
    # host dataset runs letterbox-only transforms (randomness is on-device)
    assert m.trainer.device_aug
    assert m.trainer.trainset.device_aug
    assert m.trainer.trainset.max_buffer_length == 0
