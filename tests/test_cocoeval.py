"""Vendored numpy COCOeval (VERDICT item 4): protocol unit tests + the
validator save_json -> eval_json path producing a real COCO mAP."""

import numpy as np

from make_dataset import make_dataset

from drone_yolo_tpu.utils.cocoeval import COCOevalNP


def _gt(boxes_per_img, hw=(100, 100)):
    images, annotations = [], []
    aid = 1
    for img_id, boxes in boxes_per_img.items():
        images.append({"id": img_id, "height": hw[0], "width": hw[1]})
        for cat, (x, y, w, h) in boxes:
            annotations.append(
                {"id": aid, "image_id": img_id, "category_id": cat, "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0}
            )
            aid += 1
    cats = [{"id": i, "name": str(i)} for i in range(2)]
    return {"images": images, "annotations": annotations, "categories": cats}


def test_perfect_predictions_ap1():
    gt = _gt({0: [(0, (10, 10, 30, 30)), (1, (50, 50, 20, 20))], 1: [(0, (5, 5, 40, 40))]})
    dt = [
        {"image_id": 0, "category_id": 0, "bbox": [10, 10, 30, 30], "score": 0.9},
        {"image_id": 0, "category_id": 1, "bbox": [50, 50, 20, 20], "score": 0.8},
        {"image_id": 1, "category_id": 0, "bbox": [5, 5, 40, 40], "score": 0.95},
    ]
    stats = COCOevalNP(gt, dt).run()
    assert stats["AP"] == 1.0
    assert stats["AP50"] == 1.0
    assert stats["AR100"] == 1.0


def test_false_positive_halves_precision():
    gt = _gt({0: [(0, (10, 10, 30, 30))]})
    dt = [
        {"image_id": 0, "category_id": 0, "bbox": [10, 10, 30, 30], "score": 0.9},
        {"image_id": 0, "category_id": 0, "bbox": [60, 60, 30, 30], "score": 0.95},  # higher-scored FP
    ]
    stats = COCOevalNP(gt, dt).run()
    # 101-pt interpolation: TP ranked 2nd behind an FP -> precision 0.5 at all recalls
    assert abs(stats["AP50"] - 0.5) < 0.01, stats["AP50"]


def test_localization_quality_graded_by_iou():
    gt = _gt({0: [(0, (10, 10, 40, 40))]})
    dt = [{"image_id": 0, "category_id": 0, "bbox": [14, 14, 40, 40], "score": 0.9}]  # IoU ~0.68
    stats = COCOevalNP(gt, dt).run()
    assert stats["AP50"] == 1.0
    assert stats["AP75"] == 0.0
    assert 0.2 < stats["AP"] < 0.6


def test_area_ranges_and_maxdets():
    gt = _gt({0: [(0, (0, 0, 10, 10)), (0, (20, 20, 50, 50))]})  # one small, one large
    dt = [
        {"image_id": 0, "category_id": 0, "bbox": [0, 0, 10, 10], "score": 0.9},
        {"image_id": 0, "category_id": 0, "bbox": [20, 20, 50, 50], "score": 0.8},
    ]
    stats = COCOevalNP(gt, dt).run()
    assert stats["APsmall"] == 1.0
    assert stats["APmedium"] == 1.0  # 50x50 = 2500 in [1024, 9216)
    assert stats["AR1"] < stats["AR10"] == 1.0  # maxDets=1 can't recall both


def test_validator_eval_json_end_to_end(tmp_path):
    """save_json=True writes predictions.json and eval_json returns COCO stats."""
    yaml_path = make_dataset(tmp_path / "d", n_train=2, n_val=4, size=96, nc=4, seed=1)
    from drone_yolo_tpu import YOLO
    from drone_yolo_tpu.models.yolo import TASK_MAP

    m = YOLO("yolov8n.yaml")
    v = TASK_MAP["detect"]["validator"](
        args=dict(data=str(yaml_path), imgsz=64, batch=2, save_json=True, workers=0,
                  mode="val", task="detect", verbose=False, plots=False,
                  project=str(tmp_path), name="cocoval")
    )
    v(model=m)
    assert (v.save_dir / "predictions.json").exists() or not v.jdict  # random weights may emit none
    if v.jdict:
        assert hasattr(v, "coco_stats")
        assert "AP" in v.coco_stats


def test_rle_roundtrip():
    import numpy as np

    from drone_yolo_tpu.utils.cocoeval import rle_area, rle_decode, rle_encode

    rng = np.random.default_rng(0)
    for _ in range(5):
        m = rng.random((13, 17)) > 0.6
        rle = rle_encode(m)
        assert rle["counts"][0] >= 0 and sum(rle["counts"]) == m.size
        np.testing.assert_array_equal(rle_decode(rle), m)
        assert rle_area(rle) == m.sum()
    # empty + full masks
    for m in (np.zeros((4, 6), bool), np.ones((4, 6), bool)):
        np.testing.assert_array_equal(rle_decode(rle_encode(m)), m)


def test_segm_protocol():
    """Perfect masks -> AP 1; shifted masks graded by mask IoU, not box IoU."""
    import numpy as np

    from drone_yolo_tpu.utils.cocoeval import COCOevalNP, rle_encode

    def circle(cx, cy, r, hw=(64, 64)):
        yy, xx = np.mgrid[: hw[0], : hw[1]]
        return (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r

    m1, m2 = circle(20, 20, 10), circle(45, 45, 12)
    gt = {
        "images": [{"id": 0, "height": 64, "width": 64}],
        "annotations": [
            {"id": 1, "image_id": 0, "category_id": 0, "bbox": [10, 10, 20, 20],
             "area": float(m1.sum()), "iscrowd": 0, "segmentation": rle_encode(m1)},
            {"id": 2, "image_id": 0, "category_id": 0, "bbox": [33, 33, 24, 24],
             "area": float(m2.sum()), "iscrowd": 0, "segmentation": rle_encode(m2)},
        ],
        "categories": [{"id": 0, "name": "a"}],
    }
    dt = [
        {"image_id": 0, "category_id": 0, "bbox": [10, 10, 20, 20], "score": 0.9, "segmentation": rle_encode(m1)},
        {"image_id": 0, "category_id": 0, "bbox": [33, 33, 24, 24], "score": 0.8, "segmentation": rle_encode(m2)},
    ]
    assert COCOevalNP(gt, dt, iou_type="segm").run()["AP"] == 1.0

    # a 6px-shifted second mask: IoU ~0.5 -> passes low thresholds only
    dt_shift = [dt[0], {**dt[1], "segmentation": rle_encode(circle(51, 45, 12))}]
    s = COCOevalNP(gt, dt_shift, iou_type="segm").run()
    assert s["AP50"] == 1.0 and s["AP"] < 1.0


def test_seg_validator_save_json(tmp_path):
    """Segment save_json path: RLE predictions written, bbox+segm eval runs."""
    from make_dataset import make_seg_dataset

    from drone_yolo_tpu import YOLO
    from drone_yolo_tpu.models.yolo.segment import SegmentationValidator

    yaml_path = make_seg_dataset(tmp_path / "d", n_val=4, nc=2, seed=2, size=96)
    m = YOLO("yolov8n-seg.yaml")
    v = SegmentationValidator(
        args=dict(data=str(yaml_path), imgsz=96, batch=2, save_json=True, conf=0.01, workers=0,
                  mode="val", task="segment", verbose=False, plots=False,
                  project=str(tmp_path), name="segcocoval")
    )
    v(model=m)
    if v.jdict:
        assert any("segmentation" in d for d in v.jdict)
        assert "AP(M)" in v.coco_stats


def test_keypoints_oks_protocol():
    """Perfect keypoints -> AP 1; offset keypoints graded by OKS."""
    import numpy as np

    from drone_yolo_tpu.utils.cocoeval import COCOevalNP

    kp = [10.0, 10.0, 2, 30.0, 10.0, 2, 10.0, 30.0, 2, 30.0, 30.0, 2]
    gt = {
        "images": [{"id": 0, "height": 64, "width": 64}],
        "annotations": [
            {"id": 1, "image_id": 0, "category_id": 0, "bbox": [5, 5, 30, 30],
             "area": 900.0, "iscrowd": 0, "keypoints": kp, "num_keypoints": 4},
        ],
        "categories": [{"id": 0, "name": "a"}],
    }
    dt_perfect = [{"image_id": 0, "category_id": 0, "bbox": [5, 5, 30, 30], "score": 0.9, "keypoints": kp}]
    assert COCOevalNP(gt, dt_perfect, iou_type="keypoints").run()["AP"] == 1.0
    # shift all kpts by 8px: OKS drops below high thresholds but not 0.5
    kp_off = [v + (8 if i % 3 == 0 else 0) for i, v in enumerate(kp)]
    dt_off = [{**dt_perfect[0], "keypoints": kp_off}]
    s = COCOevalNP(gt, dt_off, iou_type="keypoints").run()
    assert s["AP50"] == 1.0 and s["AP"] < 1.0


def test_pose_validator_save_json(tmp_path):
    """Pose save_json path: keypoint records written, bbox+kpt eval runs."""
    from make_dataset import make_pose_dataset

    from drone_yolo_tpu.models.yolo.pose import PoseValidator

    import jax

    from drone_yolo_tpu.nn.model import PoseModel

    yaml_path = make_pose_dataset(tmp_path / "d", n_val=4, nc=2, seed=3, size=96, nkpt=4)
    model = PoseModel("yolov8n-pose.yaml", nc=2, data_kpt_shape=(4, 3))
    variables = model.init(jax.random.PRNGKey(0), imgsz=96)

    class _Facade:
        pass

    f = _Facade()
    f.model = model
    f.variables = variables
    f.ensure_variables = lambda imgsz=96, seed=0: variables
    v = PoseValidator(
        args=dict(data=str(yaml_path), imgsz=96, batch=2, save_json=True, conf=0.001, workers=0,
                  mode="val", task="pose", verbose=False, plots=False,
                  project=str(tmp_path), name="posecocoval")
    )
    v(model=f, variables=model.fuse(variables))
    if v.jdict:
        assert all("keypoints" in d for d in v.jdict)
        assert "AP(P)" in v.coco_stats


def test_keypoints_protocol_params():
    """pycocotools keypoints protocol: zero-visible-kpt GTs ignored, maxDets=20,
    area ranges all/medium/large (no 'small')."""
    import numpy as np

    from drone_yolo_tpu.utils.cocoeval import COCOevalNP

    kp = [10.0, 10.0, 2, 30.0, 10.0, 2, 10.0, 30.0, 2, 30.0, 30.0, 2]
    kp_none = [0.0, 0.0, 0] * 4  # annotated person with no visible keypoints
    gt = {
        "images": [{"id": 0, "height": 64, "width": 64}],
        "annotations": [
            {"id": 1, "image_id": 0, "category_id": 0, "bbox": [5, 5, 30, 30],
             "area": 900.0, "iscrowd": 0, "keypoints": kp, "num_keypoints": 4},
            {"id": 2, "image_id": 0, "category_id": 0, "bbox": [40, 40, 20, 20],
             "area": 400.0, "iscrowd": 0, "keypoints": kp_none, "num_keypoints": 0},
        ],
        "categories": [{"id": 0, "name": "a"}],
    }
    dt = [{"image_id": 0, "category_id": 0, "bbox": [5, 5, 30, 30], "score": 0.9, "keypoints": kp}]
    s = COCOevalNP(gt, dt, iou_type="keypoints").run()
    # the num_keypoints==0 GT must be ignored, not counted as a miss
    assert s["AP"] == 1.0 and s["AR"] == 1.0, s
    # keypoints summary uses kp-specific area ranges and maxDets=[20]
    assert "APsmall" not in s and "APmedium" in s and "AR" in s and "AR1" not in s
    ev = COCOevalNP(gt, dt, iou_type="keypoints")
    assert ev.max_dets == (20,) and set(ev.area_rng) == {"all", "medium", "large"}
