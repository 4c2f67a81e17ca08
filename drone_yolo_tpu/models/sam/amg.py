"""Automatic mask generation: grid-prompt everything mode (reference sam/amg.py).

A points_per_side grid of foreground prompts runs through the decoder in
batches; masks are filtered by predicted IoU and deduplicated by mask IoU.
"""

from __future__ import annotations

import numpy as np

from drone_yolo_tpu.ops.masks import mask_iou_np


def auto_mask_generate(sam, img, points_per_side: int = 8, iou_thresh: float = 0.7, dedup_thresh: float = 0.85):
    """Everything-mode segmentation. Returns list of {segmentation, area, predicted_iou, point}."""
    sam.set_image(img)
    h, w = img.shape[:2]
    xs = (np.arange(points_per_side) + 0.5) / points_per_side * w
    ys = (np.arange(points_per_side) + 0.5) / points_per_side * h

    results = []
    for y in ys:
        for x in xs:
            masks, iou = sam.predict_prompts(points=[[x, y]], multimask=True)
            best = int(np.argmax(iou))
            if iou[best] >= iou_thresh and masks[best].any():
                results.append({"segmentation": masks[best], "area": int(masks[best].sum()), "predicted_iou": float(iou[best]), "point": (float(x), float(y))})

    # dedup by mask IoU, keep higher predicted iou
    results.sort(key=lambda r: -r["predicted_iou"])
    kept = []
    for r in results:
        if all(
            mask_iou_np(r["segmentation"][None], k["segmentation"][None])[0, 0] < dedup_thresh for k in kept
        ):
            kept.append(r)
    return kept


def auto_annotate(data, det_model, sam, output_dir=None, conf: float = 0.25, imgsz: int = 640):
    """Detector boxes -> SAM segment labels (reference data/annotator.py:8)."""
    import cv2
    from pathlib import Path

    output_dir = Path(output_dir or "auto_annotate_labels")
    output_dir.mkdir(parents=True, exist_ok=True)
    results = det_model.predict(source=data, conf=conf, imgsz=imgsz, verbose=False)
    for r in results:
        if r.boxes is None or len(r.boxes) == 0:
            continue
        img = r.orig_img
        sam.set_image(img)
        lines = []
        h, w = img.shape[:2]
        for box, cls in zip(r.boxes.xyxy, r.boxes.cls):
            masks, iou = sam.predict_prompts(box=box, multimask=False)
            m = masks[0].astype(np.uint8)
            contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            if not contours:
                continue
            c = max(contours, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
            coords = " ".join(f"{px / w:.5f} {py / h:.5f}" for px, py in c)
            lines.append(f"{int(cls)} {coords}")
        stem = Path(str(r.path)).stem
        (output_dir / f"{stem}.txt").write_text("\n".join(lines) + ("\n" if lines else ""))
    return output_dir
