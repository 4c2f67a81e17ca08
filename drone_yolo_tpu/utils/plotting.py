"""Plotting: Annotator (boxes/masks/kpts drawing), color palette, train plots.

Capability parity with `ultralytics/utils/plotting.py:157-1404` (Annotator,
colors, plot_images, plot_results, plot_labels). cv2-based, host-side.
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np

from drone_yolo_tpu.utils import LOGGER, threaded


class Colors:
    """Ultralytics-style color palette (reference plotting.py:24)."""

    def __init__(self):
        hexs = (
            "042AFF", "0BDBEB", "F3F3F3", "00DFB7", "111F68", "FF6FDD", "FF444F", "CCED00",
            "00F344", "BD00FF", "00B4FF", "DD00BA", "00FFFF", "26C000", "01FFB3", "7D24FF",
            "7B0068", "FF1B6C", "FC6D2F", "A2FF0B",
        )
        self.palette = [self.hex2rgb(f"#{c}") for c in hexs]
        self.n = len(self.palette)
        self.pose_palette = np.array(
            [
                [255, 128, 0], [255, 153, 51], [255, 178, 102], [230, 230, 0], [255, 153, 255],
                [153, 204, 255], [255, 102, 255], [255, 51, 255], [102, 178, 255], [51, 153, 255],
                [255, 153, 153], [255, 102, 102], [255, 51, 51], [153, 255, 153], [102, 255, 102],
                [51, 255, 51], [0, 255, 0], [0, 0, 255], [255, 0, 0], [255, 255, 255],
            ],
            dtype=np.uint8,
        )

    def __call__(self, i, bgr: bool = False):
        c = self.palette[int(i) % self.n]
        return (c[2], c[1], c[0]) if bgr else c

    @staticmethod
    def hex2rgb(h):
        return tuple(int(h[1 + i : 1 + i + 2], 16) for i in (0, 2, 4))


colors = Colors()

# COCO keypoint skeleton (reference plotting.py:189)
SKELETON = [
    [16, 14], [14, 12], [17, 15], [15, 13], [12, 13], [6, 12], [7, 13], [6, 7],
    [6, 8], [7, 9], [8, 10], [9, 11], [2, 3], [1, 2], [1, 3], [2, 4], [3, 5], [4, 6], [5, 7],
]


class Annotator:
    """cv2 drawing helper (reference plotting.py:157)."""

    def __init__(self, im, line_width=None, font_size=None, example: str = ""):
        self.im = np.ascontiguousarray(im if im.flags.writeable else im.copy())
        self.lw = line_width or max(round(sum(im.shape) / 2 * 0.003), 2)
        self.sf = self.lw / 3  # font scale
        self.tf = max(self.lw - 1, 1)  # font thickness
        self.limb_color = colors.pose_palette[[9, 9, 9, 9, 7, 7, 7, 0, 0, 0, 0, 0, 16, 16, 16, 16, 16, 16, 16]]
        self.kpt_color = colors.pose_palette[[16, 16, 16, 16, 16, 0, 0, 0, 0, 0, 0, 9, 9, 9, 9, 9, 9]]

    def box_label(self, box, label: str | None = None, color=(128, 128, 128), txt_color=(255, 255, 255)):
        import cv2

        p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
        cv2.rectangle(self.im, p1, p2, color, thickness=self.lw, lineType=cv2.LINE_AA)
        if label:
            w, h = cv2.getTextSize(label, 0, fontScale=self.sf, thickness=self.tf)[0]
            outside = p1[1] - h >= 3
            p2 = p1[0] + w, p1[1] - h - 3 if outside else p1[1] + h + 3
            cv2.rectangle(self.im, p1, p2, color, -1, cv2.LINE_AA)
            cv2.putText(
                self.im, label, (p1[0], p1[1] - 2 if outside else p1[1] + h + 2),
                0, self.sf, txt_color, thickness=self.tf, lineType=cv2.LINE_AA,
            )

    def obb_label(self, corners, label: str | None = None, color=(128, 128, 128), txt_color=(255, 255, 255)):
        import cv2

        pts = np.asarray(corners, dtype=np.int32).reshape(-1, 1, 2)
        cv2.polylines(self.im, [pts], True, color, self.lw)
        if label:
            p1 = tuple(pts[0, 0])
            cv2.putText(self.im, label, p1, 0, self.sf, txt_color, thickness=self.tf, lineType=cv2.LINE_AA)

    def masks(self, masks, mask_colors, alpha: float = 0.5):
        """Overlay (N, H, W) binary masks with per-instance colors."""
        import cv2

        if len(masks) == 0:
            return
        h, w = self.im.shape[:2]
        overlay = self.im.copy()
        for m, c in zip(masks, mask_colors):
            m8 = m.astype(np.uint8)
            if m8.shape != (h, w):
                m8 = cv2.resize(m8, (w, h), interpolation=cv2.INTER_NEAREST)
            overlay[m8.astype(bool)] = c
        self.im = cv2.addWeighted(self.im, 1 - alpha, overlay, alpha, 0)

    def kpts(self, kpts, shape=(640, 640), radius: int = 5, kpt_line: bool = True, conf_thres: float = 0.25):
        import cv2

        nk, nd = kpts.shape
        is_pose = nk == 17 and nd in {2, 3}
        for i, k in enumerate(kpts):
            if nd == 3 and k[2] < conf_thres:
                continue
            x, y = int(k[0]), int(k[1])
            if 0 < x < shape[1] and 0 < y < shape[0]:
                color = tuple(int(c) for c in self.kpt_color[i]) if is_pose else colors(i)
                cv2.circle(self.im, (x, y), radius, color, -1, lineType=cv2.LINE_AA)
        if kpt_line and is_pose:
            for i, sk in enumerate(SKELETON):
                p1, p2 = kpts[sk[0] - 1], kpts[sk[1] - 1]
                if nd == 3 and (p1[2] < conf_thres or p2[2] < conf_thres):
                    continue
                cv2.line(
                    self.im, (int(p1[0]), int(p1[1])), (int(p2[0]), int(p2[1])),
                    tuple(int(c) for c in self.limb_color[i]), thickness=2, lineType=cv2.LINE_AA,
                )

    def text(self, xy, text: str, txt_color=(255, 255, 255)):
        import cv2

        for i, line in enumerate(text.split("\n")):
            cv2.putText(self.im, line, (xy[0], xy[1] + 20 * (i + 1)), 0, self.sf, txt_color, thickness=self.tf, lineType=cv2.LINE_AA)

    # -- solution-annotation primitives (reference plotting.py:570-931) -------

    def draw_region(self, reg_pts, color=(0, 255, 0), thickness: int = 5):
        """Region polygon + vertex pins (reference plotting.py:593)."""
        import cv2

        pts = np.asarray(reg_pts, np.int32).reshape(-1, 1, 2)
        cv2.polylines(self.im, [pts], True, color, thickness)
        for p in pts[:, 0]:
            cv2.circle(self.im, (int(p[0]), int(p[1])), thickness * 2, color, -1)

    def draw_centroid_and_tracks(self, track, color=(255, 0, 255), track_thickness: int = 2):
        """Track polyline + current-centroid dot (reference plotting.py:608)."""
        import cv2

        pts = np.asarray(track, np.int32).reshape(-1, 1, 2)
        cv2.polylines(self.im, [pts], False, color, track_thickness)
        cv2.circle(self.im, (int(track[-1][0]), int(track[-1][1])), track_thickness * 2, color, -1)

    def _label_box(self, center, label, bg_color, txt_color, margin: int = 5):
        """Filled label box centered at `center`."""
        import cv2

        (tw, th), _ = cv2.getTextSize(label, 0, self.sf, self.tf)
        x, y = int(center[0] - tw / 2), int(center[1] + th / 2)
        cv2.rectangle(self.im, (x - margin, y - th - margin), (x + tw + margin, y + margin), bg_color, -1)
        cv2.putText(self.im, label, (x, y), 0, self.sf, txt_color, self.tf, cv2.LINE_AA)

    def queue_counts_display(self, label, points=None, region_color=(255, 255, 255), txt_color=(0, 0, 0)):
        """Queue count centered in the region (reference plotting.py:621)."""
        pts = np.asarray(points, np.float32)
        self._label_box((pts[:, 0].mean(), pts[:, 1].mean()), label, region_color, txt_color, margin=10)

    def display_objects_labels(self, im0, text, txt_color, bg_color, x_center, y_center, margin: int = 5):
        """Region-count label at a region centroid (reference plotting.py:661)."""
        self.im = im0
        self._label_box((x_center, y_center), text, bg_color, txt_color, margin)

    def display_analytics(self, im0, text: dict, txt_color=(255, 255, 255), bg_color=(104, 31, 17), margin: int = 10):
        """Key/value analytics block in the top-right corner (reference plotting.py:685)."""
        import cv2

        self.im = im0
        offset = 0
        for k, v in text.items():
            line = f"{k}: {v}"
            (tw, th), _ = cv2.getTextSize(line, 0, self.sf, self.tf)
            x, y = im0.shape[1] - tw - 2 * margin, th + 2 * margin + offset
            cv2.rectangle(self.im, (x - margin, y - th - margin), (x + tw + margin, y + margin), bg_color, -1)
            cv2.putText(self.im, line, (x, y), 0, self.sf, txt_color, self.tf, cv2.LINE_AA)
            offset += th + 3 * margin

    @staticmethod
    def estimate_pose_angle(a, b, c):
        """Inner angle ABC in degrees (reference plotting.py:715)."""
        a, b, c = (np.asarray(p, np.float32) for p in (a, b, c))
        ang = abs(np.degrees(np.arctan2(c[1] - b[1], c[0] - b[0]) - np.arctan2(a[1] - b[1], a[0] - b[0])))
        return 360.0 - ang if ang > 180.0 else ang

    def plot_angle_and_count_and_stage(self, angle_text, count_text, stage_text, center_kpt, color=(104, 31, 17), txt_color=(255, 255, 255)):
        """Workout angle/reps/stage stack near a joint (reference plotting.py:789)."""
        import cv2

        x, y = int(center_kpt[0]), int(center_kpt[1])
        for i, line in enumerate((f"Angle: {angle_text}", f"Reps: {count_text}", f"Stage: {stage_text}")):
            (tw, th), _ = cv2.getTextSize(line, 0, self.sf, self.tf)
            yy = y + i * (th + 12)
            cv2.rectangle(self.im, (x - 5, yy - th - 5), (x + tw + 5, yy + 5), color, -1)
            cv2.putText(self.im, line, (x, yy), 0, self.sf, txt_color, self.tf, cv2.LINE_AA)

    def plot_distance_and_line(self, pixels_distance, centroids, line_color=(104, 31, 17), centroid_color=(255, 0, 255)):
        """Distance label + line between two object centroids (reference plotting.py:878)."""
        import cv2

        label = f"Pixels Distance: {pixels_distance:.2f}"
        (tw, th), _ = cv2.getTextSize(label, 0, self.sf, self.tf)
        cv2.rectangle(self.im, (15, 25), (15 + tw + 20, 25 + th + 20), line_color, -1)
        cv2.putText(self.im, label, (25, 25 + th + 10), 0, self.sf, (255, 255, 255), self.tf, cv2.LINE_AA)
        c0 = (int(centroids[0][0]), int(centroids[0][1]))
        c1 = (int(centroids[1][0]), int(centroids[1][1]))
        cv2.line(self.im, c0, c1, line_color, 3)
        cv2.circle(self.im, c0, 6, centroid_color, -1)
        cv2.circle(self.im, c1, 6, centroid_color, -1)

    def visioneye(self, box, center_point, color=(235, 219, 11), pin_color=(255, 0, 255)):
        """Vision-eye pin from a fixed point to an object center (reference plotting.py:914)."""
        import cv2

        cx, cy = int((box[0] + box[2]) / 2), int((box[1] + box[3]) / 2)
        cv2.circle(self.im, (cx, cy), 6, color, -1)
        cv2.circle(self.im, (int(center_point[0]), int(center_point[1])), 6, pin_color, -1)
        cv2.line(self.im, (int(center_point[0]), int(center_point[1])), (cx, cy), color, 2)

    def result(self):
        return self.im


@threaded
def plot_images(images, batch_idx, cls, bboxes=None, paths=None, fname="images.jpg", names=None, max_size: int = 1920, max_subplots: int = 16, save: bool = True):
    """Tile a training batch with labels into a mosaic image (reference plotting.py:1034)."""
    import cv2

    images = np.asarray(images)
    if images.dtype in (np.float32, np.float64) or str(images.dtype) == "bfloat16":
        images = (np.asarray(images, np.float32) * 255).astype(np.uint8)
    if images.shape[-1] in (1, 3):  # NHWC -> keep
        pass
    bs, h, w, _ = images.shape
    bs = min(bs, max_subplots)
    ns = math.ceil(bs**0.5)

    mosaic = np.full((int(ns * h), int(ns * w), 3), 255, dtype=np.uint8)
    for i in range(bs):
        x, y = int(w * (i // ns)), int(h * (i % ns))
        mosaic[y : y + h, x : x + w] = images[i][..., ::-1]  # RGB->BGR for cv2

    scale = max_size / ns / max(h, w)
    if scale < 1:
        mosaic = cv2.resize(mosaic, (int(ns * w * scale), int(ns * h * scale)))

    ann = Annotator(mosaic, line_width=2)
    for i in range(bs):
        x, y = int(w * (i // ns) * min(scale, 1)), int(h * (i % ns) * min(scale, 1))
        if bboxes is not None and len(bboxes):
            sel = np.asarray(batch_idx) == i
            bb = np.asarray(bboxes)[sel] * min(scale, 1)
            cc = np.asarray(cls)[sel]
            for b, c in zip(bb, cc):
                # boxes arrive as pixel xyxy
                ann.box_label([b[0] + x, b[1] + y, b[2] + x, b[3] + y], (names or {}).get(int(c), str(int(c))), color=colors(int(c), True))
    if save:
        cv2.imwrite(str(fname), ann.result())
    return ann.result()


def plot_results(file: str = "results.csv", dir: str = "", on_plot=None):
    """Plot training curves from results.csv (reference plotting.py:1202)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import pandas as pd
    except ImportError as e:  # pragma: no cover
        LOGGER.warning(f"plot_results skipped: {e}")
        return
    save_dir = Path(file).parent if file else Path(dir)
    files = list(save_dir.glob("results*.csv"))
    if not files:
        return
    fig, axes = plt.subplots(2, 5, figsize=(20, 8))
    axes = axes.ravel()
    for f in files:
        data = pd.read_csv(f)
        cols = [c for c in data.columns if c != "epoch"][:10]
        for i, c in enumerate(cols):
            axes[i].plot(data["epoch"], data[c], marker=".", label=f.stem)
            axes[i].set_title(c, fontsize=9)
    fig.savefig(save_dir / "results.png", dpi=150)
    plt.close(fig)


def plot_labels(boxes, cls, names=(), save_dir=Path("")):
    """Label distribution plots (reference plotting.py:932)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover
        return
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].hist(np.asarray(cls), bins=max(int(np.max(cls)) + 1, 1) if len(cls) else 1)
    axes[0].set_title("classes")
    if len(boxes):
        b = np.asarray(boxes)
        axes[1].scatter(b[:, 2], b[:, 3], s=2, alpha=0.3)
        axes[1].set_title("wh")
    fig.savefig(Path(save_dir) / "labels.jpg", dpi=150)
    plt.close(fig)


def feature_visualization(x, module_type: str, stage: int, n: int = 32, save_dir=Path("runs/detect/exp")):
    """Dump feature-map channels to an image (reference plotting.py:1373)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover
        return
    x = np.asarray(x, np.float32)
    if x.ndim != 4:
        return
    _, h, w, c = x.shape
    n = min(n, c)
    fig, axes = plt.subplots(math.ceil(n / 8), 8, figsize=(12, 2 * math.ceil(n / 8)))
    axes = np.atleast_1d(axes).ravel()
    for i in range(n):
        axes[i].imshow(x[0, :, :, i])
        axes[i].axis("off")
    save_dir.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_dir / f"stage{stage}_{module_type.split('.')[-1]}_features.png", dpi=120)
    plt.close(fig)
