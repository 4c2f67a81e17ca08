"""Trackers (ByteTrack/BoT-SORT) and SAHI tiled inference tests."""

import numpy as np

from drone_yolo_tpu.trackers.bot_sort import BOTSORT
from drone_yolo_tpu.trackers.byte_tracker import BYTETracker
from drone_yolo_tpu.ops.tiling import crop_labels, get_windows, tiled_inference
from drone_yolo_tpu.utils import IterableSimpleNamespace


def _tracker_args(**kw):
    base = dict(
        tracker_type="bytetrack", track_high_thresh=0.25, track_low_thresh=0.1,
        new_track_thresh=0.25, track_buffer=30, match_thresh=0.8, fuse_score=True,
        gmc_method="sparseOptFlow", proximity_thresh=0.5, appearance_thresh=0.25, with_reid=False,
    )
    base.update(kw)
    return IterableSimpleNamespace(**base)


def _moving_boxes(t):
    """Two objects moving right/down at constant velocity."""
    return np.array(
        [
            [10 + 3 * t, 20, 40 + 3 * t, 60],
            [100, 50 + 2 * t, 140, 90 + 2 * t],
        ],
        np.float32,
    )


def test_bytetrack_identity_consistency():
    tr = BYTETracker(_tracker_args(), frame_rate=30)
    ids_per_frame = []
    for t in range(10):
        boxes = _moving_boxes(t)
        out = tr.update(boxes, np.array([0.9, 0.8]), np.array([0, 1]))
        assert out.shape[1] == 8
        ids = {int(c): int(i) for *_, i, s, c, _ in [(0, 0, 0, 0, r[4], r[5], r[6], r[7]) for r in out]}
        ids_per_frame.append(sorted(out[:, 4].tolist()))
    # same two identities persist across all frames after activation
    assert ids_per_frame[1] == ids_per_frame[-1]
    assert len(set(ids_per_frame[-1])) == 2


def test_bytetrack_occlusion_recovery():
    """A track lost for a few frames keeps its id when it reappears."""
    tr = BYTETracker(_tracker_args(), frame_rate=30)
    first_ids = None
    for t in range(3):
        out = tr.update(_moving_boxes(t), np.array([0.9, 0.9]), np.array([0, 0]))
    first_ids = sorted(out[:, 4].tolist())
    for t in range(3, 6):  # object 1 disappears
        out = tr.update(_moving_boxes(t)[:1], np.array([0.9]), np.array([0]))
    for t in range(6, 9):  # reappears near its predicted position
        out = tr.update(_moving_boxes(t), np.array([0.9, 0.9]), np.array([0, 0]))
    assert sorted(out[:, 4].tolist()) == first_ids


def test_botsort_runs_with_gmc():
    tr = BOTSORT(_tracker_args(tracker_type="botsort"), frame_rate=30)
    rng = np.random.default_rng(0)
    img = (rng.random((120, 160, 3)) * 255).astype(np.uint8)
    for t in range(5):
        out = tr.update(_moving_boxes(t), np.array([0.9, 0.8]), np.array([0, 1]), img)
    assert len(out) == 2


def test_get_windows_cover():
    wins = get_windows((1000, 1500), crop_size=640, gap=128)
    assert (wins[:, 2] - wins[:, 0] <= 640).all()
    # full coverage
    cover = np.zeros((1000, 1500), bool)
    for x1, y1, x2, y2 in wins:
        cover[y1:y2, x1:x2] = True
    assert cover.all()


def test_crop_labels_iof():
    labels = np.array([[10, 10, 50, 50], [600, 600, 700, 700]], np.float32)
    cls = np.array([0, 1], np.float32)
    out, c = crop_labels(labels, cls, (0, 0, 640, 640), iof_thr=0.7)
    assert len(out) == 1 and c[0] == 0


def test_tiled_inference_merges():
    """Fake detector that 'finds' one box per crop center; merged output must
    deduplicate overlaps and live in frame coordinates."""

    max_det = 8

    def fake_forward(variables, batch):
        b = batch.shape[0]
        dets = np.zeros((b, max_det, 6), np.float32)
        n = np.zeros(b, np.int32)
        for i in range(b):
            if batch[i].max() > 0:  # non-padded crop
                dets[i, 0] = [300, 300, 340, 340, 0.9, 0]  # crop coords
                n[i] = 1
        return dets, n

    img = (np.ones((1000, 1000, 3)) * 100).astype(np.uint8)
    merged = tiled_inference(fake_forward, None, img, crop_size=640, gap=128, max_crop_batch=4)
    assert merged.shape[1] == 6
    assert len(merged) >= 1
    # all detections inside the frame
    assert (merged[:, :4] >= 0).all() and (merged[:, [0, 2]] <= 1000).all()
