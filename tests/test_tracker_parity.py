"""Cross-framework ByteTrack parity: feed IDENTICAL detection streams to the
reference BYTETracker and ours; the track partitions must agree.

Covers two-stage association (high/low conf), Kalman prediction, track
activation/rebirth, and lost-track handling (reference trackers/byte_tracker.py
:235-392). IDs are compared up to relabeling (assignment order is an
implementation detail); the grouping of (frame, det_idx) into tracks and the
per-frame tracked det sets must match exactly.
"""

from types import SimpleNamespace

import numpy as np
import pytest

from refshim import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="torch reference unavailable")


def _install_lap_stub():
    """The reference's matching.py wants the `lap` package (absent, zero
    egress). Provide a scipy-backed `lapjv` with extend_cost/cost_limit
    semantics: pad to (n+m) square with the opt-out cost so any row/col may
    stay unmatched at cost_limit."""
    import sys
    import types

    if "lap" in sys.modules:
        return

    from scipy.optimize import linear_sum_assignment

    def lapjv(cost, extend_cost=False, cost_limit=None, return_cost=True):
        cost = np.asarray(cost, float)
        n, m = cost.shape
        L = cost_limit if cost_limit is not None else 1e9
        big = np.full((n + m, n + m), L, float)
        big[:n, :m] = cost
        big[n:, m:] = 0.0
        rows, cols = linear_sum_assignment(big)
        x = -np.ones(n, int)
        y = -np.ones(m, int)
        for r, c in zip(rows, cols):
            if r < n and c < m and cost[r, c] < L:
                x[r] = c
                y[c] = r
        total = float(cost[x >= 0, x[x >= 0]].sum()) if (x >= 0).any() else 0.0
        return (total, x, y) if return_cost else (x, y)

    mod = types.ModuleType("lap")
    mod.lapjv = lapjv
    sys.modules["lap"] = mod


_install_lap_stub()


def _make_stream(n_frames=40, seed=0):
    """3 crossing objects + flickering confidence + a mid-stream newcomer."""
    rng = np.random.default_rng(seed)
    frames = []
    for t in range(n_frames):
        dets = []
        # object A: left -> right, high conf
        dets.append([50 + 8 * t, 100, 40, 30, 0.9 + 0.05 * np.sin(t), 0])
        # object B: top -> bottom, conf dips below high_thresh periodically
        conf_b = 0.85 if t % 7 else 0.3
        dets.append([300, 40 + 7 * t, 36, 36, conf_b, 1])
        # object C: appears at t=12
        if t >= 12:
            dets.append([500 - 6 * t, 320, 44, 28, 0.75, 0])
        # noise detection with low conf (should mostly be ignored/second stage)
        if t % 5 == 0:
            dets.append([rng.uniform(0, 600), rng.uniform(0, 400), 20, 20, 0.15, 2])
        arr = np.asarray(dets, np.float32)
        arr[:, :2] += rng.normal(0, 0.8, (len(arr), 2))  # jitter centers
        frames.append(arr)
    return frames


def _run_reference(frames):
    from ultralytics.trackers.byte_tracker import BYTETracker

    args = SimpleNamespace(
        track_high_thresh=0.5,
        track_low_thresh=0.1,
        new_track_thresh=0.6,
        track_buffer=30,
        match_thresh=0.8,
        fuse_score=True,
    )
    tr = BYTETracker(args, frame_rate=30)
    out = []
    for arr in frames:
        cx, cy, w, h = arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]
        res = SimpleNamespace(
            conf=arr[:, 4],
            xywh=np.stack([cx, cy, w, h], 1),
            cls=arr[:, 5],
        )
        tracks = tr.update(res)
        out.append(np.asarray(tracks).reshape(-1, 8))
    return out


def _run_ours(frames):
    from drone_yolo_tpu.trackers.byte_tracker import BYTETracker

    tr = BYTETracker(
        SimpleNamespace(
            track_high_thresh=0.5,
            track_low_thresh=0.1,
            new_track_thresh=0.6,
            track_buffer=30,
            match_thresh=0.8,
            fuse_score=True,
        ),
        frame_rate=30,
    )
    out = []
    for arr in frames:
        cx, cy, w, h = arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]
        xyxy = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
        tracks = tr.update(xyxy, arr[:, 4], arr[:, 5])
        out.append(np.asarray(tracks).reshape(-1, 8))
    return out


def test_bytetrack_parity():
    frames = _make_stream()
    r, o = _run_reference(frames), _run_ours(frames)
    # per-frame: same set of tracked detection indices
    for t, (rt, ot) in enumerate(zip(r, o)):
        assert set(rt[:, 7].astype(int)) == set(ot[:, 7].astype(int)), f"frame {t}"
    # track partitions agree up to ID relabeling: the mapping ref_id -> our_id
    # built from (frame, det_idx) co-occurrence must be a bijection
    pairs = {}
    for rt, ot in zip(r, o):
        ours_by_idx = {int(row[7]): int(row[4]) for row in ot}
        for row in rt:
            rid, idx = int(row[4]), int(row[7])
            oid = ours_by_idx[idx]
            pairs.setdefault(rid, set()).add(oid)
    assert all(len(v) == 1 for v in pairs.values()), f"split tracks: {pairs}"
    mapped = [next(iter(v)) for v in pairs.values()]
    assert len(mapped) == len(set(mapped)), f"merged tracks: {pairs}"
    # boxes of tracked objects agree (same Kalman math)
    for rt, ot in zip(r, o):
        rs = rt[np.argsort(rt[:, 7])]
        os_ = ot[np.argsort(ot[:, 7])]
        np.testing.assert_allclose(rs[:, :4], os_[:, :4], atol=1e-3)


def test_botsort_parity():
    """BOT-SORT (gmc off, no ReID): same stream -> same track partition.
    Exercises the BoT-SORT-specific pieces ByteTrack lacks: proximity-thresh
    distance masking and the xywh Kalman state (reference bot_sort.py:150-250).
    """
    from ultralytics.trackers.bot_sort import BOTSORT as RefBOT

    from drone_yolo_tpu.trackers.bot_sort import BOTSORT

    frames = _make_stream(seed=3)
    args = dict(
        track_high_thresh=0.5,
        track_low_thresh=0.1,
        new_track_thresh=0.6,
        track_buffer=30,
        match_thresh=0.8,
        fuse_score=True,
        proximity_thresh=0.5,
        appearance_thresh=0.25,
        gmc_method="none",
        with_reid=False,
        model="auto",
    )
    rt_ = RefBOT(SimpleNamespace(**args), frame_rate=30)
    ot_ = BOTSORT(SimpleNamespace(**args), frame_rate=30)
    r, o = [], []
    for arr in frames:
        cx, cy, w, h = arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]
        res = SimpleNamespace(conf=arr[:, 4], xywh=np.stack([cx, cy, w, h], 1), cls=arr[:, 5])
        r.append(np.asarray(rt_.update(res)).reshape(-1, 8))
        xyxy = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
        o.append(np.asarray(ot_.update(xyxy, arr[:, 4], arr[:, 5])).reshape(-1, 8))
    for t, (rt2, ot2) in enumerate(zip(r, o)):
        assert set(rt2[:, 7].astype(int)) == set(ot2[:, 7].astype(int)), f"frame {t}"
    pairs = {}
    for rt2, ot2 in zip(r, o):
        ours_by_idx = {int(row[7]): int(row[4]) for row in ot2}
        for row in rt2:
            pairs.setdefault(int(row[4]), set()).add(ours_by_idx[int(row[7])])
    assert all(len(v) == 1 for v in pairs.values())
    mapped = [next(iter(v)) for v in pairs.values()]
    assert len(mapped) == len(set(mapped))
    for rt2, ot2 in zip(r, o):
        rs = rt2[np.argsort(rt2[:, 7])]
        os_ = ot2[np.argsort(ot2[:, 7])]
        np.testing.assert_allclose(rs[:, :4], os_[:, :4], atol=1e-3)


def test_gmc_shift_estimation_parity():
    """GMC sparse-optical-flow: both frameworks recover a known camera shift on
    identical synthetic frames (reference trackers/utils/gmc.py)."""
    import cv2

    from ultralytics.trackers.utils.gmc import GMC as RefGMC

    from drone_yolo_tpu.trackers.gmc import GMC

    rng = np.random.default_rng(0)
    base = (rng.random((240, 320)) * 255).astype(np.uint8)
    base = cv2.GaussianBlur(base, (0, 0), 2.0)  # trackable texture
    frames = []
    for t in range(4):
        dx, dy = 3 * t, 2 * t  # constant camera motion
        M = np.float32([[1, 0, -dx], [0, 1, -dy]])
        f = cv2.warpAffine(base, M, (320, 240))
        frames.append(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR))

    r_g, o_g = RefGMC(method="sparseOptFlow"), GMC(method="sparseOptFlow")
    for i, f in enumerate(frames):
        wr = np.asarray(r_g.apply(f.copy()))
        wo = np.asarray(o_g.apply(f.copy()))
        if i == 0:
            continue
        # per-frame shift is (-3, -2); both must estimate it (tolerance for
        # flow noise) and agree with each other
        np.testing.assert_allclose(wr[:, 2], [-3.0, -2.0], atol=0.5)
        np.testing.assert_allclose(wo[:, 2], [-3.0, -2.0], atol=0.5)
        np.testing.assert_allclose(wo[:, 2], wr[:, 2], atol=0.3)
