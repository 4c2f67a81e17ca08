"""Gait study (VERDICT item 10): synthetic walkers with known group differences
must produce significant ANOVA/Kruskal stats and an accurate RF classifier."""

import numpy as np

from drone_yolo_tpu.apps.gait import FEATURE_NAMES, GaitStudy, gait_features, smooth_track


def make_walker(rng, n_frames=120, fps=30.0, cadence=1.8, speed=80.0, noise=1.0):
    """Synthetic COCO-17 walking track: hips advance at `speed` px/s, ankles
    oscillate fore-aft at `cadence` steps/s."""
    t = np.arange(n_frames) / fps
    kpts = np.zeros((n_frames, 17, 2))
    hip_x = speed * t + rng.normal(0, noise, n_frames).cumsum() * 0.01
    hip_y = 200 + 2 * np.sin(2 * np.pi * cadence * t)  # vertical bob at step rate
    stride_hz = cadence / 2  # per-leg stride frequency
    phase = 2 * np.pi * stride_hz * t
    amp = speed / (2 * np.pi * stride_hz) * 0.9
    for side, (hip, knee, ankle, sgn, ph) in enumerate(
        [(11, 13, 15, -1, 0.0), (12, 14, 16, 1, np.pi)]
    ):
        kpts[:, hip] = np.stack([hip_x + sgn * 8, hip_y], 1)
        kpts[:, ankle] = np.stack([hip_x + amp * np.sin(phase + ph) + sgn * 10, hip_y + 80], 1)
        kpts[:, knee] = (kpts[:, hip] + kpts[:, ankle]) / 2 + np.stack(
            [10 * np.cos(phase + ph), np.zeros(n_frames)], 1
        )
    kpts[:, 5] = kpts[:, 11] + [0, -60]
    kpts[:, 6] = kpts[:, 12] + [0, -60]
    kpts += rng.normal(0, noise, kpts.shape)
    return kpts


def test_gait_features_recover_cadence_and_speed():
    rng = np.random.default_rng(0)
    k = make_walker(rng, cadence=2.0, speed=90.0)
    f = gait_features(k, fps=30.0, gsd=1.0)
    assert abs(f["cadence"] - 2.0) < 0.35, f
    assert abs(f["speed"] - 90.0) < 12.0, f
    assert 0.5 < f["symmetry"] <= 1.0


def test_smoothing_reduces_noise():
    rng = np.random.default_rng(1)
    k = make_walker(rng, noise=3.0)
    sm = smooth_track(k)
    jerk_raw = np.abs(np.diff(k[:, 15, 0], 2)).mean()
    jerk_sm = np.abs(np.diff(sm[:, 15, 0], 2)).mean()
    assert jerk_sm < jerk_raw * 0.6


def test_group_study_detects_known_difference():
    """Two groups with different cadence/speed: ANOVA flags them, RF separates."""
    rng = np.random.default_rng(2)
    tracks, groups = {}, {}
    for i in range(14):
        tracks[i] = make_walker(rng, cadence=rng.normal(1.6, 0.08), speed=rng.normal(70, 4))
        groups[i] = "old"
    for i in range(14, 28):
        tracks[i] = make_walker(rng, cadence=rng.normal(2.2, 0.08), speed=rng.normal(100, 4))
        groups[i] = "young"
    report = GaitStudy(fps=30.0).run(tracks, groups)
    assert set(report["features"]) == set(range(28))
    stats = report["stats"]
    assert stats["cadence"]["anova_p"] < 0.01, stats["cadence"]
    assert stats["speed"]["kruskal_p"] < 0.01, stats["speed"]
    assert report["classifier"]["cv_accuracy"] > 0.85, report["classifier"]
    assert set(report["classifier"]["importances"]) == set(FEATURE_NAMES)
