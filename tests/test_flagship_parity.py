"""North-star reproduction (VERDICT r2 next #1): train yolov8s-p2-repvgg-sf in
BOTH frameworks on the dense small-object VisDrone proxy from the SAME initial
weights and matched hyps, then compare mAP50-95.

Reproduces tools/flagship_parity.py at reduced scale (slow-marked: ~20 min on
a 1-CPU box). The reference side exercises the real P2+RepVGG graph via
refshim.patch_reference_repvgg (the snapshot's parse_model KeyError defect,
SURVEY.md §2.3). The full-scale run (60 epochs @320px, 160/96 images) is the
committed FLAGSHIP_PARITY.json artifact, asserted by
test_full_scale_artifact_within_half_point; env knobs (FLAGSHIP_EPOCHS=60
FLAGSHIP_IMGSZ=320 FLAGSHIP_NTRAIN=160 FLAGSHIP_NVAL=96) re-run it exactly.

Reference protocol match: /root/reference/README.md:3-5 (Drone-YOLO claim),
ultralytics/cfg/models/v8/yolov8-p2-repvgg-sf.yaml (the flagship graph).
"""

import importlib
import json
import os
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[1]


def test_flagship_parity_reduced_scale(tmp_path, monkeypatch):
    pytest.importorskip("torch")
    monkeypatch.setenv("FLAGSHIP_WORK", str(tmp_path / "work"))
    monkeypatch.setenv("FLAGSHIP_EPOCHS", os.environ.get("FLAGSHIP_EPOCHS", "30"))
    monkeypatch.setenv("FLAGSHIP_IMGSZ", os.environ.get("FLAGSHIP_IMGSZ", "160"))
    monkeypatch.setenv("FLAGSHIP_NTRAIN", os.environ.get("FLAGSHIP_NTRAIN", "48"))
    monkeypatch.setenv("FLAGSHIP_NVAL", os.environ.get("FLAGSHIP_NVAL", "24"))
    sys.path.insert(0, str(REPO / "tools"))
    import flagship_parity as fp

    fp = importlib.reload(fp)
    fp.cmd_init()
    fp.cmd_ref()
    fp.cmd_ours()
    fp.cmd_report()
    report = json.loads((fp.WORK / "report.json").read_text())

    # Both frameworks must LEARN on the dense proxy (not vacuous 0-vs-0 parity),
    # and agree at reduced scale. The tight 0.5-point claim is asserted on the
    # full-scale artifact below; at 30 epochs/160px the runs are mid-convergence
    # where run-to-run spread is larger, hence the looser band.
    assert report["ref_map50"] > 0.30, report
    assert report["ours_map50"] > 0.30, report
    assert report["abs_diff_map50_95"] <= 0.08, report


def test_full_scale_artifact_within_half_point():
    """The committed full-scale report must evidence the north-star claim."""
    art = REPO / "FLAGSHIP_PARITY.json"
    assert art.exists(), "run tools/flagship_parity.py at full scale and commit the report"
    report = json.loads(art.read_text())
    assert report["within_0p5_points"] is True, report
    assert report["ref_map50_95"] > 0.5 and report["ours_map50_95"] > 0.5, report
