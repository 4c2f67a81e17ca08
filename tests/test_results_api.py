"""Results container serializer/geometry surface (reference engine/results.py:
to_csv:851, to_xml:878, tojson:906, to_sql:945, OBB xyxyxyxyn:1750 / xyxy:1772,
update(keypoints):308)."""

import json
import sqlite3

import numpy as np

from drone_yolo_tpu.engine.results import OBB, Results

NAMES = {0: "car", 1: "person"}


def _res():
    img = np.zeros((80, 120, 3), np.uint8)
    boxes = np.array([[10, 10, 50, 40, 0.9, 0], [60, 20, 100, 70, 0.8, 1]], np.float32)
    kpts = np.tile(np.array([[30.0, 25.0, 1.0]], np.float32), (2, 3, 1))
    r = Results(img, "im.jpg", NAMES, boxes=boxes)
    r.update(keypoints=kpts)
    return r


def test_serializers_roundtrip(tmp_path):
    r = _res()
    recs = json.loads(r.to_json())
    assert [x["name"] for x in recs] == ["car", "person"]
    assert recs == json.loads(r.tojson())  # deprecated alias

    csv = r.to_csv()
    assert csv.count("\n") >= 3 and "confidence" in csv

    xml = r.to_xml()
    assert xml.startswith("<?xml") and "car" in xml

    db = tmp_path / "results.db"
    r.to_sql(db_path=str(db))
    rows = sqlite3.connect(db).execute("SELECT name, class, box FROM results").fetchall()
    assert len(rows) == 2 and rows[0][0] == "car"
    assert json.loads(rows[0][2])["x1"] == 10


def test_update_keypoints_and_empty_xml():
    r = _res()
    assert r.keypoints is not None and r.keypoints.data.shape == (2, 3, 3)
    empty = Results(np.zeros((8, 8, 3), np.uint8), "e.jpg", NAMES, boxes=np.zeros((0, 6), np.float32))
    assert "<root></root>" in empty.to_xml()


def test_obb_corner_geometry():
    # axis-aligned (r=0) rotated box: corners must reduce to the plain rect
    obb = OBB(np.array([[50, 40, 20, 10, 0.0, 0.9, 0]], np.float32), orig_shape=(80, 120))
    assert obb.id is None
    np.testing.assert_allclose(obb.xyxy[0], [40, 35, 60, 45], atol=1e-5)
    n = obb.xyxyxyxyn
    assert n.shape == (1, 4, 2)
    np.testing.assert_allclose(n[0, :, 0].min(), 40 / 120, atol=1e-6)
    np.testing.assert_allclose(n[0, :, 1].max(), 45 / 80, atol=1e-6)
    # 90-degree rotation swaps extents
    obb90 = OBB(np.array([[50, 40, 20, 10, np.pi / 2, 0.9, 0]], np.float32), orig_shape=(80, 120))
    np.testing.assert_allclose(obb90.xyxy[0], [45, 30, 55, 50], atol=1e-4)
