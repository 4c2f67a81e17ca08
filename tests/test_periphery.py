"""Solutions, apps, exporter, tuner-space, autobatch, CLI tests."""

import numpy as np
import pytest


def test_geo_roundtrip():
    from drone_yolo_tpu.apps.geo import GeoConverter, latlon_to_utm, utm_to_latlon

    for lat, lon in [(39.9, 116.4), (-33.86, 151.2), (51.5, -0.12)]:
        e, n, z, h = latlon_to_utm(lat, lon)
        lat2, lon2 = utm_to_latlon(e, n, z, h)
        assert abs(lat - lat2) < 1e-7 and abs(lon - lon2) < 1e-7

    g = GeoConverter(lat=39.9, lon=116.4, altitude_m=100, image_width_px=1920, image_height_px=1080)
    # 100 px east at nadir ~ 100 * gsd meters
    e0, n0 = g.pixel_to_utm(960, 540)
    e1, n1 = g.pixel_to_utm(1060, 540)
    assert abs((e1 - e0) - 100 * g.gsd) < 1e-6


def test_trajectory_statistics():
    from drone_yolo_tpu.apps.analytics import confidence_statistics, trajectory_statistics

    rows = []
    for t in range(20):  # straight mover: 2 px/frame
        rows.append([t, 1, 10 + 2 * t, 50, 0.9, 0])
    for t in range(20):  # zigzag
        rows.append([t, 2, 100 + (t % 2) * 4, 100 + t, 0.7, 0])
    stats = trajectory_statistics(rows, fps=10, meters_per_pixel=0.5)
    assert abs(stats[1]["mean_speed"] - 2 * 0.5 * 10) < 1e-6
    assert stats[1]["straightness"] > 0.99
    assert stats[2]["straightness"] < 0.99
    cs = confidence_statistics(rows)
    assert 0.7 <= cs["mean"] <= 0.9


def test_kde_density():
    from drone_yolo_tpu.apps.analytics import kde_density

    rng = np.random.default_rng(0)
    pts = np.concatenate([rng.normal(0, 1, (200, 2)), rng.normal(8, 1, (50, 2))])
    dens, extent = kde_density(pts, grid_shape=(50, 50))
    assert dens.shape == (50, 50)
    assert np.isfinite(dens).all() and dens.max() > 0


def test_object_counter_line_crossing(monkeypatch):
    from drone_yolo_tpu.solutions.object_counter import ObjectCounter

    class FakeModel:
        names = {0: "person"}

        def track(self, source, **kw):
            return [self._r]

    fake = FakeModel()
    oc = ObjectCounter(model=fake, region=[(0, 50), (100, 50)])

    class R:  # minimal Results stand-in
        def __init__(self, y):
            from drone_yolo_tpu.engine.results import Boxes

            self.boxes = Boxes(np.array([[10, y - 5, 20, y + 5, 7, 0.9, 0]], np.float32), (100, 100))
            self.orig_img = np.zeros((100, 100, 3), np.uint8)

    for y in (30, 45, 60, 75):  # crosses the line at y=50
        fake._r = R(y)
        out = oc.process(np.zeros((100, 100, 3), np.uint8))
    assert oc.in_count + oc.out_count == 1
    assert out["classwise"]["person"]["IN"] + out["classwise"]["person"]["OUT"] == 1


def test_distance_calculation_mouse_selection():
    """Interactive pair selection (reference distance_calculation.py:50
    mouse_event_for_distance): clicks pick tracked boxes, right-click resets —
    driven headlessly through the cv2-compatible callback."""
    import cv2

    from drone_yolo_tpu.solutions.distance_calculation import DistanceCalculation

    class FakeModel:
        names = {0: "person"}

        def track(self, source, **kw):
            return [self._r]

    class R:
        def __init__(self):
            from drone_yolo_tpu.engine.results import Boxes

            self.boxes = Boxes(
                np.array(
                    [
                        [10, 10, 30, 30, 1, 0.9, 0],
                        [60, 60, 90, 90, 2, 0.9, 0],
                        [40, 5, 50, 15, 3, 0.9, 0],
                    ],
                    np.float32,
                ),
                (100, 100),
            )
            self.orig_img = np.zeros((100, 100, 3), np.uint8)

    fake = FakeModel()
    fake._r = R()
    dc = DistanceCalculation(model=fake, meters_per_pixel=0.1)
    out = dc.process(np.zeros((100, 100, 3), np.uint8))  # default: first two tracks
    assert out["pair"] == [1, 2]

    dc.mouse_event_for_distance(cv2.EVENT_LBUTTONDOWN, 45, 10)  # box of track 3
    dc.mouse_event_for_distance(cv2.EVENT_LBUTTONDOWN, 20, 20)  # box of track 1
    out = dc.process(np.zeros((100, 100, 3), np.uint8))
    assert out["pair"] == [3, 1]
    # centers (45,10) vs (20,20): hypot(25,10)*0.1 m
    assert abs(out["distance_m"] - np.hypot(25, 10) * 0.1) < 1e-6

    dc.mouse_event_for_distance(cv2.EVENT_RBUTTONDOWN, 0, 0)  # reset
    out = dc.process(np.zeros((100, 100, 3), np.uint8))
    assert out["pair"] == [1, 2]


def test_export_stablehlo_roundtrip(tmp_path):
    import jax

    from drone_yolo_tpu import YOLO
    from drone_yolo_tpu.engine.exporter import load_stablehlo

    m = YOLO("yolov8n.yaml")
    path = m.export(format="stablehlo", imgsz=64, batch=1, project=str(tmp_path), nms=False)
    fn, meta = load_stablehlo(path)
    x = np.random.default_rng(0).random((1, 64, 64, 3), np.float32)
    v = m.model.fuse(m.variables)
    out = fn(v, x)
    preds = np.asarray(out)
    assert preds.shape[0] == 1 and preds.shape[2] == 84
    # matches the live jit path
    import jax.numpy as jnp

    from drone_yolo_tpu.nn import modules as M

    live, _ = m.model.apply(v, jnp.asarray(x), ctx=M.Ctx(train=False, dtype=jnp.float32))
    np.testing.assert_allclose(preds, np.asarray(live), rtol=2e-2, atol=1e-3)


def test_autobatch():
    import jax
    import jax.numpy as jnp

    from drone_yolo_tpu.utils.autobatch import check_train_batch_size

    def builder(b):
        @jax.jit
        def f(x):
            return jnp.sum(x * 2.0)

        return f, (jnp.zeros((b, 64, 64, 3)),)

    best = check_train_batch_size(builder, candidates=(1, 2, 4))
    assert best in (1, 2, 4)


def test_cli_entrypoint_help(capsys):
    from drone_yolo_tpu.cfg import entrypoint

    entrypoint("yolo-tpu")  # no args -> usage
    entrypoint("yolo-tpu version")


def test_tuner_mutation_bounds():
    from drone_yolo_tpu.engine.tuner import Tuner

    t = Tuner(args={"task": "detect", "mode": "train"})
    parent = {k: (lo + hi) / 2 for k, (lo, hi, *rest) in [(k, v) for k, v in t.space.items()]}
    for _ in range(5):
        g = t._mutate(parent)
        for k, bounds in t.space.items():
            assert bounds[0] <= g[k] <= bounds[1]


def test_streamlit_inference_app_under_fakes():
    """solutions.Inference drives the full UI->model->frame loop with an
    injected fake streamlit module and fake capture (no streamlit needed)."""
    import numpy as np

    from drone_yolo_tpu.solutions import Inference

    class Pane:
        def __init__(self):
            self.frames = []

        def image(self, img, **kw):
            self.frames.append(np.asarray(img))

        def empty(self):
            return self

    class Sidebar:
        def __init__(self, st):
            self.st = st

        def title(self, *a):
            pass

        def selectbox(self, label, options):
            return options[0]  # webcam / first model

        def radio(self, label, options):
            return "No"  # tracking off -> plain predict path

        def slider(self, label, lo, hi, val, step):
            return val

        def multiselect(self, label, options, default=None):
            return default or []

        def file_uploader(self, *a, **k):
            return None

        def button(self, label):
            return True  # Start pressed

    class Spinner:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class FakeSt:
        def __init__(self):
            self.sidebar = Sidebar(self)
            self.panes = [Pane(), Pane()]

        def set_page_config(self, **kw):
            pass

        def markdown(self, *a, **k):
            pass

        def columns(self, n):
            return self.panes

        def spinner(self, msg):
            return Spinner()

        def success(self, msg):
            pass

        def error(self, msg):
            pass

        def warning(self, msg):
            pass

        def button(self, label):
            return False  # Stop not pressed

        def stop(self):
            raise SystemExit

    class FakeCap:
        def __init__(self, source):
            self.n = 2  # two frames then end

        def isOpened(self):
            return self.n > 0

        def read(self):
            self.n -= 1
            if self.n < 0:
                return False, None
            return True, np.full((64, 80, 3), 128, np.uint8)

        def release(self):
            self.n = 0

    st = FakeSt()
    app = Inference(st_module=st, capture_factory=FakeCap, model="yolov8n.yaml")
    app.inference()
    # both panes got both frames; annotated pane is a rendered HWC image
    assert len(st.panes[0].frames) == 2 and len(st.panes[1].frames) == 2
    assert st.panes[1].frames[0].ndim == 3


def test_dataset_stats(tmp_path):
    """DatasetStats produces the reference HUBDatasetStats schema locally."""
    import json

    from make_dataset import make_dataset

    from drone_yolo_tpu.data.utils import DatasetStats

    yaml_path = make_dataset(tmp_path / "d", n_train=3, n_val=2, size=64, nc=3, seed=5)
    st = DatasetStats(yaml_path, task="detect")
    stats = st.get_json(save=True)
    assert stats["nc"] == 3 and len(stats["names"]) == 3
    for split in ("train", "val"):
        s = stats[split]
        assert s is not None
        assert s["instance_stats"]["total"] == sum(s["instance_stats"]["per_class"])
        assert s["image_stats"]["total"] == len(s["labels"])
        # label rows are [cls, x, y, w, h]
        row = next(iter(s["labels"][0].values()))
        if row:
            assert len(row[0]) == 5
    assert (st.hub_dir / "stats.json").exists()
    json.load(open(st.hub_dir / "stats.json"))
    imdir = st.process_images()
    assert any(imdir.iterdir())


def test_solution_annotator_primitives():
    """Solution overlay primitives draw (pixels change) without errors."""
    import numpy as np

    from drone_yolo_tpu.utils.plotting import Annotator

    im = np.zeros((200, 300, 3), np.uint8)
    ann = Annotator(im.copy(), line_width=2)
    ann.draw_region([(10, 10), (100, 10), (100, 100), (10, 100)])
    ann.draw_centroid_and_tracks([(20, 20), (40, 45), (60, 70)])
    ann.queue_counts_display("Queue Counts : 3", points=[(10, 10), (100, 10), (100, 100), (10, 100)])
    ann.display_analytics(ann.im, {"Occupancy": 2, "Available": 5})
    ann.display_objects_labels(ann.im, "region-1: 4", (255, 255, 255), (104, 0, 123), 150.0, 50.0)
    ann.plot_angle_and_count_and_stage("93.4", 3, "down", (120, 120))
    ann.plot_distance_and_line(42.5, ((30, 30), (200, 150)))
    ann.visioneye([10, 10, 50, 50], (150, 190))
    out = ann.result()
    assert out.shape == im.shape and out.sum() > 0
    # angle helper matches plain geometry
    assert abs(Annotator.estimate_pose_angle((0, 0), (0, 1), (1, 1)) - 90.0) < 1e-6


def test_facade_callbacks_device_reset(tmp_path):
    """YOLO.add_callback forwards to trainer/validator; reset_weights re-inits
    (reference engine/model.py:980-1004, reset_weights)."""
    from make_dataset import make_dataset

    from drone_yolo_tpu import YOLO

    yaml_path = make_dataset(tmp_path / "d", n_train=4, n_val=2, size=96, nc=2, seed=6)
    m = YOLO("yolov8n.yaml")
    events = []
    m.add_callback("on_train_start", lambda t: events.append("train_start"))
    m.add_callback("on_val_start", lambda v: events.append("val_start"))
    m.train(data=str(yaml_path), epochs=1, imgsz=64, batch=2, workers=0,
            project=str(tmp_path), name="cb", plots=False, verbose=False, val=False)
    m.val(data=str(yaml_path), imgsz=64, batch=2, verbose=False)
    assert events == ["train_start", "val_start"]
    assert m.device is not None
    m.clear_callback("on_val_start")
    assert m._user_callbacks["on_val_start"] == []
    m.reset_weights()
    assert m.variables is None and m.ensure_variables() is not None


def test_env_detection_helpers():
    """Env probes return sane values in this container (reference utils/__init__.py:550-763)."""
    from drone_yolo_tpu.utils import (
        get_git_branch,
        get_git_dir,
        is_colab,
        is_dir_writeable,
        is_docker,
        is_git_dir,
        is_github_action_running,
        is_jupyter,
        is_kaggle,
    )

    assert is_colab() is False and is_kaggle() is False and is_jupyter() is False
    assert isinstance(is_docker(), bool) and isinstance(is_github_action_running(), bool)
    assert is_dir_writeable("/tmp") is True
    assert is_git_dir() == (get_git_dir() is not None)
    b = get_git_branch()
    assert b is None or isinstance(b, str)


def test_hub_session_against_fake_server(tmp_path):
    """HUBTrainingSession speaks the HUB protocol end-to-end against an
    in-process server double (metrics queue, checkpoint upload, heartbeat,
    model create/load); offline mode (no endpoint) is a safe no-op."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from drone_yolo_tpu.hub.session import HUBTrainingSession

    seen = []

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _reply(self, obj):
            body = json.dumps(obj).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            seen.append(("GET", self.path, None))
            self._reply({"id": self.path.rsplit("/", 1)[1], "status": "trained"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            seen.append(("POST", self.path, body, self.headers.get("x-api-key")))
            self._reply({"id": "srv-model-1", "ok": True})

    srv = HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        root = f"http://127.0.0.1:{srv.server_port}"
        s = HUBTrainingSession("m0", api_key="k123", api_root=root, heartbeat_interval=999)
        assert s.online
        assert s.create_model({"name": "exp"}) == "srv-model-1"
        assert s.load_model()["status"] == "trained"
        s.upload_metrics(0, {"loss": 1.5})
        s.upload_metrics(1, {"loss": 1.0})
        w = tmp_path / "best.npz"
        w.write_bytes(b"weights-bytes")
        s.upload_model(1, str(w), is_best=True, final=True)
        s.heartbeat()
        s.stop()
        paths = [p for _, p, *rest in seen]
        assert "/models" in paths and "/models/srv-model-1" in paths
        metrics_post = [b for m, p, b, *k in seen if p == "/models/srv-model-1/metrics"][-1]  # last flush has both epochs
        assert json.loads(metrics_post)["metrics"]["1"] == {"loss": 1.0}
        upload = next((m, p, b) for m, p, b, *k in seen if p.startswith("/models/srv-model-1/upload"))
        assert b"weights-bytes" in upload[2] and "is_best=true" in upload[1] and "final=true" in upload[1]
        assert any(p.startswith("/agent/") for p in paths)
        assert all(x[3] == "k123" for x in seen if x[0] == "POST")  # api key on every POST
    finally:
        srv.shutdown()
    # offline: everything is a no-op, nothing raises
    off = HUBTrainingSession("m1")
    assert not off.online
    off.upload_metrics(0, {"a": 1})
    off.upload_model(0, str(tmp_path / "missing.npz"))
    off.heartbeat()


def test_gcp_regions_ranking():
    """GCPRegions ranks by injected probe latency; tier filters work
    (reference hub/google/__init__.py, probing logic offline-testable)."""
    from drone_yolo_tpu.hub.google import GCPRegions

    fake = {"us-central1": 10.0, "europe-west4": 5.0, "asia-east1": 50.0}
    g = GCPRegions(probe=lambda r: fake.get(r, float("inf")))
    assert set(g.tier1()) & {"us-central1", "europe-west4"} and "asia-east2" in g.tier2()
    best = g.lowest_latency(top=2, tier=1, attempts=3)
    assert best[0][0] == "europe-west4" and best[0][1] == 5.0
    assert best[1][0] == "us-central1"
    # unreachable regions sort last with inf latency
    allr = g.lowest_latency(top=len(g.regions))
    assert allr[-1][1] == float("inf")
