"""AutoBackend uniform reload-and-validate (reference nn/autobackend.py:54):
every export artifact reloads through one interface, produces identical raw
predictions, and re-validates through the real validator (benchmark harness).
"""

import numpy as np
import pytest

import jax

from make_dataset import make_dataset


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    from drone_yolo_tpu import YOLO
    from drone_yolo_tpu.engine.exporter import Exporter

    td = tmp_path_factory.mktemp("artifacts")
    m = YOLO("yolov8n.yaml")
    m.ensure_variables(imgsz=64)
    paths = {}
    for fmt in ("npz", "stablehlo"):
        paths[fmt] = Exporter(overrides={"format": fmt, "imgsz": 64, "batch": 1, "project": str(td), "task": "detect"})(m)
    try:
        import tensorflow  # noqa: F401

        paths["savedmodel"] = Exporter(overrides={"format": "savedmodel", "imgsz": 64, "batch": 1, "project": str(td), "task": "detect"})(m)
        paths["tflite"] = Exporter(overrides={"format": "tflite", "imgsz": 64, "batch": 1, "project": str(td), "task": "detect"})(m)
    except ImportError:
        pass
    return m, paths


def test_autobackend_outputs_agree(exported):
    from drone_yolo_tpu.nn.autobackend import AutoBackend

    m, paths = exported
    x = np.random.default_rng(0).random((1, 64, 64, 3), np.float32)
    ref = None
    for fmt, p in paths.items():
        b = AutoBackend(p)
        assert b.kind == fmt
        assert b.nc == 80 and 0 in b.names
        out = np.asarray(b(x))
        assert out.shape[0] == 1 and out.shape[-1] == 84  # (B, A, 4+nc)
        if ref is None:
            ref = out
        else:
            np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-2)  # tflite quant noise


def test_benchmark_reload_and_validate(tmp_path):
    """benchmark(): export -> AutoBackend reload -> validator mAP per format."""
    yaml_path = make_dataset(tmp_path / "d", n_train=2, n_val=3, size=96, nc=4, seed=0)
    from drone_yolo_tpu import YOLO
    from drone_yolo_tpu.utils.benchmarks import benchmark

    m = YOLO("yolov8n.yaml")
    rows = benchmark(model=m, data=str(yaml_path), imgsz=64, fmts=("npz", "stablehlo"), keep_dir=str(tmp_path))
    assert [r["format"] for r in rows] == ["npz", "stablehlo"]
    for r in rows:
        assert r["status"] == "ok", r
        assert r["latency_ms"] is not None
        assert r["mAP50-95"] is not None  # validated THROUGH the reloaded artifact


class _FakeTritonHandler:
    """KServe-v2 test double: config + binary-extension infer for a y=2x model."""

    def make(meta_json):
        import json
        from http.server import BaseHTTPRequestHandler

        import numpy as np

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence
                pass

            def do_GET(self):
                cfg = {
                    "input": [{"name": "images", "data_type": "TYPE_FP32", "dims": [-1, -1, -1, 3]}],
                    "output": [{"name": "output0", "data_type": "TYPE_FP32", "dims": [-1]}],
                    "parameters": {"metadata": {"string_value": meta_json}},
                }
                body = json.dumps(cfg).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                hlen = int(self.headers["Inference-Header-Content-Length"])
                raw = self.rfile.read(int(self.headers["Content-Length"]))
                req = json.loads(raw[:hlen])
                i0 = req["inputs"][0]
                x = np.frombuffer(raw[hlen:], np.float32).reshape(i0["shape"])
                y = (x * 2).astype(np.float32)
                blob = y.tobytes()
                hdr = json.dumps(
                    {
                        "outputs": [
                            {
                                "name": "output0",
                                "datatype": "FP32",
                                "shape": list(y.shape),
                                "parameters": {"binary_data_size": len(blob)},
                            }
                        ]
                    }
                ).encode()
                self.send_response(200)
                self.send_header("Inference-Header-Content-Length", str(len(hdr)))
                self.send_header("Content-Length", str(len(hdr) + len(blob)))
                self.end_headers()
                self.wfile.write(hdr + blob)

        return H

    make = staticmethod(make)


def test_triton_remote_model():
    """TritonRemoteModel speaks KServe-v2 REST (binary extension) end-to-end."""
    import json
    import threading
    from http.server import HTTPServer

    from drone_yolo_tpu.nn.autobackend import AutoBackend
    from drone_yolo_tpu.utils.triton import TritonRemoteModel

    meta = json.dumps({"names": {"0": "obj"}, "task": "detect", "stride": [8.0], "nc": 1})
    srv = HTTPServer(("127.0.0.1", 0), _FakeTritonHandler.make(meta))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/yolo"
        m = TritonRemoteModel(url)
        assert m.endpoint == "yolo" and m.input_names == ["images"] and m.output_names == ["output0"]
        x = np.arange(12, dtype=np.float32).reshape(1, 2, 2, 3)
        (y,) = m(x)
        np.testing.assert_allclose(y, x * 2)
        # through AutoBackend: URL routes to the triton backend, metadata flows
        b = AutoBackend(url)
        assert b.kind == "triton" and b.task == "detect" and b.nc == 1
        np.testing.assert_allclose(np.asarray(b(x)), x * 2)
    finally:
        srv.shutdown()


def test_triton_remote_model_grpc():
    """TritonRemoteModel speaks the KServe-v2 gRPC protocol (raw tensor
    contents) against an in-process generic-handler server double."""
    import pytest

    grpc = pytest.importorskip("grpc")

    from concurrent import futures

    from drone_yolo_tpu.utils import pbwire as pb
    from drone_yolo_tpu.utils.triton import TritonRemoteModel

    def model_metadata(request, context):  # name=1; inputs=4/outputs=5 TensorMetadata
        tin = pb.string_field(1, "images") + pb.string_field(2, "FP32") + pb.packed_int64_field(3, [-1, -1, -1, 3])
        tout = pb.string_field(1, "output0") + pb.string_field(2, "FP32") + pb.packed_int64_field(3, [-1])
        return pb.string_field(1, "yolo") + pb.bytes_field(4, tin) + pb.bytes_field(5, tout)

    def model_config(request, context):  # Triton extension: parameters.metadata
        import json

        meta = json.dumps({"task": "detect", "names": {0: "drone"}})
        entry = pb.string_field(1, "metadata") + pb.bytes_field(2, pb.string_field(1, meta))
        return pb.bytes_field(1, pb.bytes_field(14, entry))  # ModelConfigResponse.config.parameters

    def model_infer(request, context):  # y = 2x echo with the request's shape
        shape, raw = None, None
        for f, w, v in pb.fields(request):
            if f == 5:  # InferInputTensor
                for f2, w2, v2 in pb.fields(v):
                    if f2 == 3:
                        shape = pb.unpack_int64(v2)
            elif f == 7:
                raw = v
        y = (np.frombuffer(raw, np.float32).reshape(shape) * 2).astype(np.float32)
        out = pb.string_field(1, "output0") + pb.string_field(2, "FP32") + pb.packed_int64_field(3, list(y.shape))
        return pb.string_field(1, "yolo") + pb.bytes_field(5, out) + pb.bytes_field(6, y.tobytes())

    def model_infer_contents(request, context):  # KServe typed-contents variant (no raw buffers)
        shape, raw = None, None
        for f, w, v in pb.fields(request):
            if f == 5:
                for f2, w2, v2 in pb.fields(v):
                    if f2 == 3:
                        shape = pb.unpack_int64(v2)
            elif f == 7:
                raw = v
        y = (np.frombuffer(raw, np.float32).reshape(shape) * 2).astype(np.float32)
        contents = pb.bytes_field(6, y.astype("<f4").tobytes())  # InferTensorContents.fp32_contents (packed)
        out = (
            pb.string_field(1, "output0")
            + pb.string_field(2, "FP32")
            + pb.packed_int64_field(3, list(y.shape))
            + pb.bytes_field(5, contents)  # InferOutputTensor.contents
        )
        return pb.string_field(1, "yolo") + pb.bytes_field(5, out)

    ident = lambda b: b  # noqa: E731

    def serve(methods):
        handler = grpc.method_handlers_generic_handler(
            "inference.GRPCInferenceService",
            {name: grpc.unary_unary_rpc_method_handler(fn, ident, ident) for name, fn in methods.items()},
        )
        server = grpc.server(futures.ThreadPoolExecutor(max_workers=2))
        server.add_generic_rpc_handlers((handler,))
        port = server.add_insecure_port("127.0.0.1:0")
        server.start()
        return server, port

    x = np.arange(24, dtype=np.float32).reshape(2, 2, 2, 3)

    # Triton-style server: raw buffers + ModelConfig metadata
    server, port = serve({"ModelMetadata": model_metadata, "ModelConfig": model_config, "ModelInfer": model_infer})
    try:
        m = TritonRemoteModel(f"grpc://127.0.0.1:{port}/yolo")
        assert m.endpoint == "yolo" and m.input_names == ["images"] and m.output_names == ["output0"]
        assert m.np_input_formats == [np.float32]
        assert m.metadata == {"task": "detect", "names": {"0": "drone"}}  # ADVICE r4: metadata flows over gRPC
        (y,) = m(x)
        np.testing.assert_allclose(y, x * 2)
    finally:
        server.stop(0)

    # KServe server without ModelConfig, answering with typed contents: metadata
    # degrades to None, inference still decodes
    server, port = serve({"ModelMetadata": model_metadata, "ModelInfer": model_infer_contents})
    try:
        m = TritonRemoteModel(f"grpc://127.0.0.1:{port}/yolo")
        assert m.metadata is None
        (y,) = m(x)
        np.testing.assert_allclose(y, x * 2)
    finally:
        server.stop(0)


def test_pbwire_malformed_input_errors():
    """Truncated/overlong wire data raises ValueError, not IndexError/garbage
    (ADVICE r4)."""
    import pytest

    from drone_yolo_tpu.utils import pbwire as pb

    with pytest.raises(ValueError, match="truncated"):
        pb.decode_varint(b"\x80\x80", 0)  # continuation bit set, buffer ends
    with pytest.raises(ValueError, match="64 bits"):
        pb.decode_varint(b"\x80" * 10 + b"\x01", 0)
    good = pb.bytes_field(1, b"payload-bytes")
    assert list(pb.fields(good)) == [(1, pb.LEN, b"payload-bytes")]
    with pytest.raises(ValueError, match="truncated"):
        list(pb.fields(good[:-4]))  # LEN payload cut short
    with pytest.raises(ValueError, match="truncated"):
        list(pb.fields(pb.key(2, pb.I64) + b"\x00\x01"))  # I64 needs 8 bytes


def test_rf100_benchmark_local_manifest(tmp_path):
    """RF100Benchmark offline analog: manifest parse -> fix_yaml -> per-dataset
    val with mAP50 accumulation into the eval log (reference benchmarks.py:203)."""
    from drone_yolo_tpu import YOLO
    from drone_yolo_tpu.utils import yaml_load
    from drone_yolo_tpu.utils.benchmarks import RF100Benchmark

    y1 = make_dataset(tmp_path / "ds_a", n_train=2, n_val=2, size=96, nc=4, seed=0)
    y2 = make_dataset(tmp_path / "ds_b", n_train=2, n_val=2, size=96, nc=4, seed=1)
    manifest = tmp_path / "datasets_links.txt"
    manifest.write_text(f"{y1}\n# comment\n{tmp_path / 'missing'}\n{y2}\n")

    rf = RF100Benchmark()
    names, cfgs = rf.parse_dataset(str(manifest))
    assert len(names) == len(cfgs) == 2  # missing entry skipped

    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        rf.set_key("k")  # zero-egress: download path must refuse loudly

    # fix_yaml normalizes split paths like the reference
    fixme = tmp_path / "fix.yaml"
    fixme.write_text("train: weird/path\nval: другое\nnames: {0: a}\n")
    RF100Benchmark.fix_yaml(fixme)
    fixed = yaml_load(fixme)
    assert fixed["train"] == "train/images" and fixed["val"] == "valid/images"

    m = YOLO("yolov8n.yaml")
    log = tmp_path / "eval.txt"
    v = rf.evaluate(cfgs[0], m, str(log), 0, imgsz=64)
    assert isinstance(v, float)
    assert log.read_text().startswith("ds_a:")


def test_facade_predict_on_artifact(tmp_path):
    """YOLO('best.onnx').predict(...) — the reference's primary AutoBackend
    flow: the facade wraps the artifact and the predictor routes inference
    through it (no jitted model)."""
    import cv2

    from drone_yolo_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    path = m.export(format="onnx", imgsz=64, batch=1, project=str(tmp_path))
    img = (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
    f = str(tmp_path / "img.jpg")
    cv2.imwrite(f, img)

    m2 = YOLO(str(path))
    assert m2.task == "detect" and m2.model is None and m2.backend is not None
    res = m2.predict(f, imgsz=64, verbose=False)
    assert len(res) == 1 and res[0].boxes is not None
    assert len(m2.backend.names) == 80


def test_facade_predict_segment_artifact(tmp_path):
    """YOLO('seg.onnx').predict(...): the segment predictor consumes the
    artifact's two outputs (dets + protos) and reconstructs masks."""
    import cv2

    from drone_yolo_tpu import YOLO

    m = YOLO("yolov8n-seg.yaml")
    path = m.export(format="onnx", imgsz=64, batch=1, project=str(tmp_path))
    img = (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
    f = str(tmp_path / "img.jpg")
    cv2.imwrite(f, img)

    m2 = YOLO(str(path))
    assert m2.task == "segment"
    res = m2.predict(f, imgsz=64, verbose=False, conf=0.001)
    r = res[0]
    assert r.boxes is not None
    if len(r.boxes.data):  # random init: usually a few low-conf dets
        assert r.masks is not None and r.masks.data.shape[1:] == (64, 64)
