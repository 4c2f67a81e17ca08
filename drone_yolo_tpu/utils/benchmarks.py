"""Benchmark harness: throughput/latency/mAP across export formats.

Capability parity with `ultralytics/utils/benchmarks.py:51-202` (benchmark()) and
`ProfileModels:338`: exports the model to each runnable format, re-validates, and
tabulates mAP + latency. Formats reduce to {npz (native jit), stablehlo} on a
zero-egress TPU image; TF-family formats join automatically when importable.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from drone_yolo_tpu.utils import LOGGER, TQDM


def default_formats():
    """Export formats included in the benchmark matrix (skips formats whose runtime is absent)."""
    fmts = ["npz", "stablehlo", "onnx"]
    try:
        import tensorflow  # noqa: F401

        fmts += ["savedmodel", "tflite"]
    except ImportError:
        pass
    return tuple(fmts)


def benchmark(model=None, data=None, imgsz: int = 160, half: bool = False, device=None, verbose=False, fmts=None, keep_dir=None):
    """Export to each format, RELOAD the artifact via AutoBackend, and measure
    latency + (optionally) re-validated mAP through the reloaded artifact —
    reference benchmarks.py:51 semantics (export x AutoBackend x val).

    If `verbose` is a float, assert every mAP >= that floor (the reference's
    CI regression-gate trick, ci.yaml:138-146).
    """
    import tempfile

    import jax

    from drone_yolo_tpu import YOLO
    from drone_yolo_tpu.engine.exporter import Exporter
    from drone_yolo_tpu.nn.autobackend import AutoBackend

    assert model is not None, "pass a YOLO facade or model path"
    facade = model if isinstance(model, YOLO) else YOLO(model)
    facade.ensure_variables(imgsz=imgsz)
    fmts = fmts or default_formats()

    rows = []
    x = np.random.default_rng(0).random((1, imgsz, imgsz, 3), np.float32)
    workdir = keep_dir or tempfile.mkdtemp(prefix="dyt_bench_")
    for fmt in fmts:
        t_export = 0.0
        try:
            t0 = time.time()
            path = Exporter(
                overrides={"format": fmt, "imgsz": imgsz, "batch": 1, "project": workdir, "task": facade.task, "half": half}
            )(facade)
            t_export = time.time() - t0
            backend = AutoBackend(path, half=half)
            out = backend.warmup((1, imgsz, imgsz, 3))

            n_timed = 20
            t0 = time.perf_counter()
            for _ in range(n_timed):
                out = backend(x)
            np.asarray(jax.tree_util.tree_leaves(out)[-1])
            latency_ms = (time.perf_counter() - t0) / n_timed * 1e3

            metrics = None
            if data is not None:
                from drone_yolo_tpu.engine.validator import DetectionValidator

                v = DetectionValidator(
                    args={"data": data, "imgsz": imgsz, "batch": 1, "plots": False, "verbose": False,
                          "half": half, "mode": "val", "task": "detect", "workers": 0}
                )
                res = v(model=backend)
                metrics = res.get("metrics/mAP50-95(B)")
            rows.append({"format": fmt, "status": "ok", "latency_ms": round(latency_ms, 2), "mAP50-95": metrics, "export_s": round(t_export, 1)})
        except Exception as e:  # noqa: BLE001 - report per-format failures like the reference
            rows.append({"format": fmt, "status": f"fail: {type(e).__name__}: {e}", "latency_ms": None, "mAP50-95": None})

    LOGGER.info(f"\n{'format':<12}{'status':<10}{'latency_ms':<12}{'mAP50-95':<10}")
    for r in rows:
        LOGGER.info(f"{r['format']:<12}{str(r['status'])[:28]:<30}{str(r['latency_ms']):<12}{str(r['mAP50-95']):<10}")
    if isinstance(verbose, float):
        for r in rows:
            if r["mAP50-95"] is not None:
                assert r["mAP50-95"] >= verbose, f"{r['format']} mAP {r['mAP50-95']} below floor {verbose}"
    return rows


class ProfileModels:
    """Per-model throughput profiling table (reference benchmarks.py:338 analog)."""

    def __init__(self, paths, imgsz: int = 640, num_timed_runs: int = 20, batch: int = 1, half: bool = True):
        self.paths = paths if isinstance(paths, list) else [paths]
        self.imgsz = imgsz
        self.num_timed_runs = num_timed_runs
        self.batch = batch
        self.half = half

    def run(self):
        import jax
        import jax.numpy as jnp

        from drone_yolo_tpu import YOLO
        from drone_yolo_tpu.nn import modules as M

        rows = []
        for p in self.paths:
            facade = YOLO(p)
            facade.ensure_variables(imgsz=self.imgsz)
            v = facade.model.fuse(facade.variables)
            dtype = jnp.bfloat16 if self.half else jnp.float32
            net = facade.model

            @jax.jit
            def fn(v, x):
                out = net.apply(v, x, ctx=M.Ctx(train=False, dtype=dtype))
                return out[0] if isinstance(out, tuple) else out

            x = jnp.asarray(np.random.default_rng(0).random((self.batch, self.imgsz, self.imgsz, 3), np.float32))
            np.asarray(jax.tree_util.tree_leaves(fn(v, x))[-1][:1])
            t0 = time.perf_counter()
            for _ in range(self.num_timed_runs):
                out = fn(v, x)
            np.asarray(jax.tree_util.tree_leaves(out)[-1][:1])
            dt = (time.perf_counter() - t0) / self.num_timed_runs
            n_params = net.param_count(v)
            rows.append({"model": str(p), "latency_ms": round(dt * 1e3, 2), "img_per_s": round(self.batch / dt, 1), "params": n_params})
            LOGGER.info(rows[-1])
        return rows


class RF100Benchmark:
    """Multi-dataset val benchmark (reference utils/benchmarks.py:203 RF100Benchmark).

    The reference downloads the Roboflow-100 suite and scrapes val log lines;
    this environment has zero egress, so datasets come from a local manifest
    instead (one dataset-yaml path — or a directory containing data.yaml — per
    line), and `evaluate` reads metrics straight from the validator instead of
    parsing logs. The surface (parse_dataset/fix_yaml/evaluate, eval_log
    accumulation of per-dataset mAP50) mirrors the reference so RF100-style
    sweeps port directly once the datasets are on disk.
    """

    def __init__(self):
        self.ds_names = []
        self.ds_cfg_list = []
        self.val_metrics = ["class", "images", "targets", "precision", "recall", "map50", "map95"]

    def set_key(self, api_key):  # noqa: ARG002 - kept for surface parity
        raise RuntimeError(
            "Roboflow download is unavailable in this environment (zero egress); "
            "provide datasets locally and call parse_dataset(manifest)"
        )

    def parse_dataset(self, ds_link_txt="datasets_links.txt"):
        """Read a local manifest: each non-empty line is a dataset yaml path or
        a directory containing data.yaml. Returns (names, cfg_paths)."""
        from pathlib import Path

        for line in Path(ds_link_txt).read_text().splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            p = Path(line)
            if p.is_dir():
                p = p / "data.yaml"
            if not p.exists():
                LOGGER.warning(f"RF100Benchmark: skipping missing dataset '{line}'")
                continue
            self.ds_names.append(p.parent.name or p.stem)
            self.ds_cfg_list.append(p.resolve())
        return self.ds_names, self.ds_cfg_list

    @staticmethod
    def fix_yaml(path):
        """Normalize train/val paths inside a dataset yaml (reference :266)."""
        from drone_yolo_tpu.utils import yaml_load, yaml_save

        data = yaml_load(path)
        data["train"] = "train/images"
        data["val"] = "valid/images"
        yaml_save(path, data)

    def evaluate(self, yaml_path, model, eval_log_file, list_ind, imgsz: int = 640):
        """Validate `model` (path or facade) on one dataset and append its
        mAP50 to the eval log. Returns the mAP50 (reference :282 semantics,
        metrics taken from the validator instead of scraped logs)."""
        from drone_yolo_tpu import YOLO

        m = model if hasattr(model, "val") else YOLO(model)
        res = m.val(data=str(yaml_path), imgsz=imgsz, verbose=False, plots=False)
        map50 = float(res.box.map50)
        with open(eval_log_file, "a") as f:
            f.write(f"{self.ds_names[list_ind]}: {map50}\n")
        return map50
