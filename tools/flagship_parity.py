"""Flagship accuracy parity: train yolov8s-p2-repvgg-sf in BOTH frameworks on
the dense small-object benchmark (tools/dense_dataset.py) from the SAME initial
weights and matched hyperparameters, then compare final mAP50-95.

This is the north-star claim (BASELINE.json: "VisDrone mAP50-95 within 0.5 of
the PyTorch reference") evidenced on a generated VisDrone proxy, since the
image has zero egress. The reference side exercises the real P2 head via the
refshim parse_model patch (the snapshot's RepVGGBlock KeyError defect,
SURVEY.md §2.3).

Usage:
  python tools/flagship_parity.py init   # dataset + shared init weights
  python tools/flagship_parity.py ref    # torch reference training (CPU, slow)
  python tools/flagship_parity.py ours   # our training (TPU or JAX CPU)
  python tools/flagship_parity.py report # compare the two JSON outputs

Artifacts under WORK (default /tmp/flagship_parity): dataset/, init_sd.pt,
ref_result.json, ours_result.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

WORK = Path(os.environ.get("FLAGSHIP_WORK", "/tmp/flagship_parity"))
MODEL_YAML = "yolov8s-p2-repvgg-sf.yaml"
NC = 6
IMGSZ = int(os.environ.get("FLAGSHIP_IMGSZ", 320))
EPOCHS = int(os.environ.get("FLAGSHIP_EPOCHS", 60))
BATCH = int(os.environ.get("FLAGSHIP_BATCH", 8))
N_TRAIN = int(os.environ.get("FLAGSHIP_NTRAIN", 160))
N_VAL = int(os.environ.get("FLAGSHIP_NVAL", 96))
SEED = 0

# matched training hyps, reference cfg names (ours uses the same names).
# Geometry/color aug off except horizontal flip: both frameworks implement
# flip identically, while mosaic/HSV/affine have framework-specific RNG
# streams that would add run-to-run variance without changing the claim.
HYPS = dict(
    epochs=EPOCHS,
    batch=BATCH,
    imgsz=IMGSZ,
    seed=SEED,
    optimizer="SGD",
    lr0=0.01,
    lrf=0.01,
    momentum=0.937,
    weight_decay=0.0005,
    warmup_epochs=3.0,
    warmup_momentum=0.8,
    warmup_bias_lr=0.1,
    nbs=8,  # accumulate=1: one optimizer step per batch in both frameworks
    box=7.5,
    cls=0.5,
    dfl=1.5,
    mosaic=0.0,
    mixup=0.0,
    copy_paste=0.0,
    scale=0.0,
    translate=0.0,
    degrees=0.0,
    shear=0.0,
    perspective=0.0,
    fliplr=0.5,
    flipud=0.0,
    hsv_h=0.0,
    hsv_s=0.0,
    hsv_v=0.0,
    erasing=0.0,
    auto_augment=None,
    multi_scale=False,
    rect=False,
    cos_lr=False,
    close_mosaic=0,
    patience=10_000,
    amp=False,
    cache="ram",
    plots=False,
    deterministic=True,
    # no per-epoch val: with patience=inf and EMA-final weights the in-training
    # val only selects best.pt, and both sides are compared on FINAL (EMA)
    # weights anyway — per-epoch val would cost ~30 min per side here
    val=False,
)


def _add_paths():
    for p in (str(Path(__file__).resolve().parents[1]), str(Path(__file__).resolve().parents[1] / "tests")):
        if p not in sys.path:
            sys.path.insert(0, p)


def cmd_init():
    """Generate the dataset and the shared torch init state dict."""
    _add_paths()
    from dense_dataset import make_dense_dataset
    from refshim import load_reference, patch_reference_repvgg

    WORK.mkdir(parents=True, exist_ok=True)
    yaml_path = make_dense_dataset(WORK / "dataset", n_train=N_TRAIN, n_val=N_VAL, size=IMGSZ, seed=7, nc=NC)
    print("dataset:", yaml_path)

    assert load_reference() is not None, "torch reference required for shared init"
    patch_reference_repvgg()
    import torch
    from ultralytics.nn.tasks import DetectionModel as RefDet

    torch.manual_seed(SEED)
    m = RefDet(MODEL_YAML, ch=3, nc=NC, verbose=False)
    n_params = sum(p.numel() for p in m.parameters())
    torch.save({k: v.clone() for k, v in m.state_dict().items()}, WORK / "init_sd.pt")
    # ultralytics-format checkpoint so the reference trainer starts from it
    torch.save({"model": m, "epoch": -1, "train_args": {"model": MODEL_YAML, "task": "detect"}}, WORK / "init.pt")
    print(f"shared init: {n_params / 1e6:.2f}M params -> {WORK}/init_sd.pt, init.pt")


def cmd_ref():
    """Train + validate the torch reference (CPU)."""
    _add_paths()
    from refshim import load_reference, patch_reference_repvgg

    assert load_reference() is not None
    patch_reference_repvgg()
    import torch

    torch.set_num_threads(max(os.cpu_count() or 1, 1))
    from ultralytics import YOLO

    t0 = time.time()
    y = YOLO(str(WORK / "init.pt"))
    y.train(
        data=str(WORK / "dataset" / "data.yaml"),
        device="cpu",
        workers=0,
        project=str(WORK / "runs_ref"),
        name="flagship",
        exist_ok=True,
        save=True,
        save_period=-1,
        verbose=False,
        **HYPS,
    )
    train_s = time.time() - t0
    last_pt = Path(y.trainer.wdir) / "last.pt"
    # standalone final validation on last.pt (EMA) weights, fixed protocol
    from ultralytics import YOLO as RefYOLO

    y = RefYOLO(str(last_pt))
    res = y.val(data=str(WORK / "dataset" / "data.yaml"), imgsz=IMGSZ, batch=BATCH, rect=False, conf=0.001, iou=0.7, max_det=300, device="cpu", half=False, plots=False, verbose=False)
    out = {
        "framework": "torch-reference",
        "map50": float(res.box.map50),
        "map50_95": float(res.box.map),
        "precision": float(res.box.mp),
        "recall": float(res.box.mr),
        "train_seconds": round(train_s, 1),
        "epochs": EPOCHS,
        "weights": str(last_pt),
    }
    (WORK / "ref_result.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


def cmd_ours(platform_note: str = ""):
    """Train + validate drone_yolo_tpu (TPU when available, else JAX CPU)."""
    _add_paths()
    import numpy as np
    import torch

    from drone_yolo_tpu.engine.model import YOLO
    from drone_yolo_tpu.nn.model import DetectionModel
    from drone_yolo_tpu.utils.torch_convert import convert_state_dict

    sd = torch.load(WORK / "init_sd.pt", map_location="cpu", weights_only=True)
    ours = DetectionModel(MODEL_YAML, nc=NC)
    variables = convert_state_dict(ours, sd)

    facade = YOLO(MODEL_YAML, task="detect")
    facade.model = ours
    facade.variables = variables

    import jax

    t0 = time.time()
    metrics = facade.train(
        data=str(WORK / "dataset" / "data.yaml"),
        workers=2,
        project=str(WORK / "runs_ours"),
        name="flagship",
        exist_ok=True,
        save=True,
        **HYPS,
    )
    train_s = time.time() - t0
    res = facade.val(data=str(WORK / "dataset" / "data.yaml"), imgsz=IMGSZ, batch=BATCH, rect=False, conf=0.001, iou=0.7, max_det=300, half=False, plots=False, verbose=False)
    rd = res.results_dict
    out = {
        "framework": "drone_yolo_tpu",
        "backend": jax.default_backend(),
        "map50": float(rd["metrics/mAP50(B)"]),
        "map50_95": float(rd["metrics/mAP50-95(B)"]),
        "precision": float(rd["metrics/precision(B)"]),
        "recall": float(rd["metrics/recall(B)"]),
        "train_seconds": round(train_s, 1),
        "epochs": EPOCHS,
        "final_train_metrics": {k: float(v) for k, v in (metrics or {}).items() if isinstance(v, (int, float))},
    }
    (WORK / "ours_result.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


def cmd_ablation():
    """Reproduce the paper's architecture ablation IN OUR FRAMEWORK (VERDICT
    r3 next #6): train yolov8s (P3-P5), yolov8s-p2 (adds the stride-4 level),
    and the flagship yolov8s-p2-repvgg-sf on a HARDER dense proxy (4-12 px
    objects — below what a stride-8 P3 grid resolves cleanly) and check the
    README's qualitative result (/root/reference/README.md:3-5): the P2 head
    is the main gain; RepVGG + sandwich-fusion are ~neutral on accuracy.

    Env: ABL_EPOCHS=40 ABL_NTRAIN=240 ABL_OBJPX=4,12 ABL_IMGSZ=320
    Writes WORK/ablation.json and prints the ordering verdict.
    """
    _add_paths()
    from dense_dataset import make_dense_dataset

    epochs = int(os.environ.get("ABL_EPOCHS", 40))
    n_train = int(os.environ.get("ABL_NTRAIN", 240))
    obj_px = tuple(int(v) for v in os.environ.get("ABL_OBJPX", "4,12").split(","))
    imgsz = int(os.environ.get("ABL_IMGSZ", 320))
    models = ["yolov8s.yaml", "yolov8s-p2.yaml", MODEL_YAML]

    ds_root = WORK / f"ablation_ds_{obj_px[0]}_{obj_px[1]}_{imgsz}"
    yaml_path = ds_root / "data.yaml"
    if not yaml_path.exists():
        yaml_path = make_dense_dataset(ds_root, n_train=n_train, n_val=96, size=imgsz, seed=1, nc=NC, obj_px=obj_px)

    from drone_yolo_tpu.engine.model import YOLO

    hyps = dict(HYPS, epochs=epochs, imgsz=imgsz)
    if os.environ.get("ABL_AMP", "") == "1":
        # the ablation is an OUR-FRAMEWORK architecture-ordering claim (not a
        # torch-numerics comparison like cmd_ours), so the production bf16
        # training mode is the honest setting — and ~3x faster on the MXU
        hyps["amp"] = True
    # incremental: per-model rows land in ablation_partial.json as they finish
    # so an interrupted run still leaves evidence (and re-runs skip done rows)
    partial_path = WORK / "ablation_partial.json"
    results = json.loads(partial_path.read_text()) if partial_path.exists() else {}
    for model_yaml in models:
        if model_yaml in results:
            print("skip (cached):", model_yaml, results[model_yaml], flush=True)
            continue
        t0 = time.time()
        facade = YOLO(model_yaml, task="detect")
        facade.train(
            data=str(yaml_path), workers=2, project=str(WORK / "runs_ablation"),
            name=model_yaml.split(".")[0], exist_ok=True, save=True, **hyps,
        )
        res = facade.val(
            data=str(yaml_path), imgsz=imgsz, batch=BATCH, rect=False,
            conf=0.001, iou=0.7, max_det=300, half=False, plots=False, verbose=False,
        )
        rd = res.results_dict
        results[model_yaml] = {
            "map50_95": round(float(rd["metrics/mAP50-95(B)"]), 4),
            "map50": round(float(rd["metrics/mAP50(B)"]), 4),
            "train_seconds": round(time.time() - t0, 1),
        }
        partial_path.write_text(json.dumps(results, indent=1))
        print(model_yaml, results[model_yaml], flush=True)

    plain, p2, sf = (results[m]["map50_95"] for m in models)
    report = {
        "dataset": f"dense proxy {obj_px[0]}-{obj_px[1]}px objects @{imgsz}, {n_train} train imgs, {epochs} epochs",
        "models": results,
        "p2_gain_over_plain": round(p2 - plain, 4),
        "sf_delta_vs_p2": round(sf - p2, 4),
        # README.md:3-5 ordering: P2 = main gain; SF/RepVGG ~ neutral
        "p2_is_main_gain": bool(p2 - plain > 0.01),
        "sf_roughly_neutral": bool(abs(sf - p2) < max(0.5 * (p2 - plain), 0.02)),
    }
    (WORK / "ablation.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))
    return 0 if report["p2_is_main_gain"] else 1


def cmd_report():
    r = json.loads((WORK / "ref_result.json").read_text())
    o = json.loads((WORK / "ours_result.json").read_text())
    diff = abs(r["map50_95"] - o["map50_95"])
    report = {
        "model": MODEL_YAML,
        "dataset": f"dense small-object VisDrone proxy ({N_TRAIN} train / {N_VAL} val, ~114 obj/img, tiny boxes @{IMGSZ})",
        "ref_map50_95": round(r["map50_95"], 4),
        "ours_map50_95": round(o["map50_95"], 4),
        "ref_map50": round(r["map50"], 4),
        "ours_map50": round(o["map50"], 4),
        "abs_diff_map50_95": round(diff, 4),
        "within_0p5_points": bool(diff <= 0.005),
        "ref_train_seconds": r["train_seconds"],
        "ours_train_seconds": o["train_seconds"],
    }
    (WORK / "report.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))
    return 0 if report["within_0p5_points"] else 1


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "report"
    sys.exit({"init": cmd_init, "ref": cmd_ref, "ours": cmd_ours, "report": cmd_report, "ablation": cmd_ablation}[cmd]())
