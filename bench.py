"""Benchmark: batched 640px inference throughput on one TPU chip.

Prints one JSON line per gated model: {"metric", "value", "unit", "vs_baseline"}.
The LAST line is the primary regression gate (YOLOv8s b256); the flagship
yolov8s-p2-repvgg-sf (b128, pre_topk=256 — the tuned 4-level-head setting,
ROUND3.md §2) is emitted first so a flagship regression is caught per-round.
vs_baseline is measured img/s divided by the reference A100 TensorRT rate for
v8s (1.20 ms/img -> 833.3 img/s, docs/en/models/yolov8.md:45); the north-star
target is vs_baseline >= 2.0 (BASELINE.json) ON THE MODEL THAT BASELINE RATES
(v8s: 3.58x, comfortably met). The flagship line shares the v8s denominator
only because no A100 number exists for a 4-level P2 head; its measured
ceiling on this chip is ~1.93x and 2.0x is NOT reachable for this
architecture by postprocess tuning (r3-r5 measurements: raw head with NMS
off = 1592 img/s, so NMS is 0.4% at pre_topk=256 after the 256/384/512/1024
sweep; weight-only int8 -0.5%; inference lane_pad 1197 vs 1605 = -25%, the
forward pays the padded convs' real compute without training's wgrad-layout
win; spd_stride2 -15%). The 4-level head simply runs ~2.6x the P2-less v8s
work per image — the flagship gate is therefore parity-class ~1.9x, tracked
here per-round for regressions, not a 2.0x gate.

Env knobs: BENCH_MODEL (run ONE model instead of the two-gate default),
BENCH_BATCH, BENCH_IMGSZ, BENCH_ITERS, BENCH_PRETOPK, BENCH_NMS=0, BENCH_U8=0.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

A100_TRT_V8S_IMGS_PER_S = 1000.0 / 1.20  # 833.3


def bench_one(model_name: str, batch: int, imgsz: int, iters: int, pre_topk: int, with_nms: bool, u8: bool) -> dict:
    import jax
    import jax.numpy as jnp

    from drone_yolo_tpu.nn import modules as M
    from drone_yolo_tpu.nn.model import DetectionModel
    from drone_yolo_tpu.ops.nms import non_max_suppression

    model = DetectionModel(model_name)
    variables = model.fuse(model.init(jax.random.PRNGKey(0), imgsz=imgsz))
    if os.environ.get("BENCH_LANEPAD", "") == "1":
        # lane-pad the narrow P1/P2 convs inside the traced forward (exact,
        # ~2e-5 fp32 reassociation noise; composes with fused weights)
        print(f"lane_pad: {model.enable_lane_pad()} modules", file=sys.stderr)

    @jax.jit
    def fn(variables, x):
        if u8:
            # deployment contract (predictor.preprocess): host ships raw uint8,
            # normalization runs in-graph in the compute dtype — one fused pass
            # reading 1 byte/px instead of materializing a full f32 tensor
            x = x.astype(jnp.bfloat16) / 255.0
        preds, _ = model.apply(variables, x, ctx=M.Ctx(train=False, dtype=jnp.bfloat16))
        if not with_nms:  # NMS-share measurement (BENCH_NMS=0): raw head only
            return preds, jnp.zeros((preds.shape[0],), jnp.int32)
        return non_max_suppression(preds, conf_thres=0.25, iou_thres=0.7, max_det=300, pre_topk=pre_topk)

    rng = np.random.default_rng(0)
    if u8:
        x = jnp.asarray(rng.integers(0, 256, (batch, imgsz, imgsz, 3), np.uint8))
    else:
        x = jnp.asarray(rng.random((batch, imgsz, imgsz, 3), np.float32))
    variables = jax.device_put(variables)

    # warmup + compile; completion is forced with a host fetch because
    # block_until_ready is unreliable on the tunneled axon platform
    dets, n = fn(variables, x)
    _ = np.asarray(n)

    t0 = time.perf_counter()
    for _ in range(iters):
        dets, n = fn(variables, x)
    _ = np.asarray(n)  # device queue is in-order: fetching the last result bounds all
    dt = time.perf_counter() - t0

    imgs_per_s = batch * iters / dt
    stem = model_name.rsplit(".", 1)[0]
    stem = "flagship" if stem == "yolov8s-p2-repvgg-sf" else stem.replace("yolov8s", "v8s")
    return {
        "metric": f"{stem}_{imgsz}px_batch{batch}_infer_throughput",
        "value": round(imgs_per_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(imgs_per_s / A100_TRT_V8S_IMGS_PER_S, 3),
    }


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    imgsz = int(os.environ.get("BENCH_IMGSZ", 640))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    with_nms = os.environ.get("BENCH_NMS", "1") != "0"
    u8 = os.environ.get("BENCH_U8", "1") != "0"

    if "BENCH_MODEL" in os.environ:  # single-model mode (sweeps, xprof pairing)
        runs = [
            (
                os.environ["BENCH_MODEL"],
                int(os.environ.get("BENCH_BATCH", 256)),
                int(os.environ.get("BENCH_PRETOPK", 384)),
            )
        ]
    else:
        # two-gate default: flagship first, v8s LAST (primary driver gate).
        # flagship: b32/b128 within noise of each other, pre_topk=256 is the
        # tuned 4-level-head setting; v8s: b256, pre_topk=384 (sweeps in
        # ROUND2.md/ROUND3.md §2)
        runs = [
            ("yolov8s-p2-repvgg-sf.yaml", int(os.environ.get("BENCH_BATCH", 128)), 256),
            ("yolov8s.yaml", int(os.environ.get("BENCH_BATCH", 256)), 384),
        ]

    for model_name, batch, pre_topk in runs:
        print(json.dumps(bench_one(model_name, batch, imgsz, iters, pre_topk, with_nms, u8)), flush=True)


if __name__ == "__main__":
    sys.exit(main())
