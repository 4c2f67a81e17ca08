"""Per-op TPU time breakdown of the v8 train step via jax.profiler.ProfileData.

Captures a short trace of the steady-state jitted train step, then aggregates
device-side op durations by HLO category so the HBM/MXU bottleneck is visible
without the TensorBoard UI (replaces the reference's thop/torch.profiler flow,
ultralytics/utils/torch_utils.py:303-421, with XLA-native evidence).

Run: python tools/xprof_breakdown.py [--model yolov8s.yaml] [--batch 32]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(model_name: str, imgsz: int, nc: int):
    import jax
    import jax.numpy as jnp

    from drone_yolo_tpu.nn import modules as M
    from drone_yolo_tpu.nn.model import DetectionModel
    from drone_yolo_tpu.utils.loss import v8DetectionLoss

    model = DetectionModel(model_name, nc=nc)
    variables = model.init(jax.random.PRNGKey(0), imgsz=imgsz)
    if os.environ.get("PROF_SPD2"):
        print("spd_stride2:", model.enable_spd_stride2())
    if os.environ.get("PROF_LANEPAD"):
        print("lane_pad:", model.enable_lane_pad())
        if os.environ.get("PROF_LANEPAD_STATE"):
            variables = model.pad_variables(variables, imgsz=imgsz)
            print("lane_pad: padded-state masters")
    criterion = v8DetectionLoss(model)

    @jax.jit
    def step(params, batch, mom):
        def loss_fn(p):
            ctx = M.Ctx(train=True, dtype=jnp.bfloat16, targets=batch, rng=jax.random.PRNGKey(0))
            feats = model.apply(p, batch["img"] / 255.0, ctx=ctx)
            total, items = criterion(feats, batch)
            return total, items

        (total, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # SGD w/ momentum placeholder matching the real trainer's update cost
        new = jax.tree_util.tree_map(lambda p, g: p - 0.01 * g.astype(p.dtype), params, grads)
        return new, total, items

    return model, variables, step


def make_labels(rng, batch: int, imgsz: int, nc: int) -> dict:
    """Synthetic padded labels. Default: the historical 32-slot batch. With
    PROF_MAXBOXES/PROF_NOBJ set, a dense drone-regime load (e.g. 1024 slots,
    456 valid small boxes — what the dense proxy's mosaic labels pad to), the
    label shape all (B, M, A) assigner tensors key off."""
    m = int(os.environ.get("PROF_MAXBOXES", 32))
    nobj = int(os.environ.get("PROF_NOBJ", m))
    lo, hi = (int(x) for x in os.environ.get("PROF_OBJPX", "6,36").split(","))
    cls = np.zeros((batch, m), np.float32)
    boxes = np.zeros((batch, m, 4), np.float32)
    mask = np.zeros((batch, m), np.float32)
    if "PROF_MAXBOXES" not in os.environ and "PROF_NOBJ" not in os.environ:
        boxes[:] = np.array([10, 10, 100, 100], np.float32)
        mask[:] = 1.0
        return {"cls": cls, "bboxes": boxes, "mask": mask}
    for i in range(batch):
        w = rng.uniform(lo, hi, nobj)
        h = rng.uniform(lo, hi, nobj)
        cx = rng.uniform(hi, imgsz - hi, nobj)
        cy = rng.uniform(hi, imgsz - hi, nobj)
        boxes[i, :nobj] = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
        cls[i, :nobj] = rng.integers(0, nc, nobj)
        mask[i, :nobj] = 1.0
    return {"cls": cls, "bboxes": boxes, "mask": mask}


def collect(trace_dir: str):
    """Aggregate per-op device durations from the newest xplane in trace_dir."""
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    pd = ProfileData.from_serialized_xspace(open(paths[-1], "rb").read())
    per_op = collections.Counter()
    total_ps = 0
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            lname = line.name.lower()
            # ONLY the synchronous 'XLA Ops' line: its events tile the real
            # serialized TensorCore timeline (busy == span). 'Async XLA Ops'
            # carries overlapping DMA durations (issue->completion incl. queue
            # wait) that sum to several times the wall clock — counting them
            # made copies look like 80%+ of the step.
            if lname != "xla ops":
                continue
            for ev in line.events:
                dur = ev.duration_ns
                name = ev.name
                per_op[name] += dur
                total_ps += dur
    return per_op, total_ps


def categorize(name: str) -> str:
    # ev.name is the full HLO text "%op = type fusion(%operand1, ...)"; match
    # ONLY the lhs op name + the fusion kind, NOT operand names — "%bitcast.39"
    # as an *operand* must not classify its consumer as layout/copy (this bug
    # inflated the r3 'layout/copy' share by counting every fusion that merely
    # CONSUMES a relaid-out operand).
    n = name.split(" = ")[0].lower()
    if "%" in name and " = " in name:
        rhs = name.split(" = ", 1)[1]
        kind = rhs.split("(", 1)[0]  # "bf16[...] fusion" / "... copy" etc.
        n = n + " " + kind.split("]")[-1].lower()
    if "convolution" in n:  # NOT bare "conv": convert_reduce_fusion is BN stats
        return "conv (fwd/bwd)"
    if "convert_reduce" in n or "reduce_fusion" in n:
        return "bn-stats/reduce"
    if re.search(r"\b(dot|gemm|matmul)", n):
        return "matmul"
    if "all-reduce" in n or "allreduce" in n:
        return "collective"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "layout/copy"
    if "reduce" in n or "sort" in n or "top" in n or "scatter" in n or "gather" in n:
        return "reduce/sort/gather"
    if "fusion" in n:
        return "fusion (elementwise)"
    return "other"


def build_infer(model_name: str, imgsz: int, nc: int):
    import jax
    import jax.numpy as jnp

    from drone_yolo_tpu.nn import modules as M
    from drone_yolo_tpu.nn.model import DetectionModel
    from drone_yolo_tpu.ops.nms import non_max_suppression

    model = DetectionModel(model_name, nc=nc)
    variables = model.fuse(model.init(jax.random.PRNGKey(0), imgsz=imgsz))

    @jax.jit
    def step(params, batch, _mom):
        # deployment contract (bench.py / predictor): uint8 in, normalize in-graph
        preds = model.apply(params, batch["img"].astype(jnp.bfloat16) / 255.0, ctx=M.Ctx(train=False, dtype=jnp.bfloat16))
        if isinstance(preds, tuple):
            preds = preds[0]
        dets, n = non_max_suppression(preds, conf_thres=0.25, iou_thres=0.7, max_det=300, pre_topk=384)
        return params, jnp.sum(n).astype(jnp.float32), n

    return model, variables, step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov8s.yaml")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--infer", action="store_true", help="profile fused inference+NMS instead of the train step")
    ap.add_argument("--nc", type=int, default=4, help="class count (use 80 to match bench.py's head shapes)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)

    build = build_infer if args.infer else build_step
    model, variables, step = build(args.model, args.imgsz, nc=args.nc)
    rng = np.random.default_rng(0)
    img_u8 = rng.integers(0, 255, (args.batch, args.imgsz, args.imgsz, 3), np.uint8)
    batch = {
        "img": jnp.asarray(img_u8) if args.infer else jnp.asarray(img_u8.astype(np.float32)),
        **{k: jnp.asarray(v) for k, v in make_labels(rng, args.batch, args.imgsz, args.nc).items()},
    }
    params = jax.device_put(variables)

    # compile + warm
    params, total, items = step(params, batch, 0.9)
    _ = np.asarray(total)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, total, items = step(params, batch, 0.9)
    _ = np.asarray(total)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"steady state: {dt * 1e3:.1f} ms/step  {args.batch / dt:.1f} img/s")

    trace_dir = tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            params, total, items = step(params, batch, 0.9)
        _ = np.asarray(total)

    per_op, total_ns = collect(trace_dir)
    dump = os.environ.get("PROF_DUMP")
    if dump:
        import json

        with open(dump, "w") as f:
            json.dump({n: v for n, v in per_op.items()}, f)
        print(f"dumped {len(per_op)} ops to {dump}")
    print(f"device total in trace: {total_ns / 1e6:.2f} ms (2 steps)")
    cats = collections.Counter()
    for name, ns in per_op.items():
        cats[categorize(name)] += ns
    print("\n-- by category --")
    for cat, ns in cats.most_common():
        print(f"{ns / total_ns * 100:6.2f}%  {ns / 1e6:9.2f} ms  {cat}")
    print(f"\n-- top {args.top} ops --")
    for name, ns in per_op.most_common(args.top):
        print(f"{ns / total_ns * 100:6.2f}%  {ns / 1e6:9.2f} ms  {name[:110]}")
    print(f"\n-- top {args.top} convs --")
    convs = collections.Counter({n: v for n, v in per_op.items() if "convolution" in n.lower()})
    for name, ns in convs.most_common(args.top):
        print(f"{ns / total_ns * 100:6.2f}%  {ns / 1e6:9.2f} ms  {name[:160]}")


if __name__ == "__main__":
    main()
