"""Micro-benchmark for the TAL assigner at dense drone-regime label loads.

The dense proxy's real label load (~114 obj/img under mosaic -> M=512 padded
slots) makes the (B, M, A) assigner tensors the dominant train-step cost
(tools/xprof_breakdown.py attribution, ROUND5.md). This harness times
`drone_yolo_tpu.utils.tal.assign` alone so variants can be iterated in
seconds instead of re-profiling the full step.

Run: python tools/tal_bench.py [--batch 32] [--maxboxes 512] [--nobj 456]
     [--imgsz 640] [--nc 4] [--iters 20] [--variant assign]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_inputs(batch, maxboxes, nobj, imgsz, nc, strides=(4, 8, 16, 32)):
    import jax.numpy as jnp

    from drone_yolo_tpu.ops.anchors import make_anchors

    rng = np.random.default_rng(0)
    feat_shapes = [(imgsz // s, imgsz // s) for s in strides]
    anc, st = make_anchors(feat_shapes, strides, 0.5)
    a = anc.shape[0]
    pd_scores = rng.uniform(0, 1, (batch, a, nc)).astype(np.float32)
    # plausible predicted boxes: anchor-centered, 4-64 px extents (pixel units)
    ctr = np.asarray(anc) * np.asarray(st)
    wh = rng.uniform(4, 64, (batch, a, 2)).astype(np.float32)
    pd_bboxes = np.concatenate([ctr[None] - wh / 2, ctr[None] + wh / 2], -1).astype(np.float32)
    lo, hi = 4, 36
    w = rng.uniform(lo, hi, (batch, maxboxes)).astype(np.float32)
    h = rng.uniform(lo, hi, (batch, maxboxes)).astype(np.float32)
    cx = rng.uniform(hi, imgsz - hi, (batch, maxboxes)).astype(np.float32)
    cy = rng.uniform(hi, imgsz - hi, (batch, maxboxes)).astype(np.float32)
    gt = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    mask = (np.arange(maxboxes)[None] < nobj).astype(np.float32) * np.ones((batch, 1), np.float32)
    gt = gt * mask[..., None]
    labels = rng.integers(0, nc, (batch, maxboxes)).astype(np.int32)
    return (
        jnp.asarray(pd_scores),
        jnp.asarray(pd_bboxes),
        jnp.asarray(np.asarray(anc) * np.asarray(st)),
        jnp.asarray(labels),
        jnp.asarray(gt),
        jnp.asarray(mask),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--maxboxes", type=int, default=512)
    p.add_argument("--nobj", type=int, default=456)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--nc", type=int, default=4)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--trace", default="", help="xprof trace dir (optional)")
    args = p.parse_args()

    import jax

    from drone_yolo_tpu.utils import tal

    inputs = make_inputs(args.batch, args.maxboxes, args.nobj, args.imgsz, args.nc)
    fn = jax.jit(lambda *i: tal.assign(*i, num_classes=args.nc))
    out = fn(*inputs)
    _ = int(np.asarray(out[3]).sum())  # completion fence: block_until_ready is a no-op on the tunneled axon platform
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(*inputs)
    fg = int(np.asarray(out[3]).sum())  # in-order device queue: fetching the last result bounds all iters
    dt = (time.perf_counter() - t0) / args.iters
    a = inputs[0].shape[1]
    print(f"assign: {dt * 1e3:.2f} ms  (B={args.batch} M={args.maxboxes} A={a} nc={args.nc})  fg={fg}")
    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                out = fn(*inputs)
            jax.block_until_ready(out)
        print("trace:", args.trace)


if __name__ == "__main__":
    main()
