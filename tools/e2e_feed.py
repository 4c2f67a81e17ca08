"""End-to-end fed-training measurement (VERDICT r2 next #3).

Measures the REAL input pipeline — JPEG decode + mosaic + random affine + HSV +
collate (the actual YOLODataset/DataLoader path, reference
`ultralytics/data/build.py:96-185` analog) — feeding the actual jitted train
step on the chip, and reports:

  * host_img_per_s            loader-only throughput (one timed epoch, post-cache)
  * fed_img_per_s             loader -> uint8 device_put -> train step, overlapped
  * device_img_per_s          same step re-fed the last device batch (device roof)
  * overlap_efficiency        fed / min(host, device) — 1.0 means the slower side
                              fully hides the faster side (true pipelining)
  * cores_to_feed_device      host cores needed for the loader to match the chip
                              (this box has 1 core; production hosts have dozens)

Run (axon TPU): python tools/e2e_feed.py
Knobs: FEED_IMGSZ=640 FEED_N=192 FEED_BATCH=16 FEED_WORKERS=1 FEED_MODEL=yolov8s.yaml
       FEED_EPOCHS=2 (timed epochs after the warmup/caching epoch)
       FEED_DEVICE_AUG=1 (host pipeline = decode+letterbox+collate only; mosaic/
       affine/HSV/flip run inside the jitted step — measures the cores-to-feed
       win of device_aug, VERDICT r3 next #2)  FEED_LANEPAD=1
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dense_dataset import make_dense_dataset  # noqa: E402

V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    import jax.numpy as jnp

    from drone_yolo_tpu.cfg import get_cfg
    from drone_yolo_tpu.data.build import build_dataloader, build_yolo_dataset
    from drone_yolo_tpu.data.utils import check_det_dataset
    from drone_yolo_tpu.nn import modules as M
    from drone_yolo_tpu.nn.model import DetectionModel
    from drone_yolo_tpu.utils.loss import v8DetectionLoss

    imgsz = int(os.environ.get("FEED_IMGSZ", 640))
    n_imgs = int(os.environ.get("FEED_N", 192))
    batch = int(os.environ.get("FEED_BATCH", 16))
    workers = int(os.environ.get("FEED_WORKERS", 1))
    model_name = os.environ.get("FEED_MODEL", "yolov8s.yaml")
    timed_epochs = int(os.environ.get("FEED_EPOCHS", 2))
    device_aug = os.environ.get("FEED_DEVICE_AUG", "") == "1"

    root = Path(os.environ.get("FEED_WORK", "/tmp/e2e_feed")) / f"ds{imgsz}_{n_imgs}"
    yaml_path = root / "data.yaml"
    if not yaml_path.exists():
        yaml_path = Path(make_dense_dataset(root, n_train=n_imgs, n_val=8, size=imgsz, seed=3, nc=6))
    data = check_det_dataset(str(yaml_path))

    cfg = get_cfg(
        overrides={"imgsz": imgsz, "batch": batch, "workers": workers, "data": str(yaml_path), "device_aug": device_aug}
    )
    ds = build_yolo_dataset(cfg, data["train"], batch, data, mode="train")
    loader = build_dataloader(ds, batch, workers, shuffle=True, seed=0)

    # -- phase A: loader-only host throughput (epoch 0 warms the label cache) --
    for ep in range(1 + 1):
        loader.set_epoch(ep)
        t0 = time.perf_counter()
        n = 0
        for b in loader:
            n += b["img"].shape[0]
        dt = time.perf_counter() - t0
    host_rate = n / dt

    # -- phase B: fed training (loader -> uint8 ship -> jitted step) --
    model = DetectionModel(model_name, nc=int(data["nc"]))
    variables = model.init(jax.random.PRNGKey(0), imgsz=imgsz)
    if os.environ.get("FEED_LANEPAD"):
        print(f"lane_pad: {model.enable_lane_pad()} modules padded", file=sys.stderr)
    criterion = v8DetectionLoss(model)
    if device_aug:
        from drone_yolo_tpu.data.device_aug import aug_hyp_from_args, device_augment

        aug_hyp = aug_hyp_from_args(cfg)

    @jax.jit
    def step(params, dev_batch):
        img = dev_batch["img"].astype(jnp.float32)
        if device_aug:  # mosaic/affine/HSV/flip inside the step (normalizes to 0..1)
            dev_batch = device_augment({**dev_batch, "img": img}, jax.random.PRNGKey(0), aug_hyp, True)
            img = dev_batch["img"]
        else:
            img = img / 255.0  # uint8 ships, normalize in-graph
            dev_batch = {**dev_batch, "img": img}

        def loss_fn(p):
            ctx = M.Ctx(train=True, dtype=jnp.bfloat16, targets=dev_batch, rng=jax.random.PRNGKey(0))
            out = model.apply(p, img, ctx=ctx)
            loss, items = criterion(out, dev_batch)
            return loss, items

        (loss, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_params = jax.tree_util.tree_map(lambda p, g: p - 0.01 * g.astype(p.dtype), params, grads)
        return new_params, loss

    keep = ("img", "cls", "bboxes", "mask")

    def ship(b):
        arrs = {k: np.ascontiguousarray(v) for k, v in b.items() if k in keep and isinstance(v, np.ndarray)}
        assert arrs["img"].dtype == np.uint8, arrs["img"].dtype
        return jax.device_put({k: jnp.asarray(v) for k, v in arrs.items()})

    # compile once on the first batch
    loader.set_epoch(2)
    it = iter(loader)
    first = ship(next(it))
    params, loss = step(variables, first)
    _ = np.asarray(loss)

    t0 = time.perf_counter()
    n = 0
    last_dev = first
    for ep in range(timed_epochs):
        loader.set_epoch(3 + ep)
        for b in it if ep == 0 else loader:
            dev = ship(b)
            params, loss = step(params, dev)  # async dispatch: next host batch builds while device runs
            last_dev = dev
            n += dev["img"].shape[0]
    _ = np.asarray(loss)
    fed_dt = time.perf_counter() - t0
    fed_rate = n / fed_dt

    # -- phase C: device-only roof (same compiled step, re-fed the last batch) --
    iters = 12
    t0 = time.perf_counter()
    for _ in range(iters):
        params, loss = step(params, last_dev)
    _ = np.asarray(loss)
    dev_dt = time.perf_counter() - t0
    dev_rate = batch * iters / dev_dt

    bound = min(host_rate, dev_rate)
    print(
        json.dumps(
            {
                "metric": f"e2e_feed_{model_name.split('.')[0]}_{imgsz}px_b{batch}_w{workers}"
                + ("_device_aug" if device_aug else ""),
                "host_img_per_s": round(host_rate, 1),
                "fed_img_per_s": round(fed_rate, 1),
                "device_img_per_s": round(dev_rate, 1),
                "overlap_efficiency": round(fed_rate / bound, 3) if bound else None,
                "cores_to_feed_device": round(dev_rate / host_rate, 1),
                "host_cores": os.cpu_count(),
                "n_images_timed": n,
            }
        )
    )


if __name__ == "__main__":
    main()
