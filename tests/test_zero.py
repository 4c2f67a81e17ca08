"""ZeRO-style sharded train state (beyond-reference; `zero=True`).

The reference's DDP replicates optimizer state on every rank. `zero=True`
shards optimizer moments, EMA weights and the grad accumulator over the
"data" mesh axis (place_state in parallel/mesh.py) while params stay
replicated — ZeRO-1/2 semantics expressed purely as sharding annotations.

Checks on the virtual 8-device CPU mesh:
(a) place_state(zero=True) actually shards the non-param subtrees and leaves
    params replicated,
(b) a jitted train step with pinned output shardings keeps the state sharded
    across steps and matches the fully-replicated run's loss trajectory,
(c) the full trainer path (YOLO.train(zero=True)) produces the same losses
    as zero=False and ends with sharded optimizer state.
"""

import csv
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from make_dataset import make_dataset

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _n_sharded(tree):
    return sum(not x.sharding.is_fully_replicated for x in jax.tree_util.tree_leaves(tree))


@pytest.mark.smoke
def test_place_state_zero_shards_non_param_subtrees():
    from drone_yolo_tpu.parallel.mesh import make_mesh, place_state

    mesh = make_mesh(devices=jax.devices()[:8])
    params = {"w": jnp.ones((3, 3, 16, 64)), "b": jnp.ones((64,)), "odd": jnp.ones((7,))}
    state = {
        "params": params,
        "opt": jax.tree_util.tree_map(jnp.zeros_like, params),
        "step": jnp.zeros((), jnp.int32),
    }
    placed = place_state(state, mesh, zero=True)
    # params replicated
    assert _n_sharded(placed["params"]) == 0
    # divisible moment leaves sharded over "data"; non-divisible (7,) replicated
    assert not placed["opt"]["w"].sharding.is_fully_replicated
    assert not placed["opt"]["b"].sharding.is_fully_replicated
    assert placed["opt"]["odd"].sharding.is_fully_replicated
    # trailing dim preferred: each shard holds 64/8 output channels
    assert placed["opt"]["w"].addressable_shards[0].data.shape == (3, 3, 16, 8)
    # zero=False unchanged: everything replicated
    placed_rep = place_state(state, mesh, zero=False)
    assert _n_sharded(placed_rep) == 0


@pytest.mark.smoke
def test_zero_step_matches_replicated_and_stays_sharded():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from drone_yolo_tpu.parallel.mesh import make_mesh, place_state
    from drone_yolo_tpu.utils.optimizer import label_tree, sgd_step

    mesh = make_mesh(devices=jax.devices()[:8])
    rng = np.random.default_rng(0)
    # host-side template: device_put of an already-placed jax.Array can alias it,
    # and the donated alias would be deleted before the second placement
    params = {
        "conv": {"kernel": rng.normal(size=(3, 3, 8, 32)).astype(np.float32)},
        "bias": {"bias": rng.normal(size=(32,)).astype(np.float32)},
    }
    labels = label_tree(params)
    x = jax.device_put(
        jnp.asarray(rng.normal(size=(16, 8)), jnp.float32), NamedSharding(mesh, P("data"))
    )

    def loss_fn(p, x):
        w = p["conv"]["kernel"].reshape(-1, 32)[: x.shape[1]]  # (8, 32)
        y = x @ w + p["bias"]["bias"]
        return jnp.mean(y**2)

    def step(state, x):
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], x)
        new_p, new_m = sgd_step(
            state["params"], grads, state["mom"], labels,
            jnp.float32(0.1), jnp.float32(0.1), jnp.float32(0.9), jnp.float32(0.0),
        )
        return {"params": new_p, "mom": new_m}, loss

    results = {}
    for zero in (False, True):
        state0 = {"params": params, "mom": jax.tree_util.tree_map(np.zeros_like, params)}
        state = place_state(state0, mesh, zero=zero)
        sh = jax.tree_util.tree_map(lambda a: a.sharding, state)
        fn = jax.jit(step, donate_argnums=(0,), out_shardings=(sh, None))
        losses = []
        for _ in range(5):
            state, loss = fn(state, x)
            losses.append(float(loss))
        results[zero] = (losses, state)
    np.testing.assert_allclose(results[True][0], results[False][0], rtol=1e-6)
    final = results[True][1]
    assert _n_sharded(final["mom"]) >= 2, "moments lost their sharding across steps"
    assert _n_sharded(final["params"]) == 0
    # numerically identical final params
    np.testing.assert_allclose(
        np.asarray(final["params"]["conv"]["kernel"]),
        np.asarray(results[False][1]["params"]["conv"]["kernel"]),
        rtol=1e-6,
    )


NO_AUG = dict(
    mosaic=0.0, mixup=0.0, copy_paste=0.0, fliplr=0.0, flipud=0.0, hsv_h=0.0,
    hsv_s=0.0, hsv_v=0.0, translate=0.0, scale=0.0, degrees=0.0, shear=0.0,
    perspective=0.0, erasing=0.0, bgr=0.0, multi_scale=False, amp=False,
    nbs=8,
)


def _train(tmp_path, data_yaml, name, zero, epochs=2):
    from drone_yolo_tpu import YOLO

    random.seed(0)
    np.random.seed(0)
    m = YOLO("yolov8n.yaml")
    m.train(
        data=str(data_yaml), epochs=epochs, imgsz=64, batch=8, workers=1,
        project=str(tmp_path), name=name, val=False, plots=False, verbose=False,
        warmup_epochs=0.0, seed=0, zero=zero, **NO_AUG,
    )
    rows = list(csv.DictReader(open(tmp_path / name / "results.csv")))
    losses = [
        float(r["train/box_loss"]) + float(r["train/cls_loss"]) + float(r["train/dfl_loss"])
        for r in rows
    ]
    return m, losses


def test_trainer_zero_flag_trajectory_and_sharding(tmp_path):
    yaml_path = make_dataset(tmp_path / "d", n_train=8, n_val=4, size=96, nc=4, seed=11)
    m0, loss_rep = _train(tmp_path, yaml_path, "rep", zero=False)
    m1, loss_zero = _train(tmp_path, yaml_path, "zero", zero=True)
    assert len(loss_rep) == len(loss_zero) >= 2
    np.testing.assert_allclose(loss_zero, loss_rep, rtol=2e-3, atol=2e-3)
    st = m1.trainer.state
    assert _n_sharded(st["opt"]) > 0, "trainer zero=True left optimizer state replicated"
    assert _n_sharded(st["ema"]) > 0
    assert _n_sharded(st["params"]) == 0
    # checkpoint save gathers sharded state transparently (single-process)
    host_opt = jax.device_get(st["opt"])
    assert all(np.isfinite(x).all() for x in jax.tree_util.tree_leaves(host_opt))
