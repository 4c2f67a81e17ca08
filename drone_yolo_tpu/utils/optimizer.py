"""Optimizers over pytrees with per-group hyperparameters fed as traced scalars.

Capability parity with the reference optimizer builder (`engine/trainer.py:764`):
three param groups — g0 conv/linear kernels (weight decay), g1 BN scales (no
decay), g2 biases (no decay, separate warmup lr) — plus a frozen group for BN
running stats. SGD matches torch's nesterov formulation; AdamW matches torch
AdamW. Learning rates and momentum arrive as *device scalars* each step, so the
per-batch warmup interpolation (trainer.py:366-376) never triggers recompiles.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def label_tree(variables: dict) -> dict:
    """Assign each leaf a group label by its path/name.

    kernel -> "decay"; BN scale -> "scale"; any bias -> "bias";
    BN mean/var -> "frozen" (updated by the BN-EMA merge, not the optimizer).
    """

    def walk(node, parent_key=""):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk(v, k)
            elif k in ("mean", "var"):
                out[k] = "frozen"
            elif k == "bias":
                out[k] = "bias"
            elif k == "scale":
                out[k] = "scale"
            else:
                out[k] = "decay"
        return out

    return walk(variables)


def init_momentum(variables):
    """Zero-initialized SGD momentum buffers matching the params pytree."""
    return jax.tree_util.tree_map(jnp.zeros_like, variables)


def sgd_step(params, grads, mom_buf, labels, lr_w, lr_b, momentum, weight_decay, nesterov: bool = True):
    """Torch-SGD with nesterov momentum + decoupled group lrs.

    lr_w applies to decay/scale groups, lr_b to the bias group; weight decay only
    to "decay". All hyperparameters are traced scalars.
    """

    def upd(p, g, m, lab):
        if lab == "frozen":
            return p, m
        g = g.astype(jnp.float32)
        if lab == "decay":
            g = g + weight_decay * p
        m = momentum * m + g
        step_dir = g + momentum * m if nesterov else m
        lr = lr_b if lab == "bias" else lr_w
        return p - lr * step_dir, m

    flat_p, tree = jax.tree_util.tree_flatten(params)
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_m = jax.tree_util.tree_leaves(mom_buf)
    flat_l = jax.tree_util.tree_leaves(labels)
    new_p, new_m = [], []
    for p, g, m, lab in zip(flat_p, flat_g, flat_m, flat_l):
        np_, nm_ = upd(p, g, m, lab)
        new_p.append(np_)
        new_m.append(nm_)
    return jax.tree_util.tree_unflatten(tree, new_p), jax.tree_util.tree_unflatten(tree, new_m)


def init_adam(variables):
    """Zero-initialized Adam state: first/second moments + timestep."""
    z = jax.tree_util.tree_map(jnp.zeros_like, variables)
    return {"m": z, "v": jax.tree_util.tree_map(jnp.zeros_like, variables), "t": jnp.zeros((), jnp.int32)}


def adamw_step(params, grads, state, labels, lr_w, lr_b, beta1, weight_decay, beta2: float = 0.999, eps: float = 1e-8):
    """Torch-AdamW semantics: decoupled weight decay p -= lr*wd*p on decay group."""
    t = state["t"] + 1
    bc1 = 1 - beta1**t.astype(jnp.float32)
    bc2 = 1 - beta2**t.astype(jnp.float32)

    def upd(p, g, m, v, lab):
        if lab == "frozen":
            return p, m, v
        g = g.astype(jnp.float32)
        m = beta1 * m + (1 - beta1) * g
        v = beta2 * v + (1 - beta2) * (g * g)
        lr = lr_b if lab == "bias" else lr_w
        step = lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        if lab == "decay":
            p = p - lr * weight_decay * p
        return p - step, m, v

    flat_p, tree = jax.tree_util.tree_flatten(params)
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_m = jax.tree_util.tree_leaves(state["m"])
    flat_v = jax.tree_util.tree_leaves(state["v"])
    flat_l = jax.tree_util.tree_leaves(labels)
    ps, ms, vs = [], [], []
    for p, g, m, v, lab in zip(flat_p, flat_g, flat_m, flat_v, flat_l):
        np_, nm_, nv_ = upd(p, g, m, v, lab)
        ps.append(np_)
        ms.append(nm_)
        vs.append(nv_)
    unf = partial(jax.tree_util.tree_unflatten, tree)
    return unf(ps), {"m": unf(ms), "v": unf(vs), "t": t}


def clip_global_norm(grads, max_norm: float = 10.0):
    """Global-norm gradient clipping (reference trainer.py:594 clip_grad_norm_)."""
    leaves = jax.tree_util.tree_leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), gnorm


def build_lr_fn(cfg, epochs: int):
    """Epoch -> lr fraction (reference trainer.py:210: linear or one_cycle cosine)."""
    lrf = cfg.lrf
    if cfg.cos_lr:
        return lambda e: lrf + 0.5 * (1 - lrf) * (1 + math.cos(math.pi * e / epochs))
    return lambda e: max(1 - e / epochs, 0) * (1.0 - lrf) + lrf


def auto_optimizer(cfg, nc: int, iterations: float):
    """'auto' optimizer selection (reference trainer.py:789-801)."""
    name = str(cfg.optimizer)
    lr0, momentum = cfg.lr0, cfg.momentum
    if name.lower() == "auto":
        lr_fit = round(0.002 * 5 / (4 + nc), 6)
        if iterations > 10000:
            name, lr0, momentum = "SGD", 0.01, 0.9
        else:
            name, lr0, momentum = "AdamW", lr_fit, 0.9
        # warmup_bias_lr must not exceed 0.01 with Adam (reference trainer.py:801)
        cfg.warmup_bias_lr = 0.0
    return name, lr0, momentum
