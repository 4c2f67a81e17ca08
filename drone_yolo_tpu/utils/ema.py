"""Exponential moving average of the full variables tree.

Capability parity with `ultralytics/utils/torch_utils.py:515` (ModelEMA): decay
0.9999 with a 2000-step exponential ramp; BN running stats ride along (torch EMAs
every floating state_dict entry, which includes buffers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_tree, new_tree, step, decay: float = 0.9999, tau: float = 2000.0):
    """ema = d*ema + (1-d)*new with d = decay*(1 - exp(-step/tau))."""
    d = decay * (1.0 - jnp.exp(-step.astype(jnp.float32) / tau))
    return jax.tree_util.tree_map(lambda e, p: d * e + (1.0 - d) * p.astype(e.dtype), ema_tree, new_tree)


class EarlyStopping:
    """Stop when fitness stalls for `patience` epochs (reference torch_utils.py:733)."""

    def __init__(self, patience: int = 100):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: float | None) -> bool:
        if fitness is None:
            return False
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        stop = (epoch - self.best_epoch) >= self.patience
        return stop
