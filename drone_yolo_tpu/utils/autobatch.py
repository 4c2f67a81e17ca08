"""AutoBatch: pick the largest batch fitting in device memory.

Capability parity with `ultralytics/utils/autobatch.py:14-107` — but instead of
empirically allocating CUDA memory and polyfitting, XLA tells us exactly: each
candidate batch is lowered+compiled and `memory_analysis()` reports the peak
bytes, no execution needed.
"""

from __future__ import annotations

import numpy as np

from drone_yolo_tpu.utils import LOGGER


def device_memory_bytes(default_gb: float = 16.0) -> int:
    """Best-effort accelerator memory size."""
    import jax

    d = jax.devices()[0]
    stats = None
    try:
        stats = d.memory_stats()
    except Exception:  # noqa: BLE001 - not all backends implement it
        stats = None
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    return int(default_gb * (1 << 30))


def check_train_batch_size(step_builder, imgsz: int = 640, fraction: float = 0.60, candidates=(1, 2, 4, 8, 16, 32, 64, 128)) -> int:
    """Return the largest candidate whose compiled train step fits in
    `fraction` of device memory (reference targets 60% CUDA memory).

    Args:
        step_builder: fn(batch_size) -> (jitted_fn, example_args) for one step.
    """
    import jax

    limit = device_memory_bytes() * fraction
    best = candidates[0]
    for b in candidates:
        try:
            fn, args = step_builder(b)
            lowered = fn.lower(*args)
            compiled = lowered.compile()
            analysis = compiled.memory_analysis()
            peak = getattr(analysis, "temp_size_in_bytes", 0) + getattr(analysis, "argument_size_in_bytes", 0) + getattr(
                analysis, "output_size_in_bytes", 0
            )
            if peak and peak < limit:
                best = b
                LOGGER.info(f"autobatch: batch {b} peak {peak / 1e9:.2f} GB < {limit / 1e9:.2f} GB ✓")
            elif peak:
                LOGGER.info(f"autobatch: batch {b} peak {peak / 1e9:.2f} GB exceeds budget ✗")
                break
        except Exception as e:  # noqa: BLE001 - OOM during compile etc.
            LOGGER.info(f"autobatch: batch {b} failed to compile ({type(e).__name__})")
            break
    LOGGER.info(f"autobatch: using batch {best}")
    return best
