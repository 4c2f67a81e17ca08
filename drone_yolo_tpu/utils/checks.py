"""Validation/check helpers (reference `ultralytics/utils/checks.py` subset that
is meaningful on a zero-egress TPU image: imgsz/version/suffix checks, device
report, numeric-stability check replacing check_amp)."""

from __future__ import annotations

import math
import platform
import re
from pathlib import Path

from drone_yolo_tpu.utils import LOGGER, colorstr


def resolve_dtype(half):
    """bf16/f32 selection: explicit half flag wins; None = auto (bf16 on TPU
    backends — the deployment numerics — f32 on CPU where parity tests run).

    The auto default deviates from the reference's half=False val/predict
    default (cfg/default.yaml:implied False), so the resolution is logged once
    per process: small metric shifts on TPU are attributable (PARITY.md §half).
    """
    import jax
    import jax.numpy as jnp

    if half is None:
        dtype = jnp.bfloat16 if jax.default_backend() in ("tpu", "axon") else jnp.float32
        global _DTYPE_LOGGED
        if not _DTYPE_LOGGED:
            from drone_yolo_tpu.utils import LOGGER

            LOGGER.info(f"half=auto resolved to {'bf16' if dtype == jnp.bfloat16 else 'fp32'} on backend '{jax.default_backend()}' (pass half=False to force fp32)")
            _DTYPE_LOGGED = True
        return dtype
    return jnp.bfloat16 if half else jnp.float32


_DTYPE_LOGGED = False


def check_imgsz(imgsz, stride: int = 32, min_dim: int = 1, max_dim: int = 2, floor: int = 0):
    """Round image size up to a multiple of the max stride (reference checks.py:112)."""
    stride = int(stride)
    if isinstance(imgsz, (int, float)):
        imgsz = [int(imgsz)]
    elif isinstance(imgsz, (list, tuple)):
        imgsz = [int(x) for x in imgsz]
    else:
        raise TypeError(f"imgsz={imgsz!r} must be int or list")
    sz = [max(math.ceil(x / stride) * stride, floor) for x in imgsz]
    if sz != list(imgsz):
        LOGGER.warning(f"imgsz={imgsz} must be multiple of max stride {stride}, updating to {sz}")
    if min_dim == 2 and len(sz) == 1:
        sz = [sz[0], sz[0]]
    return sz[0] if max_dim == 1 else sz


def parse_version(version: str = "0.0.0"):
    """Version string -> (major, minor, patch) int tuple ('2.0.1+cpu' -> (2, 0, 1))."""
    return tuple(int(x) for x in re.findall(r"\d+", version)[:3])


def check_version(current: str, required: str = "", name: str = "version", hard: bool = False) -> bool:
    """Compare versions with >=, <=, ==, ranges (reference checks.py:221)."""
    if not required:
        return True
    c = parse_version(current)
    ok = True
    for r in required.split(","):
        m = re.match(r"([^0-9]*)([\d.]+)", r.strip())
        op, v = m.group(1).strip() or ">=", parse_version(m.group(2))
        ok &= {"==": c == v, "!=": c != v, ">=": c >= v, "<=": c <= v, ">": c > v, "<": c < v}[op]
    if not ok and hard:
        raise ModuleNotFoundError(f"{name}{required} required, found {current}")
    return ok


def check_suffix(file, suffix=(".npz",), msg: str = ""):
    """Assert file suffix(es)."""
    if file and suffix:
        if isinstance(suffix, str):
            suffix = (suffix,)
        for f in file if isinstance(file, (list, tuple)) else [file]:
            s = Path(f).suffix.lower().strip()
            if s:
                assert s in suffix, f"{msg}{f} acceptable suffix is {suffix}, not {s}"


def check_yaml(file, suffix=(".yaml", ".yml")):
    """Assert the path has a YAML suffix and return it."""
    check_suffix(file, suffix)
    return file


def check_numeric_stability(model, variables, imgsz: int = 64, tol: float = 2e-2) -> bool:
    """bf16-vs-fp32 consistency probe — the TPU analog of the reference's
    check_amp FP32-vs-AMP comparison (checks.py:651)."""
    import numpy as np
    import jax.numpy as jnp

    from drone_yolo_tpu.nn import modules as M

    x = jnp.asarray(np.random.default_rng(0).random((1, imgsz, imgsz, 3), np.float32))
    out32 = model.apply(variables, x, ctx=M.Ctx(train=False, dtype=jnp.float32))
    out16 = model.apply(variables, x, ctx=M.Ctx(train=False, dtype=jnp.bfloat16))
    a = np.asarray(out32[0] if isinstance(out32, tuple) else out32, np.float32)
    b = np.asarray(out16[0] if isinstance(out16, tuple) else out16, np.float32)
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    ok = bool(rel < tol)
    if not ok:
        LOGGER.warning(f"bf16 check: relative deviation {rel:.4f} exceeds {tol}; consider dtype=float32")
    return ok


def collect_system_info() -> str:
    """Human-readable platform/python/jax/devices summary for bug reports."""
    import jax

    lines = [
        f"platform {platform.platform()}",
        f"python {platform.python_version()}",
        f"jax {jax.__version__} backend={jax.default_backend()}",
        f"devices {[str(d) for d in jax.devices()]}",
    ]
    info = "\n".join(lines)
    LOGGER.info(info)
    return info


def print_args(args: dict | None = None):
    """Log a k=v summary of the merged run arguments."""
    if args:
        LOGGER.info(colorstr("args: ") + ", ".join(f"{k}={v}" for k, v in args.items()))
