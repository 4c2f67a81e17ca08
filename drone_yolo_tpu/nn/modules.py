"""TPU-native NN module zoo (NHWC, functional pytrees, bf16 MXU compute).

Capability parity with `ultralytics/nn/modules/{conv,block,head}.py` — but NOT a
port. Differences that make this TPU-first:

* **Functional**: each module is a static config object; parameters live in a
  nested-dict pytree (`init(key) -> vars`, `__call__(vars, x, ctx) -> y`). The whole
  network traces once under `jax.jit`; there is no per-call Python layer loop at
  runtime.
* **NHWC layout** with HWIO kernels — the layout XLA:TPU tiles best onto the MXU.
* **Mixed precision by construction**: activations flow in `ctx.dtype` (bfloat16 by
  default), convs accumulate in fp32 (`preferred_element_type`), BN/statistics in
  fp32. No GradScaler — bf16 has fp32's exponent range.
* **BatchNorm under SPMD**: stats are computed with `jnp.mean` over the *global*
  batch; under a sharded-data mesh XLA inserts the cross-replica reduction, giving
  synced BN for free (the torch DDP reference uses per-GPU stats).
* **Deploy-time fusion is a weight transform**: `fuse_vars` folds BN into conv
  kernels and collapses RepVGG branches *before* jit, so the compiled inference
  graph only ever sees single convs (reference does this with module surgery,
  `block.py:1421` switch_to_deploy).

Reference file:line pointers are cited per class for the parity audit.
"""

from __future__ import annotations

import math
import os
import zlib
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3  # reference: initialize_weights sets BatchNorm2d eps=1e-3 (torch_utils.py)
BN_MOMENTUM = 0.03  # reference: momentum=0.03

_S2_KINDS = {(1, 0), (3, 1)}  # (k, p) combos covered by ops.conv_s2 (== S2_GRAD_KINDS)


# ---------------------------------------------------------------------------
# Trace context
# ---------------------------------------------------------------------------
@dataclass
class Ctx:
    """Per-trace context threaded through module calls.

    `updates` collects (path -> (batch_mean, batch_var)) from BatchNorms in train
    mode; the train step folds them into the running stats (EMA) after the
    gradient step. This keeps `__call__` single-return while staying functional.
    `text` carries text embeddings (B, nc, ct) for open-vocabulary (world) heads.
    """

    train: bool = False
    dtype: Any = jnp.bfloat16
    updates: dict = field(default_factory=dict)
    text: Any = None
    targets: Any = None  # padded GT dict for heads needing train-time targets (RT-DETR CDN)
    rng: Any = None  # PRNG key for train-time stochastic heads
    aux: dict = field(default_factory=dict)  # head -> extra train outputs (e.g. dn_meta)


def autopad(k: int, p: int | None = None, d: int = 1) -> int:
    """'same' padding (reference conv.py:28)."""
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2 if p is None else p


def _child_key(key, name: str):
    """Deterministic per-child PRNG key (stable across processes)."""
    return jax.random.fold_in(key, zlib.crc32(name.encode()) & 0x7FFFFFFF)


def silu(x):
    """SiLU activation x * sigmoid(x) (the reference default, conv.py:39)."""
    return x * jax.nn.sigmoid(x)


class Module:
    """Minimal functional module: static config + pytree params.

    Children are discovered by scanning instance attributes for Module instances
    (or lists of them); `init` composes child params under matching dict keys, and
    `set_paths` assigns dotted paths used by BN-stat collection and checkpoint
    naming (layout mirrors the torch state_dict naming for easy conversion).
    """

    path: str = ""

    def children(self):
        out = {}
        for name, val in vars(self).items():
            if isinstance(val, Module):
                out[name] = val
            elif isinstance(val, (list, tuple)) and val and all(isinstance(m, Module) for m in val):
                out[name] = list(val)
        return out

    def set_paths(self, prefix: str = ""):
        self.path = prefix
        for name, child in self.children().items():
            if isinstance(child, list):
                for i, m in enumerate(child):
                    m.set_paths(f"{prefix}.{name}.{i}" if prefix else f"{name}.{i}")
            else:
                child.set_paths(f"{prefix}.{name}" if prefix else name)

    def init(self, key):
        """Default init: compose children. Leaves override."""
        v = {}
        for name, child in self.children().items():
            if isinstance(child, list):
                v[name] = {str(i): m.init(_child_key(key, f"{name}.{i}")) for i, m in enumerate(child)}
            else:
                v[name] = child.init(_child_key(key, name))
        return v

    def _map_child_vars(self, v, method: str):
        out = dict(v)
        for name, child in self.children().items():
            if name not in v:
                continue
            if isinstance(child, list):
                out[name] = {str(i): getattr(m, method)(v[name][str(i)]) for i, m in enumerate(child)}
            else:
                out[name] = getattr(child, method)(v[name])
        return out

    def fuse_vars(self, v):
        """Default fusion: recurse into children. Leaves override."""
        return self._map_child_vars(v, "fuse_vars")

    def pad_vars(self, v):
        """Masters -> lane-padded masters (padded-state mode; see
        BaseModel.pad_variables). Default: recurse. Leaves override."""
        return self._map_child_vars(v, "pad_vars")

    def unpad_vars(self, v):
        """Lane-padded masters -> canonical masters (checkpoint save under
        padded-state mode). Exact inverse of pad_vars. Default: recurse."""
        return self._map_child_vars(v, "unpad_vars")

    def __call__(self, v, x, ctx: Ctx):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------
_S2_CUSTOM_GRAD = os.environ.get("DYT_S2GRAD", "0") == "1"  # DYT_S2GRAD=1 -> custom s2 VJP (opt-in)


def conv2d(x, w, s: int = 1, p: int = 0, d: int = 1, g: int = 1):
    """NHWC conv with HWIO kernel. Output dtype == input dtype; the TPU MXU
    accumulates bf16 x bf16 in fp32 internally, so no explicit
    preferred_element_type is needed (and uniform dtypes keep the transpose
    convs of the backward pass well-typed).

    With DYT_S2GRAD=1 stride-2 convs route through `ops.conv_s2.conv2d_s2`
    (identical forward, custom layout-preserving VJP) — an attack on XLA's
    dim-split stride-2 backward (69% of the flagship train step as relayout
    copies, ROUND3.md §2). Measured on-chip (tools/s2grad_probe.py) the
    einsum formulation is 4-6x SLOWER than the stock backward in isolation,
    so the dispatch is opt-in until a faster (Pallas) formulation lands."""
    if _S2_CUSTOM_GRAD and s == 2 and d == 1 and (w.shape[0], p) in _S2_KINDS and w.shape[0] == w.shape[1]:
        from drone_yolo_tpu.ops.conv_s2 import conv2d_s2

        return conv2d_s2(x, w, p, g)
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(s, s),
        padding=((p, p), (p, p)),
        rhs_dilation=(d, d),
        feature_group_count=g,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


SP_SAFE_POOL = False


def set_sp_safe_pool(enable: bool) -> None:
    """Route max pooling through the shifted-slice/argmax formulation whose
    backward partitions exactly under a "space" mesh axis.

    GSPMD mispartitions SelectAndScatter — the reduce-window-max VJP — when
    the H dim is sharded (measured 1.9e-1 rel grad error; conv/BN/resize/
    avg-pool all partition exactly). The replacement stacks the k*k shifted
    slices and gathers the FIRST max per window (row-major window order, the
    same tie-break SelectAndScatter uses), so values AND tie subgradients are
    bit-identical to the default path on one device, and exact (~2e-7) under
    spatial sharding. Set by the trainer when sp>1 and by spatial_forward;
    affects subsequently TRACED functions only.
    """
    global SP_SAFE_POOL
    SP_SAFE_POOL = enable


def max_pool2d(x, k: int, s: int = 1, p: int = 0):
    """NHWC max pool with torch-style symmetric padding.

    The init value MUST be a python scalar -inf (not a jnp array): JAX's
    reduce-window-max autodiff rule pattern-matches the monoid (max, -inf)
    and falls back to a non-differentiable generic path otherwise.
    """
    neg = -float("inf") if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    if SP_SAFE_POOL:
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), constant_values=neg) if p else x
        oh = (xp.shape[1] - k) // s + 1
        ow = (xp.shape[2] - k) // s + 1
        sls = [
            jax.lax.slice(
                xp,
                (0, dy, dx, 0),
                (xp.shape[0], dy + (oh - 1) * s + 1, dx + (ow - 1) * s + 1, xp.shape[3]),
                (1, s, s, 1),
            )
            for dy in range(k)
            for dx in range(k)
        ]
        stk = jnp.stack(sls)  # (k*k, B, oh, ow, C) — row-major window order
        idx = jnp.argmax(stk, axis=0)  # first max == SelectAndScatter tie order
        return jnp.take_along_axis(stk, idx[None], axis=0)[0]
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, s, s, 1),
        padding=((0, 0), (p, p), (p, p), (0, 0)),
    )


def _kaiming_uniform(key, shape, fan_in):
    """Torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), ...)."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _bn_init(c):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def _bn_apply(bn, x, ctx: Ctx, path: str):
    """BatchNorm over NHW with fp32 statistics. Train mode taps batch stats into
    ctx.updates.

    Train-mode stats are computed as two *independent* reductions (sum and
    sum-of-squares, fp32 accumulation) rather than mean-then-variance: with no
    data dependence between them XLA multi-output-fuses both into a single
    sweep that reads the activation in its compute dtype (bf16 on TPU), instead
    of two serial passes over an fp32-materialized copy. On the flagship P2
    model the stat passes over the 320^2/160^2 activations were 28% of the
    train step before this change. var = E[x^2] - E[x]^2 in fp32 is well within
    the 2e-3 loss-parity tolerance (activations are O(1) post-BN), and the
    analytic gradient is identical to the two-pass form.
    """
    xf = x.astype(jnp.float32)
    if ctx.train:
        n = x.shape[0] * x.shape[1] * x.shape[2]
        s1 = jnp.sum(xf, axis=(0, 1, 2))
        s2 = jnp.sum(jnp.square(xf), axis=(0, 1, 2))
        mean = s1 / n
        var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
        ctx.updates[path] = (mean, var)
    else:
        mean = jax.lax.stop_gradient(bn["mean"])
        var = jax.lax.stop_gradient(bn["var"])
    inv = jax.lax.rsqrt(var + BN_EPS) * bn["scale"]
    return ((xf - mean) * inv + bn["bias"]).astype(ctx.dtype)


def _bn_fold(bn, w):
    """Fold BN into a conv: returns (w_scaled, bias). w is HWIO."""
    inv = bn["scale"] / jnp.sqrt(bn["var"] + BN_EPS)
    return w * inv[None, None, None, :], bn["bias"] - bn["mean"] * inv


def _bn_pad(bn, n):
    """Zero-pad BN params to n channels (lane padding, enable_lane_pad).

    All pads are zeros — including `var`: the padded channels carry exact-zero
    activations, so train-mode batch var is 0 and eval-mode inv = rsqrt(eps) *
    scale_pad(=0) = 0, keeping padded outputs exactly zero in both modes."""
    d = n - bn["scale"].shape[0]
    return {k: jnp.pad(v, (0, d)) for k, v in bn.items()}


def _pad_blocks(a, axis, c, pc, nb):
    """Zero-pad each of nb contiguous channel blocks (width c -> pc) along axis."""
    axis = axis % a.ndim
    shape = a.shape
    a = a.reshape(*shape[:axis], nb, c, *shape[axis + 1 :])
    pads = [(0, 0)] * a.ndim
    pads[axis + 1] = (0, pc - c)
    a = jnp.pad(a, pads)
    return a.reshape(*shape[:axis], nb * pc, *shape[axis + 1 :])


def _unpad_blocks(a, axis, c, pc, nb):
    """Exact inverse of _pad_blocks: strip each block back to width c."""
    axis = axis % a.ndim
    shape = a.shape
    a = a.reshape(*shape[:axis], nb, pc, *shape[axis + 1 :])
    idx = tuple([slice(None)] * (axis + 1) + [slice(0, c)])
    a = a[idx]
    return a.reshape(*shape[:axis], nb * c, *shape[axis + 1 :])


def _pad_row_map(k, in_map):
    """Zero-pad kernel C_in rows per an irregular (canonical, padded) block map."""
    blocks, off = [], 0
    for c_blk, pc_blk in in_map:
        blk = k[:, :, off : off + c_blk, :]
        if pc_blk > c_blk:
            blk = jnp.pad(blk, ((0, 0), (0, 0), (0, pc_blk - c_blk), (0, 0)))
        blocks.append(blk)
        off += c_blk
    return jnp.concatenate(blocks, axis=2)


def _unpad_row_map(k, in_map):
    """Exact inverse of _pad_row_map."""
    blocks, off = [], 0
    for c_blk, pc_blk in in_map:
        blocks.append(k[:, :, off : off + c_blk, :])
        off += pc_blk
    return jnp.concatenate(blocks, axis=2)


def _dense_group_expand(k, cin_padded, c1, c2, g):
    """Grouped kernel (k,k,c1/g,c2) -> dense block-diagonal (k,k,cin_padded,c2)
    via one einsum against a constant scatter mask (dense_pad_in)."""
    cin_g, co_g = c1 // g, c2 // g
    e = np.zeros((cin_padded, cin_g, c2), np.float32)
    for gi in range(g):
        for j in range(cin_g):
            e[gi * cin_g + j, j, gi * co_g : (gi + 1) * co_g] = 1.0
    return jnp.einsum("hwjc,ijc->hwic", k, jnp.asarray(e, k.dtype))


# ---------------------------------------------------------------------------
# Conv family
# ---------------------------------------------------------------------------
class Conv2dRaw(Module):
    """Bare conv (optional bias), the torch nn.Conv2d analog for head output layers."""

    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, d=1, bias=True):
        self.c1, self.c2, self.k, self.s, self.g, self.d = c1, c2, k, s, g, d
        self.p = autopad(k, p, d)
        self.bias = bias
        self.pad_in_ok = False  # lane padding (enable_lane_pad) — see Conv

    def init(self, key):
        fan_in = self.c1 // self.g * self.k * self.k
        v = {"kernel": _kaiming_uniform(_child_key(key, "w"), (self.k, self.k, self.c1 // self.g, self.c2), fan_in)}
        if self.bias:
            v["bias"] = _kaiming_uniform(_child_key(key, "b"), (self.c2,), fan_in)
        return v

    def __call__(self, v, x, ctx: Ctx):
        k = v["kernel"]
        if self.pad_in_ok and x.shape[-1] > self.c1:
            if self.g == 1:
                self._pad_in_seen = x.shape[-1]
                if k.shape[2] != x.shape[-1]:  # padded-state masters skip the in-step pad
                    k = jnp.pad(k, ((0, 0), (0, 0), (0, x.shape[-1] - k.shape[2]), (0, 0)))
            else:
                x = x[..., : self.c1]
        y = conv2d(x.astype(ctx.dtype), k, self.s, self.p, self.d, self.g)
        if "bias" in v:
            y = y + v["bias"]
        return y.astype(ctx.dtype)

    def pad_vars(self, v):
        seen = getattr(self, "_pad_in_seen", 0)
        if self.pad_in_ok and self.g == 1 and seen > v["kernel"].shape[2]:
            return dict(v, kernel=jnp.pad(v["kernel"], ((0, 0), (0, 0), (0, seen - v["kernel"].shape[2]), (0, 0))))
        return v

    def unpad_vars(self, v):
        if self.pad_in_ok and self.g == 1 and v["kernel"].shape[2] > self.c1:
            return dict(v, kernel=v["kernel"][:, :, : self.c1, :])
        return v


def _spd_rearrange(x, groups: int = 1):
    """(B,H,W,C) -> (B,H/2,W/2,4C) space-to-depth, slot-within-group order.

    Output channel layout per group: suby*(2*cpg) + subx*cpg + c, matching
    `_spd_kernel`'s tap placement. For groups>1 the four spatial slots of each
    group stay contiguous so a grouped 2x2 conv sees them as one contraction.
    """
    b, h, w, c = x.shape
    cpg = c // groups
    xs = x.reshape(b, h // 2, 2, w // 2, 2, groups, cpg)
    return xs.transpose(0, 1, 3, 5, 2, 4, 6).reshape(b, h // 2, w // 2, 4 * c)


def _spd_kernel(w):
    """(3,3,Cin,Cout) -> (2,2,4*Cin,Cout) for the k3 s2 p1 -> k2 s1 SPD form.

    y(i,j) = sum_{dy,dx in -1..1} W[dy+1,dx+1] . X[2i+dy, 2j+dx]
    with X[r,s,c] = Xspd[r//2, s//2, (r%2)*(2*Cin) + (s%2)*Cin + c]:
    each original tap maps to a unique (ky',kx',slot) position; the top/left
    pad row of the SPD tensor reproduces the original zero padding. Slots the
    stride-2 window never reads stay zero. Works per-group (pass the
    per-group Cin slice of a grouped kernel)."""
    k3, _, cin, cout = w.shape
    out = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for ky in range(3):
        kyp, suby = (0, 1) if ky == 0 else (1, ky - 1)
        for kx in range(3):
            kxp, subx = (0, 1) if kx == 0 else (1, kx - 1)
            ch = suby * (2 * cin) + subx * cin
            out = out.at[kyp, kxp, ch : ch + cin, :].set(w[ky, kx])
    return out


def _spd_conv2d(xs, w, g: int = 1):
    """2x2 stride-1 conv over an `_spd_rearrange`d tensor — EXACTLY the
    k3 s2 p1 conv with kernel w (3,3,Cin/g,Cout)."""
    return jax.lax.conv_general_dilated(
        xs, _spd_kernel(w).astype(xs.dtype), window_strides=(1, 1), padding=((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=g,
    )


def _spd_conv2d_1x1(xs, w, g: int = 1):
    """1x1 stride-2 conv (p=0) over an `_spd_rearrange`d tensor: only the
    (suby=0, subx=0) slot of each group is read."""
    cpg = w.shape[2]
    kern = jnp.zeros((1, 1, 4 * cpg, w.shape[3]), w.dtype)
    kern = kern.at[:, :, :cpg, :].set(w)
    return jax.lax.conv_general_dilated(
        xs, kern.astype(xs.dtype), window_strides=(1, 1), padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=g,
    )


class Conv(Module):
    """Conv2d + BN + SiLU (reference conv.py:37). Fused form: conv + bias + SiLU.

    `spd=True` (set by BaseModel.enable_spd_stride2 on k3 s2 p1 convs) swaps
    execution for the space-to-depth reformulation — bit-identical math with
    4x the contraction depth and none of the stride-2 backward layout copies
    XLA emits at small channel counts (xprof: the s2 wgrads dominated the
    flagship's P1/P2 time)."""

    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, d=1, act=True):
        self.c1, self.c2, self.k, self.s, self.g, self.d = c1, c2, k, s, g, d
        self.p = autopad(k, p, d)
        self.act = act
        self.spd = False
        # lane padding (enable_lane_pad): pad_out > 0 zero-pads the kernel /
        # BN params to pad_out output channels INSIDE the traced step (the
        # canonical params pytree is untouched — grads through the pad are
        # exact slices). pad_in_ok lets the module accept an input carrying
        # exact-zero padded channels: g==1 pads kernel C_in rows with zeros,
        # grouped convs slice the zeros away (both exact).
        # Block specs generalize tail pads for positional consumers (C2f's
        # chunk split/concat): (orig_block, padded_block, n_blocks) pads each
        # of n_blocks channel blocks from orig_block to padded_block channels.
        self.pad_out = 0
        self.pad_in_ok = False
        self.pad_out_spec = None  # overrides pad_out when set
        self.pad_in_spec = None
        # pad_in_map: list of (canonical, padded) channel-block widths — for
        # consumers of a Concat whose inputs are heterogeneously padded (the
        # kernel rows are split per block and zero-padded in place, so the
        # Concat never has to materialize trimmed copies of its inputs).
        self.pad_in_map = None
        # dense_pad_in: grouped conv consuming a padded input executes as a
        # dense conv with the block-diagonal expansion of its grouped kernel
        # (zero rows at padded positions) — avoids materializing a slice of
        # the big padded activation just to preserve the group partition.
        self.dense_pad_in = False

    def init(self, key):
        fan_in = self.c1 // self.g * self.k * self.k
        return {
            "conv": {"kernel": _kaiming_uniform(key, (self.k, self.k, self.c1 // self.g, self.c2), fan_in)},
            "bn": _bn_init(self.c2),
        }

    def _out_spec(self):
        if self.pad_out_spec:
            return self.pad_out_spec
        if self.pad_out and self.pad_out > self.c2:
            return (self.c2, self.pad_out, 1)
        return None

    def __call__(self, v, x, ctx: Ctx):
        x = x.astype(ctx.dtype)
        k = v["conv"]["kernel"]
        groups = self.g
        # every pad below skips when the master already carries it
        # (padded-state mode, BaseModel.pad_variables)
        if self.pad_in_map and x.shape[-1] > self.c1:
            if k.shape[2] != sum(pc for _, pc in self.pad_in_map):
                k = _pad_row_map(k, self.pad_in_map)
        elif self.pad_in_spec:
            c, pc, nb = self.pad_in_spec
            if k.shape[2] != nb * pc:
                k = _pad_blocks(k, 2, c, pc, nb)
        elif self.pad_in_ok and x.shape[-1] > self.c1:
            if self.g == 1:
                self._pad_in_seen = x.shape[-1]
                if k.shape[2] != x.shape[-1]:
                    k = jnp.pad(k, ((0, 0), (0, 0), (0, x.shape[-1] - k.shape[2]), (0, 0)))
            elif self.dense_pad_in:
                # one einsum against a constant block-diagonal scatter mask
                # (a DUS-per-group loop compiles slowly and serializes); the
                # grouped master stays canonical even in padded-state mode —
                # off-block slots of a dense master would RECEIVE gradients
                k = _dense_group_expand(k, x.shape[-1], self.c1, self.c2, self.g)
                groups = 1
            else:
                x = x[..., : self.c1]
        spec = self._out_spec()
        bn_in_step = False
        if spec:
            c, pc, nb = spec
            if k.shape[-1] != nb * pc:
                k = _pad_blocks(k, -1, c, pc, nb)
            bn_params = v["bn"]["scale"] if "bn" in v else v["conv"].get("bias")
            bn_in_step = bn_params is not None and bn_params.shape[0] != nb * pc
        if self.spd:
            assert spec is None and not self.pad_in_ok and not self.pad_in_spec, (
                "spd and lane_pad are mutually exclusive"
            )
            y = _spd_conv2d(_spd_rearrange(x, self.g), v["conv"]["kernel"], self.g)
        else:
            y = conv2d(x, k, self.s, self.p, self.d, groups)

        if "bn" in v:
            bn = {kk: _pad_blocks(vv, 0, c, pc, nb) for kk, vv in v["bn"].items()} if bn_in_step else v["bn"]
            y = _bn_apply(bn, y, ctx, f"{self.path}.bn")
            if bn_in_step and ctx.train:
                # tapped batch stats back to canonical width for merge_bn_updates
                # (padded-state masters keep padded running stats: no strip)
                bm, bv = ctx.updates[f"{self.path}.bn"]
                ctx.updates[f"{self.path}.bn"] = (_unpad_blocks(bm, 0, c, pc, nb), _unpad_blocks(bv, 0, c, pc, nb))
        else:
            b = _pad_blocks(v["conv"]["bias"], 0, c, pc, nb) if bn_in_step else v["conv"]["bias"]
            y = (y + b).astype(ctx.dtype)
        if self.act is True:
            return silu(y)
        if self.act == "relu":
            return jax.nn.relu(y)
        return y

    def pad_vars(self, v):
        k = v["conv"]["kernel"]
        seen = getattr(self, "_pad_in_seen", 0)
        if self.pad_in_map:
            if k.shape[2] != sum(pc for _, pc in self.pad_in_map):
                k = _pad_row_map(k, self.pad_in_map)
        elif self.pad_in_spec:
            c, pc, nb = self.pad_in_spec
            if k.shape[2] != nb * pc:
                k = _pad_blocks(k, 2, c, pc, nb)
        elif self.pad_in_ok and self.g == 1 and seen > k.shape[2]:
            k = jnp.pad(k, ((0, 0), (0, 0), (0, seen - k.shape[2]), (0, 0)))
        out = {"conv": dict(v["conv"], kernel=k)}
        spec = self._out_spec()
        if spec and not self.spd:
            c, pc, nb = spec
            if out["conv"]["kernel"].shape[-1] != nb * pc:
                out["conv"]["kernel"] = _pad_blocks(out["conv"]["kernel"], -1, c, pc, nb)
            if "bias" in v["conv"] and v["conv"]["bias"].shape[0] != nb * pc:
                out["conv"]["bias"] = _pad_blocks(v["conv"]["bias"], 0, c, pc, nb)
            if "bn" in v and v["bn"]["scale"].shape[0] != nb * pc:
                out["bn"] = {kk: _pad_blocks(vv, 0, c, pc, nb) for kk, vv in v["bn"].items()}
                return out
        if "bn" in v:
            out["bn"] = v["bn"]
        return out

    def unpad_vars(self, v):
        k = v["conv"]["kernel"]
        spec = self._out_spec()
        bn = v.get("bn")
        bias = v["conv"].get("bias")
        if spec and not self.spd:
            c, pc, nb = spec
            if k.shape[-1] == nb * pc:
                k = _unpad_blocks(k, -1, c, pc, nb)
            if bias is not None and bias.shape[0] == nb * pc:
                bias = _unpad_blocks(bias, 0, c, pc, nb)
            if bn is not None and bn["scale"].shape[0] == nb * pc:
                bn = {kk: _unpad_blocks(vv, 0, c, pc, nb) for kk, vv in bn.items()}
        if self.pad_in_map:
            if k.shape[2] == sum(pc for _, pc in self.pad_in_map):
                k = _unpad_row_map(k, self.pad_in_map)
        elif self.pad_in_spec:
            c, pc, nb = self.pad_in_spec
            if k.shape[2] == nb * pc:
                k = _unpad_blocks(k, 2, c, pc, nb)
        elif self.pad_in_ok and self.g == 1 and k.shape[2] > self.c1:
            k = k[:, :, : self.c1, :]
        out = {"conv": dict(v["conv"], kernel=k)}
        if bias is not None:
            out["conv"]["bias"] = bias
        if bn is not None:
            out["bn"] = bn
        return out

    def fuse_vars(self, v):
        if "bn" not in v:
            return v
        w, b = _bn_fold(v["bn"], v["conv"]["kernel"])
        return {"conv": {"kernel": w, "bias": b}}


class SPDConv(Conv):
    """Space-to-depth execution of a stride-2 3x3 stem conv — an EXACT
    reformulation, not an architecture change (VERDICT r2 next #4).

    The stem conv sees C_in=3: on the MXU that wastes nearly the whole 128-wide
    contraction lane, and at 640px the stem is the largest activation in the
    network (HBM-bound). Rearranging (B,H,W,3)->(B,H/2,W/2,12) and running an
    equivalent 2x2 stride-1 conv (top/left pad 1) quadruples the contraction
    depth and quarters the spatial extent. The 2x2x12xC kernel is BUILT FROM
    the original 3x3x3xC parameters inside the traced step:
      y(i,j) = sum_{dy,dx in -1..1} W[dy+1,dx+1,c] * X[2i+dy, 2j+dx, c]
      with X[r,s,c] = Xspd[r//2, s//2, (r%2)*6 + (s%2)*3 + c]
      => dy=-1 -> (ky'=0, suby=1); dy=0 -> (1,0); dy=1 -> (1,1)  (same in x),
    so each tap maps to a unique transformed slot and the (0,*sub=0*) slots
    stay zero. Parameters, gradients, BN, and checkpoints are IDENTICAL to the
    plain Conv (golden-tested in tests/test_spd_stem.py); only the compute
    schedule changes. Enable via BaseModel.enable_spd_stem().
    """

    def __init__(self, conv: "Conv"):
        assert conv.k == 3 and conv.s == 2 and conv.p == 1 and conv.d == 1, "SPD requires a k3 s2 p1 conv"
        super().__init__(conv.c1, conv.c2, conv.k, conv.s, conv.p, conv.g, conv.d, conv.act)
        self.path = conv.path
        self.spd = True


class DWConv(Conv):
    """Depth-wise conv (reference conv.py:102): groups = gcd(c1, c2)."""

    def __init__(self, c1, c2, k=1, s=1, d=1, act=True):
        super().__init__(c1, c2, k, s, g=math.gcd(c1, c2), d=d, act=act)


class LightConv(Module):
    """1x1 conv (no act) + depthwise conv with ReLU (reference conv.py:84)."""

    def __init__(self, c1, c2, k=1, act="relu"):
        self.conv1 = Conv(c1, c2, 1, act=False)
        self.conv2 = DWConv(c2, c2, k, act=act)

    def __call__(self, v, x, ctx: Ctx):
        return self.conv2(v["conv2"], self.conv1(v["conv1"], x, ctx), ctx)


class HGStem(Module):
    """PPHGNetV2 stem: 5 convs + maxpool with asymmetric pads (reference block.py:100)."""

    def __init__(self, c1, cm, c2):
        self.stem1 = Conv(c1, cm, 3, 2, act="relu")
        self.stem2a = Conv(cm, cm // 2, 2, 1, 0, act="relu")
        self.stem2b = Conv(cm // 2, cm, 2, 1, 0, act="relu")
        self.stem3 = Conv(cm * 2, cm, 3, 2, act="relu")
        self.stem4 = Conv(cm, c2, 1, 1, act="relu")

    def __call__(self, v, x, ctx: Ctx):
        x = self.stem1(v["stem1"], x, ctx)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))  # F.pad [0,1,0,1]
        x2 = self.stem2a(v["stem2a"], x, ctx)
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = self.stem2b(v["stem2b"], x2, ctx)
        x1 = max_pool2d(x, 2, 1, 0)  # on the padded map == ceil_mode pool
        x = jnp.concatenate([x1, x2], axis=-1)
        x = self.stem3(v["stem3"], x, ctx)
        return self.stem4(v["stem4"], x, ctx)


class HGBlock(Module):
    """PPHGNetV2 block: n (Light)Convs + squeeze/excite convs (reference block.py:131)."""

    def __init__(self, c1, cm, c2, k=3, n=6, lightconv=False, shortcut=False):
        block = LightConv if lightconv else Conv
        if lightconv:
            self.m = [block(c1 if i == 0 else cm, cm, k=k) for i in range(n)]
        else:
            self.m = [block(c1 if i == 0 else cm, cm, k=k, act="relu") for i in range(n)]
        self.sc = Conv(c1 + n * cm, c2 // 2, 1, 1, act="relu")
        self.ec = Conv(c2 // 2, c2, 1, 1, act="relu")
        self.add = shortcut and c1 == c2

    def __call__(self, v, x, ctx: Ctx):
        y = [x]
        for i, m in enumerate(self.m):
            y.append(m(v["m"][str(i)], y[-1], ctx))
        out = self.ec(v["ec"], self.sc(v["sc"], jnp.concatenate(y, axis=-1), ctx), ctx)
        return out + x if self.add else out


class ConvTranspose2dRaw(Module):
    """Bare transposed conv (torch nn.ConvTranspose2d analog, used by v6 upsampling)."""

    def __init__(self, c1, c2, k=2, s=2, p=0, bias=True):
        self.c1, self.c2, self.k, self.s, self.p = c1, c2, k, s, p
        self.bias = bias

    def init(self, key):
        fan_in = self.c1 * self.k * self.k
        v = {"kernel": _kaiming_uniform(_child_key(key, "w"), (self.k, self.k, self.c2, self.c1), fan_in)}
        if self.bias:
            v["bias"] = _kaiming_uniform(_child_key(key, "b"), (self.c2,), fan_in)
        return v

    def __call__(self, v, x, ctx: Ctx):
        y = jax.lax.conv_transpose(
            x.astype(ctx.dtype),
            v["kernel"].astype(ctx.dtype),
            strides=(self.s, self.s),
            padding=((self.p, self.p), (self.p, self.p)) if self.p else "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,  # torch ConvTranspose2d orientation
        )
        if self.bias:
            y = y + v["bias"].astype(ctx.dtype)
        return y


def override_default_act(module: Module, act):
    """Recursively replace the default SiLU on Conv-family modules (the yaml
    `activation:` key, reference tasks.py:944-947 Conv.default_act override)."""
    if isinstance(module, (Conv,)) and module.act is True:
        module.act = act
    for child in module.children().values():
        if isinstance(child, list):
            for m in child:
                override_default_act(m, act)
        else:
            override_default_act(child, act)


class Focus(Module):
    """Space-to-depth stem (reference conv.py:139): concat 4 pixel phases then conv."""

    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, act=True):
        self.conv = Conv(c1 * 4, c2, k, s, p, g, act=act)

    def __call__(self, v, x, ctx: Ctx):
        x = jnp.concatenate(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]], axis=-1
        )
        return self.conv(v["conv"], x, ctx)


class GhostConv(Module):
    """Ghost convolution (reference conv.py:158): primary conv + cheap DW expansion."""

    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        c_ = c2 // 2
        self.cv1 = Conv(c1, c_, k, s, None, g, act=act)
        self.cv2 = Conv(c_, c_, 5, 1, None, c_, act=act)

    def __call__(self, v, x, ctx: Ctx):
        y = self.cv1(v["cv1"], x, ctx)
        return jnp.concatenate([y, self.cv2(v["cv2"], y, ctx)], axis=-1)


class ChannelAttention(Module):
    """Squeeze-excite channel attention (reference conv.py:278)."""

    def __init__(self, channels):
        self.fc = Conv2dRaw(channels, channels, 1, bias=True)

    def __call__(self, v, x, ctx: Ctx):
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        w = jax.nn.sigmoid(self.fc(v["fc"], pooled.astype(ctx.dtype), ctx).astype(jnp.float32))
        return (x.astype(jnp.float32) * w).astype(ctx.dtype)


class SpatialAttention(Module):
    """Spatial attention over channel mean/max maps (reference conv.py:293)."""

    def __init__(self, kernel_size=7):
        assert kernel_size in (3, 7)
        self.cv1 = Conv2dRaw(2, 1, kernel_size, p=kernel_size // 2, bias=False)

    def __call__(self, v, x, ctx: Ctx):
        xf = x.astype(jnp.float32)
        s = jnp.concatenate([jnp.mean(xf, -1, keepdims=True), jnp.max(xf, -1, keepdims=True)], axis=-1)
        w = jax.nn.sigmoid(self.cv1(v["cv1"], s.astype(ctx.dtype), ctx).astype(jnp.float32))
        return (xf * w).astype(ctx.dtype)


class CBAM(Module):
    """Channel + spatial attention (reference conv.py:309)."""

    def __init__(self, c1, kernel_size=7):
        self.channel_attention = ChannelAttention(c1)
        self.spatial_attention = SpatialAttention(kernel_size)

    def __call__(self, v, x, ctx: Ctx):
        return self.spatial_attention(
            v["spatial_attention"], self.channel_attention(v["channel_attention"], x, ctx), ctx
        )


class Identity(Module):
    """Pass-through (torch nn.Identity analog; used by v9-e's dual-branch stem)."""

    def init(self, key):
        return {}

    def __call__(self, v, x, ctx: Ctx):
        return x


class Concat(Module):
    """Concat along channels (reference conv.py:323). NHWC: torch dim 1 -> axis -1."""

    def __init__(self, dim=1):
        self.dim = -1 if dim == 1 else dim
        # lane padding (enable_lane_pad): canonical channel count per input, or
        # None. Concatenation is positional, so padded inputs must be sliced
        # back to their real channels (the padded tail is exact zeros).
        self.trim_to = None

    def init(self, key):
        return {}

    def __call__(self, v, xs, ctx: Ctx):
        if self.trim_to:
            xs = [x[..., :t] if (t and x.shape[-1] > t) else x for x, t in zip(xs, self.trim_to)]
        return jnp.concatenate(xs, axis=self.dim)


class Upsample(Module):
    """Nearest-neighbor upsample (torch nn.Upsample(None, 2, 'nearest') analog)."""

    def __init__(self, size=None, scale_factor=2, mode="nearest"):
        assert mode == "nearest", f"unsupported upsample mode {mode}"
        self.scale = int(scale_factor)

    def init(self, key):
        return {}

    def __call__(self, v, x, ctx: Ctx):
        s = self.scale
        b, h, w, c = x.shape
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, s, w, s, c))
        return x.reshape(b, h * s, w * s, c)


# ---------------------------------------------------------------------------
# CSP blocks
# ---------------------------------------------------------------------------
class Bottleneck(Module):
    """Standard bottleneck (reference block.py:337)."""

    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, k[0], 1)
        self.cv2 = Conv(c_, c2, k[1], 1, g=g)
        self.add = shortcut and c1 == c2

    def __call__(self, v, x, ctx: Ctx):
        y = self.cv2(v["cv2"], self.cv1(v["cv1"], x, ctx), ctx)
        return x + y if self.add else y


class C2f(Module):
    """Fast CSP bottleneck with 2 convs — the v8 workhorse (reference block.py:230)."""

    def __init__(self, c1, c2, n=1, shortcut=False, g=1, e=0.5):
        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = [Bottleneck(self.c, self.c, shortcut, g, k=(3, 3), e=1.0) for _ in range(n)]

    def __call__(self, v, x, ctx: Ctx):
        y = list(jnp.split(self.cv1(v["cv1"], x, ctx), 2, axis=-1))
        for i, m in enumerate(self.m):
            y.append(m(v["m"][str(i)], y[-1], ctx))
        return self.cv2(v["cv2"], jnp.concatenate(y, axis=-1), ctx)


class C2(Module):
    """CSP bottleneck with 2 convs (reference block.py:211)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv(2 * self.c, c2, 1)
        self.m = [Bottleneck(self.c, self.c, shortcut, g, k=(3, 3), e=1.0) for _ in range(n)]

    def __call__(self, v, x, ctx: Ctx):
        a, b = jnp.split(self.cv1(v["cv1"], x, ctx), 2, axis=-1)
        for i, m in enumerate(self.m):
            a = m(v["m"][str(i)], a, ctx)
        return self.cv2(v["cv2"], jnp.concatenate([a, b], axis=-1), ctx)


class C1(Module):
    """CSP bottleneck with 1 conv (reference block.py:194)."""

    def __init__(self, c1, c2, n=1):
        self.cv1 = Conv(c1, c2, 1, 1)
        self.m = [Conv(c2, c2, 3) for _ in range(n)]

    def __call__(self, v, x, ctx: Ctx):
        y = self.cv1(v["cv1"], x, ctx)
        z = y
        for i, m in enumerate(self.m):
            z = m(v["m"][str(i)], z, ctx)
        return z + y


class C3(Module):
    """CSP bottleneck with 3 convs (reference block.py:252)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c1, c_, 1, 1)
        self.cv3 = Conv(2 * c_, c2, 1)
        self.m = [Bottleneck(c_, c_, shortcut, g, k=(1, 3), e=1.0) for _ in range(n)]

    def __call__(self, v, x, ctx: Ctx):
        a = self.cv1(v["cv1"], x, ctx)
        for i, m in enumerate(self.m):
            a = m(v["m"][str(i)], a, ctx)
        b = self.cv2(v["cv2"], x, ctx)
        return self.cv3(v["cv3"], jnp.concatenate([a, b], axis=-1), ctx)


class SPPF(Module):
    """Spatial pyramid pooling - fast (reference block.py:172)."""

    def __init__(self, c1, c2, k=5):
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c_ * 4, c2, 1, 1)
        self.k = k

    def __call__(self, v, x, ctx: Ctx):
        y = [self.cv1(v["cv1"], x, ctx)]
        for _ in range(3):
            y.append(max_pool2d(y[-1], self.k, 1, self.k // 2))
        return self.cv2(v["cv2"], jnp.concatenate(y, axis=-1), ctx)


class SPP(Module):
    """Spatial pyramid pooling (reference block.py:155)."""

    def __init__(self, c1, c2, k=(5, 9, 13)):
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c_ * (len(k) + 1), c2, 1, 1)
        self.k = k

    def __call__(self, v, x, ctx: Ctx):
        x = self.cv1(v["cv1"], x, ctx)
        ys = [x] + [max_pool2d(x, k, 1, k // 2) for k in self.k]
        return self.cv2(v["cv2"], jnp.concatenate(ys, axis=-1), ctx)


class RepConv(Module):
    """RepVGG-style fusible 3x3 + 1x1 conv (reference conv.py:174). No identity
    branch by default (bn=False upstream)."""

    def __init__(self, c1, c2, k=3, s=1, p=1, g=1, d=1, act=True, bn=False):
        assert k == 3 and p == 1
        self.c1, self.c2, self.s, self.g = c1, c2, s, g
        self.act = act
        self.has_identity = bn and c2 == c1 and s == 1
        self.conv1 = Conv(c1, c2, 3, s, p=p, g=g, act=False)
        self.conv2 = Conv(c1, c2, 1, s, p=p - 3 // 2, g=g, act=False)

    def init(self, key):
        v = {"conv1": self.conv1.init(_child_key(key, "conv1")), "conv2": self.conv2.init(_child_key(key, "conv2"))}
        if self.has_identity:
            v["idbn"] = _bn_init(self.c1)
        return v

    def __call__(self, v, x, ctx: Ctx):
        x = x.astype(ctx.dtype)
        if "kernel" in v:
            y = conv2d(x, v["kernel"], self.s, 1, 1, self.g) + v["bias"]
            y = y.astype(ctx.dtype)
        else:
            y = self.conv1(v["conv1"], x, ctx) + self.conv2(v["conv2"], x, ctx)
            if self.has_identity:
                y = y + _bn_apply(v["idbn"], x, ctx, f"{self.path}.idbn")
        return silu(y) if self.act is True else y

    def fuse_vars(self, v):
        if "kernel" in v:
            return v
        w3, b3 = _bn_fold(v["conv1"]["bn"], v["conv1"]["conv"]["kernel"])
        w1, b1 = _bn_fold(v["conv2"]["bn"], v["conv2"]["conv"]["kernel"])
        w = w3 + jnp.pad(w1, ((1, 1), (1, 1), (0, 0), (0, 0)))
        b = b3 + b1
        if self.has_identity:
            cin = self.c1 // self.g
            ident = np.zeros((3, 3, cin, self.c2), np.float32)
            for i in range(self.c2):
                ident[1, 1, i % cin, i] = 1.0
            wid, bid = _bn_fold(v["idbn"], jnp.asarray(ident))
            w, b = w + wid, b + bid
        return {"kernel": w, "bias": b}


class RepBottleneck(Bottleneck):
    """Bottleneck with a RepConv first conv (reference block.py RepNBottleneck)."""

    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        super().__init__(c1, c2, shortcut, g, k, e)
        c_ = int(c2 * e)
        self.cv1 = RepConv(c1, c_, k[0], 1)


class RepCSP(C3):
    """CSP with RepBottlenecks (reference block.py RepCSP)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)
        c_ = int(c2 * e)
        self.m = [RepBottleneck(c_, c_, shortcut, g, e=1.0) for _ in range(n)]


class RepNCSPELAN4(Module):
    """CSP-ELAN (reference block.py:585, the v9 workhorse)."""

    def __init__(self, c1, c2, c3, c4, n=1):
        self.c = c3 // 2
        self.cv1 = Conv(c1, c3, 1, 1)
        self.cv2 = _Seq(RepCSP(c3 // 2, c4, n), Conv(c4, c4, 3, 1))
        self.cv3 = _Seq(RepCSP(c4, c4, n), Conv(c4, c4, 3, 1))
        self.cv4 = Conv(c3 + 2 * c4, c2, 1, 1)

    def __call__(self, v, x, ctx: Ctx):
        y = list(jnp.split(self.cv1(v["cv1"], x, ctx), 2, axis=-1))
        y.append(self.cv2(v["cv2"], y[-1], ctx))
        y.append(self.cv3(v["cv3"], y[-1], ctx))
        return self.cv4(v["cv4"], jnp.concatenate(y, axis=-1), ctx)


class ELAN1(RepNCSPELAN4):
    """Plain-conv ELAN (reference block.py:610)."""

    def __init__(self, c1, c2, c3, c4):
        self.c = c3 // 2
        self.cv1 = Conv(c1, c3, 1, 1)
        self.cv2 = Conv(c3 // 2, c4, 3, 1)
        self.cv3 = Conv(c4, c4, 3, 1)
        self.cv4 = Conv(c3 + 2 * c4, c2, 1, 1)


def avg_pool2d_2x1(x):
    """torch avg_pool2d(x, 2, 1, 0) equivalent: window 2, stride 1, no pad."""
    s = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, (1, 2, 2, 1), (1, 1, 1, 1), "VALID"
    )
    return (s / 4.0).astype(x.dtype)


class AConv(Module):
    """avg-pool + strided conv downsample (reference block.py:623, v9)."""

    def __init__(self, c1, c2):
        self.cv1 = Conv(c1, c2, 3, 2, 1)

    def __call__(self, v, x, ctx: Ctx):
        return self.cv1(v["cv1"], avg_pool2d_2x1(x), ctx)


class ADown(Module):
    """Dual-path downsample (reference block.py:637, v9)."""

    def __init__(self, c1, c2):
        self.c = c2 // 2
        self.cv1 = Conv(c1 // 2, self.c, 3, 2, 1)
        self.cv2 = Conv(c1 // 2, self.c, 1, 1, 0)

    def __call__(self, v, x, ctx: Ctx):
        x = avg_pool2d_2x1(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        y1 = self.cv1(v["cv1"], x1, ctx)
        y2 = self.cv2(v["cv2"], max_pool2d(x2, 3, 2, 1), ctx)
        return jnp.concatenate([y1, y2], axis=-1)


class SPPELAN(Module):
    """SPP-ELAN (reference block.py:657, v9)."""

    def __init__(self, c1, c2, c3, k=5):
        self.c = c3
        self.cv1 = Conv(c1, c3, 1, 1)
        self.cv5 = Conv(4 * c3, c2, 1, 1)
        self.k = k

    def __call__(self, v, x, ctx: Ctx):
        y = [self.cv1(v["cv1"], x, ctx)]
        for _ in range(3):
            y.append(max_pool2d(y[-1], self.k, 1, self.k // 2))
        return self.cv5(v["cv5"], jnp.concatenate(y, axis=-1), ctx)


class CBLinear(Module):
    """Linear projection split into multiple channel groups (reference block.py:677, v9-e)."""

    def __init__(self, c1, c2s, k=1, s=1, p=None, g=1):
        self.c2s = list(c2s)
        self.conv = Conv2dRaw(c1, sum(c2s), k, s, p, g, bias=True)

    def __call__(self, v, x, ctx: Ctx):
        y = self.conv(v["conv"], x, ctx)
        splits = np.cumsum(self.c2s)[:-1].tolist()
        return tuple(jnp.split(y, splits, axis=-1))


class CBFuse(Module):
    """Fuse multi-scale CBLinear outputs by upsampling + sum (reference block.py:691)."""

    def __init__(self, idx):
        self.idx = list(idx)

    def init(self, key):
        return {}

    def __call__(self, v, xs, ctx: Ctx):
        target = xs[-1].shape[1:3]
        outs = []
        for i, x in enumerate(xs[:-1]):
            xi = x[self.idx[i]] if isinstance(x, (tuple, list)) else x
            b, h, w, c = xi.shape
            outs.append(jax.image.resize(xi, (b, target[0], target[1], c), method="nearest"))
        return sum(outs) + xs[-1]


class CIB(Module):
    """Conditional identity block (reference block.py:811, v10)."""

    def __init__(self, c1, c2, shortcut=True, e=0.5, lk=False):
        c_ = int(c2 * e)
        self.cv1 = _Seq(
            Conv(c1, c1, 3, g=c1),
            Conv(c1, 2 * c_, 1),
            RepVGGDW(2 * c_) if lk else Conv(2 * c_, 2 * c_, 3, g=2 * c_),
            Conv(2 * c_, c2, 1),
            Conv(c2, c2, 3, g=c2),
        )
        self.add = shortcut and c1 == c2

    def __call__(self, v, x, ctx: Ctx):
        y = self.cv1(v["cv1"], x, ctx)
        return x + y if self.add else y


class C2fCIB(C2f):
    """C2f with CIB bottlenecks (reference block.py:850, v10)."""

    def __init__(self, c1, c2, n=1, shortcut=False, lk=False, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)
        self.m = [CIB(self.c, self.c, shortcut, e=1.0, lk=lk) for _ in range(n)]


class MaxSigmoidAttnBlock(Module):
    """Max-sigmoid text-guided attention (reference block.py:414, YOLO-World)."""

    def __init__(self, c1, c2, nh=1, ec=128, gc=512, scale=False):
        self.nh, self.hc = nh, c2 // nh
        self.ec_conv = Conv(c1, ec, 1, act=False) if c1 != ec else None
        self.gl = None  # built in init (Linear)
        self.gc, self.ec_dim = gc, ec
        self.proj_conv = Conv(c1, c2, 3, 1, act=False)
        self.use_scale = scale

    def init(self, key):
        v = {}
        if self.ec_conv is not None:
            v["ec"] = self.ec_conv.init(_child_key(key, "ec"))
        bound = 1.0 / math.sqrt(self.gc)
        v["gl"] = {
            "kernel": jax.random.uniform(_child_key(key, "gl"), (self.gc, self.ec_dim), jnp.float32, -bound, bound),
            "bias": jax.random.uniform(_child_key(key, "glb"), (self.ec_dim,), jnp.float32, -bound, bound),
        }
        v["bias"] = jnp.zeros((self.nh,), jnp.float32)
        v["proj_conv"] = self.proj_conv.init(_child_key(key, "pc"))
        if self.use_scale:
            v["scale"] = jnp.ones((self.nh,), jnp.float32)
        return v

    def __call__(self, v, x, ctx: Ctx):
        guide = ctx.text  # (B, n_cls, gc)
        b, h, w, _ = x.shape
        g = guide.astype(jnp.float32) @ v["gl"]["kernel"] + v["gl"]["bias"]  # (B, n, ec)
        g = g.reshape(b, -1, self.nh, self.hc)
        embed = self.ec_conv(v["ec"], x, ctx) if self.ec_conv is not None else x
        embed = embed.reshape(b, h, w, self.nh, self.hc).astype(jnp.float32)
        aw = jnp.einsum("bhwmc,bnmc->bhwmn", embed, g)
        aw = jnp.max(aw, axis=-1) / math.sqrt(self.hc)  # (B, H, W, nh)
        aw = jax.nn.sigmoid(aw + v["bias"])
        if self.use_scale:
            aw = aw * v["scale"]
        y = self.proj_conv(v["proj_conv"], x, ctx)
        y = y.reshape(b, h, w, self.nh, self.hc) * aw[..., None].astype(y.dtype)
        return y.reshape(b, h, w, self.nh * self.hc)


class C2fAttn(Module):
    """C2f with a text-guided attention tail (reference block.py:449, YOLO-World)."""

    def __init__(self, c1, c2, n=1, ec=128, nh=1, gc=512, shortcut=False, g=1, e=0.5):
        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv((3 + n) * self.c, c2, 1)
        self.m = [Bottleneck(self.c, self.c, shortcut, g, k=(3, 3), e=1.0) for _ in range(n)]
        self.attn = MaxSigmoidAttnBlock(self.c, self.c, gc=gc, ec=ec, nh=nh)

    def __call__(self, v, x, ctx: Ctx):
        y = list(jnp.split(self.cv1(v["cv1"], x, ctx), 2, axis=-1))
        for i, m in enumerate(self.m):
            y.append(m(v["m"][str(i)], y[-1], ctx))
        y.append(self.attn(v["attn"], y[-1], ctx))
        return self.cv2(v["cv2"], jnp.concatenate(y, axis=-1), ctx)


class ContrastiveHead(Module):
    """Region-text similarity head (reference block.py:522)."""

    def init(self, key):
        return {"bias": jnp.asarray([-10.0], jnp.float32), "logit_scale": jnp.asarray(math.log(1 / 0.07), jnp.float32)}

    def __call__(self, v, x, ctx: Ctx):
        w = ctx.text.astype(jnp.float32)  # (B, n, c)
        xf = x.astype(jnp.float32)
        xf = xf / (jnp.linalg.norm(xf, axis=-1, keepdims=True) + 1e-12)
        w = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-12)
        sim = jnp.einsum("bhwc,bkc->bhwk", xf, w)
        return sim * jnp.exp(v["logit_scale"]) + v["bias"]


class BNContrastiveHead(Module):
    """Contrastive head with BatchNorm on image features (reference block.py:540)."""

    def __init__(self, embed_dims):
        self.c = embed_dims

    def init(self, key):
        return {
            "bn": _bn_init(self.c),
            "bias": jnp.asarray([-10.0], jnp.float32),
            "logit_scale": jnp.asarray(-1.0, jnp.float32),
        }

    def __call__(self, v, x, ctx: Ctx):
        xf = _bn_apply(v["bn"], x, ctx, f"{self.path}.bn").astype(jnp.float32)
        w = ctx.text.astype(jnp.float32)
        w = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-12)
        sim = jnp.einsum("bhwc,bkc->bhwk", xf, w)
        return sim * jnp.exp(v["logit_scale"]) + v["bias"]


class ImagePoolingAttn(Module):
    """Image-aware enhancement of text embeddings (reference block.py:476).

    Updates ctx.text in place (the reference threads the refined text forward)."""

    def __init__(self, ec=256, ch=(), ct=512, nh=8, k=3, scale=False):
        self.ec_dim, self.ct, self.nh, self.k = ec, ct, nh, k
        self.nf = len(ch)
        self.hc = ec // nh
        from drone_yolo_tpu.nn import transformer as T

        self.query = _Seq(T.LayerNorm(ct), T.Linear(ct, ec))
        self.key = _Seq(T.LayerNorm(ec), T.Linear(ec, ec))
        self.value = _Seq(T.LayerNorm(ec), T.Linear(ec, ec))
        self.proj = T.Linear(ec, ct)
        self.projections = [Conv2dRaw(c, ec, 1, bias=True) for c in ch]
        self.use_scale = scale

    def init(self, key):
        v = super().init(key)
        if self.use_scale:
            v["scale"] = jnp.zeros((1,), jnp.float32)
        return v

    def __call__(self, v, xs, ctx: Ctx):
        text = ctx.text
        b = xs[0].shape[0]
        pooled = []
        for i, x in enumerate(xs):
            p = self.projections[i](v["projections"][str(i)], x, ctx)  # (B, H, W, ec)
            # adaptive max-pool to k x k (torch AdaptiveMaxPool2d semantics:
            # bin i spans [floor(i*H/k), ceil((i+1)*H/k)); handles H < k)
            bb, h, w, c = p.shape
            rows = []
            for iy in range(self.k):
                y0, y1 = (iy * h) // self.k, -(-((iy + 1) * h) // self.k)
                for ix in range(self.k):
                    x0, x1 = (ix * w) // self.k, -(-((ix + 1) * w) // self.k)
                    rows.append(jnp.max(p[:, y0:max(y1, y0 + 1), x0:max(x1, x0 + 1), :], axis=(1, 2)))
            pooled.append(jnp.stack(rows, axis=1))  # (B, k*k, ec)
        feats = jnp.concatenate(pooled, axis=1)  # (B, nf*k*k, ec)
        q = self.query(v["query"], text, ctx).reshape(b, -1, self.nh, self.hc)
        kk = self.key(v["key"], feats, ctx).reshape(b, -1, self.nh, self.hc)
        vv = self.value(v["value"], feats, ctx).reshape(b, -1, self.nh, self.hc)
        aw = jnp.einsum("bnmc,bkmc->bmnk", q, kk) / math.sqrt(self.hc)
        aw = jax.nn.softmax(aw, axis=-1)
        out = jnp.einsum("bmnk,bkmc->bnmc", aw, vv).reshape(b, -1, self.ec_dim)
        out = self.proj(v["proj"], out, ctx)
        scale = v["scale"] if self.use_scale else 1.0
        new_text = out * scale + text
        ctx.text = new_text
        return new_text


class RepC3(Module):
    """RT-DETR neck block: RepConv stack + residual 1x1 (reference block.py:279)."""

    def __init__(self, c1, c2, n=3, e=1.0):
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c1, c_, 1, 1)
        self.m = [RepConv(c_, c_) for _ in range(n)]
        self.cv3 = Conv(c_, c2, 1, 1) if c_ != c2 else None

    def __call__(self, v, x, ctx: Ctx):
        a = self.cv1(v["cv1"], x, ctx)
        for i, m in enumerate(self.m):
            a = m(v["m"][str(i)], a, ctx)
        y = a + self.cv2(v["cv2"], x, ctx)
        return self.cv3(v["cv3"], y, ctx) if self.cv3 is not None else y


class C3k(C3):
    """C3 with configurable bottleneck kernel (reference block.py:738, v11)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, k=3):
        super().__init__(c1, c2, n, shortcut, g, e)
        c_ = int(c2 * e)
        self.m = [Bottleneck(c_, c_, shortcut, g, k=(k, k), e=1.0) for _ in range(n)]


class C3k2(C2f):
    """Faster CSP with optional C3k blocks (reference block.py:727, the v11 workhorse)."""

    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, g=1, shortcut=True):
        super().__init__(c1, c2, n, shortcut, g, e)
        self.m = [
            C3k(self.c, self.c, 2, shortcut, g) if c3k else Bottleneck(self.c, self.c, shortcut, g, k=(3, 3), e=0.5)
            for _ in range(n)
        ]


class Attention(Module):
    """Multi-head self-attention over spatial positions with positional conv
    (reference block.py:870, v10/v11 PSA attention)."""

    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim**-0.5
        nh_kd = self.key_dim * num_heads
        h = dim + nh_kd * 2
        self.qkv = Conv(dim, h, 1, act=False)
        self.proj = Conv(dim, dim, 1, act=False)
        self.pe = Conv(dim, dim, 3, 1, g=dim, act=False)
        self.dim = dim

    def __call__(self, v, x, ctx: Ctx):
        b, hh, ww, c = x.shape
        n = hh * ww
        qkv = self.qkv(v["qkv"], x, ctx).reshape(b, n, self.num_heads, self.key_dim * 2 + self.head_dim)
        q, k, vv = jnp.split(qkv, [self.key_dim, self.key_dim * 2], axis=-1)
        attn = jnp.einsum("bnhk,bmhk->bhnm", q.astype(jnp.float32), k.astype(jnp.float32)) * self.scale
        attn = jax.nn.softmax(attn, axis=-1).astype(ctx.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, vv).reshape(b, hh, ww, c)
        pe = self.pe(v["pe"], vv.reshape(b, hh, ww, c), ctx)
        return self.proj(v["proj"], out + pe, ctx)


class PSABlock(Module):
    """Attention + MLP residual block (reference block.py:926)."""

    def __init__(self, c, attn_ratio=0.5, num_heads=4, shortcut=True):
        self.attn = Attention(c, num_heads=num_heads, attn_ratio=attn_ratio)
        self.ffn = _Seq(Conv(c, c * 2, 1), Conv(c * 2, c, 1, act=False))
        self.add = shortcut

    def __call__(self, v, x, ctx: Ctx):
        y = self.attn(v["attn"], x, ctx)
        x = x + y if self.add else y
        y = self.ffn(v["ffn"], x, ctx)
        return x + y if self.add else y


class PSA(Module):
    """Partial self-attention (reference block.py:963, v10): attn + ffn applied
    to half the channels."""

    def __init__(self, c1, c2, e=0.5):
        assert c1 == c2
        self.c = int(c1 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv(2 * self.c, c1, 1)
        self.attn = Attention(self.c, attn_ratio=0.5, num_heads=max(self.c // 64, 1))
        self.ffn = _Seq(Conv(self.c, self.c * 2, 1), Conv(self.c * 2, self.c, 1, act=False))

    def __call__(self, v, x, ctx: Ctx):
        a, b = jnp.split(self.cv1(v["cv1"], x, ctx), 2, axis=-1)
        b = b + self.attn(v["attn"], b, ctx)
        b = b + self.ffn(v["ffn"], b, ctx)
        return self.cv2(v["cv2"], jnp.concatenate([a, b], axis=-1), ctx)


class C2PSA(Module):
    """CSP wrapper around stacked PSABlocks (reference block.py:1006, v11)."""

    def __init__(self, c1, c2, n=1, e=0.5):
        assert c1 == c2
        self.c = int(c1 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv(2 * self.c, c1, 1)
        self.m = [PSABlock(self.c, attn_ratio=0.5, num_heads=max(self.c // 64, 1)) for _ in range(n)]

    def __call__(self, v, x, ctx: Ctx):
        a, b = jnp.split(self.cv1(v["cv1"], x, ctx), 2, axis=-1)
        for i, m in enumerate(self.m):
            b = m(v["m"][str(i)], b, ctx)
        return self.cv2(v["cv2"], jnp.concatenate([a, b], axis=-1), ctx)


class AAttn(Module):
    """Area attention (reference block.py:1161, v12): full attention within
    `area` horizontal stripes of the feature map."""

    def __init__(self, dim, num_heads, area=1):
        self.dim, self.nh, self.area = dim, num_heads, area
        self.hd = dim // num_heads
        self.qkv = Conv(dim, dim * 3, 1, act=False)
        self.proj = Conv(dim, dim, 1, act=False)
        self.pe = Conv(dim, dim, 7, 1, 3, g=dim, act=False)

    def __call__(self, v, x, ctx: Ctx):
        b, h, w, c = x.shape
        n = h * w
        qkv = self.qkv(v["qkv"], x, ctx).reshape(b, n, 3 * c)
        area = self.area if self.area > 1 and n % self.area == 0 else 1
        if area > 1:
            qkv = qkv.reshape(b * area, n // area, 3 * c)
        bb, nn_, _ = qkv.shape
        q, k, vv = jnp.split(qkv.reshape(bb, nn_, self.nh, 3 * self.hd), 3, axis=-1)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * (self.hd**-0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(ctx.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vv).reshape(bb, nn_, c)
        vv = vv.reshape(bb, nn_, c)
        if area > 1:
            out = out.reshape(b, n, c)
            vv = vv.reshape(b, n, c)
        out = out.reshape(b, h, w, c)
        vv = vv.reshape(b, h, w, c)
        out = out + self.pe(v["pe"], vv, ctx)
        return self.proj(v["proj"], out, ctx)


class ABlock(Module):
    """Area-attention + MLP residual block (reference block.py:1239)."""

    def __init__(self, dim, num_heads, mlp_ratio=1.2, area=1):
        self.attn = AAttn(dim, num_heads=num_heads, area=area)
        hidden = int(dim * mlp_ratio)
        self.mlp = _Seq(Conv(dim, hidden, 1), Conv(hidden, dim, 1, act=False))

    def __call__(self, v, x, ctx: Ctx):
        x = x + self.attn(v["attn"], x, ctx)
        return x + self.mlp(v["mlp"], x, ctx)


class A2C2f(Module):
    """R-ELAN area-attention C2f (reference block.py:1298, the v12 workhorse)."""

    def __init__(self, c1, c2, n=1, a2=True, area=1, residual=False, mlp_ratio=2.0, e=0.5, g=1, shortcut=True):
        c_ = int(c2 * e)
        assert c_ % 32 == 0, "ABlock dim must be a multiple of 32"
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv((1 + n) * c_, c2, 1)
        self.residual = a2 and residual
        self.c2 = c2
        if a2:
            self.m = [_Seq(*(ABlock(c_, c_ // 32, mlp_ratio, area) for _ in range(2))) for _ in range(n)]
        else:
            self.m = [C3k(c_, c_, 2, shortcut, g) for _ in range(n)]

    def init(self, key):
        v = super().init(key)
        if self.residual:
            v["gamma"] = 0.01 * jnp.ones((self.c2,), jnp.float32)
        return v

    def __call__(self, v, x, ctx: Ctx):
        y = [self.cv1(v["cv1"], x, ctx)]
        for i, m in enumerate(self.m):
            y.append(m(v["m"][str(i)], y[-1], ctx))
        out = self.cv2(v["cv2"], jnp.concatenate(y, axis=-1), ctx)
        if self.residual:
            return x + v["gamma"].astype(ctx.dtype) * out
        return out


class SCDown(Module):
    """Separable-conv downsample (reference block.py:1080, v10)."""

    def __init__(self, c1, c2, k=3, s=2):
        self.cv1 = Conv(c1, c2, 1, 1)
        self.cv2 = Conv(c2, c2, k=k, s=s, g=c2, act=False)

    def __call__(self, v, x, ctx: Ctx):
        return self.cv2(v["cv2"], self.cv1(v["cv1"], x, ctx), ctx)


class RepVGGDW(Module):
    """Depthwise RepVGG block (reference block.py:749, v10): 7x7 DW + 3x3 DW
    branches fused to one 7x7 DW at deploy."""

    def __init__(self, c):
        self.c = c
        self.conv = DWConv(c, c, 7, 1, act=False)
        self.conv1 = DWConv(c, c, 3, 1, act=False)

    def __call__(self, v, x, ctx: Ctx):
        if "kernel" in v:
            y = conv2d(x.astype(ctx.dtype), v["kernel"], 1, 3, 1, self.c) + v["bias"]
            return silu(y.astype(ctx.dtype))
        return silu(self.conv(v["conv"], x, ctx) + self.conv1(v["conv1"], x, ctx))

    def fuse_vars(self, v):
        if "kernel" in v:
            return v
        w7, b7 = _bn_fold(v["conv"]["bn"], v["conv"]["conv"]["kernel"])
        w3, b3 = _bn_fold(v["conv1"]["bn"], v["conv1"]["conv"]["kernel"])
        w3 = jnp.pad(w3, ((2, 2), (2, 2), (0, 0), (0, 0)))
        return {"kernel": w7 + w3, "bias": b7 + b3}


# ---------------------------------------------------------------------------
# RepVGG (the Drone-YOLO backbone downsampler) — reference block.py:1393-1492
# ---------------------------------------------------------------------------
class RepVGGBlock(Module):
    """Structural-reparameterization block: train 3x3+1x1+identity, deploy one 3x3.

    Registered as a first-class width-scalable module in the graph builder (fixing
    the reference snapshot's missing-import defect, SURVEY.md §2.3). Fusion
    (`fuse_vars`) is a pure weight transform applied before jit, mirroring
    `get_equivalent_kernel_bias` (reference block.py:1440): fold each branch's BN,
    zero-pad the 1x1 kernel to 3x3, express identity-BN as a centered-delta kernel,
    then sum kernels and biases.
    """

    def __init__(self, c1, c2, k=3, s=1, p=1, d=1, g=1, deploy=False, use_se=False):
        assert k == 3 and p == 1, "RepVGGBlock supports k=3, p=1"
        assert not use_se, "SE variant not used by the drone yamls"
        self.c1, self.c2, self.s, self.g = c1, c2, s, g
        self.has_identity = (c2 == c1) and (s == 1)
        self.spd = False  # stride-2 space-to-depth execution (enable_spd_stride2)
        self.pad_out = 0  # lane padding (enable_lane_pad) — see Conv
        self.pad_in_ok = False

    def init(self, key):
        fan3 = self.c1 // self.g * 9
        fan1 = self.c1 // self.g
        v = {
            "dense": {
                "conv": {"kernel": _kaiming_uniform(_child_key(key, "d"), (3, 3, self.c1 // self.g, self.c2), fan3)},
                "bn": _bn_init(self.c2),
            },
            "one": {
                "conv": {"kernel": _kaiming_uniform(_child_key(key, "o"), (1, 1, self.c1 // self.g, self.c2), fan1)},
                "bn": _bn_init(self.c2),
            },
        }
        if self.has_identity:
            v["idbn"] = _bn_init(self.c1)
        return v

    def __call__(self, v, x, ctx: Ctx):
        x = x.astype(ctx.dtype)
        if self.spd and self.s == 2:
            assert not self.pad_out and not self.pad_in_ok, "spd and lane_pad are mutually exclusive"
            # space-to-depth execution of the stride-2 block: one rearrange
            # feeds both branches (3x3 -> k2 s1 tap-mapped kernel; 1x1 -> slot
            # (0,0) embed). s2 blocks have no identity branch. Bit-identical
            # params/grads — compute schedule only.
            xs = _spd_rearrange(x, self.g)
            if "kernel" in v:  # fused deploy form
                y = _spd_conv2d(xs, v["kernel"], self.g) + v["bias"]
                return silu(y.astype(ctx.dtype))
            y3 = _bn_apply(v["dense"]["bn"], _spd_conv2d(xs, v["dense"]["conv"]["kernel"], self.g), ctx, f"{self.path}.dense.bn")
            y1 = _bn_apply(v["one"]["bn"], _spd_conv2d_1x1(xs, v["one"]["conv"]["kernel"], self.g), ctx, f"{self.path}.one.bn")
            return silu(y3 + y1)
        pad_n = self.pad_out - self.c2 if self.pad_out else 0
        pad_in = x.shape[-1] - self.c1 if (self.pad_in_ok and x.shape[-1] > self.c1) else 0
        if pad_in and self.g != 1:
            x, pad_in = x[..., : self.c1], 0
        if pad_in and self.g == 1:
            self._pad_in_seen = x.shape[-1]

        def padk(k):  # skips pads the master already carries (padded-state mode)
            if pad_in and k.shape[2] != x.shape[-1]:
                k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_in), (0, 0)))
            if pad_n > 0 and k.shape[-1] != self.pad_out:
                k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad_n)))
            return k

        if "kernel" in v:  # fused deploy form
            b = jnp.pad(v["bias"], (0, pad_n)) if pad_n > 0 and v["bias"].shape[0] != self.pad_out else v["bias"]
            y = conv2d(x, padk(v["kernel"]), self.s, 1, 1, self.g) + b
            return silu(y.astype(ctx.dtype))

        bn_in_step = pad_n > 0 and v["dense"]["bn"]["scale"].shape[0] != self.pad_out

        def bnp(bn):
            return _bn_pad(bn, self.pad_out) if bn_in_step else bn

        y3 = _bn_apply(bnp(v["dense"]["bn"]), conv2d(x, padk(v["dense"]["conv"]["kernel"]), self.s, 1, 1, self.g), ctx, f"{self.path}.dense.bn")
        y1 = _bn_apply(bnp(v["one"]["bn"]), conv2d(x, padk(v["one"]["conv"]["kernel"]), self.s, 0, 1, self.g), ctx, f"{self.path}.one.bn")
        y = y3 + y1
        idbn_in_step = False
        if self.has_identity:
            assert pad_n <= 0 or x.shape[-1] == self.pad_out, (
                "lane-padded identity RepVGG needs an equally padded input"
            )
            idbn_in_step = bool(pad_in) and v["idbn"]["scale"].shape[0] != x.shape[-1]
            idbn = _bn_pad(v["idbn"], x.shape[-1]) if idbn_in_step else v["idbn"]
            y = y + _bn_apply(idbn, x, ctx, f"{self.path}.idbn")
        if ctx.train:  # tapped batch stats back to canonical widths (in-step pads only)
            subs = [("dense.bn", self.c2), ("one.bn", self.c2)] if bn_in_step else []
            if idbn_in_step:
                subs.append(("idbn", self.c1))
            for sub, cc in subs:
                bm, bv = ctx.updates[f"{self.path}.{sub}"]
                ctx.updates[f"{self.path}.{sub}"] = (bm[:cc], bv[:cc])
        return silu(y)

    def pad_vars(self, v):
        pad_n = max(self.pad_out - self.c2, 0) if self.pad_out else 0
        seen = getattr(self, "_pad_in_seen", 0)
        pad_in = max(seen - self.c1, 0) if (self.pad_in_ok and self.g == 1) else 0
        if not (pad_n or pad_in):
            return v

        def padk(k):
            if pad_in and k.shape[2] == self.c1 // self.g:
                k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_in), (0, 0)))
            if pad_n and k.shape[-1] == self.c2:
                k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad_n)))
            return k

        if "kernel" in v:  # fused deploy form
            b = jnp.pad(v["bias"], (0, pad_n)) if pad_n and v["bias"].shape[0] == self.c2 else v["bias"]
            return dict(v, kernel=padk(v["kernel"]), bias=b)

        def branch(bv):
            bn = _bn_pad(bv["bn"], self.pad_out) if pad_n and bv["bn"]["scale"].shape[0] == self.c2 else bv["bn"]
            return {"conv": {"kernel": padk(bv["conv"]["kernel"])}, "bn": bn}

        out = {"dense": branch(v["dense"]), "one": branch(v["one"])}
        if "idbn" in v:
            w = self.c1 + pad_in
            out["idbn"] = (
                {k2: jnp.pad(v2, (0, w - v2.shape[0])) for k2, v2 in v["idbn"].items()}
                if pad_in and v["idbn"]["scale"].shape[0] == self.c1
                else v["idbn"]
            )
        return out

    def unpad_vars(self, v):
        def cutk(k):
            if k.shape[2] > self.c1 // self.g:
                k = k[:, :, : self.c1 // self.g, :]
            if k.shape[-1] > self.c2:
                k = k[..., : self.c2]
            return k

        if "kernel" in v:
            return dict(v, kernel=cutk(v["kernel"]), bias=v["bias"][: self.c2])
        out = {
            name: {"conv": {"kernel": cutk(v[name]["conv"]["kernel"])}, "bn": {k2: v2[: self.c2] for k2, v2 in v[name]["bn"].items()}}
            for name in ("dense", "one")
        }
        if "idbn" in v:
            out["idbn"] = {k2: v2[: self.c1] for k2, v2 in v["idbn"].items()}
        return out

    def fuse_vars(self, v):
        if "kernel" in v:
            return v
        w3, b3 = _bn_fold(v["dense"]["bn"], v["dense"]["conv"]["kernel"])
        w1, b1 = _bn_fold(v["one"]["bn"], v["one"]["conv"]["kernel"])
        w1 = jnp.pad(w1, ((1, 1), (1, 1), (0, 0), (0, 0)))
        w, b = w3 + w1, b3 + b1
        if self.has_identity:
            cin = self.c1 // self.g
            ident = np.zeros((3, 3, cin, self.c2), np.float32)
            for i in range(self.c2):
                ident[1, 1, i % cin, i] = 1.0
            wid, bid = _bn_fold(v["idbn"], jnp.asarray(ident))
            w, b = w + wid, b + bid
        return {"kernel": w, "bias": b}


# ---------------------------------------------------------------------------
# Heads — reference head.py:21-305
# ---------------------------------------------------------------------------
def dfl_expectation(box_logits, reg_max: int = 16):
    """Distribution Focal Loss expectation decode (reference block.py:58 DFL).

    box_logits: (..., 4 * reg_max) -> (..., 4) expected distances. A softmax +
    arange dot instead of the reference's frozen-conv trick — same math, and XLA
    fuses it into the surrounding elementwise stream.
    """
    shape = box_logits.shape[:-1]
    x = box_logits.reshape(*shape, 4, reg_max).astype(jnp.float32)
    p = jax.nn.softmax(x, axis=-1)
    return jnp.einsum("...r,r->...", p, jnp.arange(reg_max, dtype=jnp.float32))


_FUSE_HEAD_TAIL = os.environ.get("DYT_FUSE_HEAD_TAIL", "0")  # 0|auto|1 (opt-in, see _branch_pair)


def _tail_fusible(m2, m3) -> bool:
    t2, t3 = m2.ms[-1], m3.ms[-1]
    return (
        isinstance(t2, Conv2dRaw)
        and isinstance(t3, Conv2dRaw)
        and t2.k == t3.k == 1
        and t2.s == t3.s == 1
        and t2.g == t3.g == 1
        and t2.bias
        and t3.bias
        and (_FUSE_HEAD_TAIL == "1" or (_FUSE_HEAD_TAIL == "auto" and t3.c2 < 16))
    )


def _branch_pair(m2, v2, m3, v3, x, ctx: Ctx):
    """concat(box_branch(x), cls_branch(x)) with a layout-aware tail fusion.

    When the class count is small (nc < 16, e.g. drone datasets), the cls
    tail's (B, H, W, nc) map is lane-padded up to 32x in HBM and XLA demotes
    the producing 1x1 conv to a loop fusion (measured 4 ms/level at nc=4 b256,
    ROUND3.md). Fusing the two 1x1 tail convs into ONE block-diagonal conv
    over the concatenated branch features emits the (B, H, W, 4*reg_max+nc)
    map directly — exact up to fp32 accumulation order (the cross blocks are
    zeros; only the partial-sum tree changes), parameters untouched.

    MEASURED (v5e): no net win — nc=4 b256 inference 90.4 -> 93.2 ms/step (the
    concat pushes the wide branch's SiLU into a hotter fusion), flagship b32
    train 162.6 -> 161.9 ms (noise). The padded narrow-map writes evidently
    overlap well in XLA's original schedule. Kept opt-in via
    DYT_FUSE_HEAD_TAIL=auto (nc<16) or =1 (always); default 0."""
    if not _tail_fusible(m2, m3):
        box = m2(v2, x, ctx)
        cls = m3(v3, x, ctx)
        return jnp.concatenate([box, cls], axis=-1)
    f2, f3 = x, x
    for i, mod in enumerate(m2.ms[:-1]):
        f2 = mod(v2["m"][str(i)], f2, ctx)
    for i, mod in enumerate(m3.ms[:-1]):
        f3 = mod(v3["m"][str(i)], f3, ctx)
    p2 = v2["m"][str(len(m2.ms) - 1)]
    p3 = v3["m"][str(len(m3.ms) - 1)]
    w2, w3 = p2["kernel"], p3["kernel"]  # (1, 1, cin, cout)
    c2i, c2o = w2.shape[2], w2.shape[3]
    c3i, c3o = w3.shape[2], w3.shape[3]
    w = jnp.zeros((1, 1, c2i + c3i, c2o + c3o), w2.dtype)
    w = w.at[:, :, :c2i, :c2o].set(w2).at[:, :, c2i:, c2o:].set(w3)
    b = jnp.concatenate([p2["bias"], p3["bias"]])
    f = jnp.concatenate([f2, f3], axis=-1).astype(ctx.dtype)
    return (conv2d(f, w, 1, 0, 1, 1) + b).astype(ctx.dtype)


class Detect(Module):
    """Anchor-free decoupled detection head (reference head.py:21).

    Per level: box branch cv2 -> 4*reg_max DFL logits, cls branch cv3 -> nc logits.
    Train output: list of per-level (B, H, W, 4*reg_max + nc) maps.
    Eval output adds decoded (B, A, 4 + nc): DFL expectation -> dist2bbox around
    grid anchors -> x stride, sigmoid class scores. Anchors are trace-time
    constants (static shapes), not runtime tensors.
    """

    def __init__(self, nc=80, ch=(), legacy=True, reg_max=16):
        self.nc = nc
        self.nl = len(ch)
        self.reg_max = reg_max
        self.no = nc + reg_max * 4
        self.stride = [8, 16, 32] if self.nl == 3 else [4, 8, 16, 32][: self.nl]  # overwritten at build
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = [
            _Seq(Conv(x, c2, 3), Conv(c2, c2, 3), Conv2dRaw(c2, 4 * reg_max, 1)) for x in ch
        ]
        if legacy:
            self.cv3 = [_Seq(Conv(x, c3, 3), Conv(c3, c3, 3), Conv2dRaw(c3, nc, 1)) for x in ch]
        else:
            # nested like the reference head.py:47 (Sequential of Sequentials)
            self.cv3 = [
                _Seq(_Seq(DWConv(x, x, 3), Conv(x, c3, 1)), _Seq(DWConv(c3, c3, 3), Conv(c3, c3, 1)), Conv2dRaw(c3, nc, 1))
                for x in ch
            ]

    def bias_init_vars(self, v, imgsz: int = 640):
        """Prior-prob bias init (reference head.py:133): requires strides set."""
        v = jax.tree_util.tree_map(lambda x: x, v)  # shallow copy
        for i, s in enumerate(self.stride):
            box_last = v["cv2"][str(i)]["m"][str(len(self.cv2[i].ms) - 1)]
            box_last["bias"] = jnp.ones_like(box_last["bias"])
            cls_last = v["cv3"][str(i)]["m"][str(len(self.cv3[i].ms) - 1)]
            cls_last["bias"] = jnp.full_like(cls_last["bias"], math.log(5 / self.nc / (imgsz / s) ** 2))
        return v

    def raw_maps(self, v, xs, ctx: Ctx):
        """Per-level (B, H, W, 4*reg_max + nc) prediction maps."""
        out = []
        for i, x in enumerate(xs):
            out.append(_branch_pair(self.cv2[i], v["cv2"][str(i)], self.cv3[i], v["cv3"][str(i)], x, ctx))
        return out

    def decode(self, maps):
        """maps -> (B, A, 4 + nc) with xywh pixel boxes and sigmoid scores."""
        from drone_yolo_tpu.ops.anchors import dist2bbox, make_anchors

        b = maps[0].shape[0]
        feat_shapes = [(m.shape[1], m.shape[2]) for m in maps]
        anchors, strides = make_anchors(feat_shapes, self.stride, 0.5)
        flat = jnp.concatenate([m.reshape(b, -1, self.no) for m in maps], axis=1)
        box_logits, cls_logits = flat[..., : 4 * self.reg_max], flat[..., 4 * self.reg_max :]
        dist = dfl_expectation(box_logits, self.reg_max)
        dbox = dist2bbox(dist, jnp.asarray(anchors)[None], xywh=True) * jnp.asarray(strides)[None]
        return jnp.concatenate([dbox, jax.nn.sigmoid(cls_logits.astype(jnp.float32))], axis=-1)

    def __call__(self, v, xs, ctx: Ctx):
        maps = self.raw_maps(v, xs, ctx)
        if ctx.train:
            return maps
        return self.decode(maps), maps


class v10Detect(Detect):
    """NMS-free end-to-end detection head (reference head.py:592, v10).

    Dual heads: one2many (train-time auxiliary) + one2one (deployed). Inference
    decodes the one2one maps and takes top max_det by score — no NMS. The
    one2one branches consume stop-gradient features (reference forward_end2end
    detaches x)."""

    def __init__(self, nc=80, ch=(), legacy=False, reg_max=16):
        super().__init__(nc, ch, legacy=True, reg_max=reg_max)  # cv2 same as Detect
        self.max_det = 300
        c3 = max(ch[0], min(nc, 100))
        def make_cv3(x):
            return _Seq(
                _Seq(Conv(x, x, 3, g=x), Conv(x, c3, 1)),
                _Seq(Conv(c3, c3, 3, g=c3), Conv(c3, c3, 1)),
                Conv2dRaw(c3, nc, 1),
            )

        self.cv3 = [make_cv3(x) for x in ch]
        c2 = max(16, ch[0] // 4, reg_max * 4)
        self.one2one_cv2 = [_Seq(Conv(x, c2, 3), Conv(c2, c2, 3), Conv2dRaw(c2, 4 * reg_max, 1)) for x in ch]
        self.one2one_cv3 = [make_cv3(x) for x in ch]

    def bias_init_vars(self, v, imgsz: int = 640):
        v = super().bias_init_vars(v, imgsz)
        for i, s in enumerate(self.stride):
            box_last = v["one2one_cv2"][str(i)]["m"][str(len(self.one2one_cv2[i].ms) - 1)]
            box_last["bias"] = jnp.ones_like(box_last["bias"])
            cls_last = v["one2one_cv3"][str(i)]["m"][str(len(self.one2one_cv3[i].ms) - 1)]
            cls_last["bias"] = jnp.full_like(cls_last["bias"], math.log(5 / self.nc / (imgsz / s) ** 2))
        return v

    def _one2one_maps(self, v, xs, ctx: Ctx):
        out = []
        for i, x in enumerate(xs):
            xd = jax.lax.stop_gradient(x)
            out.append(
                _branch_pair(self.one2one_cv2[i], v["one2one_cv2"][str(i)], self.one2one_cv3[i], v["one2one_cv3"][str(i)], xd, ctx)
            )
        return out

    def __call__(self, v, xs, ctx: Ctx):
        one2one = self._one2one_maps(v, xs, ctx)
        if ctx.train:
            one2many = self.raw_maps(v, xs, ctx)
            return {"one2many": one2many, "one2one": one2one}
        preds = self.decode(one2one)  # (B, A, 4 + nc) xywh + scores
        b, a, _ = preds.shape
        boxes, scores = preds[..., :4], preds[..., 4:]
        flat = scores.reshape(b, -1)
        k = min(self.max_det, a)
        top_scores, idx = jax.lax.top_k(flat, k)
        anchor_idx = idx // self.nc
        cls_idx = (idx % self.nc).astype(jnp.float32)
        sel = jnp.take_along_axis(boxes, anchor_idx[..., None], axis=1)
        from drone_yolo_tpu.ops.boxes import xywh2xyxy

        dets = jnp.concatenate([xywh2xyxy(sel), top_scores[..., None], cls_idx[..., None]], axis=-1)
        return dets, {"one2one": one2one}


class WorldDetect(Detect):
    """Open-vocabulary detection head (reference head.py:307): cls branch emits
    text-embedding-space features scored by a contrastive head against ctx.text."""

    def __init__(self, nc=80, embed=512, with_bn=False, ch=(), legacy=True):
        super().__init__(nc, ch, legacy=True)
        c3 = max(ch[0], min(nc, 100))
        self.cv3 = [_Seq(Conv(x, c3, 3), Conv(c3, c3, 3), Conv2dRaw(c3, embed, 1)) for x in ch]
        self.cv4 = [BNContrastiveHead(embed) if with_bn else ContrastiveHead() for _ in ch]

    def raw_maps(self, v, xs, ctx: Ctx):
        out = []
        for i, x in enumerate(xs):
            box = self.cv2[i](v["cv2"][str(i)], x, ctx)
            emb = self.cv3[i](v["cv3"][str(i)], x, ctx)
            cls = self.cv4[i](v["cv4"][str(i)], emb, ctx)
            out.append(jnp.concatenate([box, cls.astype(box.dtype)], axis=-1))
        return out

    def bias_init_vars(self, v, imgsz: int = 640):
        v = jax.tree_util.tree_map(lambda x: x, v)
        for i in range(self.nl):
            box_last = v["cv2"][str(i)]["m"][str(len(self.cv2[i].ms) - 1)]
            box_last["bias"] = jnp.ones_like(box_last["bias"])
        return v


class _Seq(Module):
    """Sequential container with numbered children under key 'm'."""

    def __init__(self, *ms):
        self.m = list(ms)

    @property
    def ms(self):
        return self.m

    def __call__(self, v, x, ctx: Ctx):
        for i, mod in enumerate(self.m):
            x = mod(v["m"][str(i)], x, ctx)
        return x


class Proto(Module):
    """Segmentation mask prototypes (reference block.py:80)."""

    def __init__(self, c1, c_=256, c2=32):
        self.cv1 = Conv(c1, c_, k=3)
        self.cv2 = Conv(c_, c_, k=3)
        self.cv3 = Conv(c_, c2)
        self.c_ = c_

    def init(self, key):
        v = super().init(key)
        # ConvTranspose2d(c_, c_, 2, 2) with bias (upsample conv)
        fan_in = self.c_ * 4
        v["up"] = {
            "kernel": _kaiming_uniform(_child_key(key, "up"), (2, 2, self.c_, self.c_), fan_in),
            "bias": _kaiming_uniform(_child_key(key, "upb"), (self.c_,), fan_in),
        }
        return v

    def __call__(self, v, x, ctx: Ctx):
        y = self.cv1(v["cv1"], x, ctx)
        y = jax.lax.conv_transpose(
            y.astype(ctx.dtype),
            v["up"]["kernel"].astype(ctx.dtype),
            strides=(2, 2),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,  # torch ConvTranspose2d orientation
        ) + v["up"]["bias"].astype(ctx.dtype)
        y = self.cv2(v["cv2"], y, ctx)
        return self.cv3(v["cv3"], y, ctx)


class Segment(Detect):
    """Segmentation head (reference head.py:175): Detect + proto masks + coeffs."""

    def __init__(self, nc=80, nm=32, npr=256, ch=(), legacy=True):
        super().__init__(nc, ch, legacy)
        self.nm, self.npr = nm, npr
        self.proto = Proto(ch[0], npr, nm)
        c4 = max(ch[0] // 4, nm)
        self.cv4 = [_Seq(Conv(x, c4, 3), Conv(c4, c4, 3), Conv2dRaw(c4, nm, 1)) for x in ch]

    def __call__(self, v, xs, ctx: Ctx):
        protos = self.proto(v["proto"], xs[0], ctx)  # (B, H/4*2, W/4*2, nm) at P3-based scale
        b = xs[0].shape[0]
        mc = jnp.concatenate(
            [self.cv4[i](v["cv4"][str(i)], x, ctx).reshape(b, -1, self.nm) for i, x in enumerate(xs)], axis=1
        )
        maps = self.raw_maps(v, xs, ctx)
        if ctx.train:
            return maps, mc, protos
        preds = self.decode(maps)
        return jnp.concatenate([preds, mc], axis=-1), (maps, mc, protos)


class Pose(Detect):
    """Pose head (reference head.py:230): Detect + keypoint regression branch."""

    def __init__(self, nc=80, kpt_shape=(17, 3), ch=(), legacy=True):
        super().__init__(nc, ch, legacy)
        self.kpt_shape = tuple(kpt_shape)
        self.nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(ch[0] // 4, self.nk)
        self.cv4 = [_Seq(Conv(x, c4, 3), Conv(c4, c4, 3), Conv2dRaw(c4, self.nk, 1)) for x in ch]

    def kpts_decode(self, kpts, feat_shapes):
        """Decode keypoints to pixel space (reference head.py:271)."""
        from drone_yolo_tpu.ops.anchors import make_anchors

        anchors, strides = make_anchors(feat_shapes, self.stride, 0.5)
        anchors, strides = jnp.asarray(anchors), jnp.asarray(strides)
        b, a, _ = kpts.shape
        y = kpts.reshape(b, a, *self.kpt_shape).astype(jnp.float32)
        xy = (y[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) * strides[None, :, None, :]
        if self.kpt_shape[1] == 3:
            conf = jax.nn.sigmoid(y[..., 2:3])
            y = jnp.concatenate([xy, conf], axis=-1)
        else:
            y = xy
        return y.reshape(b, a, self.nk)

    def __call__(self, v, xs, ctx: Ctx):
        b = xs[0].shape[0]
        kpt = jnp.concatenate(
            [self.cv4[i](v["cv4"][str(i)], x, ctx).reshape(b, -1, self.nk) for i, x in enumerate(xs)], axis=1
        )
        maps = self.raw_maps(v, xs, ctx)
        if ctx.train:
            return maps, kpt
        preds = self.decode(maps)
        feat_shapes = [(m.shape[1], m.shape[2]) for m in maps]
        pkpt = self.kpts_decode(kpt, feat_shapes)
        return jnp.concatenate([preds, pkpt], axis=-1), (maps, kpt)


class OBB(Detect):
    """Oriented bounding box head (reference head.py:200): Detect + angle branch."""

    def __init__(self, nc=80, ne=1, ch=(), legacy=True):
        super().__init__(nc, ch, legacy)
        self.ne = ne
        c4 = max(ch[0] // 4, ne)
        self.cv4 = [_Seq(Conv(x, c4, 3), Conv(c4, c4, 3), Conv2dRaw(c4, ne, 1)) for x in ch]

    def __call__(self, v, xs, ctx: Ctx):
        b = xs[0].shape[0]
        angle = jnp.concatenate(
            [self.cv4[i](v["cv4"][str(i)], x, ctx).reshape(b, -1, self.ne) for i, x in enumerate(xs)], axis=1
        )
        angle = (jax.nn.sigmoid(angle.astype(jnp.float32)) - 0.25) * math.pi  # [-pi/4, 3pi/4)
        maps = self.raw_maps(v, xs, ctx)
        if ctx.train:
            return maps, angle
        # decode with rotation-aware dist2rbox
        from drone_yolo_tpu.ops.anchors import dist2rbox, make_anchors

        feat_shapes = [(m.shape[1], m.shape[2]) for m in maps]
        anchors, strides = make_anchors(feat_shapes, self.stride, 0.5)
        flat = jnp.concatenate([m.reshape(b, -1, self.no) for m in maps], axis=1)
        box_logits, cls_logits = flat[..., : 4 * self.reg_max], flat[..., 4 * self.reg_max :]
        dist = dfl_expectation(box_logits, self.reg_max)
        rbox = dist2rbox(dist, angle, jnp.asarray(anchors)[None]) * jnp.asarray(strides)[None]
        preds = jnp.concatenate([rbox, jax.nn.sigmoid(cls_logits.astype(jnp.float32)), angle], axis=-1)
        return preds, (maps, angle)


class Classify(Module):
    """Classification head (reference head.py:282): conv -> GAP -> dropout -> linear."""

    def __init__(self, c1, c2, k=1, s=1, p=None, g=1):
        c_ = 1280
        self.conv = Conv(c1, c_, k, s, p, g)
        self.c_, self.c2 = c_, c2

    def init(self, key):
        v = super().init(key)
        v["linear"] = {
            "kernel": _kaiming_uniform(_child_key(key, "lw"), (self.c_, self.c2), self.c_),
            "bias": jnp.zeros((self.c2,), jnp.float32),
        }
        return v

    def __call__(self, v, x, ctx: Ctx):
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate(x, axis=-1)
        y = self.conv(v["conv"], x, ctx)
        y = jnp.mean(y.astype(jnp.float32), axis=(1, 2))  # global average pool
        y = y @ v["linear"]["kernel"] + v["linear"]["bias"]
        return y if ctx.train else jax.nn.softmax(y, axis=-1)


# ---------------------------------------------------------------------------
# extended zoo (round 2): remaining reference blocks used by legacy/aux yamls
# ---------------------------------------------------------------------------
class Conv2(Conv):
    """RepConv-style Conv with a parallel 1x1 branch summed before BN
    (reference conv.py:58); fuse folds the 1x1 into the kxk kernel center."""

    def __init__(self, c1, c2, k=3, s=1, p=None, g=1, d=1, act=True):
        super().__init__(c1, c2, k, s, p, g, d, act)

    def init(self, key):
        v = super().init(key)
        fan_in = self.c1 // self.g
        v["cv2"] = {"kernel": _kaiming_uniform(_child_key(key, "cv2"), (1, 1, self.c1 // self.g, self.c2), fan_in)}
        return v

    def __call__(self, v, x, ctx: Ctx):
        x = x.astype(ctx.dtype)
        y = conv2d(x, v["conv"]["kernel"], self.s, self.p, self.d, self.g)
        if "cv2" in v:
            y = y + conv2d(x, v["cv2"]["kernel"], self.s, 0, self.d, self.g)
        if "bn" in v:
            y = _bn_apply(v["bn"], y, ctx, f"{self.path}.bn")
        else:
            y = (y + v["conv"]["bias"]).astype(ctx.dtype)
        return silu(y) if self.act is True else y

    def fuse_vars(self, v):
        if "cv2" in v:
            w = v["conv"]["kernel"]
            pad = self.k // 2
            w = w.at[pad : pad + 1, pad : pad + 1].add(v["cv2"]["kernel"])
            v = {"conv": {"kernel": w}, **({"bn": v["bn"]} if "bn" in v else {})}
        return super().fuse_vars(v)


class ConvTranspose(Module):
    """ConvTranspose2d + optional BN + SiLU (reference conv.py:118)."""

    def __init__(self, c1, c2, k=2, s=2, p=0, bn=True, act=True):
        self.c1, self.c2, self.k, self.s, self.p = c1, c2, k, s, p
        self.bn, self.act = bn, act

    def init(self, key):
        fan_in = self.c1 * self.k * self.k
        v = {"kernel": _kaiming_uniform(_child_key(key, "w"), (self.k, self.k, self.c2, self.c1), fan_in)}
        if self.bn:
            v["bn"] = _bn_init(self.c2)
        else:
            v["bias"] = jnp.zeros((self.c2,), jnp.float32)
        return v

    def __call__(self, v, x, ctx: Ctx):
        x = x.astype(ctx.dtype)
        y = jax.lax.conv_transpose(
            x, v["kernel"].astype(x.dtype), (self.s, self.s),
            ((self.p, self.p), (self.p, self.p)) if self.p else "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
        )
        if "bn" in v:
            y = _bn_apply(v["bn"], y, ctx, f"{self.path}.bn")
        else:
            y = (y + v["bias"]).astype(ctx.dtype)
        return silu(y) if self.act is True else y


class DWConvTranspose2d(ConvTranspose):
    """Depth-wise transposed conv (reference conv.py:110): groups=gcd, no bn/act."""

    def __init__(self, c1, c2, k=1, s=1, p1=0, p2=0):
        assert c1 == c2, "depthwise transpose implemented for c1 == c2"
        super().__init__(c1, c2, k, s, p1, bn=False, act=False)

    def __call__(self, v, x, ctx: Ctx):
        x = x.astype(ctx.dtype)
        # feature_group_count path: apply per-channel transpose via grouped conv
        y = jax.lax.conv_transpose(
            x, v["kernel"].astype(x.dtype), (self.s, self.s),
            ((self.p, self.p), (self.p, self.p)) if self.p else "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
        )
        return (y + v["bias"]).astype(ctx.dtype)


class GhostBottleneck(Module):
    """Ghost bottleneck (reference block.py:316)."""

    def __init__(self, c1, c2, k=3, s=1):
        c_ = c2 // 2
        self.s = s
        self.g1 = GhostConv(c1, c_, 1, 1)
        self.dw = DWConv(c_, c_, k, s, act=False) if s == 2 else None
        self.g2 = GhostConv(c_, c2, 1, 1, act=False)
        if s == 2:
            self.sc_dw = DWConv(c1, c1, k, s, act=False)
            self.sc_pw = Conv(c1, c2, 1, 1, act=False)
        self.add = s == 1 and c1 == c2

    def __call__(self, v, x, ctx: Ctx):
        y = self.g1(v["g1"], x, ctx)
        if self.dw is not None:
            y = self.dw(v["dw"], y, ctx)
        y = self.g2(v["g2"], y, ctx)
        if self.s == 2:
            sc = self.sc_pw(v["sc_pw"], self.sc_dw(v["sc_dw"], x, ctx), ctx)
            return y + sc
        return x + y if self.add else y


class RectConv(Module):
    """Conv+BN+SiLU with an asymmetric (kh, kw) kernel (C3x cross convs)."""

    def __init__(self, c1, c2, k=(1, 3), s=1, act=True):
        self.c1, self.c2, self.kh, self.kw, self.s, self.act = c1, c2, k[0], k[1], s, act

    def init(self, key):
        fan_in = self.c1 * self.kh * self.kw
        return {
            "conv": {"kernel": _kaiming_uniform(key, (self.kh, self.kw, self.c1, self.c2), fan_in)},
            "bn": _bn_init(self.c2),
        }

    def __call__(self, v, x, ctx: Ctx):
        x = x.astype(ctx.dtype)
        y = jax.lax.conv_general_dilated(
            x, v["conv"]["kernel"].astype(x.dtype), (self.s, self.s),
            ((self.kh // 2, self.kh // 2), (self.kw // 2, self.kw // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = _bn_apply(v["bn"], y, ctx, f"{self.path}.bn")
        return silu(y) if self.act is True else y


class _CrossBottleneck(Module):
    """Bottleneck with (1,3)/(3,1) cross kernels (reference C3x's Bottleneck)."""

    def __init__(self, c1, c2, shortcut=True, e=1.0):
        c_ = int(c2 * e)
        self.cv1 = RectConv(c1, c_, (1, 3))
        self.cv2 = RectConv(c_, c2, (3, 1))
        self.add = shortcut and c1 == c2

    def __call__(self, v, x, ctx: Ctx):
        y = self.cv2(v["cv2"], self.cv1(v["cv1"], x, ctx), ctx)
        return x + y if self.add else y


class C3x(C3):
    """C3 with cross convolutions (reference block.py C3x)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)
        c_ = int(c2 * e)
        self.m = [_CrossBottleneck(c_, c_, shortcut, e=1.0) for _ in range(n)]


class C3Ghost(C3):
    """C3 with GhostBottlenecks (reference block.py C3Ghost)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)
        c_ = int(c2 * e)
        self.m = [GhostBottleneck(c_, c_) for _ in range(n)]


class TransformerLayer(Module):
    """Self-attention + 2-linear FFN, both residual, no norms
    (reference transformer.py:118)."""

    def __init__(self, c, num_heads):
        from drone_yolo_tpu.nn.transformer import Linear

        self.c, self.nh = c, num_heads
        self.q = Linear(c, c, bias=False)
        self.k = Linear(c, c, bias=False)
        self.v = Linear(c, c, bias=False)
        # torch MultiheadAttention in/out projections
        self.in_proj = Linear(c, 3 * c)
        self.out_proj = Linear(c, c)
        self.fc1 = Linear(c, c, bias=False)
        self.fc2 = Linear(c, c, bias=False)

    def _mha(self, v, q, k, val, ctx):
        b, n, c = q.shape
        hd = c // self.nh
        w, bias = v["in_proj"]["kernel"], v["in_proj"]["bias"]
        qp = q @ w[:, :c] + bias[:c]
        kp = k @ w[:, c : 2 * c] + bias[c : 2 * c]
        vp = val @ w[:, 2 * c :] + bias[2 * c :]
        qh = qp.reshape(b, n, self.nh, hd)
        kh = kp.reshape(b, -1, self.nh, hd)
        vh = vp.reshape(b, -1, self.nh, hd)
        attn = jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(hd), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, n, c)
        return self.out_proj(v["out_proj"], out, ctx)

    def __call__(self, v, x, ctx: Ctx):
        q = self.q(v["q"], x, ctx)
        k = self.k(v["k"], x, ctx)
        val = self.v(v["v"], x, ctx)
        x = self._mha(v, q, k, val, ctx) + x
        return self.fc2(v["fc2"], self.fc1(v["fc1"], x, ctx), ctx) + x


class TransformerBlock(Module):
    """Vision transformer over an NHWC map (reference transformer.py:137)."""

    def __init__(self, c1, c2, num_heads, num_layers):
        from drone_yolo_tpu.nn.transformer import Linear

        self.conv = Conv(c1, c2) if c1 != c2 else None
        self.linear = Linear(c2, c2)  # learned positional embedding
        self.tr = [TransformerLayer(c2, num_heads) for _ in range(num_layers)]
        self.c2 = c2

    def __call__(self, v, x, ctx: Ctx):
        if self.conv is not None:
            x = self.conv(v["conv"], x, ctx)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c)
        p = p + self.linear(v["linear"], p, ctx)
        for i, t in enumerate(self.tr):
            p = t(v["tr"][str(i)], p, ctx)
        return p.reshape(b, h, w, self.c2)


class C3TR(C3):
    """C3 with a TransformerBlock core (reference block.py C3TR)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)
        c_ = int(c2 * e)
        self.m = [TransformerBlock(c_, c_, 4, n)]


class BottleneckCSP(Module):
    """Original CSP bottleneck (reference block.py:353)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        c_ = int(c2 * e)
        self.c_ = c_
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv2dRaw(c1, c_, 1, 1, p=0, bias=False)
        self.cv3 = Conv2dRaw(c_, c_, 1, 1, p=0, bias=False)
        self.cv4 = Conv(2 * c_, c2, 1, 1)
        self.m = [Bottleneck(c_, c_, shortcut, g, e=1.0) for _ in range(n)]

    def init(self, key):
        v = super().init(key)
        v["bn"] = _bn_init(2 * self.c_)
        return v

    def __call__(self, v, x, ctx: Ctx):
        a = self.cv1(v["cv1"], x, ctx)
        for i, m in enumerate(self.m):
            a = m(v["m"][str(i)], a, ctx)
        y1 = self.cv3(v["cv3"], a, ctx)
        y2 = self.cv2(v["cv2"], x, ctx)
        y = _bn_apply(v["bn"], jnp.concatenate([y1, y2], axis=-1), ctx, f"{self.path}.bn")
        return self.cv4(v["cv4"], silu(y).astype(ctx.dtype), ctx)


class ResNetBlock(Module):
    """ResNet bottleneck block (reference block.py:375)."""

    def __init__(self, c1, c2, s=1, e=4):
        c3 = e * c2
        self.cv1 = Conv(c1, c2, 1, 1)
        self.cv2 = Conv(c2, c2, 3, s)
        self.cv3 = Conv(c2, c3, 1, act=False)
        self.short = Conv(c1, c3, 1, s, act=False) if s != 1 or c1 != c3 else None

    def __call__(self, v, x, ctx: Ctx):
        y = self.cv3(v["cv3"], self.cv2(v["cv2"], self.cv1(v["cv1"], x, ctx), ctx), ctx)
        sc = self.short(v["short"], x, ctx) if self.short is not None else x
        return jax.nn.relu(y + sc)


class ResNetLayer(Module):
    """Stack of ResNet blocks, or the stem when is_first (reference block.py:392)."""

    def __init__(self, c1, c2, s=1, is_first=False, n=1, e=4):
        self.is_first = is_first
        if is_first:
            self.stem = Conv(c1, c2, 7, 2, p=3)
        else:
            self.blocks = [ResNetBlock(c1, c2, s, e=e)] + [ResNetBlock(e * c2, c2, 1, e=e) for _ in range(n - 1)]

    def __call__(self, v, x, ctx: Ctx):
        if self.is_first:
            y = self.stem(v["stem"], x, ctx)
            return max_pool2d(y, 3, 2, 1)
        for i, b in enumerate(self.blocks):
            x = b(v["blocks"][str(i)], x, ctx)
        return x


class MaxPool2d(Module):
    """Raw torch nn.MaxPool2d analog for yaml rows like yolov3-tiny's
    `[-1, 1, nn.MaxPool2d, [2, 2, 0]]` (reference v3/yolov3-tiny.yaml)."""

    def __init__(self, k=2, s=2, p=0):
        self.k, self.s, self.p = int(k), int(s), int(p)

    def init(self, key):
        return {}

    def __call__(self, v, x, ctx: Ctx):
        return max_pool2d(x, self.k, self.s, self.p)


class ZeroPad2d(Module):
    """Raw torch nn.ZeroPad2d analog; padding = (left, right, top, bottom)."""

    def __init__(self, padding):
        self.padding = tuple(int(p) for p in (padding if not isinstance(padding, int) else (padding,) * 4))

    def init(self, key):
        return {}

    def __call__(self, v, x, ctx: Ctx):
        l, r, t, b = self.padding
        return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


class _BasicResBlock(Module):
    """Two-conv residual block (torchvision BasicBlock analog, expansion 1)."""

    def __init__(self, c1, c2, s=1):
        self.cv1 = Conv(c1, c2, 3, s, act="relu")
        self.cv2 = Conv(c2, c2, 3, 1, act=False)
        self.down = Conv(c1, c2, 1, s, act=False) if (s != 1 or c1 != c2) else None

    def __call__(self, v, x, ctx: Ctx):
        idn = x if self.down is None else self.down(v["down"], x, ctx)
        y = self.cv2(v["cv2"], self.cv1(v["cv1"], x, ctx), ctx)
        return jax.nn.relu(y + idn)


class TorchVision(Module):
    """Native trunk standing in for the reference's TorchVision loader module
    (reference block.py:1115, used by 11/yolo11-cls-resnet18.yaml).

    The reference instantiates `torchvision.models.<name>` and truncates the
    classifier; torchvision is not a dependency here, so the supported trunks
    (resnet18/resnet34) are built natively in JAX with the same topology.
    `weights` is accepted for yaml compatibility but pretrained tensors must be
    converted offline via utils/torch_convert (zero-egress image).
    """

    _STAGES = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3)}

    def __init__(self, model="resnet18", weights="DEFAULT", unwrap=True, truncate=2, split=False):
        if model not in self._STAGES or not unwrap or truncate < 2 or split:
            raise NotImplementedError(f"native TorchVision trunk supports {sorted(self._STAGES)} with unwrap=True, truncate>=2, split=False (got {model})")
        depths = self._STAGES[model]
        self.stem = Conv(3, 64, 7, 2, p=3, act="relu")
        self.blocks = []  # flat block list (child discovery handles flat lists)
        cin = 64
        for si, (cout, n) in enumerate(zip((64, 128, 256, 512), depths)):
            self.blocks.append(_BasicResBlock(cin, cout, s=1 if si == 0 else 2))
            self.blocks += [_BasicResBlock(cout, cout, 1) for _ in range(n - 1)]
            cin = cout

    def __call__(self, v, x, ctx: Ctx):
        x = self.stem(v["stem"], x, ctx)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        for bi, b in enumerate(self.blocks):
            x = b(v["blocks"][str(bi)], x, ctx)
        return x


class C2fPSA(C2f):
    """C2f with PSA attention blocks (reference block.py:1048)."""

    def __init__(self, c1, c2, n=1, e=0.5):
        assert c1 == c2
        super().__init__(c1, c2, n=n, shortcut=False, e=e)
        self.m = [PSABlock(self.c, attn_ratio=0.5, num_heads=max(1, self.c // 64)) for _ in range(n)]


class Index(Module):
    """Select one tensor from a list input (reference conv.py:336)."""

    def __init__(self, index=0):
        self.index = index

    def __call__(self, v, x, ctx: Ctx):
        return x[self.index]


class AGLU(Module):
    """Unified activation (reference activation.py:8): learnable lambda/kappa."""

    def __init__(self, *_args):
        pass

    def init(self, key):
        return {
            "lambd": jax.random.uniform(_child_key(key, "l"), (1,), jnp.float32),
            "kappa": jax.random.uniform(_child_key(key, "k"), (1,), jnp.float32),
        }

    def __call__(self, v, x, ctx: Ctx):
        lam = jnp.clip(v["lambd"], 0.0001, None)
        # Softplus(beta=-1): -log(1 + exp(-x))
        inner = v["kappa"] * x - jnp.log(lam)
        return jnp.exp((1.0 / lam) * (-jnp.log1p(jnp.exp(-inner))))
