"""Task models: graph executor + init/fuse/stride-probe over the built layer list.

Parity with `ultralytics/nn/tasks.py:95-681` (BaseModel/DetectionModel/...), minus
the torch-isms: the forward here is a pure function of (variables, input) that is
traced exactly once per shape under jit; `fuse()` is a pytree->pytree weight
transform instead of module surgery; stride probing uses `jax.eval_shape` (zero
FLOPs) instead of a dummy forward.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from drone_yolo_tpu.nn import modules as M
from drone_yolo_tpu.nn.build import parse_model, yaml_model_load
from drone_yolo_tpu.utils import LOGGER


class BaseModel:
    """Executable detection/segmentation/pose/obb/classify graph."""

    task = "detect"

    def __init__(self, cfg="yolov8n.yaml", ch: int = 3, nc: int | None = None, verbose: bool = False):
        self.yaml = cfg if isinstance(cfg, dict) else yaml_model_load(cfg)
        if nc and nc != self.yaml.get("nc"):
            LOGGER.info(f"Overriding model.yaml nc={self.yaml.get('nc')} with nc={nc}")
            self.yaml["nc"] = nc
        self.ch = ch
        self.layers, self.save, self.nc, self.ch_list = parse_model(self.yaml, ch=ch, verbose=verbose)
        # dotted paths mirror torch state_dict names ("model.<i>....") for conversion
        for spec in self.layers:
            spec.module.set_paths(f"model.{spec.i}")
        self.head = self.layers[-1].module
        self.names = {i: f"class{i}" for i in range(self.nc)}
        self.stride = np.array([32.0])
        self._probe_strides()

    # -- construction -------------------------------------------------------
    def _probe_strides(self, imgsz: int = 256):
        """Discover per-level strides from static output shapes (tasks.py:326-337)."""
        head = self.head
        if not isinstance(head, M.Detect):
            self.stride = np.array([1.0])
            return
        var_shapes = jax.eval_shape(lambda k: self.init_raw(k), jax.random.PRNGKey(0))
        x = jax.ShapeDtypeStruct((1, imgsz, imgsz, self.ch), jnp.float32)

        def fwd(v, xx):
            out = self.apply(v, xx, train=True)
            if isinstance(out, dict):  # v10 end-to-end head
                return out["one2many"]
            return out[0] if isinstance(out, tuple) else out

        map_shapes = jax.eval_shape(fwd, var_shapes, x)
        strides = [imgsz / m.shape[1] for m in map_shapes]
        head.stride = [int(s) for s in strides]
        self.stride = np.array(head.stride, dtype=np.float32)

    def init_raw(self, key):
        """Initialize all layer variables (no bias priors)."""
        return {
            str(spec.i): spec.module.init(jax.random.fold_in(key, spec.i)) for spec in self.layers
        }

    def init(self, key, imgsz: int = 640):
        """Initialize variables with detection bias priors applied (head.py:133)."""
        v = self.init_raw(key)
        if isinstance(self.head, M.Detect):
            v[str(self.layers[-1].i)] = self.head.bias_init_vars(v[str(self.layers[-1].i)], imgsz=imgsz)
        return v

    # -- execution ----------------------------------------------------------
    def apply(self, variables, x, train: bool = False, ctx: M.Ctx | None = None):
        """Run the graph. Returns the head output (train: raw maps; eval: decoded).

        The per-layer Python loop runs at *trace* time only; the compiled program
        is a flat XLA graph (contrast reference tasks.py:147-161 which interprets
        the layer list every forward).
        """
        ctx = ctx or M.Ctx(train=train)
        y: list = []
        out = x
        for spec in self.layers:
            f = spec.f
            if f == -1:
                xin = out
            elif isinstance(f, int):
                xin = y[f]
            else:
                xin = [out if j == -1 else y[j] for j in f]
            # .get: parameter-free layers (Upsample/Concat) vanish through
            # flatten/unflatten checkpoint round-trips
            out = spec.module(variables.get(str(spec.i), {}), xin, ctx)
            y.append(out if spec.i in self.save else None)
        return out

    def __call__(self, variables, x, train: bool = False, ctx: M.Ctx | None = None):
        return self.apply(variables, x, train=train, ctx=ctx)

    def predict_augmented(self, variables, x, ctx=None):
        """Test-time augmentation (reference tasks.py:339 _predict_augment):
        3 forward passes at scales (1.0, 0.83, 0.67) with an lr-flip at 0.83,
        predictions descaled/unflipped to the input frame and concatenated.
        Each scale is its own static shape -> compiles once per scale."""
        import jax.numpy as jnp

        from drone_yolo_tpu.nn import modules as M

        ctx = ctx or M.Ctx(train=False)
        b, h, w, c = x.shape
        gs = int(max(self.stride))
        outs = []
        for scale, flip in ((1.0, None), (0.83, "lr"), (0.67, None)):
            sh = max(int(round(h * scale / gs)) * gs, gs)
            sw = max(int(round(w * scale / gs)) * gs, gs)
            xi = x if (sh, sw) == (h, w) else jax.image.resize(x, (b, sh, sw, c), method="bilinear")
            if flip == "lr":
                xi = xi[:, :, ::-1, :]
            out = self.apply(variables, xi, ctx=M.Ctx(train=False, dtype=ctx.dtype))
            preds = out[0] if isinstance(out, tuple) else out  # (B, A, 4+nc) xywh pixels
            boxes, scores = preds[..., :4], preds[..., 4:]
            # descale to the original frame
            sx, sy = w / sw, h / sh
            bx = boxes * jnp.asarray([sx, sy, sx, sy], boxes.dtype)
            if flip == "lr":
                bx = jnp.concatenate([w - bx[..., 0:1], bx[..., 1:]], axis=-1)
            outs.append(jnp.concatenate([bx, scores], axis=-1))
        return jnp.concatenate(outs, axis=1)

    # -- transforms ---------------------------------------------------------
    def enable_spd_stem(self) -> bool:
        """Swap the stem conv's execution for the space-to-depth reformulation
        (modules.SPDConv): an EXACT compute-schedule change — parameters,
        gradients, and checkpoints are untouched, so weight parity with the
        reference is preserved. Returns True if applied (stem must be a plain
        k3 s2 Conv). Idempotent."""
        spec = self.layers[0]
        mod = spec.module
        if isinstance(mod, M.SPDConv):
            return True
        if type(mod) is M.Conv and mod.k == 3 and mod.s == 2 and mod.p == 1 and mod.g == 1 and mod.d == 1:
            spec.module = M.SPDConv(mod)
            return True
        return False

    def enable_spd_stride2(self) -> int:
        """Execute EVERY top-level k3 s2 p1 conv (Conv/DWConv incl. grouped,
        RepVGGBlock stride-2 blocks, the stem) in space-to-depth form.

        Same exactness contract as enable_spd_stem: parameters, gradients, BN,
        and checkpoints are untouched — the SPD kernels are built from the
        original 3x3 parameters inside the traced step, so reference weight
        parity survives. Motivation: xprof shows XLA's stride-2 conv BACKWARD
        at small channel counts emitting dim-split wgrad layouts plus physical
        transposes of the big P1/P2 activations; the k2 s1 form avoids them
        and quadruples the MXU contraction depth. Downsample blocks live at
        the graph's top level (C2f internals are stride-1), so walking
        `self.layers` covers the network. Returns the number of convs
        transformed. Idempotent."""
        n = 0
        for spec in self.layers:
            mod = spec.module
            if isinstance(mod, M.RepVGGBlock) and mod.s == 2:
                mod.spd = True
                n += 1
            elif isinstance(mod, M.Conv) and mod.k == 3 and mod.s == 2 and mod.p == 1 and mod.d == 1:
                mod.spd = True
                n += 1
        return n

    def enable_lane_pad(self, target: int = 128, inner_target: int | None = None) -> int:
        """Zero-pad narrow (< target channel) top-level convs to `target` lanes
        INSIDE the traced step — an EXACT schedule change, like enable_spd_*.

        Motivation (xprof, ROUND3.md §2 / ROUND4): at C<=64 XLA assigns
        dim-split wgrad layouts around the P1/P2 stride-2 convs and emits
        physical transposes of the 100-200 MB activations (layout/copy was
        55-70% of the flagship train step, the convolutions 6%). At C=128 the
        lanes are full and the dim-splits disappear; a width-bumped probe of
        the padded graph measured +20% step throughput DESPITE the extra math.
        This in-step transform lands +7.6% (162.1 -> 150.7 ms/step, flagship
        b32; per-family xprof: dim-split wgrad fusions 51 -> 18 ms, copies
        28 -> 10 ms per 2 steps, partially offset by the padded convs' real
        MXU time and 4x BN-stat traffic at P1/P2).

        Exactness: padded kernel/BN-param slots are zeros built in-step from
        the canonical params, so padded activations are exact zeros in every
        mode, every consumer contribution through them is zero, and autodiff
        of the pads yields exact slices — the real channels compute the SAME
        mathematical function and the canonical params/optimizer/EMA/
        checkpoints are untouched. Not bit-exact: the zeros inserted inside
        the conv reduction re-pair the real summands in the backend's
        accumulation (~4e-5 fp32 reassociation noise, tests/test_lane_pad.py).
        Consumers accept padded inputs by zero-padding kernel C_in rows (g==1)
        or slicing (grouped convs, Concat — positional semantics).

        Returns the number of modules padded. Idempotent."""
        padded: dict[int, int] = {}  # layer index -> canonical c2
        n = 0
        for spec in self.layers:
            mod = spec.module
            if isinstance(mod, M.RepVGGBlock) and mod.g == 1 and mod.c2 < target and not mod.spd:
                mod.pad_out = target
                padded[spec.i] = mod.c2
                n += 1
            elif type(mod) in (M.Conv, M.SPDConv) and mod.g == 1 and mod.c2 < target and not mod.spd:
                mod.pad_out = target
                padded[spec.i] = mod.c2
                n += 1
            elif type(mod) is M.C2f and mod.cv2.c2 < target:
                # positional internals (cv1's 2-way chunk split, the (2+n)-way
                # concat into cv2) pad block-wise so chunk boundaries stay
                # aligned; the narrow bottleneck convs are lane-padded too —
                # they carry the same dim-split wgrad problem as the top-level
                # convs (phase-A measurement: outputs-only padding LOST 6%,
                # internals are where the probe's +20% lives)
                # half-lane internals measured best (flagship b32, ms/step):
                # inner=64 -> 150.7, inner=128 -> 162.5 (the 4x-wider
                # bottlenecks' real compute eats the layout win), no padding
                # -> 162.1. Half-lane still kills the dim-split wgrads.
                inner = inner_target or max(64, target // 2)
                c = mod.c
                if c < inner:
                    mod.cv1.pad_out_spec = (c, inner, 2)
                    mod.cv2.pad_in_spec = (c, inner, 2 + len(mod.m))
                    for b in mod.m:
                        b.cv1.pad_in_ok = True
                        b.cv1.pad_out = inner
                        b.cv2.pad_in_ok = True
                        b.cv2.pad_out = inner
                mod.cv2.pad_out = target
                padded[spec.i] = mod.cv2.c2
                n += 1
            elif type(mod) is M.C2f and inner_target and mod.c < inner_target and mod.cv2.c2 >= target:
                # internals-only: the narrow bottleneck chunks carry the
                # dim-split wgrad problem even when the C2f OUTPUT is already
                # lane-aligned (e.g. target=64 leaves the 64-wide P2 C2f
                # unqualified while its 32-wide internal chunks still split).
                # cv2 absorbs the padded concat via pad_in_spec and produces
                # the CANONICAL width — no downstream Concat bookkeeping.
                inner = inner_target
                mod.cv1.pad_out_spec = (mod.c, inner, 2)
                mod.cv2.pad_in_spec = (mod.c, inner, 2 + len(mod.m))
                for b in mod.m:
                    b.cv1.pad_in_ok = True
                    b.cv1.pad_out = inner
                    b.cv2.pad_in_ok = True
                    b.cv2.pad_out = inner
                n += 1
        # NOT padded, by measurement: the Detect cv2/cv3 towers (64-80ch convs,
        # the P2 tower at 160^2). Padding all levels ran 155.3 ms/step, the P2
        # level alone 154.8, no head padding 150.7 (flagship b32) — the padded
        # towers' real extra compute exceeds their layout win.
        if not n:
            return 0

        def allow(mod):
            if isinstance(mod, (M.Conv, M.RepVGGBlock, M.Conv2dRaw)):
                mod.pad_in_ok = True
                if isinstance(mod, M.Conv) and mod.g > 1:
                    # grouped consumers of a padded input run as a dense
                    # block-diagonal conv instead of materializing a slice of
                    # the big padded activation (the taps sit at 320^2/160^2)
                    mod.dense_pad_in = True
            for child in mod.children().values():
                for m in child if isinstance(child, list) else [child]:
                    allow(m)

        for spec in self.layers:
            allow(spec.module)

        # Concat is positional: its consumers see shifted channel offsets when
        # any input is padded. Preferred (copy-free): give every consumer conv
        # a per-block pad_in_map so ITS kernel rows absorb the padding; fall
        # back to trimming at the Concat only when some consumer cannot.
        consumers: dict[int, list] = {}
        for spec in self.layers:
            fs = spec.f if isinstance(spec.f, (list, tuple)) else [spec.f]
            for j in fs:
                consumers.setdefault(spec.i - 1 if j == -1 else j, []).append(spec)

        for spec in self.layers:
            mod = spec.module
            if not (isinstance(mod, M.Concat) and isinstance(spec.f, (list, tuple))):
                continue
            srcs = [spec.i - 1 if j == -1 else j for j in spec.f]
            if not any(j in padded for j in srcs):
                continue
            in_map = [(self.ch_list[j], target if j in padded else self.ch_list[j]) for j in srcs]
            targets = []
            for cons in consumers.get(spec.i, []):
                cm = cons.module
                if type(cm) is M.C2f:
                    targets.append(cm.cv1)
                elif isinstance(cm, M.Conv) and cm.g == 1:
                    targets.append(cm)
                else:
                    targets = None
                    break
            if targets:
                for t in targets:
                    t.pad_in_map = in_map
            else:
                mod.trim_to = [padded.get(j) for j in srcs]
        return n

    def pad_variables(self, variables, imgsz: int = 256):
        """Bake every lane pad into the stored masters (padded-state mode).

        enable_lane_pad keeps canonical masters and builds the zero-padded
        kernels/BN params INSIDE the traced step; that in-step transform costs
        per-step pad/scatter kernels and grad slices (xprof: most of the
        150.7 -> 135.3 ms/step gap to the width-bumped probe). This returns a
        tree where the pads are already in the arrays, so the step touches no
        canonical<->padded plumbing at all.

        Correctness: a padded-state train step is EXACTLY the in-step-padded
        step with the pad/slice ops hoisted out, because the padded slots are
        invariant under training — their activations are exact zeros (BN
        gamma/beta pads are zero), every consumer contracts them against
        exact-zero kernel rows, so their gradients are exact floating-point
        zeros, and zero grads + zero momentum + multiplicative weight decay/
        EMA keep the slots at exactly zero forever (asserted in
        tests/test_lane_pad.py). Checkpoints stay canonical via
        unpad_variables. The grouped dense_pad_in expansion stays in-step —
        its off-block slots WOULD receive gradients.

        Call after enable_lane_pad; idempotent. One abstract forward records
        each pad-in consumer's padded input width first."""
        x = jax.ShapeDtypeStruct((1, imgsz, imgsz, self.ch), jnp.float32)
        shapes = jax.tree_util.tree_map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)
        jax.eval_shape(lambda v, xx: self.apply(v, xx, train=True), shapes, x)
        return {str(spec.i): spec.module.pad_vars(variables.get(str(spec.i), {})) for spec in self.layers}

    def unpad_variables(self, variables):
        """Padded-state masters -> canonical masters (exact slices; the inverse
        of pad_variables, used for checkpoint save / export)."""
        return {str(spec.i): spec.module.unpad_vars(variables.get(str(spec.i), {})) for spec in self.layers}

    def fuse(self, variables):
        """Fold BN into convs and collapse RepVGG branches (pure weight transform).

        Reference equivalents: BaseModel.fuse (tasks.py:210-230) and
        RepVGGBlock.switch_to_deploy (block.py:1421).
        """
        return {str(spec.i): spec.module.fuse_vars(variables.get(str(spec.i), {})) for spec in self.layers}

    def merge_bn_updates(self, variables, updates: dict, momentum: float = M.BN_MOMENTUM):
        """Fold collected batch statistics into running stats: new = (1-m)*old + m*batch.

        `updates` maps dotted BN paths ("model.0.bn") to (batch_mean, batch_var)
        as collected by Ctx during a train-mode forward.
        """

        def walk(node, prefix):
            if not isinstance(node, dict):
                return node
            if prefix in updates and "mean" in node and "var" in node:
                bm, bv = updates[prefix]
                n = {**node}
                n["mean"] = (1 - momentum) * node["mean"] + momentum * bm
                n["var"] = (1 - momentum) * node["var"] + momentum * bv
                return n
            return {k: walk(val, f"{prefix}.{k}" if prefix else k) for k, val in node.items()}

        return {i: walk(v, f"model.{i}") for i, v in variables.items()}

    def param_count(self, variables) -> int:
        return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables))

    def flops(self, variables, imgsz: int = 640) -> float:
        """Forward GFLOPs from XLA cost analysis (replaces the reference's thop
        profiling, utils/torch_utils.py:303 get_flops)."""
        import jax.numpy as jnp

        from drone_yolo_tpu.nn import modules as M

        def fwd(v, x):
            out = self.apply(v, x, ctx=M.Ctx(train=False, dtype=jnp.float32))
            return out[0] if isinstance(out, tuple) else out

        x = jnp.zeros((1, imgsz, imgsz, self.ch), jnp.float32)
        try:
            analysis = jax.jit(fwd).lower(variables, x).cost_analysis()
            if isinstance(analysis, list):
                analysis = analysis[0]
            return float(analysis.get("flops", 0.0)) / 1e9
        except Exception:  # noqa: BLE001 - cost analysis is backend-dependent
            return 0.0

    def info(self, variables=None, imgsz: int = 640, flops: bool = False):
        n = self.param_count(variables) if variables is not None else -1
        msg = f"{self.__class__.__name__}: {len(self.layers)} layers, {n:,} parameters, task={self.task}"
        if flops and variables is not None:
            msg += f", {self.flops(variables, imgsz):.1f} GFLOPs@{imgsz}"
        LOGGER.info(msg)
        return msg


class DetectionModel(BaseModel):
    task = "detect"


class SegmentationModel(DetectionModel):
    task = "segment"


class PoseModel(DetectionModel):
    task = "pose"

    def __init__(self, cfg="yolov8n-pose.yaml", ch=3, nc=None, data_kpt_shape=(None, None), verbose=False):
        if isinstance(cfg, (str,)):
            cfg = yaml_model_load(cfg)
        if any(data_kpt_shape) and list(data_kpt_shape) != list(cfg.get("kpt_shape", [])):
            cfg["kpt_shape"] = list(data_kpt_shape)
        super().__init__(cfg, ch=ch, nc=nc, verbose=verbose)


class OBBModel(DetectionModel):
    task = "obb"


class WorldModel(DetectionModel):
    """YOLO-World open-vocabulary model (reference tasks.py:595 WorldModel).

    Class semantics come from text embeddings: `set_classes` installs (nc, 512)
    embeddings (precomputed, or CLIP-encoded when weights are available locally);
    the graph threads them to MaxSigmoidAttnBlock/ContrastiveHead via Ctx.text.
    """

    task = "detect"

    def __init__(self, cfg="yolov8s-worldv2.yaml", ch=3, nc=None, verbose=False):
        self.txt_feats = np.random.default_rng(0).standard_normal((1, nc or 80, 512)).astype(np.float32)
        super().__init__(cfg, ch=ch, nc=nc, verbose=verbose)

    def set_classes(self, names, embeddings=None):
        """Install class texts. `embeddings` (n, 512) may be precomputed; otherwise
        CLIP via transformers is attempted (requires local weights)."""
        if embeddings is None:
            embeddings = clip_text_embeddings(names)
        e = np.asarray(embeddings, np.float32)
        e = e / (np.linalg.norm(e, axis=-1, keepdims=True) + 1e-12)
        self.txt_feats = e[None]
        self.names = dict(enumerate(names))
        self.head.nc = self.nc = len(names)
        self.head.no = self.head.reg_max * 4 + self.nc  # decode split width

    def apply(self, variables, x, train: bool = False, ctx=None):
        from drone_yolo_tpu.nn import modules as M_

        ctx = ctx or M_.Ctx(train=train)
        if ctx.text is None:
            # per-batch sampled texts (world training) ride in the targets dict;
            # otherwise fall back to the static set_classes vocabulary
            if ctx.targets is not None and isinstance(ctx.targets, dict) and "txt_feats" in ctx.targets:
                ctx.text = ctx.targets["txt_feats"].astype(jnp.float32)
            else:
                txt = jnp.asarray(self.txt_feats)
                ctx.text = jnp.broadcast_to(txt, (x.shape[0], *txt.shape[1:]))
        return super().apply(variables, x, train=train, ctx=ctx)


def clip_text_embeddings(texts, model_id: str = "openai/clip-vit-base-patch32"):
    """Encode texts with CLIP if transformers weights are locally available."""
    try:
        import torch
        from transformers import CLIPModel, CLIPProcessor

        clip = CLIPModel.from_pretrained(model_id)
        proc = CLIPProcessor.from_pretrained(model_id)
        inputs = proc(text=list(texts), return_tensors="pt", padding=True)
        with torch.no_grad():
            e = clip.get_text_features(**inputs)
        return e.numpy()
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            "CLIP text encoding unavailable (zero-egress build needs local weights); "
            f"pass precomputed `embeddings` to set_classes. ({e})"
        ) from e


def intersect_tree(dst, src, _path=""):
    """Copy src leaves into dst where the path AND shape match (reference
    utils/torch_utils.py intersect_dicts + BaseModel.load, tasks.py:263).

    Returns (merged_tree, n_copied, n_total_dst_leaves)."""
    import jax.numpy as jnp

    copied = total = 0

    def walk(d, s, path):
        nonlocal copied, total
        if not isinstance(d, dict):
            total += 1
            if s is not None and not isinstance(s, dict) and tuple(np.shape(s)) == tuple(np.shape(d)):
                copied += 1
                return jnp.asarray(s)
            return d
        return {k: walk(v, s.get(k) if isinstance(s, dict) else None, f"{path}.{k}") for k, v in d.items()}

    out = walk(dst, src, _path)
    return out, copied, total


class Ensemble:
    """NMS ensemble of detection models: predictions concatenated along the
    anchor axis, suppressed jointly (reference nn/tasks.py:684 Ensemble).

    Variables are a tuple of per-model pytrees; all engine entry points that
    only need apply/fuse/stride/nc/names work unchanged."""

    def __init__(self, models):
        assert models, "empty ensemble"
        self.models = list(models)
        m0 = self.models[0]
        self.task, self.nc, self.names, self.yaml = m0.task, m0.nc, m0.names, m0.yaml
        self.head = m0.head
        self.stride = np.array([max(float(max(m.stride)) for m in self.models)])
        for m in self.models[1:]:
            assert m.nc == self.nc, f"ensemble class counts differ: {m.nc} vs {self.nc}"

    def apply(self, variables, x, train: bool = False, ctx=None):
        from drone_yolo_tpu.nn import modules as M_

        outs = []
        for m, v in zip(self.models, variables):
            c = M_.Ctx(train=False, dtype=(ctx.dtype if ctx is not None else jnp.float32))
            o = m.apply(v, x, ctx=c)
            outs.append(o[0] if isinstance(o, tuple) else o)
        return jnp.concatenate(outs, axis=1), None  # (B, sum_A, 4+nc)

    def fuse(self, variables):
        return tuple(m.fuse(v) for m, v in zip(self.models, variables))

    def init(self, key, imgsz: int = 640):
        import jax as _jax

        keys = _jax.random.split(key, len(self.models))
        return tuple(m.init(k, imgsz=imgsz) for m, k in zip(self.models, keys))

    def info(self, variables=None):
        for i, m in enumerate(self.models):
            LOGGER.info(f"ensemble member {i}: {type(m).__name__}")
            m.info(variables[i] if variables else None)


def attempt_load_weights(weights):
    """Load one or many checkpoints; many -> Ensemble (reference tasks.py:865)."""
    from drone_yolo_tpu.engine.checkpoint import load_checkpoint

    if isinstance(weights, (str, Path)):
        model, variables, _ = load_checkpoint(weights)
        return model, variables
    pairs = [load_checkpoint(w)[:2] for w in weights]
    if len(pairs) == 1:
        return pairs[0]
    LOGGER.info(f"Ensemble of {len(pairs)} models")
    return Ensemble([p[0] for p in pairs]), tuple(p[1] for p in pairs)


class RTDETRDetectionModel(DetectionModel):
    """RT-DETR task model (reference tasks.py:595 RTDETRDetectionModel)."""

    task = "rtdetr"

    def _probe_strides(self, imgsz: int = 256):
        # transformer head: strides fixed by the 3-level neck
        self.stride = np.array([8.0, 16.0, 32.0], dtype=np.float32)


class ClassificationModel(BaseModel):
    task = "classify"


TASK2MODELCLASS = {
    "rtdetr": RTDETRDetectionModel,
    "detect": DetectionModel,
    "segment": SegmentationModel,
    "pose": PoseModel,
    "obb": OBBModel,
    "classify": ClassificationModel,
}


def guess_model_task(cfg) -> str:
    """Infer task from a model yaml (reference tasks.py:1127 guess_model_task)."""
    d = cfg if isinstance(cfg, dict) else yaml_model_load(cfg)
    head_name = d["head"][-1][2].lower()
    for task, key in (("classify", "classify"), ("segment", "segment"), ("pose", "pose"), ("obb", "obb"), ("rtdetr", "rtdetr")):
        if key in head_name:
            return task
    return "detect"
