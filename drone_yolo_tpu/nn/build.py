"""YAML architecture dialect -> executable network graph.

Parity with `ultralytics/nn/tasks.py:929-1090` (parse_model): same row grammar
`[from, repeats, module, args]`, same depth gain `max(round(n*depth), 1)`, same
width gain `make_divisible(min(c2, max_channels) * width, 8)`, same n/s/m/l/x
unified-yaml scale resolution (`yaml_model_load`, tasks.py:1093-1125).

TPU-native difference: the graph is *built* once in Python and *executed* inside a
traced function — the layer loop disappears into the compiled XLA program, so the
interpreter overhead the reference pays per forward (tasks.py:147-161) is zero.

Fixes the reference snapshot's latent defect (SURVEY.md §2.3): RepVGGBlock is
registered as a first-class width-scalable module here.
"""

from __future__ import annotations

import re
from pathlib import Path

from drone_yolo_tpu.nn import modules as M
from drone_yolo_tpu.utils import LOGGER, yaml_load

MODEL_CFG_DIR = Path(__file__).resolve().parent.parent / "cfg" / "models"

# Module registry: yaml name -> class. "nn.Upsample" kept for yaml compatibility.
REGISTRY = {
    "Conv": M.Conv,
    "DWConv": M.DWConv,
    "Focus": M.Focus,
    "GhostConv": M.GhostConv,
    "Bottleneck": M.Bottleneck,
    "C1": M.C1,
    "C2": M.C2,
    "C2f": M.C2f,
    "C3": M.C3,
    "C3k": M.C3k,
    "C3k2": M.C3k2,
    "C2PSA": M.C2PSA,
    "PSA": M.PSA,
    "PSABlock": M.PSABlock,
    "SCDown": M.SCDown,
    "RepVGGDW": M.RepVGGDW,
    "SPP": M.SPP,
    "SPPF": M.SPPF,
    "RepVGGBlock": M.RepVGGBlock,
    "RepConv": M.RepConv,
    "RepCSP": M.RepCSP,
    "RepNCSPELAN4": M.RepNCSPELAN4,
    "ELAN1": M.ELAN1,
    "AConv": M.AConv,
    "ADown": M.ADown,
    "SPPELAN": M.SPPELAN,
    "CBLinear": M.CBLinear,
    "CBFuse": M.CBFuse,
    "CIB": M.CIB,
    "C2fCIB": M.C2fCIB,
    "v10Detect": M.v10Detect,
    "C2fAttn": M.C2fAttn,
    "MaxSigmoidAttnBlock": M.MaxSigmoidAttnBlock,
    "ImagePoolingAttn": M.ImagePoolingAttn,
    "ContrastiveHead": M.ContrastiveHead,
    "BNContrastiveHead": M.BNContrastiveHead,
    "WorldDetect": M.WorldDetect,
    "AAttn": M.AAttn,
    "ABlock": M.ABlock,
    "A2C2f": M.A2C2f,
    "LightConv": M.LightConv,
    "HGStem": M.HGStem,
    "HGBlock": M.HGBlock,
    "RepC3": M.RepC3,
    "Conv2": M.Conv2,
    "ConvTranspose": M.ConvTranspose,
    "DWConvTranspose2d": M.DWConvTranspose2d,
    "GhostBottleneck": M.GhostBottleneck,
    "C3x": M.C3x,
    "C3TR": M.C3TR,
    "C3Ghost": M.C3Ghost,
    "BottleneckCSP": M.BottleneckCSP,
    "ResNetLayer": M.ResNetLayer,
    "C2fPSA": M.C2fPSA,
    "TransformerBlock": M.TransformerBlock,
    "Index": M.Index,
    "AGLU": M.AGLU,
    "Concat": M.Concat,
    "nn.Identity": M.Identity,
    "Identity": M.Identity,
    "CBAM": M.CBAM,
    "ChannelAttention": M.ChannelAttention,
    "SpatialAttention": M.SpatialAttention,
    "nn.ConvTranspose2d": M.ConvTranspose2dRaw,
    "ConvTranspose2d": M.ConvTranspose2dRaw,
    "AIFI": None,  # resolved lazily (transformer import)
    "RTDETRDecoder": None,
    "nn.Upsample": M.Upsample,
    "Upsample": M.Upsample,
    "nn.MaxPool2d": M.MaxPool2d,
    "MaxPool2d": M.MaxPool2d,
    "nn.ZeroPad2d": M.ZeroPad2d,
    "ZeroPad2d": M.ZeroPad2d,
    "TorchVision": M.TorchVision,
    "Detect": M.Detect,
    "Segment": M.Segment,
    "Pose": M.Pose,
    "OBB": M.OBB,
    "Classify": M.Classify,
}

# Width-scalable modules taking (c1, c2, ...) — reference tasks.py:954-991
# (base_modules), plus RepVGGBlock (the defect fix).
BASE_MODULES = {
    M.Conv, M.DWConv, M.Focus, M.GhostConv, M.LightConv, M.Bottleneck, M.C1, M.C2, M.C2f, M.C3,
    M.C3k, M.C3k2, M.C2PSA, M.PSA, M.SCDown, M.SPP, M.SPPF, M.RepVGGBlock, M.Classify,
    M.RepConv, M.RepCSP, M.RepNCSPELAN4, M.ELAN1, M.AConv, M.ADown, M.SPPELAN,
    M.CIB, M.C2fCIB, M.RepC3, M.A2C2f, M.C2fAttn, M.ConvTranspose2dRaw,
    M.Conv2, M.ConvTranspose, M.DWConvTranspose2d, M.GhostBottleneck, M.C3x, M.C3TR,
    M.C3Ghost, M.BottleneckCSP, M.C2fPSA,
}
# Modules whose 3rd ctor arg is the repeat count — reference tasks.py:993-1010.
REPEAT_MODULES = {
    M.C1, M.C2, M.C2f, M.C3, M.C3k, M.C3k2, M.C2PSA, M.RepCSP, M.C2fCIB, M.RepC3, M.A2C2f,
    M.C2fAttn, M.C3x, M.C3TR, M.C3Ghost, M.BottleneckCSP, M.C2fPSA,
}
HEAD_MODULES = {M.Detect, M.Segment, M.Pose, M.OBB, M.v10Detect, M.WorldDetect}


def make_divisible(x, divisor: int = 8) -> int:
    """Nearest integer divisible by divisor (reference utils/ops.py:130)."""
    import math

    return math.ceil(x / divisor) * divisor


def guess_model_scale(model_path) -> str:
    """Extract the n/s/m/l/x scale char from a path like yolov8s.yaml (tasks.py:1109)."""
    m = re.search(r"yolo[v]?\d+([nslmx])", Path(model_path).stem)
    return m.group(1) if m else ""


def yaml_model_load(path) -> dict:
    """Load a model yaml, resolving scale-suffixed names to the unified file (tasks.py:1093)."""
    path = Path(path)
    stem = path.stem
    unified = re.sub(r"(\d+)([nslmx])(.+)?$", r"\1\3", stem)  # yolov8s-p2 -> yolov8-p2
    candidates = [path]
    if not path.exists():
        for base in (MODEL_CFG_DIR,):
            candidates += sorted(base.rglob(f"{stem}.yaml")) + sorted(base.rglob(f"{unified}.yaml"))
    for c in candidates:
        if Path(c).exists():
            d = yaml_load(c, append_filename=True)
            d["scale"] = guess_model_scale(stem)
            d["yaml_file"] = str(path)
            return d
    raise FileNotFoundError(f"model yaml '{path}' not found (searched {MODEL_CFG_DIR})")


class LayerSpec:
    """One built layer: module + routing metadata (reference attaches m.i/m.f/m.type)."""

    __slots__ = ("module", "i", "f", "type", "repeats")

    def __init__(self, module, i, f, type_, repeats=1):
        self.module, self.i, self.f, self.type = module, i, f, type_
        self.repeats = repeats


class _RepeatSeq(M.Module):
    """n>1 non-repeat-aware modules stacked sequentially (reference: nn.Sequential)."""

    def __init__(self, mods):
        self.m = list(mods)

    def __call__(self, v, x, ctx):
        for i, mod in enumerate(self.m):
            x = mod(v["m"][str(i)], x, ctx)
        return x


def parse_model(d: dict, ch: int = 3, verbose: bool = False):
    """Parse a model dict into (layers, save_list).

    Returns:
        layers: list[LayerSpec] in execution order.
        save: sorted list of layer indices whose outputs are needed later.
    """
    nc = d.get("nc", 80)
    scales = d.get("scales")
    scale = d.get("scale") or (next(iter(scales)) if scales else None)
    depth, width, max_channels = d.get("depth_multiple", 1.0), d.get("width_multiple", 1.0), float("inf")
    if scales:
        if scale not in scales:
            scale = next(iter(scales))
        depth, width, max_channels = scales[scale]
    kpt_shape = d.get("kpt_shape")

    ch_list = [ch]
    layers, save = [], []
    legacy = True  # v8-style head cls branch; C3k2 (v11) flips to the DWConv variant
    # global activation override (reference tasks.py:944: yaml `activation:` key)
    act_override = None
    act_str = str(d.get("activation") or "")
    if "ReLU" in act_str and "Leaky" not in act_str:
        act_override = "relu"
    for i, (f, n, mname, args) in enumerate(d["backbone"] + d["head"]):
        cls = REGISTRY.get(mname)
        if cls is None:
            if mname in ("AIFI", "RTDETRDecoder"):
                from drone_yolo_tpu.nn import transformer as T

                cls = {"AIFI": T.AIFI, "RTDETRDecoder": T.RTDETRDecoder}[mname]
            else:
                raise KeyError(f"unknown module '{mname}' in model yaml (registered: {sorted(REGISTRY)})")
        args = list(args)
        # resolve string args: 'nc', 'None', 'nearest', numeric strings
        for j, a in enumerate(args):
            if isinstance(a, str):
                if a == "nc":
                    args[j] = nc
                elif a == "kpt_shape":
                    args[j] = kpt_shape
                else:
                    try:
                        import ast

                        args[j] = ast.literal_eval(a)
                    except (ValueError, SyntaxError):
                        pass

        n_scaled = max(round(n * depth), 1) if n > 1 else n

        if cls in BASE_MODULES:
            c1, c2 = ch_list[f], args[0]
            if c2 != nc:  # don't width-scale a Classify output layer
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            args = [c1, c2, *args[1:]]
            if cls in REPEAT_MODULES:
                args.insert(2, n_scaled)
                n_scaled = 1
            if cls is M.C3k2:  # reference tasks.py:1035-1039
                legacy = False
                if scale in "mlx":
                    if len(args) > 3:
                        args[3] = True
                    else:
                        args.append(True)
            if cls is M.A2C2f:  # reference tasks.py:1040-1043
                legacy = False
                if scale in "lx":
                    args.extend((True, 1.2))
            if cls is M.C2fAttn:  # embed channels + heads scaling (tasks.py:1028-1030)
                args[3] = make_divisible(min(args[3], max_channels // 2) * width, 8)
                args[4] = int(max(round(min(args[4], max_channels // 2 // 32) * width), 1) if args[4] > 1 else args[4])
        elif cls is M.ResNetLayer:
            # args pass through RAW (explicit c1 in the yaml, no width scaling
            # — reference tasks.py:1052); bottleneck output = 4*c2 unless stem
            c2 = args[1] if args[3] else args[1] * 4
        elif mname == "AIFI":
            c2 = ch_list[f]
            args = [c2, *args]
        elif cls in (M.HGStem, M.HGBlock):
            c1, cm, c2 = ch_list[f], args[0], args[1]
            args = [c1, cm, c2, *args[2:]]
            if cls is M.HGBlock:
                args.insert(4, n_scaled)  # (c1, cm, c2, k, n, ...)
                n_scaled = 1
        elif cls is M.ImagePoolingAttn:
            args = [*args]
            # signature (ec, ch, ct, nh, k, scale): yaml gives [ec]; ch from inputs
            args.insert(1, [ch_list[x] for x in f])
            c2 = ch_list[f[-1]] if isinstance(f, list) else ch_list[f]
        elif mname == "RTDETRDecoder":
            args.insert(1, [ch_list[x] for x in f])
            module = cls(*args)
            c2 = None
        elif cls is M.Concat:
            c2 = sum(ch_list[x] for x in f)
        elif cls in (M.TorchVision, M.Index):
            # reference tasks.py:1072: c2 declared by args[0], then dropped
            c2 = args[0]
            args = args[1:]
        elif cls is M.CBLinear:
            c2 = args[0]  # list of channel splits
            args = [ch_list[f], *args]
        elif cls is M.CBFuse:
            c2 = ch_list[f[-1]]
        elif cls in HEAD_MODULES:
            in_ch = [ch_list[x] for x in f]
            if cls is M.Segment:
                # args = [nc, nm, npr]; npr is width-scaled (tasks.py:1061)
                if len(args) > 2:
                    args[2] = make_divisible(min(args[2], max_channels) * width, 8)
            module = cls(*args, ch=in_ch, legacy=legacy)
            c2 = None
        else:  # Upsample and other shape-preserving modules
            c2 = ch_list[f] if isinstance(f, int) else ch_list[f[-1]]

        if cls not in HEAD_MODULES and mname != "RTDETRDecoder":
            if n_scaled > 1:
                module = _RepeatSeq([cls(*args) for _ in range(n_scaled)])
            else:
                module = cls(*args)

        if act_override is not None:
            M.override_default_act(module, act_override)

        spec = LayerSpec(module, i, f, mname, n_scaled)
        layers.append(spec)
        save.extend(x % i for x in ([f] if isinstance(f, int) else f) if x != -1)
        if i == 0:
            ch_list = []
        ch_list.append(c2 if c2 is not None else (ch_list[f[0]] if isinstance(f, list) else ch_list[f]))
        if verbose:
            LOGGER.info(f"{i:>3}{str(f):>20}{n_scaled:>3}  {mname:<20}{str(args):<40}")

    return layers, sorted(set(save)), nc, ch_list  # ch_list[i] = layer i's output channels
