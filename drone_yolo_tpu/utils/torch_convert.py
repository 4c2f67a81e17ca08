"""Convert torch (reference ultralytics) state_dicts to this framework's pytrees.

Pure numpy: consumes a `{name: np.ndarray}` dict (call `.numpy()` on torch tensors
first or pass a torch state_dict — tensors are detected duck-typed). Layout
transforms: torch conv OIHW -> JAX HWIO; ConvTranspose IOHW -> HWIO; Linear (o,i)
-> (i,o). Naming: walks OUR module tree and derives the matching torch name per
module class, so it also serves as living documentation of the name mapping.
"""

from __future__ import annotations

import numpy as np

from drone_yolo_tpu.nn import modules as M


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    if hasattr(t, "detach"):
        return t.detach().cpu().float().numpy()
    return np.asarray(t)


def _conv_w(t):
    return np.transpose(_np(t), (2, 3, 1, 0))  # OIHW -> HWIO


def _bn(sd, p):
    return {
        "scale": _np(sd[f"{p}.weight"]),
        "bias": _np(sd[f"{p}.bias"]),
        "mean": _np(sd[f"{p}.running_mean"]),
        "var": _np(sd[f"{p}.running_var"]),
    }


def convert_module(mod: M.Module, sd: dict, prefix: str) -> dict:
    """Convert one module subtree rooted at torch name `prefix`."""
    if isinstance(mod, M.Conv):  # Conv+BN(+act), incl. DWConv
        return {"conv": {"kernel": _conv_w(sd[f"{prefix}.conv.weight"])}, "bn": _bn(sd, f"{prefix}.bn")}

    if isinstance(mod, M.Conv2dRaw):
        v = {"kernel": _conv_w(sd[f"{prefix}.weight"])}
        if mod.bias:
            v["bias"] = _np(sd[f"{prefix}.bias"])
        return v

    if isinstance(mod, M.ConvTranspose2dRaw):
        # torch ConvTranspose2d weight (in, out, kh, kw) -> (kh, kw, out, in)
        # for jax conv_transpose(transpose_kernel=True) == torch orientation
        v = {"kernel": np.transpose(_np(sd[f"{prefix}.weight"]), (2, 3, 1, 0))}
        if mod.bias:
            v["bias"] = _np(sd[f"{prefix}.bias"])
        return v

    if isinstance(mod, M.RepVGGBlock):
        v = {
            "dense": {"conv": {"kernel": _conv_w(sd[f"{prefix}.rbr_dense.conv.weight"])}, "bn": _bn(sd, f"{prefix}.rbr_dense.bn")},
            "one": {"conv": {"kernel": _conv_w(sd[f"{prefix}.rbr_1x1.conv.weight"])}, "bn": _bn(sd, f"{prefix}.rbr_1x1.bn")},
        }
        if mod.has_identity:
            v["idbn"] = _bn(sd, f"{prefix}.rbr_identity")
        return v

    from drone_yolo_tpu.nn.build import _RepeatSeq

    if isinstance(mod, (M._Seq, _RepeatSeq)):
        # torch side is nn.Sequential: children live directly at prefix.{j}
        return {"m": {str(j): convert_module(child, sd, f"{prefix}.{j}") for j, child in enumerate(mod.m)}}

    if isinstance(mod, M.Proto):
        return {
            "cv1": convert_module(mod.cv1, sd, f"{prefix}.cv1"),
            "cv2": convert_module(mod.cv2, sd, f"{prefix}.cv2"),
            "cv3": convert_module(mod.cv3, sd, f"{prefix}.cv3"),
            # ConvTranspose2d weight is (in, out, kh, kw) in torch -> HWIO
            "up": {
                # torch ConvTranspose2d (in, out, kh, kw) -> (kh, kw, out, in)
                # for jax conv_transpose(transpose_kernel=True)
                "kernel": np.transpose(_np(sd[f"{prefix}.upsample.weight"]), (2, 3, 1, 0)),
                "bias": _np(sd[f"{prefix}.upsample.bias"]),
            },
        }

    if isinstance(mod, M.Classify):
        return {
            "conv": convert_module(mod.conv, sd, f"{prefix}.conv"),
            "linear": {
                "kernel": _np(sd[f"{prefix}.linear.weight"]).T,
                "bias": _np(sd[f"{prefix}.linear.bias"]),
            },
        }

    if isinstance(mod, M.MaxSigmoidAttnBlock):
        v = {
            "gl": {"kernel": _np(sd[f"{prefix}.gl.weight"]).T, "bias": _np(sd[f"{prefix}.gl.bias"])},
            "bias": _np(sd[f"{prefix}.bias"]),
            "proj_conv": convert_module(mod.proj_conv, sd, f"{prefix}.proj_conv"),
        }
        if mod.ec_conv is not None:
            v["ec"] = convert_module(mod.ec_conv, sd, f"{prefix}.ec")
        if mod.use_scale:
            v["scale"] = _np(sd[f"{prefix}.scale"]).reshape(-1)
        return v

    if isinstance(mod, M.ContrastiveHead):
        return {"bias": _np(sd[f"{prefix}.bias"]).reshape(-1), "logit_scale": _np(sd[f"{prefix}.logit_scale"]).reshape(())}

    if isinstance(mod, M.BNContrastiveHead):
        return {
            "bn": _bn(sd, f"{prefix}.norm"),
            "bias": _np(sd[f"{prefix}.bias"]).reshape(-1),
            "logit_scale": _np(sd[f"{prefix}.logit_scale"]).reshape(()),
        }

    from drone_yolo_tpu.nn import transformer as T

    if isinstance(mod, T.Linear):
        v = {"kernel": _np(sd[f"{prefix}.weight"]).T}
        if mod.bias:
            v["bias"] = _np(sd[f"{prefix}.bias"])
        return v

    if isinstance(mod, T.LayerNorm):
        return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}

    if isinstance(mod, T.MultiheadAttention):
        return {
            "in_proj": {"kernel": _np(sd[f"{prefix}.in_proj_weight"]).T, "bias": _np(sd[f"{prefix}.in_proj_bias"])},
            "out_proj": {"kernel": _np(sd[f"{prefix}.out_proj.weight"]).T, "bias": _np(sd[f"{prefix}.out_proj.bias"])},
        }

    if isinstance(mod, T.RTDETRDecoder):
        v = {
            "input_proj": {},
            "input_proj_bn": {},
            "denoising_class_embed": _np(sd[f"{prefix}.denoising_class_embed.weight"]),
            "query_pos_head": convert_module(mod.query_pos_head, sd, f"{prefix}.query_pos_head"),
            "enc_output": convert_module(mod.enc_output, sd, f"{prefix}.enc_output.0"),
            "enc_output_norm": convert_module(mod.enc_output_norm, sd, f"{prefix}.enc_output.1"),
            "enc_score_head": convert_module(mod.enc_score_head, sd, f"{prefix}.enc_score_head"),
            "enc_bbox_head": convert_module(mod.enc_bbox_head, sd, f"{prefix}.enc_bbox_head"),
            "dec_score_head": {str(i): convert_module(m, sd, f"{prefix}.dec_score_head.{i}") for i, m in enumerate(mod.dec_score_head)},
            "dec_bbox_head": {str(i): convert_module(m, sd, f"{prefix}.dec_bbox_head.{i}") for i, m in enumerate(mod.dec_bbox_head)},
            "layers": {str(i): convert_module(m, sd, f"{prefix}.decoder.layers.{i}") for i, m in enumerate(mod.layers)},
        }
        for i, p in enumerate(mod.input_proj):
            v["input_proj"][str(i)] = {"kernel": _conv_w(sd[f"{prefix}.input_proj.{i}.0.weight"])}
            v["input_proj_bn"][str(i)] = _bn(sd, f"{prefix}.input_proj.{i}.1")
        return v

    if isinstance(mod, M.GhostBottleneck):
        # torch packs the path as nn.Sequential conv.{0,1,2} + shortcut.{0,1}
        # (reference block.py:323-330); ours names the stages g1/dw/g2/sc_*
        v = {
            "g1": convert_module(mod.g1, sd, f"{prefix}.conv.0"),
            "g2": convert_module(mod.g2, sd, f"{prefix}.conv.2"),
        }
        if mod.dw is not None:
            v["dw"] = convert_module(mod.dw, sd, f"{prefix}.conv.1")
        if mod.s == 2:
            v["sc_dw"] = convert_module(mod.sc_dw, sd, f"{prefix}.shortcut.0")
            v["sc_pw"] = convert_module(mod.sc_pw, sd, f"{prefix}.shortcut.1")
        return v

    if isinstance(mod, M.TorchVision):
        # native resnet trunk <- torchvision resnet state dict (conv1/bn1 stem,
        # layer{1..4}.{i}.conv{1,2}/bn{1,2}(+downsample)); only needed when a
        # torchvision checkpoint is converted offline
        v = {"stem": {"conv": {"kernel": _conv_w(sd[f"{prefix}conv1.weight"])}, "bn": _bn(sd, f"{prefix}bn1")}, "blocks": {}}
        bi = 0
        for li in range(1, 5):
            i = 0
            while f"{prefix}layer{li}.{i}.conv1.weight" in sd:
                b = f"{prefix}layer{li}.{i}"
                blk = {
                    "cv1": {"conv": {"kernel": _conv_w(sd[f"{b}.conv1.weight"])}, "bn": _bn(sd, f"{b}.bn1")},
                    "cv2": {"conv": {"kernel": _conv_w(sd[f"{b}.conv2.weight"])}, "bn": _bn(sd, f"{b}.bn2")},
                }
                if f"{b}.downsample.0.weight" in sd:
                    blk["down"] = {"conv": {"kernel": _conv_w(sd[f"{b}.downsample.0.weight"])}, "bn": _bn(sd, f"{b}.downsample.1")}
                v["blocks"][str(bi)] = blk
                bi += 1
                i += 1
        return v

    # Generic composite (C2f, Bottleneck, SPPF, Detect, Segment, Pose, OBB, Focus,
    # GhostConv, _RepeatSeq, ...): recurse children under matching names. Detect's
    # frozen DFL conv (arange weights) is rebuilt analytically, not loaded.
    v = {}
    for name, child in mod.children().items():
        if isinstance(child, list):
            v[name] = {str(i): convert_module(c, sd, f"{prefix}.{name}.{i}") for i, c in enumerate(child)}
        else:
            v[name] = convert_module(child, sd, f"{prefix}.{name}")
    return v


def convert_state_dict(model, sd: dict) -> dict:
    """Convert a full reference state_dict to this framework's variables tree.

    `model` is a drone_yolo_tpu BaseModel; torch names follow "model.{i}. ..."
    (reference DetectionModel wraps layers in an nn.Sequential called `model`).
    """
    sd = {k.removeprefix("model.model.").removeprefix("model."): v for k, v in sd.items()}
    sd = {f"model.{k}" if not k.startswith("model.") else k: v for k, v in sd.items()}
    out = {}
    for spec in model.layers:
        out[str(spec.i)] = convert_module(spec.module, sd, f"model.{spec.i}")
    return out


def load_torch_checkpoint(path, model):
    """Load a reference .pt checkpoint file and convert (requires torch; EMA-first
    semantics like the reference: `trainer.py:524` saves EMA as the model)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    net = ckpt.get("ema") or ckpt.get("model") or ckpt
    sd = net.state_dict() if hasattr(net, "state_dict") else net
    return convert_state_dict(model, {k: _np(v) for k, v in sd.items()})
