"""ONNX exporter: emit the built model graph directly as ONNX protobuf.

The reference exports ONNX via torch.onnx.export (reference
engine/exporter.py:524); this image has neither the onnx package nor tf2onnx,
so the exporter writes the protobuf itself through a vendored minimal
onnx.proto (field-number-compatible with the public schema) and a per-module
emitter table that mirrors each module's forward exactly on FUSED weights.
Artifact contract matches the reference's: input `images` NCHW float32
(B,3,H,W); `output0` = (B, 4+nc, A) decoded xywh+scores for detect heads,
(B, 4+nc+nm, A) + `output1` protos for segment, (B, 4+nc+nk, A) with decoded
keypoints for pose, (B, 4+nc+1, A) rotated boxes + angle for OBB, and (B, nc)
probabilities for classify.

Round-trip verified in tests/test_onnx_export.py against OpenCV's ONNX
importer (cv2.dnn.readNetFromONNX) — an independent third-party parser.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
import onnx_pb2 as O  # noqa: E402  (vendored, generated from export/onnx.proto)

from drone_yolo_tpu.nn import modules as M  # noqa: E402

FLOAT = O.TensorProto.FLOAT
INT64 = O.TensorProto.INT64
# opset >= 13 is required for correctness: the DFL decode emits
# Softmax(axis=2) on a 4-D tensor, and opset<13 Softmax coerces to 2-D and
# normalizes over ALL trailing dims (OpenCV's importer is lenient, but
# spec-conformant runtimes like onnxruntime would produce wrong boxes)
OPSET = 13


class Builder:
    """Incremental ONNX GraphProto builder: nodes, initializers, and value names (vendored proto subset)."""
    def __init__(self, graph_name="drone_yolo_tpu"):
        self.nodes = []
        self.inits = []
        self._init_dims = {}  # initializer name -> dims (for kernel_shape inference)
        self._n = 0

    def name(self, hint="t"):
        self._n += 1
        return f"{hint}_{self._n}"

    def const(self, arr, hint="const"):
        arr = np.asarray(arr)
        t = O.TensorProto()
        t.name = self.name(hint)
        t.dims.extend(arr.shape)
        if arr.dtype == np.int64:
            t.data_type = INT64
        else:
            arr = arr.astype(np.float32)
            t.data_type = FLOAT
        t.raw_data = arr.tobytes()
        self.inits.append(t)
        self._init_dims[t.name] = tuple(arr.shape)
        return t.name

    def node(self, op, inputs, n_out=1, hint=None, **attrs):
        if op in ("Conv", "ConvTranspose") and "kernel_shape" not in attrs:
            # kernel_shape is optional per spec (inferable from the weight
            # tensor) but required by older importers (OpenCV <4.7 C++ DNN);
            # emit it whenever the weight is one of our constants
            dims = self._init_dims.get(inputs[1])
            if dims is not None and len(dims) == 4:
                attrs["kernel_shape"] = list(dims[2:])
        nd = O.NodeProto()
        nd.op_type = op
        nd.name = self.name(op)
        nd.input.extend(inputs)
        outs = [self.name(hint or op.lower()) for _ in range(n_out)]
        nd.output.extend(outs)
        for k, val in attrs.items():
            a = nd.attribute.add()
            a.name = k
            if isinstance(val, float):
                a.type, a.f = O.AttributeProto.FLOAT, val
            elif isinstance(val, bool) or isinstance(val, (int, np.integer)):
                a.type, a.i = O.AttributeProto.INT, int(val)
            elif isinstance(val, str):
                a.type, a.s = O.AttributeProto.STRING, val.encode()
            elif isinstance(val, (list, tuple)) and all(isinstance(x, (int, np.integer)) for x in val):
                a.type = O.AttributeProto.INTS
                a.ints.extend(int(x) for x in val)
            elif isinstance(val, (list, tuple)):
                a.type = O.AttributeProto.FLOATS
                a.floats.extend(float(x) for x in val)
            else:
                raise TypeError(f"attr {k}={val!r}")
        self.nodes.append(nd)
        return outs[0] if n_out == 1 else outs


def _w(kernel):  # HWIO -> OIHW
    return np.transpose(np.asarray(kernel, np.float32), (3, 2, 0, 1))


def _pads(p):
    p = int(p)
    return [p, p, p, p]


def _act(b, mod, x):
    act = getattr(mod, "act", True)
    if act is True:
        s = b.node("Sigmoid", [x])
        return b.node("Mul", [x, s], hint="silu")
    if act == "relu":
        return b.node("Relu", [x])
    return x


class Emitter:
    """Walks the fused model graph and emits ONNX nodes per module.

    `txt` holds the World vocabulary embeddings (nc, gc) when exporting a
    WorldModel — text-conditioned blocks bake it into constant weights."""

    def __init__(self, builder: Builder, txt=None):
        self.b = builder
        self.txt = txt

    def emit(self, mod, v, x):
        b = self.b
        if isinstance(mod, M.Conv):  # incl. DWConv/Conv2 (fused to plain conv)
            wname = b.const(_w(v["conv"]["kernel"]), "W")
            bias = b.const(np.asarray(v["conv"]["bias"], np.float32), "B") if "bias" in v["conv"] else None
            ins = [x, wname] + ([bias] if bias else [])
            y = b.node("Conv", ins, strides=[mod.s, mod.s], pads=_pads(mod.p), group=mod.g, dilations=[mod.d, mod.d])
            return _act(b, mod, y)
        if isinstance(mod, M.Conv2dRaw):
            wname = b.const(_w(v["kernel"]), "W")
            ins = [x, wname] + ([b.const(np.asarray(v["bias"], np.float32), "B")] if "bias" in v else [])
            return b.node("Conv", ins, strides=[mod.s, mod.s], pads=_pads(mod.p), group=mod.g, dilations=[mod.d, mod.d])
        if isinstance(mod, M.RepVGGBlock):  # fused: one 3x3 conv + bias + SiLU
            assert "kernel" in v, "export requires fused variables (model.fuse)"
            wname = b.const(_w(v["kernel"]), "W")
            bias = b.const(np.asarray(v["bias"], np.float32), "B")
            y = b.node("Conv", [x, wname, bias], strides=[mod.s, mod.s], pads=[1, 1, 1, 1], group=mod.g, dilations=[1, 1])
            s = b.node("Sigmoid", [y])
            return b.node("Mul", [y, s], hint="silu")
        if isinstance(mod, M.Bottleneck):
            y = self.emit(mod.cv2, v["cv2"], self.emit(mod.cv1, v["cv1"], x))
            return b.node("Add", [x, y]) if mod.add else y
        if isinstance(mod, M.C2f):  # also C2fCIB/C2fPSA via same topology
            y0 = self.emit(mod.cv1, v["cv1"], x)
            c = mod.c
            ys = [self._slice_ch(y0, 0, c), self._slice_ch(y0, c, 2 * c)]
            for i, m in enumerate(mod.m):
                ys.append(self.emit(m, v["m"][str(i)], ys[-1]))
            return self.emit(mod.cv2, v["cv2"], b.node("Concat", ys, axis=1))
        if isinstance(mod, (M.C2,)):
            y0 = self.emit(mod.cv1, v["cv1"], x)
            c = mod.c
            a, bb = self._slice_ch(y0, 0, c), self._slice_ch(y0, c, 2 * c)
            for i, m in enumerate(mod.m):
                a = self.emit(m, v["m"][str(i)], a)
            return self.emit(mod.cv2, v["cv2"], b.node("Concat", [a, bb], axis=1))
        if isinstance(mod, M.C3):  # also C3Ghost/C3x via child dispatch
            a = self.emit(mod.cv1, v["cv1"], x)
            for i, m in enumerate(mod.m):
                a = self.emit(m, v["m"][str(i)], a)
            c = self.emit(mod.cv2, v["cv2"], x)
            return self.emit(mod.cv3, v["cv3"], b.node("Concat", [a, c], axis=1))
        if isinstance(mod, M.SPPF):
            y = [self.emit(mod.cv1, v["cv1"], x)]
            for _ in range(3):
                y.append(b.node("MaxPool", [y[-1]], kernel_shape=[mod.k, mod.k], strides=[1, 1], pads=_pads(mod.k // 2)))
            return self.emit(mod.cv2, v["cv2"], b.node("Concat", y, axis=1))
        if isinstance(mod, M.SPP):
            y0 = self.emit(mod.cv1, v["cv1"], x)
            ys = [y0] + [b.node("MaxPool", [y0], kernel_shape=[k, k], strides=[1, 1], pads=_pads(k // 2)) for k in mod.k]
            return self.emit(mod.cv2, v["cv2"], b.node("Concat", ys, axis=1))
        if isinstance(mod, M.GhostConv):
            y = self.emit(mod.cv1, v["cv1"], x)
            y2 = self.emit(mod.cv2, v["cv2"], y)
            return b.node("Concat", [y, y2], axis=1)
        if isinstance(mod, M.GhostBottleneck):
            y = self.emit(mod.g1, v["g1"], x)
            if mod.dw is not None:
                y = self.emit(mod.dw, v["dw"], y)
            y = self.emit(mod.g2, v["g2"], y)
            if mod.add:
                return b.node("Add", [x, y])
            sc = self.emit(mod.sc_pw, v["sc_pw"], self.emit(mod.sc_dw, v["sc_dw"], x))
            return b.node("Add", [sc, y])
        if isinstance(mod, M.SCDown):
            return self.emit(mod.cv2, v["cv2"], self.emit(mod.cv1, v["cv1"], x))
        if isinstance(mod, M.Upsample):
            roi = self.b.const(np.zeros(0, np.float32), "roi")
            scales = self.b.const(np.array([1.0, 1.0, mod.scale, mod.scale], np.float32), "scales")
            return b.node("Resize", [x, roi, scales], mode="nearest", coordinate_transformation_mode="asymmetric", nearest_mode="floor")
        if isinstance(mod, M.Concat):
            return b.node("Concat", x, axis=1)
        if isinstance(mod, M.MaxPool2d):
            return b.node("MaxPool", [x], kernel_shape=[mod.k, mod.k], strides=[mod.s, mod.s], pads=_pads(mod.p))
        if isinstance(mod, M.ZeroPad2d):
            l, r, t, bo = mod.padding
            pads = self.b.const(np.array([0, 0, t, l, 0, 0, bo, r], np.int64), "pads")
            return b.node("Pad", [x, pads], mode="constant")
        if isinstance(mod, M.Identity):
            return x
        if isinstance(mod, (M._Seq,)):
            for i, m in enumerate(mod.m):
                x = self.emit(m, v["m"][str(i)], x)
            return x
        from drone_yolo_tpu.nn.build import _RepeatSeq

        if isinstance(mod, _RepeatSeq):
            for i, m in enumerate(mod.m):
                x = self.emit(m, v["m"][str(i)], x)
            return x
        if isinstance(mod, M.RepConv):  # fused: one 3x3 conv (+ optional SiLU)
            assert "kernel" in v, "export requires fused variables (model.fuse)"
            wname = b.const(_w(v["kernel"]), "W")
            bias = b.const(np.asarray(v["bias"], np.float32), "B")
            y = b.node("Conv", [x, wname, bias], strides=[mod.s, mod.s], pads=[1, 1, 1, 1], group=mod.g, dilations=[1, 1])
            if mod.act is True:
                s = b.node("Sigmoid", [y])
                y = b.node("Mul", [y, s], hint="silu")
            return y
        if isinstance(mod, M.RepNCSPELAN4):  # also ELAN1 (plain-conv subclass)
            y0 = self.emit(mod.cv1, v["cv1"], x)
            c = mod.c
            ys = [self._slice_ch(y0, 0, c), self._slice_ch(y0, c, 2 * c)]
            ys.append(self.emit(mod.cv2, v["cv2"], ys[-1]))
            ys.append(self.emit(mod.cv3, v["cv3"], ys[-1]))
            return self.emit(mod.cv4, v["cv4"], b.node("Concat", ys, axis=1))
        if isinstance(mod, M.AConv):
            y = b.node("AveragePool", [x], kernel_shape=[2, 2], strides=[1, 1], pads=[0, 0, 0, 0])
            return self.emit(mod.cv1, v["cv1"], y)
        if isinstance(mod, M.ADown):
            y = b.node("AveragePool", [x], kernel_shape=[2, 2], strides=[1, 1], pads=[0, 0, 0, 0])
            c_half = mod.cv1.c1  # ADown splits the pooled input in half
            x1 = self._slice_ch(y, 0, c_half)
            x2 = self._slice_ch(y, c_half, 2 * c_half)
            y1 = self.emit(mod.cv1, v["cv1"], x1)
            y2 = self.emit(mod.cv2, v["cv2"], b.node("MaxPool", [x2], kernel_shape=[3, 3], strides=[2, 2], pads=[1, 1, 1, 1]))
            return b.node("Concat", [y1, y2], axis=1)
        if isinstance(mod, M.SPPELAN):
            ys = [self.emit(mod.cv1, v["cv1"], x)]
            for _ in range(3):
                ys.append(b.node("MaxPool", [ys[-1]], kernel_shape=[mod.k, mod.k], strides=[1, 1], pads=_pads(mod.k // 2)))
            return self.emit(mod.cv5, v["cv5"], b.node("Concat", ys, axis=1))
        if isinstance(mod, M.CIB):
            y = self.emit(mod.cv1, v["cv1"], x)
            return b.node("Add", [x, y]) if mod.add else y
        if isinstance(mod, M.RepVGGDW):  # fused: one 7x7 DW conv + bias + SiLU
            assert "kernel" in v, "export requires fused variables (model.fuse)"
            wname = b.const(_w(v["kernel"]), "W")
            bias = b.const(np.asarray(v["bias"], np.float32), "B")
            y = b.node("Conv", [x, wname, bias], strides=[1, 1], pads=[3, 3, 3, 3], group=mod.c, dilations=[1, 1])
            s = b.node("Sigmoid", [y])
            return b.node("Mul", [y, s], hint="silu")
        if isinstance(mod, M.Attention):
            return self.emit_attention(mod, v, x)
        if isinstance(mod, M.PSABlock):
            y = self.emit_attention(mod.attn, v["attn"], x)
            x = b.node("Add", [x, y]) if mod.add else y
            y = self.emit(mod.ffn, v["ffn"], x)
            return b.node("Add", [x, y]) if mod.add else y
        if isinstance(mod, (M.PSA, M.C2PSA)):
            y0 = self.emit(mod.cv1, v["cv1"], x)
            c = mod.c
            a, bb = self._slice_ch(y0, 0, c), self._slice_ch(y0, c, 2 * c)
            if isinstance(mod, M.C2PSA):
                for i, m in enumerate(mod.m):
                    bb = self.emit(m, v["m"][str(i)], bb)
            else:
                bb = b.node("Add", [bb, self.emit_attention(mod.attn, v["attn"], bb)])
                bb = b.node("Add", [bb, self.emit(mod.ffn, v["ffn"], bb)])
            return self.emit(mod.cv2, v["cv2"], b.node("Concat", [a, bb], axis=1))
        if isinstance(mod, M.C2fAttn):
            assert self.txt is not None, "C2fAttn export requires a WorldModel vocabulary (set_classes)"
            y0 = self.emit(mod.cv1, v["cv1"], x)
            c = mod.c
            ys = [self._slice_ch(y0, 0, c), self._slice_ch(y0, c, 2 * c)]
            for i, m in enumerate(mod.m):
                ys.append(self.emit(m, v["m"][str(i)], ys[-1]))
            ys.append(self.emit_max_sigmoid_attn(mod.attn, v["attn"], ys[-1]))
            return self.emit(mod.cv2, v["cv2"], b.node("Concat", ys, axis=1))
        if isinstance(mod, M.ImagePoolingAttn):
            raise NotImplementedError(
                "ONNX export supports worldv2 graphs (static vocabulary); the v1 ImagePoolingAttn "
                "refines text embeddings from image features at runtime, which cannot be baked"
            )
        if isinstance(mod, M.ABlock):
            x = b.node("Add", [x, self.emit_aattn(mod.attn, v["attn"], x)])
            return b.node("Add", [x, self.emit(mod.mlp, v["mlp"], x)])
        if isinstance(mod, M.A2C2f):
            ys = [self.emit(mod.cv1, v["cv1"], x)]
            for i, m in enumerate(mod.m):
                ys.append(self.emit(m, v["m"][str(i)], ys[-1]))
            out = self.emit(mod.cv2, v["cv2"], b.node("Concat", ys, axis=1))
            if mod.residual:
                g = b.const(np.asarray(v["gamma"], np.float32).reshape(1, -1, 1, 1), "gamma")
                out = b.node("Add", [x, b.node("Mul", [g, out])])
            return out
        if isinstance(mod, M.Classify):
            y = self.emit(mod.conv, v["conv"], x)
            y = b.node("GlobalAveragePool", [y])
            y = b.node("Flatten", [y], axis=1)
            wn = b.const(np.asarray(v["linear"]["kernel"], np.float32), "lin_w")  # (in, out)
            bn = b.const(np.asarray(v["linear"]["bias"], np.float32), "lin_b")
            y = b.node("MatMul", [y, wn])
            y = b.node("Add", [y, bn])
            return b.node("Softmax", [y], axis=1)
        raise NotImplementedError(
            f"ONNX emitter: unsupported module {type(mod).__name__}. Supported: the v3-v12 + world(v2) "
            f"module families (Conv/C2f/C3/SPPF/Ghost/RepVGG/RepConv/ELAN/ADown/SCDown/PSA/C2PSA/AAttn/"
            f"C2fAttn/Upsample/Concat/MaxPool) under Detect/v10/Segment/Pose/OBB/World/Classify heads. "
            f"RT-DETR's deformable-attention decoder needs GridSample-class ops with no verifiable "
            f"importer in this image — use the stablehlo/savedmodel artifacts for that family."
        )

    def _slice_ch(self, x, start, end, axis: int = 1):
        b = self.b
        starts = b.const(np.array([start], np.int64), "starts")
        ends = b.const(np.array([end], np.int64), "ends")
        axes = b.const(np.array([axis], np.int64), "axes")
        return b.node("Slice", [x, starts, ends, axes])

    def emit_max_sigmoid_attn(self, at, v, x):
        """Text-guided max-sigmoid attention (reference block.py:414) with the
        guide BAKED: g = txt @ W_gl + b_gl is a constant, so per head the
        similarity is a 1x1 conv over that head's embed channels followed by
        ReduceMax over classes; the proj output is gated per head-block."""
        import math as _math

        b = self.b
        nh, hc = at.nh, at.hc
        g = np.asarray(self.txt, np.float32) @ np.asarray(v["gl"]["kernel"], np.float32) + np.asarray(v["gl"]["bias"], np.float32)
        g = g.reshape(-1, nh, hc)  # (n_cls, nh, hc)
        embed = self.emit(at.ec_conv, v["ec"], x) if at.ec_conv is not None else x
        bias = np.asarray(v["bias"], np.float32)
        scale = np.asarray(v["scale"], np.float32) if at.use_scale else None
        aws = []
        for m in range(nh):
            es = self._slice_ch(embed, m * hc, (m + 1) * hc)
            wm = b.const(np.ascontiguousarray(g[:, m, :]).reshape(-1, hc, 1, 1), "gW")
            sim = b.node("Conv", [es, wm], strides=[1, 1], pads=[0, 0, 0, 0], group=1, dilations=[1, 1])
            mx = b.node("ReduceMax", [sim], axes=[1], keepdims=1)
            mx = b.node("Mul", [mx, b.const(np.array(1.0 / _math.sqrt(hc), np.float32), "inv")])
            mx = b.node("Sigmoid", [b.node("Add", [mx, b.const(np.array(bias[m], np.float32), "ab")])])
            if scale is not None:
                mx = b.node("Mul", [mx, b.const(np.array(scale[m], np.float32), "as")])
            aws.append(mx)
        y = self.emit(at.proj_conv, v["proj_conv"], x)
        outs = [b.node("Mul", [self._slice_ch(y, m * hc, (m + 1) * hc), aws[m]]) for m in range(nh)]
        return b.node("Concat", outs, axis=1) if nh > 1 else outs[0]

    def emit_contrastive(self, head_mod, v, emb, txt):
        """Region-text similarity with the text matrix BAKED as a 1x1-conv
        weight (the reference bakes txt_feats at World export the same way):
        ContrastiveHead L2-normalizes features (block.py:522);
        BNContrastiveHead applies eval-mode BN instead (block.py:540)."""
        b = self.b
        if isinstance(head_mod, M.BNContrastiveHead):
            bn = v["bn"]
            xf = b.node(
                "BatchNormalization",
                [emb, b.const(np.asarray(bn["scale"], np.float32), "g"), b.const(np.asarray(bn["bias"], np.float32), "b"),
                 b.const(np.asarray(bn["mean"], np.float32), "m"), b.const(np.asarray(bn["var"], np.float32), "v")],
                epsilon=float(M.BN_EPS),
            )
        else:
            ss = b.node("ReduceSum", [b.node("Mul", [emb, emb]), b.const(np.array([1], np.int64), "axes")], keepdims=1)
            nrm = b.node("Add", [b.node("Sqrt", [ss]), b.const(np.array(1e-12, np.float32), "eps")])
            xf = b.node("Div", [emb, nrm])
        w = np.asarray(txt, np.float32)
        w = w / (np.linalg.norm(w, axis=-1, keepdims=True) + 1e-12)
        conv_w = b.const(w.reshape(w.shape[0], w.shape[1], 1, 1), "txtW")
        sim = b.node("Conv", [xf, conv_w], strides=[1, 1], pads=[0, 0, 0, 0], group=1, dilations=[1, 1])
        sim = b.node("Mul", [sim, b.const(np.exp(np.asarray(v["logit_scale"], np.float32)), "lscale")])
        return b.node("Add", [sim, b.const(np.asarray(v["bias"], np.float32), "lbias")])

    def _dfl_front(self, head, v, xs, imgsz, branches=None, cls_fn=None):
        """Shared decode front: branch maps -> flat (B, no, A) -> DFL
        expectation. Returns (dist (B,4,A) anchor-units, cls logits (B,nc,A),
        anchors, strides, A). Used by emit_detect and emit_obb."""
        from drone_yolo_tpu.ops.anchors import make_anchors

        b = self.b
        box_mods, box_vars, cls_mods, cls_vars = branches or (head.cv2, v["cv2"], head.cv3, v["cv3"])
        reg, no = head.reg_max, head.no
        flats = []
        feat_shapes = []
        for i, x in enumerate(xs):
            box = self.emit(box_mods[i], box_vars[str(i)], x)
            cls = cls_fn(i, x) if cls_fn is not None else self.emit(cls_mods[i], cls_vars[str(i)], x)
            m = b.node("Concat", [box, cls], axis=1)  # (B, no, h, w)
            h = int(imgsz // head.stride[i])
            feat_shapes.append((h, h))
            shp = b.const(np.array([0, no, h * h], np.int64), "shape")
            flats.append(b.node("Reshape", [m, shp]))
        flat = b.node("Concat", flats, axis=2)  # (B, no, A)
        anchors, strides = make_anchors(feat_shapes, head.stride, 0.5)
        A = anchors.shape[0]

        box = self._slice_ch(flat, 0, 4 * reg)  # (B, 4*reg, A)
        cls = self._slice_ch(flat, 4 * reg, no)
        shp = b.const(np.array([0, 4, reg, A], np.int64), "shape")
        box4 = b.node("Reshape", [box, shp])  # (B, 4, reg, A)
        # DFL expectation sum_r prob[r]*r emitted the way the reference's DFL
        # module computes it (nn/modules/block.py:58): channel softmax over the
        # reg bins followed by a frozen 1x1 Conv whose weight is arange(reg).
        # Conv + channel-Softmax are the two best-supported ops in legacy
        # importers (OpenCV <4.7 C++ DNN rejects opset-13 ReduceSum and
        # asserts on 4-D MatMul with a 2-D constant).
        regT = b.node("Transpose", [box4], perm=[0, 2, 1, 3])  # (B, reg, 4, A)
        prob = b.node("Softmax", [regT], axis=1)
        rng = b.const(np.arange(reg, dtype=np.float32).reshape(1, reg, 1, 1), "dfl_rng")
        ev = b.node("Conv", [prob, rng], strides=[1, 1], pads=[0, 0, 0, 0], group=1, dilations=[1, 1])  # (B, 1, 4, A)
        shp2 = b.const(np.array([0, 4, A], np.int64), "shape")
        dist = b.node("Reshape", [ev, shp2])  # (B, 4, A)
        return dist, cls, anchors, strides, A

    def emit_detect(self, head: M.Detect, v, xs, imgsz, branches=None, cls_fn=None):
        """Raw maps + in-graph DFL decode -> (B, 4+nc, A), reference Detect
        export contract (head.py:100 _inference). `branches` overrides the
        (box_mods, box_vars, cls_mods, cls_vars) tuple — used for v10's
        deployed one2one branch; `cls_fn(i, x)` overrides the class branch —
        used for World's contrastive text scoring."""
        b = self.b
        dist, cls, anchors, strides, A = self._dfl_front(head, v, xs, imgsz, branches=branches, cls_fn=cls_fn)

        anc = np.asarray(anchors, np.float32).T.reshape(1, 2, A)  # (1, 2, A) xy
        anc_n = b.const(anc, "anchors")
        lt = self._slice_ch(dist, 0, 2)
        rb = self._slice_ch(dist, 2, 4)
        x1y1 = b.node("Sub", [anc_n, lt])
        x2y2 = b.node("Add", [anc_n, rb])
        cxy = b.node("Mul", [b.node("Add", [x1y1, x2y2]), b.const(np.array(0.5, np.float32), "half")])
        wh = b.node("Sub", [x2y2, x1y1])
        dbox = b.node("Concat", [cxy, wh], axis=1)  # (B, 4, A) xywh
        # strides tiled to the full channel dim: legacy importers (OpenCV <4.7)
        # lower Mul-by-const to a Scale layer that cannot broadcast (1,1,A)
        # across the box channels
        sn = b.const(np.tile(np.asarray(strides, np.float32).reshape(1, 1, A), (1, 4, 1)), "strides")
        dbox = b.node("Mul", [dbox, sn])
        scores = b.node("Sigmoid", [cls])
        return b.node("Concat", [dbox, scores], axis=1, hint="output")  # (B, 4+nc, A)

    def emit_attention(self, at: M.Attention, v, x):
        """Spatial MHSA (reference block.py:870) in NCHW: qkv conv -> per-head
        q^T k softmax -> v attn^T -> positional DW conv -> proj. Spatial dims
        are recovered at runtime via Shape (the standard exported-ONNX idiom),
        so the same emitter serves any feature-map size."""
        b = self.b
        nh, kd, hd = at.num_heads, at.key_dim, at.head_dim
        per = kd * 2 + hd
        qkv = self.emit(at.qkv, v["qkv"], x)  # (B, nh*per, H, W)
        shp = b.const(np.array([0, nh, per, -1], np.int64), "shape")
        qkv = b.node("Reshape", [qkv, shp])  # (B, nh, per, n)
        q = self._slice_ch(qkv, 0, kd, axis=2)
        k = self._slice_ch(qkv, kd, 2 * kd, axis=2)
        vv = self._slice_ch(qkv, 2 * kd, per, axis=2)
        qt = b.node("Transpose", [q], perm=[0, 1, 3, 2])  # (B, nh, n, kd)
        attn = b.node("MatMul", [qt, k])  # (B, nh, n, n)
        attn = b.node("Mul", [attn, b.const(np.array(at.scale, np.float32), "scale")])
        attn = b.node("Softmax", [attn], axis=3)
        attn_t = b.node("Transpose", [attn], perm=[0, 1, 3, 2])
        out = b.node("MatMul", [vv, attn_t])  # (B, nh, hd, n)
        # back to (B, C, H, W): H/W recovered from the block input's Shape
        hw = b.node("Slice", [b.node("Shape", [x]), b.const(np.array([2], np.int64), "s2"), b.const(np.array([4], np.int64), "s4"), b.const(np.array([0], np.int64), "ax0")])
        lead = b.const(np.array([0, nh * hd], np.int64), "lead")
        full = b.node("Concat", [lead, hw], axis=0)
        out = b.node("Reshape", [out, full])
        vmap = b.node("Reshape", [vv, full])
        pe = self.emit(at.pe, v["pe"], vmap)
        out = b.node("Add", [out, pe])
        return self.emit(at.proj, v["proj"], out)

    def emit_aattn(self, at: M.AAttn, v, x):
        """Area attention (reference block.py:1161, v12) in NCHW: full attention
        within `area` horizontal stripes, stripes folded into the batch dim via
        dynamic Shape arithmetic (the exported input is fixed-size, so importers
        constant-fold the shape subgraph)."""
        b = self.b
        nh, hd, c = at.nh, at.hd, at.dim
        area = at.area if at.area > 1 else 1
        qkv = self.emit(at.qkv, v["qkv"], x)  # (B, 3c, H, W)
        shp3 = b.const(np.array([0, 3 * c, -1], np.int64), "shape")
        qkv = b.node("Transpose", [b.node("Reshape", [qkv, shp3])], perm=[0, 2, 1])  # (B, n, 3c)
        if area > 1:
            # (B, n, 3c) -> (B*area, n/area, 3c); n recovered from Shape(x)
            sh = b.node("Shape", [x])
            h_ = b.node("Slice", [sh, b.const(np.array([2], np.int64), "s2"), b.const(np.array([3], np.int64), "s3"), b.const(np.array([0], np.int64), "ax")])
            w_ = b.node("Slice", [sh, b.const(np.array([3], np.int64), "s3"), b.const(np.array([4], np.int64), "s4"), b.const(np.array([0], np.int64), "ax")])
            n_ = b.node("Mul", [h_, w_])
            n_div = b.node("Div", [n_, b.const(np.array([area], np.int64), "area")])
            shp = b.node("Concat", [b.const(np.array([-1], np.int64), "m1"), n_div, b.const(np.array([3 * c], np.int64), "c3")], axis=0)
            qkv = b.node("Reshape", [qkv, shp])
        shp4 = b.const(np.array([0, -1, nh, 3 * hd], np.int64), "shape")
        qkv = b.node("Reshape", [qkv, shp4])  # (bb, nn, nh, 3hd)
        q = self._slice_ch(qkv, 0, hd, axis=3)
        k = self._slice_ch(qkv, hd, 2 * hd, axis=3)
        vv = self._slice_ch(qkv, 2 * hd, 3 * hd, axis=3)
        qt = b.node("Transpose", [q], perm=[0, 2, 1, 3])  # (bb, nh, nn, hd)
        kt = b.node("Transpose", [k], perm=[0, 2, 3, 1])  # (bb, nh, hd, nn)
        vt = b.node("Transpose", [vv], perm=[0, 2, 1, 3])  # (bb, nh, nn, hd)
        attn = b.node("Mul", [b.node("MatMul", [qt, kt]), b.const(np.array(hd**-0.5, np.float32), "scale")])
        attn = b.node("Softmax", [attn], axis=3)
        out = b.node("Transpose", [b.node("MatMul", [attn, vt])], perm=[0, 2, 1, 3])  # (bb, nn, nh, hd)
        # (bb, nn, nh, hd) -> (B, n, c): flatten heads, then unfold area back
        # into n BEFORE any transpose (area stripes are contiguous along n)
        hw = b.node("Slice", [b.node("Shape", [x]), b.const(np.array([2], np.int64), "s2"), b.const(np.array([4], np.int64), "s4"), b.const(np.array([0], np.int64), "ax")])
        bnc = b.const(np.array([0, -1, c], np.int64), "bnc")
        merged = b.node("Reshape", [out, bnc])  # (bb, nn, c)
        vmerged = b.node("Reshape", [vv, bnc])
        if area > 1:
            unfold = b.node("Concat", [b.const(np.array([-1], np.int64), "m1"), n_, b.const(np.array([c], np.int64), "cc")], axis=0)
            merged = b.node("Reshape", [merged, unfold])  # (B, n, c)
            vmerged = b.node("Reshape", [vmerged, unfold])
        full = b.node("Concat", [b.const(np.array([-1, c], np.int64), "lead"), hw], axis=0)  # (B, c, H, W)
        out = b.node("Reshape", [b.node("Transpose", [merged], perm=[0, 2, 1]), full])
        vmap = b.node("Reshape", [b.node("Transpose", [vmerged], perm=[0, 2, 1]), full])
        pe = self.emit(at.pe, v["pe"], vmap)
        return self.emit(at.proj, v["proj"], b.node("Add", [out, pe]))

    def emit_proto(self, proto: M.Proto, v, x):
        """Mask prototypes (reference block.py:80): cv1 -> ConvTranspose(2,2) -> cv2 -> cv3."""
        b = self.b
        y = self.emit(proto.cv1, v["cv1"], x)
        # our kernel layout (kh, kw, out, in) -> ONNX ConvTranspose W (in, out, kh, kw)
        w = np.transpose(np.asarray(v["up"]["kernel"], np.float32), (3, 2, 0, 1))
        wn = b.const(w, "upW")
        bn = b.const(np.asarray(v["up"]["bias"], np.float32), "upB")
        y = b.node("ConvTranspose", [y, wn, bn], strides=[2, 2], pads=[0, 0, 0, 0])
        y = self.emit(proto.cv2, v["cv2"], y)
        return self.emit(proto.cv3, v["cv3"], y)

    def _branch4(self, head, v, xs, cout, imgsz):
        """Concat the per-level cv4 branch maps into (B, cout, A)."""
        b = self.b
        flats = []
        for i, x in enumerate(xs):
            m = self.emit(head.cv4[i], v["cv4"][str(i)], x)
            h = int(imgsz // head.stride[i])
            shp = b.const(np.array([0, cout, h * h], np.int64), "shape")
            flats.append(b.node("Reshape", [m, shp]))
        return b.node("Concat", flats, axis=2)

    def emit_segment(self, head: M.Segment, v, xs, imgsz):
        """(output0, output1) = ((B, 4+nc+nm, A), protos (B, nm, H/4, W/4)) —
        reference Segment export contract (head.py:175)."""
        protos = self.emit_proto(head.proto, v["proto"], xs[0])
        mc = self._branch4(head, v, xs, head.nm, imgsz)
        det = self.emit_detect(head, v, xs, imgsz)
        out0 = self.b.node("Concat", [det, mc], axis=1, hint="output")
        return out0, protos

    def emit_pose(self, head: M.Pose, v, xs, imgsz):
        """(B, 4+nc+nk, A) with keypoints decoded to pixel space
        (reference head.py:230,271 kpts_decode)."""
        from drone_yolo_tpu.ops.anchors import make_anchors

        b = self.b
        det = self.emit_detect(head, v, xs, imgsz)
        kpt = self._branch4(head, v, xs, head.nk, imgsz)  # (B, nk, A)
        K, D = head.kpt_shape
        feat_shapes = [(int(imgsz // s), int(imgsz // s)) for s in head.stride]
        anchors, strides = make_anchors(feat_shapes, head.stride, 0.5)
        A = anchors.shape[0]
        shp = b.const(np.array([0, K, D, A], np.int64), "shape")
        y = b.node("Reshape", [kpt, shp])  # (B, K, D, A)
        xy = self._slice_ch(y, 0, 2, axis=2)
        anc = b.const(np.asarray(anchors, np.float32).T.reshape(1, 1, 2, A) - 0.5, "kpt_anc")
        sn = b.const(np.asarray(strides, np.float32).reshape(1, 1, 1, A), "kpt_strides")
        xy = b.node("Mul", [b.node("Add", [b.node("Mul", [xy, b.const(np.array(2.0, np.float32), "two")]), anc]), sn])
        if D == 3:
            conf = b.node("Sigmoid", [self._slice_ch(y, 2, 3, axis=2)])
            y = b.node("Concat", [xy, conf], axis=2)
        else:
            y = xy
        shp2 = b.const(np.array([0, K * D, A], np.int64), "shape")
        pkpt = b.node("Reshape", [y, shp2])
        return b.node("Concat", [det, pkpt], axis=1, hint="output")

    def emit_obb(self, head: M.OBB, v, xs, imgsz):
        """(B, 4+nc+1, A): rotation-aware box decode (dist2rbox, ops/anchors.py:61)
        + angle channel — reference OBB export contract (head.py:200)."""
        b = self.b
        angle_raw = self._branch4(head, v, xs, head.ne, imgsz)  # (B, 1, A)
        sig = b.node("Sigmoid", [angle_raw])
        angle = b.node(
            "Mul",
            [b.node("Sub", [sig, b.const(np.array(0.25, np.float32), "quarter")]), b.const(np.array(np.pi, np.float32), "pi")],
        )
        dist, cls, anchors, strides, A = self._dfl_front(head, v, xs, imgsz)

        # dist2rbox: rotate the (rb-lt)/2 offset by angle, add anchors; wh = lt+rb
        lt = self._slice_ch(dist, 0, 2)
        rb = self._slice_ch(dist, 2, 4)
        half = b.const(np.array(0.5, np.float32), "half")
        off = b.node("Mul", [b.node("Sub", [rb, lt]), half])  # (B, 2, A)
        xf = self._slice_ch(off, 0, 1)
        yf = self._slice_ch(off, 1, 2)
        cos = b.node("Cos", [angle])
        sin = b.node("Sin", [angle])
        xr = b.node("Sub", [b.node("Mul", [xf, cos]), b.node("Mul", [yf, sin])])
        yr = b.node("Add", [b.node("Mul", [xf, sin]), b.node("Mul", [yf, cos])])
        anc = b.const(np.asarray(anchors, np.float32).T.reshape(1, 2, A), "anchors")
        xy = b.node("Add", [b.node("Concat", [xr, yr], axis=1), anc])
        wh = b.node("Add", [lt, rb])
        sn = b.const(np.asarray(strides, np.float32).reshape(1, 1, A), "strides")
        rbox = b.node("Mul", [b.node("Concat", [xy, wh], axis=1), sn])
        scores = b.node("Sigmoid", [cls])
        return b.node("Concat", [rbox, scores, angle], axis=1, hint="output")


def export_onnx(model, variables, path, imgsz=640, batch=1):
    """Serialize `model` (a nn.model BaseModel subclass) with FUSED `variables`
    to an ONNX file. Returns the path."""
    b = Builder()
    txt = getattr(model, "txt_feats", None)
    em = Emitter(b, txt=None if txt is None else np.asarray(txt)[0])
    variables = model.fuse(variables)

    names = {}
    outputs = []  # [(tensor_name, public_name, dims)]
    x0 = "images"
    for spec in model.layers:
        f = spec.f
        xin = x0 if f == -1 else (names[f] if isinstance(f, int) else [x0 if j == -1 else names[j] for j in f])
        v = variables.get(str(spec.i), {})
        mod = spec.module
        if isinstance(mod, M.Detect):
            A = sum((imgsz // int(s)) ** 2 for s in mod.stride)
            if isinstance(mod, M.WorldDetect):
                # bake the model's current vocabulary (set_classes txt_feats)
                # as constants, like the reference's World export
                assert em.txt is not None and em.txt.shape[0] == mod.nc, "WorldModel txt_feats required (set_classes)"
                head, headv = mod, v

                def world_cls(i, xi):
                    emb = em.emit(head.cv3[i], headv["cv3"][str(i)], xi)
                    return em.emit_contrastive(head.cv4[i], headv["cv4"][str(i)], emb, em.txt)

                out0 = em.emit_detect(mod, v, xin, imgsz, cls_fn=world_cls)
                outputs = [(out0, "output0", (batch, 4 + mod.nc, A))]
            elif isinstance(mod, M.v10Detect):
                # NMS-free deployed branch: decoded one2one maps. The reference
                # additionally bakes a top-k postprocess into the graph
                # (head.py:150); here top-k stays host-side (TopK/GatherElements
                # are not portable across the importers we can verify against),
                # so the artifact contract is (B, 4+nc, A) like plain Detect —
                # consumers threshold/top-k directly, no NMS needed.
                out0 = em.emit_detect(
                    mod, v, xin, imgsz,
                    branches=(mod.one2one_cv2, v["one2one_cv2"], mod.one2one_cv3, v["one2one_cv3"]),
                )
                outputs = [(out0, "output0", (batch, 4 + mod.nc, A))]
            elif isinstance(mod, M.Segment):
                out0, protos = em.emit_segment(mod, v, xin, imgsz)
                mh = 2 * (imgsz // int(mod.stride[0]))
                outputs = [(out0, "output0", (batch, 4 + mod.nc + mod.nm, A)), (protos, "output1", (batch, mod.nm, mh, mh))]
            elif isinstance(mod, M.Pose):
                out0 = em.emit_pose(mod, v, xin, imgsz)
                outputs = [(out0, "output0", (batch, 4 + mod.nc + mod.nk, A))]
            elif isinstance(mod, M.OBB):
                out0 = em.emit_obb(mod, v, xin, imgsz)
                outputs = [(out0, "output0", (batch, 4 + mod.nc + mod.ne, A))]
            else:
                out0 = em.emit_detect(mod, v, xin, imgsz)
                outputs = [(out0, "output0", (batch, 4 + mod.nc, A))]
            break
        if isinstance(mod, M.Classify):
            outputs = [(em.emit(mod, v, xin), "output0", (batch, mod.c2))]
            break
        x0 = em.emit(mod, v, xin)
        names[spec.i] = x0

    mp = O.ModelProto()
    mp.ir_version = 8
    mp.producer_name = "drone_yolo_tpu"
    mp.producer_version = "0.3"
    op = mp.opset_import.add()
    op.version = OPSET
    g = mp.graph
    g.name = "main"
    g.node.extend(b.nodes)
    g.initializer.extend(b.inits)

    vi = g.input.add()
    vi.name = "images"
    vi.type.tensor_type.elem_type = FLOAT
    for d in (batch, 3, imgsz, imgsz):
        vi.type.tensor_type.shape.dim.add().dim_value = d

    # rename outputs to the reference's conventional names (output0, output1, ...)
    rename = {tname: public for tname, public, _ in outputs}
    for nd in g.node:
        for i, o in enumerate(nd.output):
            if o in rename:
                nd.output[i] = rename[o]
        for i, o in enumerate(nd.input):
            if o in rename:
                nd.input[i] = rename[o]
    for tname, public, dims in outputs:
        vo = g.output.add()
        vo.name = public
        vo.type.tensor_type.elem_type = FLOAT
        for d in dims or ():
            vo.type.tensor_type.shape.dim.add().dim_value = d

    path = Path(path)
    path.write_bytes(mp.SerializeToString())
    return str(path)
