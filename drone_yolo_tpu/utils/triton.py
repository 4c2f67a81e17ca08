"""Triton Inference Server client over the open KServe-v2 REST protocol.

Capability parity with `ultralytics/utils/triton.py:9-104` (TritonRemoteModel),
re-designed without the `tritonclient` dependency: the v2 inference protocol is
plain HTTP + JSON (with an optional binary-tensor extension), so the client
speaks it directly via urllib. This keeps remote-serving support zero-dep and
works against Triton as well as any KServe-v2-compatible server (including the
local test double in tests/test_periphery.py).

Protocol notes
--------------
* model config:  GET  {server}/v2/models/{name}/config        (Triton extension)
  fallback:      GET  {server}/v2/models/{name}               (KServe metadata)
* inference:     POST {server}/v2/models/{name}/infer
  Requests use the binary-data extension (JSON header + concatenated raw
  little-endian tensor bytes, sized by the ``Inference-Header-Content-Length``
  header); responses may come back either binary or pure-JSON — both parsed.
"""

from __future__ import annotations

import json
import urllib.request
from typing import List
from urllib.parse import urlsplit

import numpy as np

# Triton config files use TYPE_-prefixed names; v2 metadata uses the bare ones.
_DTYPES = {
    "BOOL": np.bool_,
    "UINT8": np.uint8,
    "UINT16": np.uint16,
    "UINT32": np.uint32,
    "UINT64": np.uint64,
    "INT8": np.int8,
    "INT16": np.int16,
    "INT32": np.int32,
    "INT64": np.int64,
    "FP16": np.float16,
    "FP32": np.float32,
    "FP64": np.float64,
}


def _np_dtype(name: str):
    return _DTYPES[name.replace("TYPE_", "")]


class TritonRemoteModel:
    """Callable remote model: ``outputs = model(*numpy_inputs)``.

    Mirrors the reference attribute surface (`endpoint`, `url`, `input_names`,
    `input_formats`, `np_input_formats`, `output_names`, `metadata`) so the
    predictor/AutoBackend integration matches `nn/autobackend.py:130-137`.
    """

    def __init__(self, url: str, endpoint: str = "", scheme: str = "", timeout: float = 60.0):
        if not endpoint and not scheme:  # parse "<scheme>://<netloc>/<endpoint>"
            splits = urlsplit(url)
            endpoint = splits.path.strip("/").split("/")[0]
            scheme = splits.scheme
            url = splits.netloc
        if scheme in ("grpc", "grpcs"):
            raise ValueError("grpc scheme needs the tritonclient package; use http:// (KServe v2 REST)")
        if scheme not in ("", "http", "https"):
            raise ValueError(f"unsupported scheme '{scheme}' (use http:// or https://)")
        self.endpoint = endpoint
        self.url = url
        self.timeout = timeout
        # preserve the caller's scheme: silently downgrading https:// to
        # cleartext would leak payloads/auth headers (ADVICE r2)
        self._base = f"{scheme or 'http'}://{url}/v2/models/{endpoint}"

        config = self._get_config()
        config["output"] = sorted(config["output"], key=lambda x: x.get("name"))
        self.input_formats = [x["data_type"] for x in config["input"]]
        self.np_input_formats = [_np_dtype(x) for x in self.input_formats]
        self.input_names = [x["name"] for x in config["input"]]
        self.output_names = [x["name"] for x in config["output"]]
        meta = config.get("parameters", {}).get("metadata", {})
        if isinstance(meta, dict):
            meta = meta.get("string_value", "")
        try:
            self.metadata = json.loads(meta) if meta else None
        except json.JSONDecodeError:
            self.metadata = None

    # -- HTTP ------------------------------------------------------------------
    def _http(self, path: str, data: bytes | None = None, headers: dict | None = None):
        req = urllib.request.Request(self._base + path, data=data, headers=headers or {})
        with urllib.request.urlopen(req, timeout=self.timeout) as r:  # noqa: S310 (user-supplied server)
            return dict(r.headers), r.read()

    def _get_config(self) -> dict:
        try:  # Triton's config endpoint: {"input": [{"name","data_type","dims"}..], "output": [..]}
            _, body = self._http("/config")
            return json.loads(body)
        except Exception:
            # KServe metadata: {"inputs": [{"name","datatype","shape"}..], "outputs": [..]}
            _, body = self._http("")
            md = json.loads(body)
            conv = lambda ts: [{"name": t["name"], "data_type": t["datatype"], "dims": t.get("shape", [])} for t in ts]
            return {"input": conv(md.get("inputs", [])), "output": conv(md.get("outputs", [])), "parameters": {}}

    # -- inference -------------------------------------------------------------
    def __call__(self, *inputs: np.ndarray) -> List[np.ndarray]:
        out_format = inputs[0].dtype
        header_inputs, blobs = [], []
        for i, x in enumerate(inputs):
            x = np.ascontiguousarray(x, dtype=self.np_input_formats[i])
            blob = x.tobytes()
            header_inputs.append(
                {
                    "name": self.input_names[i],
                    "shape": list(x.shape),
                    "datatype": self.input_formats[i].replace("TYPE_", ""),
                    "parameters": {"binary_data_size": len(blob)},
                }
            )
            blobs.append(blob)
        header = json.dumps(
            {
                "inputs": header_inputs,
                "outputs": [{"name": n, "parameters": {"binary_data": True}} for n in self.output_names],
            }
        ).encode()
        body = header + b"".join(blobs)
        resp_headers, resp = self._http(
            "/infer",
            data=body,
            headers={
                "Content-Type": "application/octet-stream",
                "Inference-Header-Content-Length": str(len(header)),
            },
        )
        return [o.astype(out_format) for o in self._parse_response(resp_headers, resp)]

    def _parse_response(self, headers: dict, resp: bytes) -> List[np.ndarray]:
        hlen = next((int(v) for k, v in headers.items() if k.lower() == "inference-header-content-length"), len(resp))
        rj = json.loads(resp[:hlen])
        by_name, offset = {}, hlen
        for o in rj["outputs"]:
            dt, shape = _np_dtype(o["datatype"]), o["shape"]
            nbytes = int(o.get("parameters", {}).get("binary_data_size", 0))
            if nbytes:  # binary extension payload
                arr = np.frombuffer(resp[offset : offset + nbytes], dtype=dt).reshape(shape)
                offset += nbytes
            else:  # pure-JSON data array
                arr = np.asarray(o["data"], dtype=dt).reshape(shape)
            by_name[o["name"]] = arr
        return [by_name[n] for n in self.output_names]
