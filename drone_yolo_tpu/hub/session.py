"""HUB training session: a real HTTP client for a HUB-protocol backend.

Capability parity with `ultralytics/hub/session.py:19-392` (HUBTrainingSession:
model load/create, threaded heartbeats, retrying request queue, metric-queue
upload, checkpoint upload). The transport is urllib (no requests dependency);
the endpoint comes from the `DYT_HUB_API_ROOT` env var or the `api_root`
argument — when unset the session runs OFFLINE (queues locally, uploads are
no-ops), which is the zero-egress default. Tested against an in-process HUB
server double in tests/test_periphery.py.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.request
from pathlib import Path

from drone_yolo_tpu.utils import LOGGER

AGENT_NAME = "python-dyt"


class HUBTrainingSession:
    """HUB client session: heartbeats + metric/checkpoint upload hooks (reference hub/session.py:19)."""
    def __init__(self, identifier: str = "", api_key: str | None = None, api_root: str | None = None, heartbeat_interval: float = 30.0):
        import os

        self.api_root = (api_root or os.environ.get("DYT_HUB_API_ROOT", "")).rstrip("/")
        self.api_key = api_key or os.environ.get("DYT_HUB_API_KEY", "")
        self.model_id = self._parse_identifier(identifier)
        self.metrics_queue: dict = {}
        self.timers: dict = {}
        self.alive = True
        self._hb_thread = None
        self._hb_interval = heartbeat_interval
        if self.online:
            self._start_heartbeats()

    # -- identity --------------------------------------------------------------
    @property
    def online(self) -> bool:
        return bool(self.api_root)

    @staticmethod
    def _parse_identifier(identifier: str) -> str:
        """Accept a bare model id or a HUB url '<root>/models/<id>'
        (reference session.py:147)."""
        identifier = str(identifier or "")
        if "/models/" in identifier:
            return identifier.rsplit("/models/", 1)[1]
        return identifier

    # -- transport -------------------------------------------------------------
    def _headers(self) -> dict:
        h = {"Content-Type": "application/json"}
        if self.api_key:
            h["x-api-key"] = self.api_key
        return h

    def request_queue(self, path: str, payload: dict | bytes | None = None, retry: int = 3, timeout: float = 10.0, method: str = "POST"):
        """POST with bounded exponential-backoff retries (reference
        session.py:209); returns parsed JSON or None. Offline -> None."""
        if not self.online:
            return None
        body = payload if isinstance(payload, (bytes, type(None))) else json.dumps(payload).encode()
        headers = self._headers()
        if isinstance(payload, bytes):
            headers["Content-Type"] = "application/octet-stream"
        url = f"{self.api_root}{path}"
        for attempt in range(retry + 1):
            try:
                req = urllib.request.Request(url, data=body, headers=headers, method=method)
                with urllib.request.urlopen(req, timeout=timeout) as r:  # noqa: S310 (user-configured endpoint)
                    raw = r.read()
                    return json.loads(raw) if raw else {}
            except Exception as e:  # noqa: BLE001
                if attempt >= retry:
                    LOGGER.warning(f"hub: {path} failed after {retry} retries: {e}")
                    return None
                time.sleep(2**attempt)

    # -- session lifecycle -----------------------------------------------------
    def load_model(self, model_id: str | None = None) -> dict | None:
        return self.request_queue(f"/models/{model_id or self.model_id}", method="GET")

    def create_model(self, model_args: dict) -> str | None:
        resp = self.request_queue("/models", payload=model_args)
        if resp and resp.get("id"):
            self.model_id = resp["id"]
            return self.model_id
        return None

    def _start_heartbeats(self) -> None:
        """Threaded agent heartbeats (reference hub/__init__.py agent beats)."""

        def beat():
            while self.alive:
                self.request_queue(f"/agent/{self.model_id}/heartbeat", payload={"agent": AGENT_NAME}, retry=0)
                time.sleep(self._hb_interval)

        self._hb_thread = threading.Thread(target=beat, daemon=True)
        self._hb_thread.start()

    def stop(self) -> None:
        self.alive = False

    # -- uploads ---------------------------------------------------------------
    def upload_metrics(self, epoch: int | None = None, metrics: dict | None = None):
        """Queue metrics; flush the whole queue to the backend (reference
        session.py:311 uploads the queue, callbacks fill it per epoch)."""
        if epoch is not None:
            self.metrics_queue[int(epoch)] = metrics or {}
        return self.request_queue(f"/models/{self.model_id}/metrics", payload={"metrics": {str(k): v for k, v in self.metrics_queue.items()}})

    def upload_model(self, epoch: int, weights: str, is_best: bool = False, final: bool = False, map_: float = 0.0):
        """Upload a checkpoint file (reference session.py:315)."""
        p = Path(weights)
        if not p.exists():
            LOGGER.warning(f"hub: weights {weights} not found, skipping upload")
            return None
        if not self.online:
            LOGGER.info(f"hub: offline — skipping upload of {p.name} (epoch {epoch})")
            return None
        q = f"?epoch={int(epoch)}&is_best={str(bool(is_best)).lower()}&final={str(bool(final)).lower()}&map={float(map_)}"
        return self.request_queue(f"/models/{self.model_id}/upload{q}", payload=p.read_bytes(), timeout=300.0)

    def heartbeat(self) -> None:
        self.request_queue(f"/agent/{self.model_id}/heartbeat", payload={"agent": AGENT_NAME}, retry=0)
