"""HUB client interface (reference `ultralytics/hub/`, 922 LoC).

The reference talks to the Ultralytics HUB SaaS (auth, training-session
heartbeats, metric upload, telemetry). This deployment is zero-egress, so the
client is an interface-compatible no-op that logs instead of POSTing; training
metric streaming rides the same callback events (`on_fit_epoch_end`,
`on_model_save`) so a real backend can be dropped in by replacing HUBSession.
"""

from __future__ import annotations

from drone_yolo_tpu.utils import LOGGER

HUB_API_ROOT = ""
HUB_WEB_ROOT = ""


def login(api_key: str | None = None) -> bool:
    LOGGER.info("hub: zero-egress build, credentials stored locally only")
    return False


def logout() -> None:
    LOGGER.info("hub: logged out")


class HUBSession:
    """Training-session shim (reference hub/session.py:19 HUBTrainingSession)."""

    def __init__(self, model_id: str = ""):
        self.model_id = model_id
        self.metrics_queue: dict = {}
        self.alive = True

    def upload_metrics(self, epoch: int, metrics: dict) -> None:
        self.metrics_queue[epoch] = metrics

    def upload_model(self, epoch: int, weights: str, is_best: bool = False, final: bool = False) -> None:
        LOGGER.info(f"hub: would upload {'best ' if is_best else ''}{weights} (epoch {epoch}, zero-egress no-op)")

    def heartbeat(self) -> None:
        pass


class Events:
    """Anonymous telemetry sink (reference hub/utils.py:170) — disabled."""

    enabled = False

    def __call__(self, *args, **kwargs) -> None:
        return None


events = Events()
