"""Interactive browser inference app (streamlit), the TPU-side counterpart of
the reference's `ultralytics/solutions/streamlit_inference.py:14` Inference.

Design differences from the reference: the UI module is injected (testable
without streamlit installed), models resolve from local paths/yamls only
(zero-egress), and the frame loop reuses one compiled predictor — streaming
frames hit the same jitted graph, so per-frame latency is the XLA steady state.
"""

from __future__ import annotations

import io
from typing import Any

from drone_yolo_tpu.utils import LOGGER

# Local model choices offered in the dropdown (yaml = random-init demo graphs;
# users normally pass model="path/to/weights.npz").
DEFAULT_MODELS = ["yolov8n.yaml", "yolov8s.yaml", "yolo11n.yaml", "yolov8s-p2-repvgg-sf.yaml"]


class Inference:
    """Real-time detect/track UI: model picker, conf/IoU sliders, class filter,
    webcam or uploaded video, original + annotated frames side by side
    (reference streamlit_inference.py:14-176 capability envelope)."""

    def __init__(self, st_module=None, capture_factory=None, **kwargs: Any):
        if st_module is None:  # real streamlit unless a fake is injected for tests
            try:
                import streamlit as st_module  # type: ignore
            except ImportError as e:  # pragma: no cover
                raise ImportError(
                    "The interactive inference app needs streamlit (`pip install streamlit`)."
                ) from e
        self.st = st_module
        if capture_factory is None:
            import cv2

            capture_factory = cv2.VideoCapture
        self._capture = capture_factory

        self.source = None
        self.enable_trk = False
        self.conf = 0.25
        self.iou = 0.45
        self.org_frame = None
        self.ann_frame = None
        self.vid_file_name = None
        self.selected_ind: list[int] = []
        self.model = None
        self.model_path = kwargs.get("model")
        LOGGER.info(f"Solutions inference app: {kwargs}")

    def web_ui(self):
        """Page config + headers."""
        self.st.set_page_config(page_title="Drone-YOLO TPU", layout="wide")
        self.st.markdown("<style>MainMenu {visibility: hidden;}</style>", unsafe_allow_html=True)
        self.st.markdown(
            "<h1 style='text-align:center'>Drone-YOLO TPU live inference</h1>", unsafe_allow_html=True
        )

    def sidebar(self):
        """Source / tracking / threshold controls; two frame panes."""
        self.st.sidebar.title("Configuration")
        self.source = self.st.sidebar.selectbox("Video", ("webcam", "video"))
        self.enable_trk = self.st.sidebar.radio("Enable Tracking", ("Yes", "No"))
        self.conf = float(self.st.sidebar.slider("Confidence Threshold", 0.0, 1.0, self.conf, 0.01))
        self.iou = float(self.st.sidebar.slider("IoU Threshold", 0.0, 1.0, self.iou, 0.01))
        col1, col2 = self.st.columns(2)
        self.org_frame = col1.empty()
        self.ann_frame = col2.empty()

    def source_upload(self):
        """Webcam index 0 or an uploaded video saved to a temp file."""
        self.vid_file_name = ""
        if self.source == "video":
            vid_file = self.st.sidebar.file_uploader("Upload Video File", type=["mp4", "mov", "avi", "mkv"])
            if vid_file is not None:
                g = io.BytesIO(vid_file.read())
                with open("drone_yolo_upload.mp4", "wb") as out:
                    out.write(g.read())
                self.vid_file_name = "drone_yolo_upload.mp4"
        elif self.source == "webcam":
            self.vid_file_name = 0

    def configure(self):
        """Model dropdown (local choices only) + class multiselect."""
        from drone_yolo_tpu.engine.model import YOLO

        available = list(DEFAULT_MODELS)
        if self.model_path:
            available.insert(0, self.model_path)
        selected_model = self.st.sidebar.selectbox("Model", available)
        with self.st.spinner("Loading model (first compile may take a moment)..."):
            self.model = YOLO(selected_model)
            class_names = list(self.model.names.values())
        self.st.success("Model loaded!")
        selected_classes = self.st.sidebar.multiselect("Classes", class_names, default=class_names[:3])
        self.selected_ind = [class_names.index(option) for option in selected_classes]

    def inference(self):
        """The full app: UI -> config -> frame loop through one compiled graph."""
        self.web_ui()
        self.sidebar()
        self.source_upload()
        self.configure()

        if self.st.sidebar.button("Start"):
            stop_button = self.st.button("Stop")
            cap = self._capture(self.vid_file_name)
            if not cap.isOpened():
                self.st.error("Could not open source.")
            while cap.isOpened():
                success, frame = cap.read()
                if not success:
                    self.st.warning("Failed to read frame.")
                    break
                if self.enable_trk == "Yes":
                    results = self.model.track(
                        frame, conf=self.conf, iou=self.iou, classes=self.selected_ind or None, persist=True
                    )
                else:
                    results = self.model(frame, conf=self.conf, iou=self.iou, classes=self.selected_ind or None)
                annotated_frame = results[0].plot()
                if stop_button:
                    cap.release()
                    self.st.stop()
                self.org_frame.image(frame, channels="BGR")
                self.ann_frame.image(annotated_frame, channels="BGR")
            cap.release()


if __name__ == "__main__":  # pragma: no cover
    import sys

    Inference(model=sys.argv[1] if len(sys.argv) > 1 else None).inference()
