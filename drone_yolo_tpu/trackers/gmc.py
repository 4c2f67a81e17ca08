"""Global motion compensation for BoT-SORT (reference trackers/utils/gmc.py:11).

Estimates inter-frame camera motion with sparse optical flow (or ORB/ECC) and
warps track predictions accordingly — essential on drone video where the camera
moves constantly.
"""

from __future__ import annotations

import numpy as np

from drone_yolo_tpu.utils import LOGGER


class GMC:
    """Global motion compensation between frames for BoT-SORT (reference utils/gmc.py:11)."""
    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        self.method = method
        self.downscale = max(1, int(downscale))
        self.prev_frame = None
        self.prev_kpts = None
        self.initialized = False

    def apply(self, raw_frame, detections=None) -> np.ndarray:
        """Returns 2x3 affine warp from previous to current frame."""
        if self.method in {"sparseOptFlow"}:
            return self._apply_sparse_optflow(raw_frame)
        if self.method in {"orb", "sift"}:
            return self._apply_features(raw_frame)
        if self.method == "ecc":
            return self._apply_ecc(raw_frame)
        return np.eye(2, 3, dtype=np.float32)

    def _preprocess(self, raw_frame):
        import cv2

        frame = cv2.cvtColor(raw_frame, cv2.COLOR_BGR2GRAY)
        if self.downscale > 1:
            frame = cv2.resize(frame, (frame.shape[1] // self.downscale, frame.shape[0] // self.downscale))
        return frame

    def _apply_sparse_optflow(self, raw_frame):
        import cv2

        h = np.eye(2, 3, dtype=np.float32)
        frame = self._preprocess(raw_frame)
        kpts = cv2.goodFeaturesToTrack(
            frame, maxCorners=1000, qualityLevel=0.01, minDistance=1, blockSize=3, useHarrisDetector=False, k=0.04
        )
        if not self.initialized or self.prev_kpts is None:
            self.prev_frame, self.prev_kpts = frame, kpts
            self.initialized = True
            return h
        if kpts is None:
            return h
        next_kpts, status, _ = cv2.calcOpticalFlowPyrLK(self.prev_frame, frame, self.prev_kpts, None)
        if next_kpts is None:
            self.prev_frame, self.prev_kpts = frame, kpts
            return h
        ok = status.ravel() == 1
        prev_pts, curr_pts = self.prev_kpts[ok], next_kpts[ok]
        if len(prev_pts) > 4:
            m, _ = cv2.estimateAffinePartial2D(prev_pts, curr_pts, method=cv2.RANSAC)
            if m is not None:
                h = m.astype(np.float32)
                if self.downscale > 1:
                    h[0, 2] *= self.downscale
                    h[1, 2] *= self.downscale
        else:
            LOGGER.warning("GMC: not enough matching points")
        self.prev_frame, self.prev_kpts = frame, kpts
        return h

    def _apply_features(self, raw_frame):
        import cv2

        h = np.eye(2, 3, dtype=np.float32)
        frame = self._preprocess(raw_frame)
        detector = cv2.ORB_create(2000) if self.method == "orb" else cv2.SIFT_create()
        kp, des = detector.detectAndCompute(frame, None)
        if not self.initialized:
            self.prev_frame, self.prev_kpts = frame, (kp, des)
            self.initialized = True
            return h
        pkp, pdes = self.prev_kpts
        if des is None or pdes is None or len(kp) < 4 or len(pkp) < 4:
            self.prev_frame, self.prev_kpts = frame, (kp, des)
            return h
        norm = cv2.NORM_HAMMING if self.method == "orb" else cv2.NORM_L2
        matcher = cv2.BFMatcher(norm)
        matches = matcher.knnMatch(pdes, des, k=2)
        good = [m for pair in matches if len(pair) == 2 for m, n in [pair] if m.distance < 0.75 * n.distance]
        if len(good) > 4:
            src = np.float32([pkp[m.queryIdx].pt for m in good])
            dst = np.float32([kp[m.trainIdx].pt for m in good])
            m, _ = cv2.estimateAffinePartial2D(src, dst, method=cv2.RANSAC)
            if m is not None:
                h = m.astype(np.float32)
                if self.downscale > 1:
                    h[0, 2] *= self.downscale
                    h[1, 2] *= self.downscale
        self.prev_frame, self.prev_kpts = frame, (kp, des)
        return h

    def _apply_ecc(self, raw_frame):
        import cv2

        h = np.eye(2, 3, dtype=np.float32)
        frame = self._preprocess(raw_frame)
        if not self.initialized:
            self.prev_frame = frame
            self.initialized = True
            return h
        criteria = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 100, 1e-5)
        try:
            _, h = cv2.findTransformECC(self.prev_frame, frame, h, cv2.MOTION_EUCLIDEAN, criteria)
        except cv2.error:
            pass
        self.prev_frame = frame
        return h

    def reset_params(self):
        self.prev_frame = None
        self.prev_kpts = None
        self.initialized = False
