"""Inference source loaders: files, video, PIL/numpy, arrays, streams, screenshots.

Capability parity with `ultralytics/data/loaders.py:25-560` (SourceTypes,
LoadStreams, LoadScreenshots, LoadImagesAndVideos, LoadPilAndNumpy, LoadTensor).
Host-side cv2/numpy; each loader yields (paths, imgs(list of HWC BGR uint8), info).
"""

from __future__ import annotations

import glob
import math
import os
import threading
import time
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from drone_yolo_tpu.utils import LOGGER

IMG_FORMATS = {"bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm", "heic"}
VID_FORMATS = {"asf", "avi", "gif", "m4v", "mkv", "mov", "mp4", "mpeg", "mpg", "ts", "wmv", "webm"}


@dataclass
class SourceTypes:
    """Flags describing the input source (reference loaders.py:25)."""

    stream: bool = False
    screenshot: bool = False
    from_img: bool = False
    tensor: bool = False


class LoadImagesAndVideos:
    """Iterate image files / globs / dirs / videos in batches (reference loaders.py:284)."""

    def __init__(self, path, batch: int = 1, vid_stride: int = 1):
        parent = None
        if isinstance(path, str) and Path(path).suffix == ".txt":
            parent = Path(path).parent
            path = Path(path).read_text().split()
        files = []
        for p in sorted(path) if isinstance(path, (list, tuple)) else [path]:
            a = str(Path(p).absolute() if not parent else (parent / p).absolute())
            if "*" in a:
                files.extend(sorted(glob.glob(a, recursive=True)))
            elif os.path.isdir(a):
                files.extend(sorted(glob.glob(os.path.join(a, "*.*"))))
            elif os.path.isfile(a):
                files.append(a)
            else:
                raise FileNotFoundError(f"{p} does not exist")
        self.files, self.video_flag = [], []
        for f in files:
            suffix = f.split(".")[-1].lower()
            if suffix in IMG_FORMATS:
                self.files.append(f)
                self.video_flag.append(False)
            elif suffix in VID_FORMATS:
                self.files.append(f)
                self.video_flag.append(True)
        self.nf = len(self.files)
        self.ni = self.video_flag.count(False)
        self.mode = "video" if any(self.video_flag) else "image"
        self.vid_stride = vid_stride
        self.bs = batch
        self.cap = None
        self.frame = 0
        self.frames = 0
        if self.nf == 0:
            raise FileNotFoundError(f"No images or videos found in {path}")

    def __iter__(self):
        self.count = 0
        return self

    def __next__(self):
        import cv2

        paths, imgs, info = [], [], []
        while len(imgs) < self.bs:
            if self.count >= self.nf:
                if imgs:
                    return paths, imgs, info
                raise StopIteration
            path = self.files[self.count]
            if self.video_flag[self.count]:
                self.mode = "video"
                if self.cap is None:
                    self.cap = cv2.VideoCapture(path)
                    if not self.cap.isOpened():
                        self.count += 1
                        self.cap = None
                        continue
                    self.frame = 0
                    self.frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT)) or float("inf")
                ok = False
                for _ in range(self.vid_stride):
                    ok = self.cap.grab()
                    if not ok:
                        break
                if ok:
                    ok, im0 = self.cap.retrieve()
                if not ok:
                    self.cap.release()
                    self.cap = None
                    self.count += 1
                    continue
                self.frame += self.vid_stride
                paths.append(path)
                imgs.append(im0)
                info.append(f"video {self.count + 1}/{self.nf} (frame {self.frame}/{self.frames}) {path}: ")
            else:
                self.mode = "image"
                im0 = cv2.imread(path)
                if im0 is None:
                    LOGGER.warning(f"Image read error {path}")
                else:
                    paths.append(path)
                    imgs.append(im0)
                    info.append(f"image {self.count + 1}/{self.nf} {path}: ")
                self.count += 1
        return paths, imgs, info

    def __len__(self):
        return math.ceil(self.nf / self.bs)


class LoadPilAndNumpy:
    """Wrap in-memory PIL/numpy images (reference loaders.py:451)."""

    def __init__(self, im0):
        if not isinstance(im0, list):
            im0 = [im0]
        self.paths = [getattr(im, "filename", "") or f"image{i}.jpg" for i, im in enumerate(im0)]
        self.im0 = [self._single_check(im) for im in im0]
        self.mode = "image"
        self.bs = len(self.im0)

    @staticmethod
    def _single_check(im):
        if not isinstance(im, np.ndarray):  # PIL
            if im.mode != "RGB":
                im = im.convert("RGB")
            im = np.asarray(im)[:, :, ::-1]  # RGB -> BGR to match cv2 sources
            im = np.ascontiguousarray(im)
        return im

    def __iter__(self):
        self.count = 0
        return self

    def __next__(self):
        if self.count == 1:
            raise StopIteration
        self.count = 1
        return self.paths, self.im0, [""] * self.bs

    def __len__(self):
        return 1


class LoadTensor:
    """Wrap a pre-made NHWC float batch in [0,1] (reference loaders.py:516 analog)."""

    def __init__(self, im0):
        self.im0 = np.asarray(im0)
        assert self.im0.ndim == 4, f"expected 4-D NHWC batch, got {self.im0.shape}"
        self.bs = self.im0.shape[0]
        self.mode = "image"
        self.paths = [f"image{i}.jpg" for i in range(self.bs)]

    def __iter__(self):
        self.count = 0
        return self

    def __next__(self):
        if self.count == 1:
            raise StopIteration
        self.count = 1
        return self.paths, list(self.im0), [""] * self.bs

    def __len__(self):
        return 1


class LoadScreenshots:
    """Screen capture source (reference loaders.py:213). Requires `mss`."""

    def __init__(self, source):
        import mss  # noqa: F401 - optional dep, gated

        source, *params = source.split()
        self.screen = int(source[6:]) if len(source) > 6 else 0
        self.left, self.top, self.width, self.height = (int(x) for x in params) if params else (None,) * 4
        self.mode = "stream"
        self.bs = 1
        self.sct = mss.mss()
        mon = self.sct.monitors[self.screen + 1]
        self.monitor = {
            "left": mon["left"] + (self.left or 0),
            "top": mon["top"] + (self.top or 0),
            "width": self.width or mon["width"],
            "height": self.height or mon["height"],
        }
        self.frame = 0

    def __iter__(self):
        return self

    def __next__(self):
        im0 = np.asarray(self.sct.grab(self.monitor))[:, :, :3]
        self.frame += 1
        return [str(self.screen)], [np.ascontiguousarray(im0)], [f"screen {self.screen}: "]


class LoadStreams:
    """RTSP/HTTP/webcam streams, one daemon reader thread per stream
    (reference loaders.py:51)."""

    def __init__(self, sources: str = "0", vid_stride: int = 1, buffer: bool = False):
        import cv2

        self.buffer = buffer
        self.running = True
        self.mode = "stream"
        self.vid_stride = vid_stride
        sources = Path(sources).read_text().rsplit() if os.path.isfile(sources) else [sources]
        n = len(sources)
        self.bs = n
        self.fps = [0] * n
        self.frames = [0] * n
        self.threads = [None] * n
        self.caps = [None] * n
        self.imgs = [[] for _ in range(n)]
        self.shape = [[] for _ in range(n)]
        self.sources = [s.strip() for s in sources]
        for i, s in enumerate(self.sources):
            src = int(s) if s.isnumeric() else s
            self.caps[i] = cv2.VideoCapture(src)
            if not self.caps[i].isOpened():
                raise ConnectionError(f"Failed to open {s}")
            w = int(self.caps[i].get(cv2.CAP_PROP_FRAME_WIDTH))
            h = int(self.caps[i].get(cv2.CAP_PROP_FRAME_HEIGHT))
            fps = self.caps[i].get(cv2.CAP_PROP_FPS)
            self.frames[i] = max(int(self.caps[i].get(cv2.CAP_PROP_FRAME_COUNT)), 0) or float("inf")
            self.fps[i] = max((fps if math.isfinite(fps) else 0) % 100, 0) or 30
            ok, im = self.caps[i].read()
            if not ok or im is None:
                raise ConnectionError(f"Failed to read from {s}")
            self.imgs[i].append(im)
            self.shape[i] = im.shape
            self.threads[i] = threading.Thread(target=self._update, args=(i, self.caps[i], s), daemon=True)
            self.threads[i].start()

    def _update(self, i, cap, stream):
        n, f = 0, self.frames[i]
        while self.running and cap.isOpened() and n < f:
            if len(self.imgs[i]) < 30:  # buffer cap (reference loaders.py:96)
                n += 1
                cap.grab()
                if n % self.vid_stride == 0:
                    ok, im = cap.retrieve()
                    if not ok:
                        im = np.zeros(self.shape[i], dtype=np.uint8)
                        cap.open(stream)  # reopen on signal loss
                    if self.buffer:
                        self.imgs[i].append(im)
                    else:
                        self.imgs[i] = [im]
            else:
                time.sleep(0.01)

    def close(self):
        self.running = False
        for t in self.threads:
            if t is not None and t.is_alive():
                t.join(timeout=5)
        for cap in self.caps:
            if cap is not None:
                cap.release()

    def __iter__(self):
        self.count = -1
        return self

    def __next__(self):
        self.count += 1
        images = []
        for i, x in enumerate(self.imgs):
            while not x:
                if not self.threads[i].is_alive():
                    self.close()
                    raise StopIteration
                time.sleep(1 / min(self.fps))
                x = self.imgs[i]
            images.append(x.pop(0) if self.buffer else x.pop(-1))
            if not self.buffer:
                x.clear()
        return self.sources, images, [""] * self.bs

    def __len__(self):
        return len(self.sources)
