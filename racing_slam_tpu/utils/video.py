"""Host-side video sources feeding device arrays.

Replacement for the reference VideoLoader (src/VideoLoader.{h,cpp}, a
cv::VideoCapture wrapper): decode stays on the host (the one place OpenCV is
acceptable — it is IO, not compute), frames are handed to the engine as
grayscale float32 [H, W] in [0, 1] with static shape.
"""

from __future__ import annotations

import numpy as np


def open_video(path: str, prefer_native: bool = True):
    """Best decoder available: native threaded C++ loader (decode overlaps
    device compute) with Python fallback."""
    if prefer_native:
        try:
            from ..native_bindings import NativeVideoLoader, available

            if available():
                return NativeVideoLoader(path)
        except Exception:
            pass
    return VideoLoader(path)


class VideoLoader:
    """Sequential mp4/avi decoder (reference: VideoLoader.cpp:9-42)."""

    def __init__(self, path: str, gray: bool = True):
        import cv2

        self._cap = cv2.VideoCapture(path)
        if not self._cap.isOpened():
            raise FileNotFoundError(f"cannot open video: {path}")
        self.width = int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.fps = float(self._cap.get(cv2.CAP_PROP_FPS))
        self._gray = gray

    def get_next_frame(self) -> np.ndarray | None:
        import cv2

        ok, frame = self._cap.read()
        if not ok:
            return None
        if self._gray:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            return frame.astype(np.float32) / 255.0
        return frame[..., ::-1].astype(np.float32) / 255.0  # BGR -> RGB

    def get_all_frames(self) -> list:
        frames = []
        while (f := self.get_next_frame()) is not None:
            frames.append(f)
        return frames

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        f = self.get_next_frame()
        if f is None:
            raise StopIteration
        return f


def load_mask(path: str) -> np.ndarray:
    """Grayscale static mask; nonzero = feature detection allowed
    (reference: cv::imread(..., IMREAD_GRAYSCALE), src/main.cpp:33-37)."""
    try:
        from ..native_bindings import available, load_mask_native

        if available():
            return load_mask_native(path)
    except Exception:
        pass
    import cv2

    m = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if m is None:
        raise FileNotFoundError(f"cannot open mask: {path}")
    return (m > 0).astype(np.float32)


class ArraySource:
    """Iterate over in-memory frames (synthetic sequences, tests)."""

    def __init__(self, frames):
        self._frames = list(frames)
        self._i = 0

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._i >= len(self._frames):
            raise StopIteration
        f = self._frames[self._i]
        self._i += 1
        return f
