"""Inference source loaders: images, video files, webcams/RTSP streams.

Rebuild of the reference's ``ultralytics/data/loaders.py`` (``LoadImages``
:249 — files + video frames, ``LoadStreams`` :33 — threaded RTSP/webcam
readers, ``LoadScreenshots`` :185). The predictor consumes one uniform
generator of (source_label, BGR frame, frame_meta) tuples, so videos and
live streams flow through the same fixed-batch jitted inference path as
image files.
"""

from __future__ import annotations

import math
import threading
import time
from pathlib import Path
from typing import Iterator, List, Optional, Tuple, Union

import cv2
import numpy as np

from experiment_yolo_tpu.utils import LOGGER

IMG_FORMATS = {"bmp", "jpeg", "jpg", "png", "tif", "tiff", "webp"}
VID_FORMATS = {"asf", "avi", "gif", "m4v", "mkv", "mov", "mp4", "mpeg", "mpg", "ts", "wmv", "webm"}

Frame = Tuple[str, np.ndarray, dict]  # (label, BGR image, meta)


def is_stream_source(source) -> bool:
    """True for webcam indices / *.streams lists / URL protocols the
    reference routes to LoadStreams (predictor.py check_source)."""
    if isinstance(source, int):
        return True
    s = str(source)
    return (
        s.isnumeric()
        or s.endswith(".streams")
        or s.lower().startswith(("rtsp://", "rtmp://", "http://", "https://", "tcp://"))
    )


def iter_images_and_videos(source, vid_stride: int = 1) -> Iterator[Frame]:
    """Yield frames from image files, directories, and video files
    (reference LoadImages, loaders.py:249)."""
    if isinstance(source, np.ndarray):
        yield "array", source, {"kind": "image"}
        return
    if isinstance(source, (list, tuple)):
        for s in source:
            yield from iter_images_and_videos(s, vid_stride)
        return
    p = Path(source)
    if p.is_dir():
        files = sorted(
            f for f in p.rglob("*") if f.suffix.lstrip(".").lower() in IMG_FORMATS | VID_FORMATS
        )
        if not files:
            raise FileNotFoundError(f"no images/videos in {p}")
        for f in files:
            yield from iter_images_and_videos(f, vid_stride)
        return
    if not p.is_file():
        raise FileNotFoundError(f"source {source} not found")
    suffix = p.suffix.lstrip(".").lower()
    if suffix in VID_FORMATS:
        cap = cv2.VideoCapture(str(p))
        if not cap.isOpened():
            raise ValueError(f"could not open video {p}")
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        idx = 0
        try:
            while True:
                ok = cap.grab()
                if not ok:
                    break
                if idx % vid_stride == 0:
                    ok, frame = cap.retrieve()
                    if not ok:
                        break
                    yield str(p), frame, {
                        "kind": "video",
                        "frame": idx,
                        "frames": total,
                        "fps": fps,
                    }
                idx += 1
        finally:
            cap.release()
    else:
        img = cv2.imread(str(p))
        if img is None:
            raise ValueError(f"could not read image {p}")
        yield str(p), img, {"kind": "image"}


def _is_youtube(s) -> bool:
    from urllib.parse import urlparse

    return urlparse(str(s)).hostname in ("www.youtube.com", "youtube.com", "youtu.be")


def get_best_youtube_url(url: str) -> str:
    """Resolve a YouTube page URL to its best MP4 video-stream URL
    (reference loaders.py:504). Tries yt_dlp first, then pafy — neither
    ships in this image (and the build environment has no egress), so the
    failure mode is a clear install hint rather than cv2's opaque
    open-failure on the page URL."""
    try:
        import yt_dlp  # type: ignore

        with yt_dlp.YoutubeDL({"quiet": True}) as ydl:
            info = ydl.extract_info(url, download=False)
        for f in reversed(info.get("formats", [])):  # best is usually last
            good = (f.get("width") or 0) >= 1920 or (f.get("height") or 0) >= 1080
            if good and f.get("vcodec") != "none" and f.get("acodec") == "none" \
                    and f.get("ext") == "mp4":
                return f.get("url")
        raise ConnectionError(f"no suitable mp4 stream found for {url!r}")
    except ImportError:
        pass
    try:
        import pafy  # type: ignore

        return pafy.new(url).getbestvideo(preftype="mp4").url
    except ImportError:
        raise ImportError(
            "YouTube sources need 'yt-dlp' (or 'pafy'); pip install yt-dlp"
        ) from None


class LoadStreams:
    """Threaded multi-stream reader (reference loaders.py:33).

    One daemon thread per stream keeps only the most recent frame
    (buffer=False semantics: real-time sources drop stale frames).
    Iterating yields one frame list per tick: [(label, frame, meta), ...].
    """

    def __init__(self, sources: Union[str, List], vid_stride: int = 1, buffer: bool = False):
        if isinstance(sources, str) and sources.endswith(".streams"):
            sources = [s.strip() for s in Path(sources).read_text().splitlines() if s.strip()]
        elif not isinstance(sources, (list, tuple)):
            sources = [sources]
        self.sources = [
            int(s) if str(s).isnumeric()
            else get_best_youtube_url(s) if _is_youtube(s) else s
            for s in sources
        ]
        self.vid_stride = vid_stride
        self.buffer = buffer
        self.running = True
        self.caps: List[cv2.VideoCapture] = []
        self.frames: List[Optional[np.ndarray]] = [None] * len(self.sources)
        self.locks = [threading.Lock() for _ in self.sources]
        self.threads = []
        self.fps = [30.0] * len(self.sources)
        for i, s in enumerate(self.sources):
            cap = cv2.VideoCapture(s)
            if not cap.isOpened():
                raise ConnectionError(f"could not open stream {s!r}")
            self.caps.append(cap)
            self.fps[i] = cap.get(cv2.CAP_PROP_FPS) or 30.0
            ok, frame = cap.read()
            if not ok:
                raise ConnectionError(f"could not read from stream {s!r}")
            self.frames[i] = frame
            t = threading.Thread(target=self._update, args=(i, cap), daemon=True)
            self.threads.append(t)
            t.start()
        LOGGER.info(f"LoadStreams: {len(self.sources)} stream(s) open")

    def _update(self, i: int, cap: cv2.VideoCapture) -> None:
        n = 0
        while self.running and cap.isOpened():
            n += 1
            cap.grab()
            if n % self.vid_stride == 0:
                ok, frame = cap.retrieve()
                if not ok:
                    frame = np.zeros_like(self.frames[i]) if self.frames[i] is not None else None
                    LOGGER.warning(f"stream {self.sources[i]!r}: read failed; reopening")
                    cap.open(self.sources[i] if not isinstance(self.sources[i], int) else self.sources[i])
                with self.locks[i]:
                    self.frames[i] = frame
            time.sleep(0.0)

    def __iter__(self):
        n = 0
        while self.running:
            n += 1
            out = []
            for i, s in enumerate(self.sources):
                with self.locks[i]:
                    frame = None if self.frames[i] is None else self.frames[i].copy()
                if frame is None:
                    frame = np.zeros((480, 640, 3), np.uint8)
                out.append((str(s), frame, {"kind": "stream", "frame": n, "fps": self.fps[i]}))
            yield out

    def close(self) -> None:
        self.running = False
        for t in self.threads:
            t.join(timeout=2.0)
        for cap in self.caps:
            cap.release()


def load_screenshot(monitor: int = 0, region=None) -> Frame:
    """Screenshot source (reference LoadScreenshots, loaders.py:185).

    Requires the optional ``mss`` package (not bundled in this image)."""
    try:
        import mss  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "screenshot sources need the 'mss' package (reference loaders.py:185); "
            "it is not bundled in this environment"
        ) from e
    with mss.mss() as sct:
        mon = region or sct.monitors[monitor]
        shot = np.asarray(sct.grab(mon))[..., :3]  # BGRA -> BGR
    return "screen", np.ascontiguousarray(shot), {"kind": "screenshot"}
