"""AVI video muxer — replaces the reference's avifil32.dll P/Invoke layer.

The reference's only native boundary is the third-party AviFile wrapper
(aviFileWrapper_src/Avi.cs:175-389, ~25 ``DllImport("avifil32.dll")`` entry
points) used by ``Game1.compileVideo`` to stitch per-frame bitmaps into an
AVI at 30 fps (Game1.cs:192-210, VideoStream.AddFrame,
VideoStream.cs:344-365).  avifil32 is Windows-only; this module writes the
RIFF/AVI container directly, with two codecs:

- ``"MJPG"`` (default): frames JPEG-encoded via PIL — small files, playable
  everywhere.
- ``"DIB "``: uncompressed bottom-up BGR24, bit-equivalent to what
  ``AVIStreamWrite`` received from the locked bitmaps.

A C++ implementation of the same muxer lives in ``native/`` (built via
ctypes) for the zero-copy high-throughput path; this pure-Python one is the
always-available fallback and the semantic reference.
"""

from __future__ import annotations

import io as _io
import struct
from typing import List, Optional

import numpy as np


def _fourcc(s: str) -> bytes:
    return s.encode("ascii")


class AviWriter:
    """Streaming AVI writer (AviManager + VideoStream analog).

    Usage::

        with AviWriter(path, fps=30) as w:
            for frame in frames:          # (H, W, 3) uint8 RGB
                w.add_frame(frame)
    """

    def __init__(self, path: str, fps: float = 30.0, codec: str = "MJPG",
                 quality: int = 90):
        if codec not in ("MJPG", "DIB "):
            raise ValueError(f"unsupported codec {codec!r}")
        self.path = path
        self.fps = fps
        self.codec = codec
        self.quality = quality
        self._frames: List[bytes] = []
        self._wh: Optional[tuple] = None

    # -- frame ingestion ----------------------------------------------------
    def add_frame(self, frame) -> None:
        """Append an (H, W, 3) RGB frame (uint8 or float [0, 1])."""
        arr = np.asarray(frame)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        if arr.ndim != 3 or arr.shape[2] != 3:
            raise ValueError(f"expected (H, W, 3), got {arr.shape}")
        h, w = arr.shape[:2]
        if self._wh is None:
            self._wh = (w, h)
        elif self._wh != (w, h):
            raise ValueError("frame size changed mid-stream")
        if self.codec == "MJPG":
            from PIL import Image

            buf = _io.BytesIO()
            Image.fromarray(arr).save(buf, "JPEG", quality=self.quality)
            self._frames.append(buf.getvalue())
        else:
            # Bottom-up BGR24 rows padded to 4 bytes (the DIB layout
            # VideoStream.AddFrame fed to AVIStreamWrite).
            bgr = arr[::-1, :, ::-1]
            stride = (w * 3 + 3) & ~3
            if stride != w * 3:
                padded = np.zeros((h, stride), np.uint8)
                padded[:, : w * 3] = bgr.reshape(h, -1)
                self._frames.append(padded.tobytes())
            else:
                self._frames.append(bgr.tobytes())

    # -- container ----------------------------------------------------------
    def close(self) -> None:
        if self._wh is None:
            raise ValueError("no frames written")
        w, h = self._wh
        n = len(self._frames)
        rate = int(round(self.fps * 1000))
        scale = 1000
        uncompressed = self.codec == "DIB "
        frame_size = ((w * 3 + 3) & ~3) * h if uncompressed else max(
            len(f) for f in self._frames
        )

        # avih: MainAVIHeader (AVIFILEINFO analog, Avi.cs:120-139).
        avih = struct.pack(
            "<14I",
            int(1_000_000 / self.fps),  # dwMicroSecPerFrame
            frame_size * int(self.fps),  # dwMaxBytesPerSec
            0,  # dwPaddingGranularity
            0x10,  # dwFlags: AVIF_HASINDEX
            n,  # dwTotalFrames
            0,  # dwInitialFrames
            1,  # dwStreams
            frame_size,  # dwSuggestedBufferSize
            w, h, 0, 0, 0, 0,
        )
        # strh: AVISTREAMINFO analog (Avi.cs:76-96).
        strh = struct.pack(
            "<4s4sIHHIIIIIIII4i",
            _fourcc("vids"), _fourcc(self.codec), 0, 0, 0, 0,
            scale, rate, 0, n, frame_size, 0xFFFFFFFF, 0,
            0, 0, w, h,
        )
        # strf: BITMAPINFOHEADER (Avi.cs:50-62).
        compression = 0 if uncompressed else struct.unpack("<I", _fourcc("MJPG"))[0]
        strf = struct.pack(
            "<IiiHHIIiiII",
            40, w, h, 1, 24, compression, frame_size, 0, 0, 0, 0,
        )

        def chunk(cc, payload):
            pad = b"\x00" if len(payload) % 2 else b""
            return _fourcc(cc) + struct.pack("<I", len(payload)) + payload + pad

        def lst(cc, payload):
            body = _fourcc(cc) + payload
            return _fourcc("LIST") + struct.pack("<I", len(body)) + body

        strl = lst("strl", chunk("strh", strh) + chunk("strf", strf))
        hdrl = lst("hdrl", chunk("avih", avih) + strl)

        # movi chunks + idx1 index (AVIF_HASINDEX).
        movi_body = b""
        index = b""
        offset = 4  # offsets are relative to the start of 'movi'
        cc = "00db" if uncompressed else "00dc"
        for f in self._frames:
            c = chunk(cc, f)
            index += _fourcc(cc) + struct.pack("<III", 0x10, offset, len(f))
            movi_body += c
            offset += len(c)
        movi = lst("movi", movi_body)
        idx1 = chunk("idx1", index)

        riff_body = _fourcc("AVI ") + hdrl + movi + idx1
        with open(self.path, "wb") as fh:
            fh.write(_fourcc("RIFF") + struct.pack("<I", len(riff_body)) + riff_body)
        self._frames = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if exc[0] is None and self._wh is not None:
            self.close()


def compile_video(frame_paths, out_path: str, fps: float = 30.0,
                  codec: str = "MJPG") -> None:
    """Stitch image files into an AVI (Game1.compileVideo, Game1.cs:192-210)."""
    from raytpu.io.image import read_image

    with AviWriter(out_path, fps=fps, codec=codec) as w:
        for p in frame_paths:
            w.add_frame(read_image(p))
