"""Pure-stdlib YUV4MPEG2 (.y4m) codec: the real VIDEO decoder.

Companion to operators/pngcodec.py and operators/wavcodec.py — the
container has no ffmpeg, but YUV4MPEG2 (the uncompressed interchange
format mjpegtools/ffmpeg emit) needs nothing beyond bytes arithmetic:
an ASCII stream header (``YUV4MPEG2 W<w> H<h> F<num>:<den> ...``), then
one ``FRAME\\n`` marker per frame followed by raw planar YUV. 4:2:0
subsampling (the C420 family) gives a fixed frame stride of
``w*h + 2*(w//2)*(h//2)`` bytes, so frame boundaries fall out of the
decoded header — exactly the "decode to find frame boundaries" step the
frame-sampling stage documents as why it cannot be a native explode.
Implemented from the public mjpegtools yuv4mpeg(5) description.

With this, all three media kinds of the multimodal tier run REAL
end-to-end under ``fake=False``: PNG pixels, WAV samples, Y4M frames.

Reference shape parity: the reference decodes fetched payloads before
deriving fields (`/root/reference/CrawlPaperTuoiTre.py` parse stage);
this is the same fetch-bytes → decode → derive contract for video
binary columns.

Like the other codecs, this is a correctness decoder for the Spark
plumbing: decode is a header parse plus numpy views over the frame
region, fast enough for the bench; production would put ffmpeg at the
same mapInPandas swap point.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def y4m_encode(
    frames: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    fps: tuple[int, int] = (25, 1),
) -> bytes:
    """Encode planar 4:2:0 frames as a YUV4MPEG2 stream.

    Each frame is (y, u, v): y is (h, w) uint8, u and v are
    (h//2, w//2) uint8. All frames must share one geometry."""
    if not frames:
        raise ValueError("y4m_encode needs at least one frame")
    y0, u0, v0 = frames[0]
    h, w = y0.shape
    if h % 2 or w % 2:
        raise ValueError("4:2:0 needs even dimensions")
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420\n".encode()
    out = [header]
    for y, u, v in frames:
        if y.shape != (h, w) or u.shape != (h // 2, w // 2) or v.shape != u.shape:
            raise ValueError("inconsistent frame geometry")
        if y.dtype != np.uint8 or u.dtype != np.uint8 or v.dtype != np.uint8:
            raise ValueError("planes must be uint8")
        out.append(b"FRAME\n")
        out.append(y.tobytes())
        out.append(u.tobytes())
        out.append(v.tobytes())
    return b"".join(out)


def y4m_probe(data: bytes) -> tuple[int, int, tuple[int, int], int]:
    """Parse the stream header only: (width, height, (fps_num, fps_den),
    n_frames). Frame count comes from the decoded stride — the cheap
    metadata pass a sampler uses to pick frame indices before touching
    pixel bytes."""
    if not data.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("truncated y4m (no header terminator)")
    w = h = None
    fps = (25, 1)
    for tok in data[len(_MAGIC) : nl].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps = (int(num), int(den))
        elif tag == b"C" and not val.startswith(b"420"):
            raise ValueError(
                f"unsupported y4m colorspace {val!r}; only the C420 family "
                "has the fixed 3/2-byte-per-pixel stride this decoder walks"
            )
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    if w % 2 or h % 2:
        raise ValueError("4:2:0 needs even dimensions")
    stride = w * h + 2 * (w // 2) * (h // 2)
    # each frame is "FRAME[params]\n" + stride bytes
    pos, n = nl + 1, 0
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        fnl = data.find(b"\n", pos)
        if fnl < 0 or fnl + 1 + stride > len(data):
            raise ValueError("truncated y4m frame")
        pos = fnl + 1 + stride
        n += 1
    return w, h, fps, n


def y4m_decode_frame(
    data: bytes, index: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one frame by index to (y, u, v) uint8 planes."""
    w, h, _fps, n = y4m_probe(data)
    if not 0 <= index < n:
        raise IndexError(f"frame {index} out of range (n={n})")
    stride = w * h + 2 * (w // 2) * (h // 2)
    pos = data.find(b"\n") + 1
    for _ in range(index):
        pos = data.find(b"\n", pos) + 1 + stride
    pos = data.find(b"\n", pos) + 1  # skip this frame's marker line
    buf = np.frombuffer(data, dtype=np.uint8, count=stride, offset=pos)
    y = buf[: w * h].reshape(h, w)
    cw, chh = w // 2, h // 2
    u = buf[w * h : w * h + cw * chh].reshape(chh, cw)
    v = buf[w * h + cw * chh :].reshape(chh, cw)
    return y.copy(), u.copy(), v.copy()


def y4m_decode(data: bytes):
    """Decode every frame: (frames, (w, h), (fps_num, fps_den))."""
    w, h, fps, n = y4m_probe(data)
    return [y4m_decode_frame(data, i) for i in range(n)], (w, h), fps


def video_features(data: bytes, dim: int = 8) -> list:
    """Deterministic feature vector from a decoded y4m stream — the video
    twin of the PNG/WAV features; every term closed-form over the planes
    so tests recompute them independently:
    [n_frames/1000, w/4096, h/4096, fps, luma mean/255, luma std/255,
    mean |frame-to-frame luma delta|/255, chroma (u+v) mean/255]."""
    frames, (w, h), (num, den) = y4m_decode(data)
    ys = np.stack([f[0] for f in frames]).astype("float64")
    uv = np.concatenate(
        [np.stack([f[1] for f in frames]), np.stack([f[2] for f in frames])],
        axis=None,
    ).astype("float64")
    if len(frames) > 1:
        tdelta = float(np.abs(np.diff(ys, axis=0)).mean())
    else:
        tdelta = 0.0
    feats = [
        round(len(frames) / 1000.0, 6),
        round(w / 4096.0, 6),
        round(h / 4096.0, 6),
        round(num / den / 60.0, 6),
        round(float(ys.mean()) / 255.0, 6),
        round(float(ys.std()) / 255.0, 6),
        round(tdelta / 255.0, 6),
        round(float(uv.mean()) / 255.0, 6),
    ]
    return feats[:dim]
