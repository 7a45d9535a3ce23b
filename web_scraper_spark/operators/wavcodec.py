"""Pure-stdlib WAV codec (RIFF/PCM + numpy): the real AUDIO decoder.

Companion to operators/pngcodec.py — the container has no librosa/
soundfile/ffmpeg, but canonical WAV needs nothing beyond ``struct``:
RIFF container walk, ``fmt `` chunk (PCM, format tag 1), ``data`` chunk
of interleaved little-endian 16-bit samples. Implemented from the public
RIFF/WAVE spec (Multimedia Programming Interface and Data Specifications
1.0). With this, the multimodal decode tier
(`operators/multimodal.decode_media`) runs REAL end-to-end for two of
the three media kinds (PNG pixels, WAV samples); only video frame
extraction remains a documented stub.

Reference shape parity: the reference decodes fetched payloads before
deriving fields (`/root/reference/CrawlPaperTuoiTre.py` parse stage);
this is the same fetch-bytes → decode → derive contract for audio
binary columns.

Like pngcodec, this is a correctness decoder for the Spark plumbing:
decode is two numpy views over the data chunk, so it is fast enough for
the bench; production would put soundfile/ffmpeg at the same
mapInPandas swap point.
"""

from __future__ import annotations

import struct

import numpy as np

_RIFF = b"RIFF"
_WAVE = b"WAVE"


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode an (n, channels) int16 array as a PCM WAV file."""
    if samples.dtype != np.int16 or samples.ndim != 2:
        raise ValueError("wav_encode expects (n_samples, n_channels) int16")
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        _WAVE
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return _RIFF + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV file to ((n, channels) int16 array, sample_rate).

    Supports format tag 1 (integer PCM) at 16 bits/sample — the canonical
    WAV everyone writes. Raises ValueError on anything else (float WAV,
    ADPCM, a-law need a real audio library at the same swap point)."""
    if len(data) < 12 or data[:4] != _RIFF or data[8:12] != _WAVE:
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        typ = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if typ == b"fmt ":
            tag, ch, rate, _brate, _align, bits = struct.unpack("<HHIIHH", body[:16])
            if tag != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (format_tag={tag} bits={bits}); only "
                    "16-bit integer PCM is decodable without an audio library"
                )
            fmt = (ch, rate)
        elif typ == b"data":
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("truncated WAV (no fmt/data chunk)")
    ch, rate = fmt
    n = len(pcm) // (2 * ch)
    samples = np.frombuffer(pcm, dtype="<i2", count=n * ch).reshape(n, ch)
    return np.ascontiguousarray(samples), rate


def audio_features(samples: np.ndarray, sample_rate: int, dim: int = 8) -> list:
    """Deterministic feature vector from decoded samples — the audio twin
    of the PNG per-channel mean/std features. All terms are closed-form
    over the int16 samples, so tests recompute them independently:
    [duration/60, rate/48k, channels/8, rms/32768, peak/32768,
    zero-crossing rate, dc-offset/32768, first-half energy share]."""
    x = samples.astype("float64")
    mono = x.mean(axis=1)
    n = len(mono)
    half = max(1, n // 2)
    energy = float((mono**2).sum())
    feats = [
        round(n / sample_rate / 60.0, 6),
        round(sample_rate / 48000.0, 6),
        round(samples.shape[1] / 8.0, 6),
        round(float(np.sqrt((mono**2).mean())) / 32768.0, 6),
        round(float(np.abs(mono).max()) / 32768.0, 6),
        round(float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean()), 6),
        round(float(mono.mean()) / 32768.0, 6),
        round(float((mono[:half] ** 2).sum()) / energy if energy else 0.0, 6),
    ]
    return feats[:dim]
