"""Pure-numpy RIFF/WAVE PCM codec.

Reads and writes canonical RIFF ``WAVE`` containers (format tag 1 =
integer PCM at 8/16/24/32 bit, format tag 3 = IEEE float32/float64),
mono or multi-channel, tolerating extra chunks (``LIST``, ``fact``,
padding) between ``fmt `` and ``data``. No external codec libraries —
the container ships none — so this is the real decoder behind the
audio modality operators (operators/multimodal.audio_features).

The reference engine has no audio subsystem; this belongs to the
training-data-pipeline operator family from the task brief. Layout per
the RIFF/WAVE spec (multimedia programming interface, IBM/Microsoft
1991): little-endian chunks, 8-bit samples unsigned, >=16-bit signed.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    """Raised for malformed or unsupported WAVE payloads."""


_INT_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}
_FLOAT_DTYPES = {32: np.dtype("<f4"), 64: np.dtype("<f8")}


def read_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """Decode a WAVE blob to (sample_rate, float64 samples in [-1, 1)).

    Multi-channel audio is downmixed to mono by averaging channels.
    """
    if blob is None or len(blob) < 12:
        raise WavError("truncated RIFF header")
    tag, _, wave = struct.unpack_from("<4sI4s", blob, 0)
    if tag != b"RIFF" or wave != b"WAVE":
        raise WavError("not a RIFF/WAVE container")

    fmt = None
    data = None
    pos = 12
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        body = blob[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise WavError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
            if len(data) < size:
                raise WavError("data chunk extends past end of blob")
        pos += 8 + size + (size & 1)  # chunks are word-aligned

    if fmt is None or data is None:
        raise WavError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if channels < 1:
        raise WavError("zero channels")

    if audio_format == 1 and bits == 24:
        # no native 24-bit dtype: widen each 3-byte triple to int32
        frames = len(data) // 3
        raw = np.frombuffer(data[: frames * 3], dtype=np.uint8).reshape(-1, 3)
        as32 = (raw[:, 0].astype(np.uint32)
                | (raw[:, 1].astype(np.uint32) << 8)
                | (raw[:, 2].astype(np.uint32) << 16))
        samples = (as32.astype(np.int32) << 8 >> 8).astype(np.float64) / 2 ** 23
    elif audio_format == 1 and bits in _INT_DTYPES:
        dt = _INT_DTYPES[bits]
        width = np.dtype(dt).itemsize
        arr = np.frombuffer(data[: len(data) // width * width], dtype=dt)
        if bits == 8:
            samples = (arr.astype(np.float64) - 128.0) / 128.0
        else:
            samples = arr.astype(np.float64) / float(2 ** (bits - 1))
    elif audio_format == 3 and bits in _FLOAT_DTYPES:
        dt = _FLOAT_DTYPES[bits]
        width = np.dtype(dt).itemsize
        samples = np.frombuffer(
            data[: len(data) // width * width], dtype=dt).astype(np.float64)
    else:
        raise WavError(f"unsupported format tag {audio_format} / {bits} bit")

    if channels > 1:
        frames = len(samples) // channels
        samples = samples[: frames * channels].reshape(-1, channels).mean(axis=1)
    return sample_rate, samples


def write_wav(samples: np.ndarray, sample_rate: int, bits: int = 16,
              channels: int = 1) -> bytes:
    """Encode float samples in [-1, 1] as a canonical PCM WAVE blob.

    ``samples`` is 1-D (interleaved when channels > 1). bits in
    {8, 16, 32} integer PCM or 32-float via bits=-32.
    """
    x = np.asarray(samples, dtype=np.float64)
    if bits == -32:
        payload = x.astype("<f4").tobytes()
        audio_format, abs_bits = 3, 32
    elif bits == 8:
        payload = (np.clip(x, -1, 1) * 127.0 + 128.0).round().astype(np.uint8).tobytes()
        audio_format, abs_bits = 1, 8
    elif bits in (16, 32):
        scale = float(2 ** (bits - 1) - 1)
        payload = (np.clip(x, -1, 1) * scale).round().astype(
            _INT_DTYPES[bits]).tobytes()
        audio_format, abs_bits = 1, bits
    else:
        raise WavError(f"unsupported bit depth {bits}")

    block = channels * abs_bits // 8
    fmt = struct.pack("<HHIIHH", audio_format, channels, sample_rate,
                      sample_rate * block, block, abs_bits)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(payload)) + payload)
    if len(payload) & 1:
        chunks += b"\0"
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def sine_clip(freq_hz: float, seconds: float, sample_rate: int = 16000,
              amplitude: float = 0.6, bits: int = 16) -> bytes:
    """Deterministic synthetic test clip: a pure tone, PCM-encoded."""
    t = np.arange(int(round(seconds * sample_rate)), dtype=np.float64)
    return write_wav(amplitude * np.sin(2 * np.pi * freq_hz * t / sample_rate),
                     sample_rate, bits=bits)
