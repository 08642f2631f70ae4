"""Pure-stdlib PCM WAV codec: the audio leg of the multimodal column
story.

Like functions/png.py and functions/codecs.py for rasters, this decodes
the one audio container that needs no external library: RIFF/WAVE with
16-bit signed little-endian PCM (the interchange baseline), from the
public RIFF/WAVE format description. Compressed audio (MP3, AAC, ...)
stays behind the injectable-codec seam in operators/multimodal.py.

All malformed input raises ValueError — the quarantine contract shared by
every codec in this engine.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["wav_decode", "wav_encode", "WAV_MAGIC"]

WAV_MAGIC = b"RIFF"


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, int16 ndarray of shape (n,) mono or
    (n, channels)). Only uncompressed 16-bit PCM is supported."""
    try:
        if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE stream")
        pos = 12
        fmt = None
        samples = None
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + size]
            if len(body) != size:
                raise ValueError(f"WAV chunk {cid!r} truncated")
            pos += 8 + size + (size & 1)  # chunks are word-aligned
            if cid == b"fmt ":
                if size < 16:
                    raise ValueError("WAV fmt chunk too short")
                audio_fmt, n_ch, rate, _, _, bits = struct.unpack(
                    "<HHIIHH", body[:16]
                )
                if audio_fmt != 1:
                    raise ValueError(
                        f"unsupported WAV audio format {audio_fmt} "
                        "(only PCM; inject a codec for compressed audio)"
                    )
                if bits != 16:
                    raise ValueError(f"unsupported WAV bit depth {bits}")
                fmt = (n_ch, rate)
            elif cid == b"data":
                samples = body
        if fmt is None or samples is None:
            raise ValueError("WAV missing fmt or data chunk")
        n_ch, rate = fmt
        if n_ch < 1:
            raise ValueError("WAV channel count < 1")
        if len(samples) % (2 * n_ch) != 0:
            # consistent with the module contract: ALL malformed input
            # raises ValueError (a partial trailing frame is truncation,
            # same as a short raster in the image codecs)
            raise ValueError(
                "WAV data chunk truncated (partial trailing frame: "
                f"{len(samples)} bytes, frame size {2 * n_ch})"
            )
        arr = np.frombuffer(samples, dtype="<i2")
        if n_ch > 1:
            arr = arr.reshape(-1, n_ch)
        return rate, arr
    except struct.error as e:
        raise ValueError(f"malformed WAV stream: {e}") from e


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 ndarray — (n,) mono or (n, channels) — → PCM WAV bytes."""
    arr = np.ascontiguousarray(samples, dtype="<i2")
    n_ch = 1 if arr.ndim == 1 else arr.shape[1]
    body = arr.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
