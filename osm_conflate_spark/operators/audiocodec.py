"""From-scratch stdlib WAV (RIFF) decoder — the audio twin of
:mod:`.imagecodec`'s PNG/BMP/PPM decoders.

Parses the RIFF container and ``fmt ``/``data`` chunks directly with
:mod:`struct` and decodes samples with numpy — no external audio
library.  Test fixtures are WRITTEN with the stdlib :mod:`wave` module,
so the golden tests are an independent writer/reader cross-check.

Scope (documented): little-endian RIFF/WAVE, integer PCM (8-bit
unsigned, 16/24/32-bit signed), IEEE float (32/64-bit), including the
WAVE_FORMAT_EXTENSIBLE wrapper around either.  Compressed formats
(ADPCM, MP3-in-WAV...) raise ``NotImplementedError``; malformed bytes
raise ``ValueError``.  Output samples are float64 in [-1, 1], shaped
``(n_frames, n_channels)``.

Reference behavior: conflate-style ingest treats media as opaque binary
columns; decode happens in Arrow-batched ``mapInPandas``
(`multimodal.extract_audio_features`), never per-row Python on the
relational hot path.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1
_IEEE_FLOAT = 3
_EXTENSIBLE = 0xFFFE


def decode_wav(buf: bytes):
    """WAV bytes -> (samples float64[frames, channels], sample_rate).

    Integer PCM is scaled by its nominal full-scale (2^(bits-1)); 8-bit
    is unsigned per the WAV spec and is re-centered.
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, len(buf)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid, clen = struct.unpack_from("<4sI", buf, pos)
        pos += 8
        if pos + clen > end:
            raise ValueError("truncated WAV chunk")
        body = buf[pos : pos + clen]
        pos += clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            if fmt[0] == _EXTENSIBLE:
                # cbSize(2) + validBits(2) + channelMask(4) + SubFormat
                # GUID whose first two bytes are the real format code
                if clen < 26:
                    raise ValueError("extensible fmt chunk too short")
                real = struct.unpack_from("<H", body, 24)[0]
                fmt = (real,) + fmt[1:]
        elif cid == b"data":
            data = body
            if fmt is not None:
                break  # fmt precedes data in well-formed files
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    code, n_ch, rate, _byte_rate, _block, bits = fmt
    if n_ch < 1 or rate < 1:
        raise ValueError(f"bad channel count/rate ({n_ch}, {rate})")
    if code == _PCM:
        if bits == 8:
            a = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            a = (a - 128.0) / 128.0
        elif bits == 16:
            a = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: (raw.size // 3) * 3].reshape(-1, 3)
            # little-endian sign extension via int32 assembly
            v = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            v = np.where(v & 0x800000, v - 0x1000000, v)
            a = v.astype(np.float64) / 8388608.0
        elif bits == 32:
            a = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"PCM bit depth {bits}")
    elif code == _IEEE_FLOAT:
        if bits == 32:
            a = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            a = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"float bit depth {bits}")
    else:
        raise NotImplementedError(f"WAV format code {code} (compressed?)")
    frames = a.size // n_ch
    if frames * n_ch != a.size:
        raise ValueError("data chunk not a whole number of frames")
    return a.reshape(frames, n_ch), int(rate)
