"""Minimal pure-stdlib WAV (RIFF/PCM) codec — the audio half of
extension E4's real-codec story (functions/png.py is the image half).

PCM WAV is a container, not a compression format: RIFF chunk framing
plus raw little-endian samples, so a dependency-free codec is pure
``struct``.  Scope: uncompressed PCM (audio format 1), 8-bit unsigned
or 16-bit signed, any channel count / sample rate; anything else
(float PCM, ADPCM, extensible) raises ``ValueError`` naming the
field.

These run inside Arrow batches on executors (multimodal.py); the
decoder returns the raw interleaved sample bytes so feature kernels
choose their own view width.
"""

from __future__ import annotations

import struct

__all__ = ["decode_wav", "encode_wav"]


def decode_wav(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a WAV byte string → ``(sample_rate, channels,
    bits_per_sample, samples)`` with ``samples`` the raw interleaved
    PCM payload."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, fmt, samples = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated chunk body")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            samples = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, channels, rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"unsupported audio format {audio_fmt} (PCM only)")
    if bits not in (8, 16):
        raise ValueError(f"unsupported bits per sample {bits}")
    return rate, channels, bits, samples


def encode_wav(sample_rate: int, channels: int, bits: int,
               samples: bytes) -> bytes:
    """Encode raw interleaved PCM samples as a WAV byte string."""
    if bits not in (8, 16):
        raise ValueError(f"unsupported bits per sample {bits}")
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(samples)) + samples
        + (b"\x00" if len(samples) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
