"""Pure-stdlib RIFF/WAVE PCM codec: the audio leg of the multimodal
family (images: functions/png.py, jpeg.py, gif.py).

Decoder walks the RIFF chunk list (fmt/data plus any chunks to skip),
accepts integer PCM (format code 1) at 8/16-bit depth, and returns
geometry + samples; malformed payloads raise ``WavError`` with stable,
library-independent messages (the never-drop envelope depends on them —
this is why the stdlib ``wave`` module is not used). The encoder exists
to synthesize deterministic test payloads in datagen.

Reference seam: the reference stores opaque media besides page images
(apps/queue/src/lib/r2.ts sink); audio is what a crawl's <audio> assets
actually contain.
"""

from __future__ import annotations

import struct

MAX_SAMPLES = 16 << 20          # poison-pill cap (~32 MiB of 16-bit mono)


class WavError(ValueError):
    """Stable WAV parse failure."""


def encode_wav(sample_rate: int, channels: int,
               samples: list[int], bits: int = 16) -> bytes:
    """Interleaved integer samples → RIFF/WAVE PCM bytes."""
    if bits not in (8, 16):
        raise WavError("unsupported bit depth")
    if channels < 1 or len(samples) % channels:
        raise WavError("sample count not a multiple of channels")
    if bits == 16:
        frames = b"".join(struct.pack("<h", s) for s in samples)
    else:
        frames = bytes((s + 128) & 0xFF for s in samples)
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block, block, bits)
    data = b"fmt \x10\x00\x00\x00" + fmt + b"data" \
        + struct.pack("<I", len(frames)) + frames
    return b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """WAV bytes → (sample_rate, channels, n_frames, interleaved samples).

    8-bit samples are recentred to signed (-128..127) so downstream stats
    are depth-independent."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a WAV")
    pos = 12
    fmt = None
    frames = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        ln = int.from_bytes(data[pos + 4:pos + 8], "little")
        body = data[pos + 8:pos + 8 + ln]
        if len(body) < ln:
            raise WavError("truncated chunk")
        if cid == b"fmt ":
            if ln < 16:
                raise WavError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            frames = body
        pos += 8 + ln + (ln & 1)          # chunks are word-aligned
    if fmt is None or frames is None:
        raise WavError("missing fmt or data chunk")
    code, channels, rate, _, block, bits = fmt
    if code != 1:
        raise WavError("not integer PCM")
    if bits not in (8, 16) or channels < 1 or rate <= 0:
        raise WavError("bad fmt parameters")
    if block != channels * bits // 8:
        raise WavError("bad block alignment")
    if len(frames) % block:
        raise WavError("data not frame-aligned")
    n_frames = len(frames) // block
    if n_frames * channels > MAX_SAMPLES:
        raise WavError("audio exceeds sample cap")
    if bits == 16:
        samples = list(struct.unpack("<%dh" % (n_frames * channels), frames))
    else:
        samples = [b - 128 for b in frames]
    return rate, channels, n_frames, samples
