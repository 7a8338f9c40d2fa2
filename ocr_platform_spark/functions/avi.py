"""Pure-stdlib AVI/MJPEG codec: the video leg of the multimodal family.

Motion-JPEG in an AVI (RIFF) container is the one video format decodable
with what this repo already has — the RIFF chunk walk (cf.
functions/wav.py) plus the baseline-JPEG decoder (functions/jpeg.py).
``decode_avi_frames`` walks RIFF → 'movi' LIST → '00dc'/'00db' chunks
and returns the raw JPEG payload per frame; ``sample_frame`` decodes one
by index — the brief's "frame-sample" operator: at 100 TB you never
decode every frame of every clip, you sample k per document.

The encoder synthesizes deterministic test clips (a few small JPEG
frames in a minimal AVI) for datagen. Malformed containers raise
``AviError`` with stable messages; a damaged individual FRAME surfaces
as the JPEG codec's own error only when that frame is sampled.
"""

from __future__ import annotations

import struct

MAX_FRAMES = 100_000


class AviError(ValueError):
    """Stable AVI parse failure."""


def encode_avi(frames: list[bytes], fps: int = 10,
               w: int = 16, h: int = 12) -> bytes:
    """Minimal AVI: avih header + one 'movi' LIST of '00dc' JPEG chunks.
    (No index chunk — players tolerate it, and the decoder walks chunks.)"""
    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<14I", 10 ** 6 // max(fps, 1), 0, 0, 0, len(frames), 0, 1, 0,
        w, h, 0, 0, 0, 0)
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    movi = bytearray(b"movi")
    for f in frames:
        movi += b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) & 1:
            movi += b"\x00"                      # RIFF word alignment
    movi_list = b"LIST" + struct.pack("<I", len(movi)) + bytes(movi)
    body = b"AVI " + hdrl + movi_list
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_frames(data: bytes) -> list[bytes]:
    """AVI bytes → list of per-frame JPEG payloads (not decoded)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not an AVI")
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = buf[pos:pos + 4]
            ln = int.from_bytes(buf[pos + 4:pos + 8], "little")
            if pos + 8 + ln > end:
                raise AviError("truncated chunk")
            if cid == b"LIST":
                kind = buf[pos + 8:pos + 12]
                if kind == b"movi":
                    walk(buf, pos + 12, pos + 8 + ln)
                # other LISTs (hdrl etc.): skipped
            elif cid in (b"00dc", b"00db"):
                frames.append(buf[pos + 8:pos + 8 + ln])
                if len(frames) > MAX_FRAMES:
                    raise AviError("too many frames")
            pos += 8 + ln + (ln & 1)

    walk(data, 12, len(data))
    if not frames:
        raise AviError("no video frames")
    return frames


def sample_frame(data: bytes, index: int) -> tuple[int, int, int, bytes]:
    """Frame-sample: decode ONLY frame ``index`` (negative = from end)
    via the baseline-JPEG codec → (w, h, channels, pixels)."""
    from ocr_platform_spark.functions.jpeg import decode_jpeg

    frames = decode_avi_frames(data)
    if not -len(frames) <= index < len(frames):
        raise AviError("frame index out of range")
    return decode_jpeg(frames[index])
