"""AVI/MJPEG codec (functions/avi.py): container round-trips, frame
sampling, hostile payloads, video_stats media-table integration."""

from __future__ import annotations

import struct

import pytest

from ocr_platform_spark.functions.avi import (
    AviError, decode_avi_frames, encode_avi, sample_frame)
from ocr_platform_spark.functions.jpeg import JpegError, encode_jpeg


def _frames(k=4, w=16, h=12):
    return [encode_jpeg(w, h, 3, bytes(((x + 31 * i) % 256)
            for x in range(w * h * 3))) for i in range(k)]


def test_roundtrip_and_sampling():
    frames = _frames(5)
    avi = encode_avi(frames)
    assert decode_avi_frames(avi) == frames
    w, h, c, px = sample_frame(avi, 2)
    assert (w, h, c) == (16, 12, 3) and len(px) == 16 * 12 * 3
    assert sample_frame(avi, -1)[3] == sample_frame(avi, 4)[3]
    with pytest.raises(AviError, match="out of range"):
        sample_frame(avi, 5)


def test_odd_length_frames_word_aligned():
    """Frame payloads with odd byte lengths must survive RIFF padding
    (the pad byte is alignment, not frame data)."""
    odd = [f + b"!" if len(f) % 2 == 0 else f for f in _frames(3)]
    assert all(len(f) % 2 for f in odd)
    assert decode_avi_frames(encode_avi(odd)) == odd


@pytest.mark.parametrize("payload,msg", [
    (b"", "not an AVI"),
    (b"RIFF\x04\x00\x00\x00WAVE", "not an AVI"),
    (b"RIFF\x04\x00\x00\x00AVI ", "no video frames"),
])
def test_hostile(payload, msg):
    with pytest.raises(AviError, match=msg):
        decode_avi_frames(payload)


def test_truncated_container_and_corrupt_frame():
    avi = encode_avi(_frames(3))
    with pytest.raises(AviError):
        decode_avi_frames(avi[: len(avi) // 2])
    # a chunk claiming to extend past the buffer
    bad = bytearray(avi)
    at = bad.index(b"00dc") + 4
    bad[at:at + 4] = struct.pack("<I", 10 ** 6)
    with pytest.raises(AviError, match="truncated chunk"):
        decode_avi_frames(bytes(bad))
    # a structurally intact container whose FRAME bytes are garbage:
    # container walk succeeds, sampling that frame raises the JPEG error
    frames = _frames(3)
    frames[1] = b"\xff\xd8\xff" + b"junk" * 10
    avi2 = encode_avi(frames)
    assert len(decode_avi_frames(avi2)) == 3
    with pytest.raises(JpegError):
        sample_frame(avi2, 1)


def test_video_stats_media_mix():
    from ocr_platform_spark.datagen import gen_media
    from ocr_platform_spark.operators.multimodal import video_stats

    saw_video = saw_rejected = False
    for i in range(120):
        d = gen_media(i, seed=42)
        hostile = i % 13 == 5 or i % 17 == 3
        if d["url"].endswith(".avi") and not hostile:
            nf, w, h, ch, mean = video_stats(bytes(d["media"]))
            assert 2 <= nf <= 5 and (w, h, ch) == (16, 12, 3)
            saw_video = True
        elif not d["url"].endswith(".avi"):
            with pytest.raises((AviError,)):
                video_stats(bytes(d["media"]))
            saw_rejected = True
    assert saw_video and saw_rejected


def test_fuzz_codecs_raise_only_their_stable_errors():
    """Arbitrary bytes behind each container magic must parse or raise the
    codec's OWN error type — struct.error/IndexError leaking out would
    put unstable messages into the oracled decode_error columns."""
    import random

    from ocr_platform_spark.functions.gif import GifError, decode_gif
    from ocr_platform_spark.functions.wav import WavError, decode_wav

    rng = random.Random(1)
    for _ in range(500):
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(160)))
        for magic, fn, err in (
                (b"GIF89a", decode_gif, GifError),
                (b"RIFF" + body[:4] + b"WAVE", decode_wav, WavError),
                (b"RIFF" + body[:4] + b"AVI ", decode_avi_frames, AviError)):
            try:
                fn(magic + body)
            except err:
                pass
