"""WAV codec (functions/wav.py): PCM round-trips, chunk-walk robustness,
hostile payloads, audio_stats integration with the media table."""

from __future__ import annotations

import struct

import pytest

from ocr_platform_spark.functions.wav import WavError, decode_wav, encode_wav


@pytest.mark.parametrize("rate,ch,n,bits", [
    (8000, 1, 64, 16), (16000, 2, 128, 16), (44100, 1, 7, 16),
    (8000, 1, 32, 8), (22050, 2, 10, 8),
])
def test_roundtrip(rate, ch, n, bits):
    lim = 127 if bits == 8 else 30000
    samples = [((i * 37) % (2 * lim)) - lim for i in range(n * ch)]
    r, c, nf, out = decode_wav(encode_wav(rate, ch, samples, bits))
    assert (r, c, nf) == (rate, ch, n)
    assert out == samples


def test_unknown_chunks_skipped_and_word_alignment():
    """A LIST chunk with an ODD length before fmt/data must be skipped
    with word-alignment padding (the RIFF rule real files rely on)."""
    base = encode_wav(8000, 1, [1, -2, 3])
    odd = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    data = base[:12] + odd + base[12:]
    patched = b"RIFF" + struct.pack("<I", len(data) - 8) + data[8:]
    assert decode_wav(patched)[3] == [1, -2, 3]


@pytest.mark.parametrize("payload,msg", [
    (b"", "not a WAV"),
    (b"RIFF\x00\x00\x00\x00WAVE", "missing fmt or data"),
    (b"RIFX\x00\x00\x00\x00WAVE", "not a WAV"),
])
def test_hostile(payload, msg):
    with pytest.raises(WavError, match=msg):
        decode_wav(payload)


def test_non_pcm_and_truncation_rejected():
    good = encode_wav(8000, 1, [0] * 16)
    # format code 1 -> 3 (IEEE float): not integer PCM
    at = good.index(b"fmt ") + 8
    non_pcm = good[:at] + b"\x03\x00" + good[at + 2:]
    with pytest.raises(WavError, match="not integer PCM"):
        decode_wav(non_pcm)
    with pytest.raises(WavError):
        decode_wav(good[: len(good) - 7])


def test_audio_stats_and_media_mix():
    from ocr_platform_spark.datagen import gen_media
    from ocr_platform_spark.operators.multimodal import audio_stats

    saw_audio = saw_image_rejected = False
    for i in range(60):
        d = gen_media(i, seed=42)
        is_hostile = i % 13 == 5 or i % 17 == 3
        if d["url"].endswith(".wav") and not is_hostile:
            rate, ch, nf, ms, mean, peak = audio_stats(bytes(d["media"]))
            assert rate in (8000, 16000, 44100) and ch in (1, 2)
            assert ms == nf * 1000 // rate
            assert 0 <= mean and peak <= 128 * 137
            saw_audio = True
        elif not d["url"].endswith(".wav"):
            with pytest.raises(WavError):
                audio_stats(bytes(d["media"]))
            saw_image_rejected = True
    assert saw_audio and saw_image_rejected
