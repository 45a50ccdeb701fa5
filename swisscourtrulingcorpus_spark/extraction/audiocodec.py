"""Pure-stdlib WAV (RIFF PCM) codec for the multimodal decode path.

Same recipe as `extraction/imagecodec.py`: the container has no audio
libraries, but canonical WAV is plain RIFF chunk parsing + 16-bit
little-endian PCM — implemented from the public RIFF/WAVE layout
(`fmt ` chunk: audio format / channels / sample rate / block align;
`data` chunk: interleaved frames).  The reference pipeline has no audio
stage; this codec exists for the training-data brief's multimodal
columns (decode / feature-extract over opaque ``binary`` payloads).

Scope (honest boundary): 16-bit integer PCM decodes REALLY — samples
come out of the payload bytes.  Compressed codecs (MP3/AAC/Vorbis) and
float/24-bit PCM raise ``UnsupportedAudioError``; callers fall back to
the byte-stat stub exactly like undecodable images.

All stats are integer arithmetic so the DuckDB oracle can recompute
them bit-exactly (no float RMS in the gated surface).
"""

from __future__ import annotations

import struct
import sys
from array import array


class UnsupportedAudioError(ValueError):
    """Payload is not a decodable 16-bit PCM WAV."""


def decode_wav(data: bytes) -> tuple[int, int, int, "array"]:
    """Decode a 16-bit PCM RIFF/WAVE payload.  Returns
    ``(sample_rate, channels, n_frames, samples)`` with ``samples`` a
    flat interleaved ``array('h')`` of signed 16-bit values (length
    ``n_frames * channels``)."""
    try:
        if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            raise UnsupportedAudioError("not a RIFF/WAVE payload")
        pos = 12
        sample_rate = channels = bits = None
        pcm: bytes | None = None
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + length]
            pos += 8 + length + (length & 1)  # RIFF chunks pad to even
            if cid == b"fmt ":
                fmt_tag, channels, sample_rate = struct.unpack("<HHI", body[:8])
                (bits,) = struct.unpack("<H", body[14:16])
                if fmt_tag != 1:
                    raise UnsupportedAudioError(
                        f"compressed/float WAV (format tag {fmt_tag}) unsupported"
                    )
                if bits != 16:
                    raise UnsupportedAudioError(f"{bits}-bit PCM unsupported")
                if channels == 0 or sample_rate == 0:
                    raise UnsupportedAudioError("zero channels or sample rate")
            elif cid == b"data":
                # header length is bounded by the bytes actually present
                # (truncated payloads must not claim more samples)
                if length > len(body):
                    raise UnsupportedAudioError("data chunk exceeds payload")
                pcm = body
        if sample_rate is None or pcm is None:
            raise UnsupportedAudioError("missing fmt or data chunk")
        n_values = len(pcm) // 2
        n_frames = n_values // channels
        # array('h'), not a boxed-int list: the executor decode path
        # only needs sum/min/max and a 100 MB payload must not balloon
        # to ~1.4 GB of PyObjects (r05 review); ~2 bytes/sample instead
        samples = array("h")
        samples.frombytes(pcm[: n_frames * channels * 2])
        if sys.byteorder == "big":
            samples.byteswap()  # WAV PCM is little-endian
        return sample_rate, channels, n_frames, samples
    except UnsupportedAudioError:
        raise
    except (struct.error, ValueError, IndexError) as e:
        raise UnsupportedAudioError(
            f"malformed WAV payload ({type(e).__name__}: {e})"
        ) from e


def encode_wav(
    sample_rate: int, channels: int, samples: list[int]
) -> bytes:
    """Encode interleaved signed 16-bit samples as canonical RIFF/WAVE
    (fmt + data, PCM format tag 1)."""
    pcm = struct.pack(f"<{len(samples)}h", *samples)
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    chunks = b"WAVE"
    for cid, body in ((b"fmt ", fmt), (b"data", pcm)):
        chunks += cid + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
