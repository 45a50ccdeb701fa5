"""Multimodal columns: opaque binary payloads + typed metadata.

Design (per the 100 TB training-pipeline brief): media lives as
``binary`` columns (or object-store URIs) with a typed metadata struct
alongside; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so bytes never leave the executor
and batch size bounds memory.

PNG (8-bit non-interlaced), BMP (24-bit uncompressed), baseline
sequential JPEG, 16-bit PCM WAV and uncompressed-DIB AVI decode FOR
REAL via the pure-stdlib codecs in `extraction/imagecodec.py`,
`jpegcodec.py`, `audiocodec.py` and `videocodec.py` —
``decode_image_features`` / ``decode_audio_features`` /
``sample_video_frames`` are the mapInPandas stages over them, pulling
actual pixel/sample statistics out of the payload bytes.  Codecs that
genuinely need native libraries (progressive/arithmetic JPEG,
MP3/AAC audio, MJPG/H.264 video) raise Unsupported*Error and fall back
to the byte-stat stub (``decode_image_stub``) with the same scheduling
shape.  Everything Spark-side — schema, UDF signature, Arrow batch
shape, partitioning — is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _fixture_ids(df: DataFrame, id_col: str) -> DataFrame:
    """Slim bigint id projection feeding every ``generate_*_fixture``
    — SPREAD across the session's parallelism when the source scan has
    fewer partitions than cores (r11 optimization, guide §2.5
    stragglers): the bench fixtures are single-row-group parquet, so
    the scan arrives as ONE partition and the whole encode→decode
    Python chain would serialize on one core while the rest idle
    (measured: jpeg/mjpg gates ran (0+1)/1 single-task).  The
    repartition moves only the 8-byte ids — the expensive payloads are
    generated AFTER the exchange, on all cores.  Scale-adaptive, not a
    local constant: a real many-file corpus already scans with ≥ cores
    partitions and keeps its layout (no added shuffle); only an
    under-parallel input is spread, and only up to
    ``defaultParallelism``, which tracks the cluster width."""
    ids = df.select(F.col(id_col).cast("long").alias("doc_id"))
    target = ids.sparkSession.sparkContext.defaultParallelism
    if ids.rdd.getNumPartitions() < target:
        ids = ids.repartition(target)
    return ids


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Fixture adapter: treat the document text's UTF-8 bytes as an
    opaque media payload with deterministic metadata (the shape a real
    ingest would produce from image/audio files)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/stub").alias("media_type"),
        (F.length(F.col(text_col)) % 1024).cast("int").alias("width"),
        (F.length(F.col(text_col)) % 768).cast("int").alias("height"),
    )


def decode_image_real(payload: bytes) -> dict:
    """Real decode for PNG/BMP/baseline-JPEG payloads
    (`extraction/imagecodec.py` + `extraction/jpegcodec.py`, pure
    stdlib): width/height/channels come from the headers, the pixel
    stats from the fully decoded pixel buffer.  Raises
    ``UnsupportedImageError`` for formats that need native codec
    libraries (progressive/arithmetic JPEG, video, audio) and for
    malformed payloads — callers fall back to
    ``decode_image_stub``'s byte features."""
    from swisscourtrulingcorpus_spark.extraction.imagecodec import decode_image

    width, height, channels, px = decode_image(payload)
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixel_sum": sum(px),
        "px_min": min(px) if px else None,
        "px_max": max(px) if px else None,
    }


PIXEL_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fmt", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("pixel_sum", LongType()),
        StructField("px_min", LongType()),
        StructField("px_max", LongType()),
    ]
)


def _pixel_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from swisscourtrulingcorpus_spark.extraction.imagecodec import (
        UnsupportedImageError,
    )

    null_stats = {
        "width": None,
        "height": None,
        "channels": None,
        "pixel_sum": None,
        "px_min": None,
        "px_max": None,
    }
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:
                # nullable binary column: a NULL payload is the most
                # common bad row of all — it must emit the null-stats
                # row, not TypeError at the sniff (r05 review)
                rows.append({"doc_id": doc_id, "fmt": "missing", **null_stats})
                continue
            fmt = (
                "png"
                if payload[:8] == b"\x89PNG\r\n\x1a\n"
                else "bmp"
                if payload[:2] == b"BM"
                else "jpeg"
                if payload[:2] == b"\xff\xd8"
                else "gif"
                if payload[:6] in (b"GIF87a", b"GIF89a")
                else "other"
            )
            try:
                feats = decode_image_real(bytes(payload))
            except UnsupportedImageError:
                # A real 100 TB corpus always contains undecodable
                # payloads (progressive JPEGs, truncated files, videos
                # mis-sniffed as images) — one of them must NOT kill
                # the Spark task.  Such rows pass through with null
                # pixel stats and a *_undecodable fmt so downstream
                # can route them to the byte-stat stub (r05 review;
                # the decode_image dispatch translates every codec's
                # malformed-payload errors to UnsupportedImageError,
                # so this one except clause really covers all three).
                feats = dict(null_stats)
                fmt = f"{fmt}_undecodable" if fmt != "other" else "other"
            rows.append(
                {
                    "doc_id": doc_id,
                    "fmt": fmt,
                    "width": feats["width"],
                    "height": feats["height"],
                    "channels": feats["channels"],
                    "pixel_sum": feats["pixel_sum"],
                    "px_min": feats["px_min"],
                    "px_max": feats["px_max"],
                }
            )
        if rows:
            yield pd.DataFrame(rows)


PAYLOAD_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
)


def _image_fixture_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from swisscourtrulingcorpus_spark.extraction.imagecodec import (
        encode_bmp24,
        encode_png,
    )

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = d % 4 + 2, d % 3 + 2
            nch = 4 if (d % 2 == 0 and d % 4 == 0) else 3
            px = bytes(
                (d + 7 * x + 13 * y + 29 * c) % 256
                for y in range(h)
                for x in range(w)
                for c in range(nch)
            )
            if d % 2 == 0:
                payloads.append(
                    encode_png(w, h, nch, px, filter_for_row=lambda y, d=d: (d + y) % 5)
                )
            else:
                payloads.append(encode_bmp24(w, h, px))
        if len(pdf):
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def _jpeg_fixture_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from swisscourtrulingcorpus_spark.extraction.jpegcodec import encode_jpeg_gray

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = d % 21 + 4, d % 13 + 4
            px = [
                (3 * d + 11 * (x // 8) + 17 * (y // 8)) % 256
                for y in range(h)
                for x in range(w)
            ]
            payloads.append(encode_jpeg_gray(w, h, px, restart_interval=d % 3))
        if len(pdf):
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def _progressive_jpeg_fixture_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    from swisscourtrulingcorpus_spark.extraction.jpegcodec import (
        encode_jpeg_gray_progressive,
    )

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = d % 21 + 4, d % 13 + 4
            px = [
                (3 * d + 11 * (x // 8) + 17 * (y // 8)) % 256
                for y in range(h)
                for x in range(w)
            ]
            payloads.append(encode_jpeg_gray_progressive(w, h, px))
        if len(pdf):
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def generate_progressive_jpeg_fixture(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Same deterministic corpus as `generate_jpeg_fixture` but encoded
    PROGRESSIVE (SOF2, DC scan + AC band scan) — the decode gate then
    exercises the multi-scan coefficient store and
    `_assemble_progressive` instead of the baseline path, against the
    identical arithmetic oracle."""
    return _fixture_ids(df, id_col).mapInPandas(
        _progressive_jpeg_fixture_batches, PAYLOAD_SCHEMA
    )


def _mixed_fixture_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from swisscourtrulingcorpus_spark.extraction.imagecodec import (
        encode_bmp24,
        encode_png,
    )
    from swisscourtrulingcorpus_spark.extraction.jpegcodec import encode_jpeg_gray

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            kind = d % 4
            if kind == 3:  # undecodable row: mis-sniffed "video" bytes
                payloads.append(b"\x00RIFFfake-video" + bytes([d % 256]) * 8)
                continue
            w, h = d % 5 + 2, d % 3 + 2
            if kind == 2:  # grayscale JPEG, constant blocks (bit-exact)
                px = [(d + 5 * (x // 8) + 9 * (y // 8)) % 256 for y in range(h) for x in range(w)]
                payloads.append(encode_jpeg_gray(w, h, px))
                continue
            px3 = bytes(
                (d + 7 * x + 13 * y + 29 * c) % 256
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            payloads.append(
                encode_png(w, h, 3, px3, filter_for_row=lambda y, d=d: (d + y) % 5)
                if kind == 0
                else encode_bmp24(w, h, px3)
            )
        if len(pdf):
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def generate_mixed_media_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """A MIXED media corpus from row ids — PNG / BMP / grayscale JPEG /
    deliberately-undecodable payload cycling by doc_id % 4 — the shape
    `decode_image_features` must survive at 100 TB: every codec
    dispatched in one scan, bad rows passing through as 'other'."""
    return _fixture_ids(df, id_col).mapInPandas(
        _mixed_fixture_batches, PAYLOAD_SCHEMA
    )


def generate_jpeg_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic baseline-JPEG corpus from row ids: grayscale,
    sizes 4..24 × 4..16 (non-multiples of 8 exercise edge-replication
    padding), restart interval cycling 0/1/2, pixel (x, y) =
    (3·id + 11·(x//8) + 17·(y//8)) % 256.  Constant 8×8 blocks + the
    encoder's flat quant table make the DCT round trip BIT-EXACT (only
    the DC coefficient survives; 8·v is exact in binary float), so an
    independent oracle recomputes every pixel statistic from arithmetic
    alone — the full marker-parse → Huffman → dequant → IDCT path
    through real bytes is what the gate verifies."""
    return _fixture_ids(df, id_col).mapInPandas(
        _jpeg_fixture_batches, PAYLOAD_SCHEMA
    )


def generate_image_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic image corpus from row ids: even ids become real
    PNGs (RGBA when id % 4 == 0 else RGB, scanline filter cycling
    through all five types), odd ids 24-bit BMPs; pixel (x, y, c) =
    (id + 7x + 13y + 29c) % 256 so an independent oracle can recompute
    every statistic from arithmetic alone — the encode→decode round
    trip through real bytes is what the gate verifies."""
    return _fixture_ids(df, id_col).mapInPandas(
        _image_fixture_batches, PAYLOAD_SCHEMA
    )


def decode_image_features(media: DataFrame) -> DataFrame:
    """REAL pixel-statistics extraction over binary image payloads via
    mapInPandas — the decode stage of a multimodal training pipeline.
    Input needs (doc_id, payload); PNG/BMP/baseline-JPEG payloads are
    decoded by the stdlib codecs; undecodable rows survive with null
    pixel stats and fmt '<fmt>_undecodable'/'other' (a mixed corpus
    never kills the task — route those rows to ``decode_image_stub``
    for byte features)."""
    return media.mapInPandas(_pixel_feature_batches, PIXEL_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fmt", StringType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("amp_sum", LongType()),
        StructField("amp_min", LongType()),
        StructField("amp_max", LongType()),
    ]
)

_AUDIO_NULL_STATS = {
    "sample_rate": None,
    "channels": None,
    "n_frames": None,
    "duration_ms": None,
    "amp_sum": None,
    "amp_min": None,
    "amp_max": None,
}


def _wav_stage_rows(doc_id, payload, nulls: dict, body) -> list[dict]:
    """The audio pass-through contract in ONE place (r05 review; same
    contract as decode_image_features): NULL payload → one 'missing'
    row; non-WAV / undecodable payload → one null-stat row; decodable
    WAV → ``body(sr, ch, nf, samples)``'s stage-specific rows.  One
    bad payload never kills the task."""
    from swisscourtrulingcorpus_spark.extraction.audiocodec import (
        UnsupportedAudioError,
        decode_wav,
    )

    if payload is None:
        return [{"doc_id": doc_id, "fmt": "missing", **nulls}]
    is_wav = payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    try:
        if not is_wav:
            raise UnsupportedAudioError("not WAV")
        sr, ch, nf, samples = decode_wav(bytes(payload))
    except UnsupportedAudioError:
        fmt = "wav_undecodable" if is_wav else "other"
        return [{"doc_id": doc_id, "fmt": fmt, **nulls}]
    return [{"doc_id": doc_id, "fmt": "wav", **r} for r in body(sr, ch, nf, samples)]


def _audio_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    def body(sr, ch, nf, samples):
        return [
            {
                "sample_rate": sr,
                "channels": ch,
                "n_frames": nf,
                "duration_ms": nf * 1000 // sr,
                "amp_sum": sum(samples),
                "amp_min": min(samples) if samples else None,
                "amp_max": max(samples) if samples else None,
            }
        ]

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            rows.extend(_wav_stage_rows(doc_id, payload, _AUDIO_NULL_STATS, body))
        if rows:
            yield pd.DataFrame(rows)


def decode_audio_features(media: DataFrame) -> DataFrame:
    """REAL sample-statistics extraction over binary WAV payloads via
    mapInPandas (`extraction/audiocodec.py`, pure stdlib).  Integer
    stats only (amp_sum/min/max, floor-division duration) so the DuckDB
    oracle recomputes them bit-exactly; undecodable/compressed/missing
    payloads pass through with null stats like the image stage."""
    return media.mapInPandas(_audio_feature_batches, AUDIO_FEATURE_SCHEMA)


def _wav_fixture_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from swisscourtrulingcorpus_spark.extraction.audiocodec import encode_wav

    rates = (8000, 16000, 44100)
    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            if d % 7 == 3:  # undecodable row: RIFF/WAVE with float PCM tag
                import struct as _s

                body = b"WAVE" + b"fmt " + _s.pack("<I", 16) + _s.pack(
                    "<HHIIHH", 3, 1, 8000, 32000, 4, 32
                )
                payloads.append(b"RIFF" + _s.pack("<I", len(body)) + body)
                continue
            ch = d % 2 + 1
            payloads.append(encode_wav(rates[d % 3], ch, _wav_samples(d)))
        if len(pdf):
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def generate_wav_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic WAV corpus from row ids: sample rate cycling
    8k/16k/44.1k, 1-2 channels, 10..59 frames, flat sample value
    i -> ((id·31 + 7i) mod 65536) − 32768; every 7th id (mod 7 == 3) is
    a float-PCM WAV the decoder must reject, exercising the
    pass-through contract.  An independent oracle recomputes every
    statistic from arithmetic alone — the RIFF parse → PCM unpack path
    through real bytes is what the gate verifies."""
    return _fixture_ids(df, id_col).mapInPandas(
        _wav_fixture_batches, PAYLOAD_SCHEMA
    )


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fmt", StringType()),
        StructField("window_idx", LongType()),
        StructField("start_ms", LongType()),
        StructField("n_values", LongType()),
        StructField("energy_sum", LongType()),
        StructField("amp_peak", LongType()),
    ]
)

_AUDIO_WINDOW_NULLS = {
    "window_idx": None,
    "start_ms": None,
    "n_values": None,
    "energy_sum": None,
    "amp_peak": None,
}


def _audio_window_batches(frame_ms: int):
    from swisscourtrulingcorpus_spark.extraction.audiocodec import (
        UnsupportedAudioError,
        decode_wav,
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    rows.append(
                        {"doc_id": doc_id, "fmt": "missing", **_AUDIO_WINDOW_NULLS}
                    )
                    continue
                is_wav = payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
                try:
                    if not is_wav:
                        raise UnsupportedAudioError("not WAV")
                    sr, ch, nf, samples = decode_wav(bytes(payload))
                    spf = sr * frame_ms // 1000  # sample frames per window
                    if spf == 0 or nf == 0:
                        # sub-ms rates or empty audio: one accounting row
                        rows.append(
                            {"doc_id": doc_id, "fmt": "wav", **_AUDIO_WINDOW_NULLS}
                        )
                        continue
                    for w in range((nf + spf - 1) // spf):
                        lo, hi = w * spf * ch, min((w + 1) * spf, nf) * ch
                        win = samples[lo:hi]
                        rows.append(
                            {
                                "doc_id": doc_id,
                                "fmt": "wav",
                                "window_idx": w,
                                "start_ms": w * frame_ms,
                                "n_values": hi - lo,
                                "energy_sum": sum(abs(v) for v in win),
                                "amp_peak": max(abs(v) for v in win),
                            }
                        )
                except UnsupportedAudioError:
                    fmt = "wav_undecodable" if is_wav else "other"
                    rows.append({"doc_id": doc_id, "fmt": fmt, **_AUDIO_WINDOW_NULLS})
            if rows:
                yield pd.DataFrame(rows)

    return gen


def audio_frame_energy(media: DataFrame, frame_ms: int = 1) -> DataFrame:
    """Windowed audio energy (1→N fan-out): each decodable WAV payload
    yields one row per fixed ``frame_ms`` window — integer |sample| sum
    and peak over the window's interleaved values — the segmentation
    primitive (VAD thresholding, silence trimming, loudness bucketing)
    of a speech-data pipeline.  Window boundaries are integer sample
    frames (``sr * frame_ms // 1000``), so a DuckDB oracle recomputes
    every row arithmetically.  Undecodable/missing payloads pass
    through as ONE null row (same contract as the other media
    stages)."""
    return media.mapInPandas(_audio_window_batches(frame_ms), AUDIO_WINDOW_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fmt", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("out_w", LongType()),
        StructField("out_h", LongType()),
        StructField("out_pixel_sum", LongType()),
        StructField("out_bmp_bytes", LongType()),
    ]
)


def _resize_box2(w: int, h: int, nch: int, px) -> tuple:
    """Real 2x box-filter downsample: each output pixel is the integer
    mean (floor) of its 2x2 source block.  Floor-crop semantics: with
    odd dims the trailing row/column is dropped, so every block is a
    full 2x2 — the arithmetic the oracle reproduces exactly."""
    ow, oh = w // 2, h // 2
    out = bytearray(ow * oh * nch)
    for Y in range(oh):
        for X in range(ow):
            base0 = (2 * Y * w + 2 * X) * nch
            base1 = ((2 * Y + 1) * w + 2 * X) * nch
            for c in range(nch):
                s = (
                    px[base0 + c]
                    + px[base0 + nch + c]
                    + px[base1 + c]
                    + px[base1 + nch + c]
                )
                out[(Y * ow + X) * nch + c] = s // 4
    return ow, oh, bytes(out)


def _resize_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from swisscourtrulingcorpus_spark.extraction.imagecodec import (
        UnsupportedImageError,
        decode_image,
        encode_bmp24,
    )

    nulls = {
        "width": None,
        "height": None,
        "channels": None,
        "out_w": None,
        "out_h": None,
        "out_pixel_sum": None,
        "out_bmp_bytes": None,
    }
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:
                rows.append({"doc_id": doc_id, "fmt": "missing", **nulls})
                continue
            payload = bytes(payload)
            fmt = (
                "png"
                if payload[:8] == b"\x89PNG\r\n\x1a\n"
                else "bmp"
                if payload[:2] == b"BM"
                else "jpeg"
                if payload[:2] == b"\xff\xd8"
                else "gif"
                if payload[:6] in (b"GIF87a", b"GIF89a")
                else "other"
            )
            try:
                w, h, nch, px = decode_image(payload)
            except UnsupportedImageError:
                rows.append(
                    {
                        "doc_id": doc_id,
                        "fmt": f"{fmt}_undecodable" if fmt != "other" else "other",
                        **nulls,
                    }
                )
                continue
            if w < 2 or h < 2:
                rows.append({"doc_id": doc_id, "fmt": f"{fmt}_tiny", **nulls})
                continue
            ow, oh, out = _resize_box2(w, h, nch, px)
            # re-encode as BMP24 to prove the round trip: drop alpha /
            # replicate gray so the writer always sees RGB
            if nch >= 3:
                rgb = bytes(
                    out[(i // 3) * nch + (i % 3)] for i in range(ow * oh * 3)
                )
            else:
                # 1-ch gray AND 2-ch gray+alpha both replicate channel 0
                # of each pixel — indexing by i//3 alone walked the
                # buffer at the wrong stride for nch=2 and emitted
                # ALPHA bytes as pixel values (r06 review)
                rgb = bytes(
                    out[(i // 3) * nch] for i in range(ow * oh * 3)
                )
            bmp = encode_bmp24(ow, oh, rgb)
            rows.append(
                {
                    "doc_id": doc_id,
                    "fmt": fmt,
                    "width": w,
                    "height": h,
                    "channels": nch,
                    "out_w": ow,
                    "out_h": oh,
                    "out_pixel_sum": sum(out),
                    "out_bmp_bytes": len(bmp),
                }
            )
        if rows:
            yield pd.DataFrame(rows)


def resize_image_features(media: DataFrame) -> DataFrame:
    """REAL image resize on executors: decode (stdlib codecs), 2x
    box-filter downsample, BMP24 re-encode — the full decode ->
    transform -> re-encode round trip of a multimodal preprocessing
    stage, Arrow-batched via mapInPandas like the decode ops.  Bad
    rows (null / undecodable / sub-2x2) pass through as null-stat rows
    under the same contract as `decode_image_features`."""
    return media.mapInPandas(_resize_feature_batches, RESIZE_SCHEMA)


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fmt", StringType()),
        StructField("frame_idx", LongType()),
        StructField("ts_ms", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("pixel_sum", LongType()),
        StructField("px_min", LongType()),
        StructField("px_max", LongType()),
    ]
)

_VIDEO_NULL_STATS = {
    "frame_idx": None,
    "ts_ms": None,
    "width": None,
    "height": None,
    "pixel_sum": None,
    "px_min": None,
    "px_max": None,
}


def _video_frame_batches(stride: int):
    from swisscourtrulingcorpus_spark.extraction.videocodec import (
        UnsupportedVideoError,
        decode_avi,
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    rows.append(
                        {"doc_id": doc_id, "fmt": "missing", **_VIDEO_NULL_STATS}
                    )
                    continue
                is_avi = payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
                try:
                    if not is_avi:
                        raise UnsupportedVideoError("not AVI")
                    w, h, us, frames = decode_avi(bytes(payload))
                    if not frames:
                        # a well-formed container with an empty movi
                        # list still yields ONE row — per-doc
                        # accounting never silently drops a doc_id
                        # (r05 review)
                        rows.append(
                            {"doc_id": doc_id, "fmt": "avi", **_VIDEO_NULL_STATS}
                        )
                        continue
                    for idx in range(0, len(frames), stride):
                        px = frames[idx]
                        rows.append(
                            {
                                "doc_id": doc_id,
                                "fmt": "avi",
                                "frame_idx": idx,
                                "ts_ms": idx * us // 1000,
                                "width": w,
                                "height": h,
                                "pixel_sum": sum(px),
                                "px_min": min(px) if px else None,
                                "px_max": max(px) if px else None,
                            }
                        )
                except UnsupportedVideoError:
                    fmt = "avi_undecodable" if is_avi else "other"
                    rows.append({"doc_id": doc_id, "fmt": fmt, **_VIDEO_NULL_STATS})
            if rows:
                yield pd.DataFrame(rows)

    return gen


def sample_video_frames(media: DataFrame, stride: int = 1) -> DataFrame:
    """REAL frame sampling over binary AVI payloads via mapInPandas
    (`extraction/videocodec.py`, pure stdlib): the 1→N UDTF-shaped
    multimodal stage — every ``stride``-th uncompressed-DIB frame comes
    out with integer pixel stats and its container timestamp.
    Compressed/undecodable/missing payloads pass through as ONE null
    row so a mixed corpus never kills the task (same contract as
    `decode_image_features`); `sample_frames_stub` remains the
    byte-stat fallback shape for codecs needing native libraries."""
    return media.mapInPandas(_video_frame_batches(stride), VIDEO_FRAME_SCHEMA)


def _avi_fixture_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from swisscourtrulingcorpus_spark.extraction.videocodec import encode_avi

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            n, w, h = d % 4 + 1, d % 3 + 2, d % 2 + 2
            frames = [
                bytes(
                    (d + 3 * f + 7 * x + 13 * y + 29 * c) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                for f in range(n)
            ]
            payloads.append(encode_avi(w, h, frames, us_per_frame=40000))
        if len(pdf):
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def generate_avi_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic AVI corpus from row ids: 1-4 uncompressed-DIB
    frames of 2-4 × 2-3 RGB at 25 fps, pixel (f, x, y, c) =
    (id + 3f + 7x + 13y + 29c) % 256 — an independent oracle recomputes
    every per-frame statistic from arithmetic alone; the RIFF walk →
    DIB plane → BGR→RGB path through real bytes is what the gate
    verifies."""
    return _fixture_ids(df, id_col).mapInPandas(
        _avi_fixture_batches, PAYLOAD_SCHEMA
    )


def _mjpg_fixture_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from swisscourtrulingcorpus_spark.extraction.jpegcodec import encode_jpeg_gray
    from swisscourtrulingcorpus_spark.extraction.videocodec import encode_avi_mjpg

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            payloads.append(_mjpg_payload(int(doc_id)))
        if len(pdf):
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def generate_mjpg_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic Motion-JPEG corpus from row ids: 1-3 grayscale
    baseline-JPEG frames of (4-16) x (4-12) per container, pixel
    (f, x, y) = (id + 5f + 11*(x//8) + 17*(y//8)) % 256 — constant
    8x8 blocks, so the DCT round trip is bit-exact and an arithmetic
    oracle predicts every decoded pixel (same trick as the
    `jpeg_decode_stats` gate).  What the gate then verifies end-to-end:
    RIFF walk -> `00dc` chunk -> baseline JPEG decode -> gray->RGB
    replicate, all through real bytes."""
    return _fixture_ids(df, id_col).mapInPandas(
        _mjpg_fixture_batches, PAYLOAD_SCHEMA
    )


GIF_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fmt", StringType()),
        StructField("frame_idx", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_palette", LongType()),
        StructField("idx_sum", LongType()),
        StructField("rgb_sum", LongType()),
    ]
)

_GIF_NULL_STATS = {
    "frame_idx": None,
    "width": None,
    "height": None,
    "n_palette": None,
    "idx_sum": None,
    "rgb_sum": None,
}



def _gif_payload(d: int) -> bytes:
    """Shared GIF fixture construction (used by generate_gif_fixture
    AND the media-router fixture — one definition, so the oracles that
    hard-code this arithmetic cannot drift apart; r06 review)."""
    from swisscourtrulingcorpus_spark.extraction.gifcodec import encode_gif

    w, h, npal, nfr = d % 7 + 3, d % 4 + 2, d % 5 + 2, d % 3 + 1
    pal = [
        ((d + 11 * i) % 256, (d + 23 * i) % 256, (d + 37 * i) % 256)
        for i in range(npal)
    ]
    frames = [
        bytes((x + 2 * y + f + d) % npal for y in range(h) for x in range(w))
        for f in range(nfr)
    ]
    return encode_gif(w, h, pal, frames)


def _mjpg_payload(d: int) -> bytes:
    """Shared Motion-JPEG fixture construction (generate_mjpg_fixture +
    router fixture)."""
    from swisscourtrulingcorpus_spark.extraction.jpegcodec import encode_jpeg_gray
    from swisscourtrulingcorpus_spark.extraction.videocodec import encode_avi_mjpg

    n, w, h = d % 3 + 1, d % 13 + 4, d % 9 + 4
    jpegs = [
        encode_jpeg_gray(
            w,
            h,
            [
                (d + 5 * f + 11 * (x // 8) + 17 * (y // 8)) % 256
                for y in range(h)
                for x in range(w)
            ],
        )
        for f in range(n)
    ]
    return encode_avi_mjpg(w, h, jpegs, us_per_frame=40000)


def _wav_samples(d: int) -> list[int]:
    """Shared PCM sample construction (WAV fixture + router fixture;
    the containers differ — mixed rates / reject rows vs fixed 8 kHz —
    but the sample arithmetic every oracle hard-codes lives here)."""
    ch, n = d % 2 + 1, d % 50 + 10
    return [((d * 31 + 7 * i) % 65536) - 32768 for i in range(n * ch)]


def _gif_frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from swisscourtrulingcorpus_spark.extraction.gifcodec import (
        UnsupportedGifError,
        decode_gif,
        frame_rgb,
    )

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:
                rows.append({"doc_id": doc_id, "fmt": "missing", **_GIF_NULL_STATS})
                continue
            payload = bytes(payload)
            is_gif = payload[:6] in (b"GIF87a", b"GIF89a")
            try:
                if not is_gif:
                    raise UnsupportedGifError("not GIF")
                w, h, pal, frames = decode_gif(payload)
                # buffer the doc's rows and extend only on FULL success:
                # a failure on frame k must not leave frames 0..k-1 rows
                # next to the null-stat row (one bad payload = exactly
                # one row, the media-stage contract; r06 review)
                doc_rows = []
                for idx, plane in enumerate(frames):
                    rgb = frame_rgb(pal, plane)
                    doc_rows.append(
                        {
                            "doc_id": doc_id,
                            "fmt": "gif",
                            "frame_idx": idx,
                            "width": w,
                            "height": h,
                            "n_palette": len(pal),
                            "idx_sum": sum(plane),
                            "rgb_sum": sum(rgb),
                        }
                    )
                rows.extend(doc_rows)
            except UnsupportedGifError:
                fmt = "gif_undecodable" if is_gif else "other"
                rows.append({"doc_id": doc_id, "fmt": fmt, **_GIF_NULL_STATS})
        if rows:
            yield pd.DataFrame(rows)


def sample_gif_frames(media: DataFrame) -> DataFrame:
    """REAL animated-GIF frame sampling via mapInPandas
    (`extraction/gifcodec.py`, pure stdlib LZW): every frame comes out
    composited to the full canvas with palette-index and RGB pixel
    sums.  Bad rows (null / non-GIF / malformed) pass through as ONE
    null-stat row — the standard media-stage contract."""
    return media.mapInPandas(_gif_frame_batches, GIF_FRAME_SCHEMA)


def _gif_fixture_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from swisscourtrulingcorpus_spark.extraction.gifcodec import encode_gif

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            payloads.append(_gif_payload(int(doc_id)))
        if len(pdf):
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def generate_gif_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic animated-GIF corpus from row ids: 1-3 frames of
    (3-9) x (2-5) cells over a 2-6 color palette, index (x, y, f) =
    (x + 2y + f + d) % n_palette and palette channel c of entry i =
    (d + prime_c * i) % 256 — an arithmetic oracle recomputes every
    per-frame index and RGB sum; the LZW bitstream -> sub-block ->
    palette -> canvas path through real bytes is what the gate
    verifies."""
    return _fixture_ids(df, id_col).mapInPandas(
        _gif_fixture_batches, PAYLOAD_SCHEMA
    )


ROUTER_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_class", StringType()),
        StructField("fmt", StringType()),
        StructField("n_units", LongType()),
        StructField("stat_sum", LongType()),
    ]
)


def route_media_features(media: DataFrame) -> DataFrame:
    """The heterogeneous-corpus stage: ONE binary column holding many
    formats, sniffed per row and dispatched to the right REAL decoder —
    images (PNG/BMP/JPEG) to the pixel path, animated GIFs to the LZW
    frame path, RIFF/AVI (incl. Motion-JPEG) to the video path,
    RIFF/WAVE to the PCM path.  Emits one row per payload with the
    media class, sniffed format, unit count (frames for video/GIF,
    per-channel sample frames for audio, 1 for stills) and the summed
    integer unit statistic — comparable across a mixed corpus without
    per-format tables.  Unroutable/undecodable/missing payloads pass
    through as null-stat rows (the standard contract: one bad row
    never kills a 100 TB scan)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from swisscourtrulingcorpus_spark.extraction.audiocodec import (
            decode_wav,
        )
        from swisscourtrulingcorpus_spark.extraction.gifcodec import (
            decode_gif,
            frame_rgb,
        )
        from swisscourtrulingcorpus_spark.extraction.imagecodec import (
            UnsupportedImageError,
            decode_image,
        )
        from swisscourtrulingcorpus_spark.extraction.videocodec import (
            UnsupportedVideoError,
            decode_avi,
        )

        nulls = {"n_units": None, "stat_sum": None}
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    rows.append(
                        {"doc_id": doc_id, "media_class": "missing",
                         "fmt": "missing", **nulls}
                    )
                    continue
                p = bytes(payload)
                try:
                    if p[:6] in (b"GIF87a", b"GIF89a"):
                        w, h, pal, frames = decode_gif(p)
                        rows.append(
                            {
                                "doc_id": doc_id,
                                "media_class": "image_anim",
                                "fmt": "gif",
                                "n_units": len(frames),
                                "stat_sum": sum(
                                    sum(frame_rgb(pal, fr)) for fr in frames
                                ),
                            }
                        )
                    elif p[:4] == b"RIFF" and p[8:12] == b"AVI ":
                        w, h, us, frames = decode_avi(p)
                        rows.append(
                            {
                                "doc_id": doc_id,
                                "media_class": "video",
                                "fmt": "avi",
                                "n_units": len(frames),
                                "stat_sum": sum(sum(fr) for fr in frames),
                            }
                        )
                    elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                        sr, ch, nframes, samples = decode_wav(p)
                        rows.append(
                            {
                                "doc_id": doc_id,
                                "media_class": "audio",
                                "fmt": "wav",
                                "n_units": nframes,
                                "stat_sum": int(sum(samples)),
                            }
                        )
                    elif (
                        p[:8] == b"\x89PNG\r\n\x1a\n"
                        or p[:2] == b"BM"
                        or p[:2] == b"\xff\xd8"
                    ):
                        fmt = (
                            "png"
                            if p[:2] == b"\x89P"
                            else "bmp" if p[:2] == b"BM" else "jpeg"
                        )
                        w, h, nch, px = decode_image(p)
                        rows.append(
                            {
                                "doc_id": doc_id,
                                "media_class": "image",
                                "fmt": fmt,
                                "n_units": 1,
                                "stat_sum": sum(px),
                            }
                        )
                    else:
                        rows.append(
                            {"doc_id": doc_id, "media_class": "other",
                             "fmt": "other", **nulls}
                        )
                except (UnsupportedImageError, UnsupportedVideoError, ValueError):
                    rows.append(
                        {"doc_id": doc_id, "media_class": "undecodable",
                         "fmt": "undecodable", **nulls}
                    )
            if rows:
                yield pd.DataFrame(rows)

    return media.mapInPandas(gen, ROUTER_SCHEMA)


def _router_fixture_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from swisscourtrulingcorpus_spark.extraction.audiocodec import encode_wav
    from swisscourtrulingcorpus_spark.extraction.gifcodec import encode_gif
    from swisscourtrulingcorpus_spark.extraction.imagecodec import (
        encode_bmp24,
        encode_png,
    )
    from swisscourtrulingcorpus_spark.extraction.jpegcodec import (
        encode_jpeg_gray,
    )
    from swisscourtrulingcorpus_spark.extraction.videocodec import (
        encode_avi_mjpg,
    )

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            if d % 97 == 13:  # junk row: router must not die
                payloads.append(b"\x00junk" + bytes([d % 256]) * 5)
                continue
            kind = d % 6
            if kind in (0, 1):  # png / bmp, 3 channels
                w, h = d % 4 + 2, d % 3 + 2
                px = bytes(
                    (d + 7 * x + 13 * y + 29 * c) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                payloads.append(
                    encode_png(w, h, 3, px) if kind == 0 else encode_bmp24(w, h, px)
                )
            elif kind == 2:  # gray baseline jpeg, constant blocks
                w, h = d % 21 + 4, d % 13 + 4
                payloads.append(
                    encode_jpeg_gray(
                        w,
                        h,
                        [
                            (3 * d + 11 * (x // 8) + 17 * (y // 8)) % 256
                            for y in range(h)
                            for x in range(w)
                        ],
                    )
                )
            elif kind == 3:  # animated gif (shared builder)
                payloads.append(_gif_payload(d))
            elif kind == 4:  # motion-jpeg avi (shared builder)
                payloads.append(_mjpg_payload(d))
            else:  # 16-bit PCM wav (shared sample builder)
                payloads.append(encode_wav(8000, d % 2 + 1, _wav_samples(d)))
        if len(pdf):
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def generate_media_router_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Six real formats + junk rows in ONE binary column, all encoded
    from doc_id arithmetic so a single oracle predicts every routed
    statistic (`plans/extra_queries.py::media_router_stats`)."""
    return _fixture_ids(df, id_col).mapInPandas(
        _router_fixture_batches, PAYLOAD_SCHEMA
    )


def _g711_fixture_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from swisscourtrulingcorpus_spark.extraction.audiocodec import (
        encode_wav_g711,
    )

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            ch = d % 2 + 1
            n = (d % 40 + 20) * ch
            enc = bytes((d + 13 * i) % 256 for i in range(n))
            payloads.append(
                encode_wav_g711(8000, ch, enc, "mulaw" if d % 2 == 0 else "alaw")
            )
        if len(pdf):
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


# small BOUNDED cache: 63 md5 digests per CLUSTER, not per doc
# (~30x fixture CPU at scale).  doc_ids are usually contiguous
# within a partition (one live cluster), but an upstream
# repartition can interleave them — a handful of FIFO slots stays
# robust to interleaving at negligible memory, where an unbounded
# dict retained one grid per cluster for the partition's lifetime
# and a single slot silently fell back to per-row recompute
# (review r07 follow-ups).
_IM_GRID_CACHE: dict[int, list[list[int]]] = {}


def _image_base_grid(g: int) -> list[list[int]]:
    grid = _IM_GRID_CACHE.get(g)
    if grid is None:
        if len(_IM_GRID_CACHE) >= 8:
            _IM_GRID_CACHE.pop(next(iter(_IM_GRID_CACHE)))
        grid = _IM_GRID_CACHE[g] = [
            [
                int(
                    hashlib.md5(f"dh|{g}|{x}|{y}".encode()).hexdigest()[:2],
                    16,
                )
                for x in range(9)
            ]
            for y in range(7)
        ]
    return grid


def _image_neardup_payload(d: int) -> bytes:
    """One 9x7 grayscale BMP of the near-dup corpus: md5 base grid
    shared by 32-doc clusters, k = d % 4 doc-unique pixel
    perturbations.  Bounded-SIZE clusters keep near-dup pair volume
    LINEAR in corpus size — cluster count grows with the corpus — and
    pseudorandom patterns make cross-cluster hamming ~ Binomial(56,
    1/2), accidental <= 3 collisions ~2^-40 per pair.  (The first cut
    used 16 FIXED patterns: dup-cluster size then grows with the
    corpus and pair output goes QUADRATIC — 121M pairs at the 10x
    scale run.  Fixture bug, not operator bug.)"""
    from swisscourtrulingcorpus_spark.extraction.imagecodec import encode_bmp24

    vals = [row[:] for row in _image_base_grid(d // 32)]
    # k=0 docs are EXACT pixel dups of their cluster base, k=1..3
    # drift <= 2 hash bits per flipped pixel
    for j in range(d % 4):
        p = (d * 13 + 29 * j) % 63
        y, x = divmod(p, 9)
        vals[y][x] = (vals[y][x] + 96 + 17 * j) % 256
    px = bytearray()
    for y in range(7):
        for x in range(9):
            v = vals[y][x]
            px += bytes((v, v, v))
    return encode_bmp24(9, 7, bytes(px))


def _image_neardup_fixture_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = [_image_neardup_payload(int(d)) for d in pdf["doc_id"]]
        if len(pdf):
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def generate_image_neardup_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 9x7 grayscale BMP corpus with BUILT-IN near-dup
    structure: md5-pixel base patterns shared by 32-doc clusters, each
    doc perturbing 0-3 pixels — so perceptual-hash dedup has real
    exact-dup and near-dup pairs to find, pair volume stays LINEAR in
    corpus size (cluster size is bounded, cluster count grows), and the
    oracle recomputes every pixel, hash bit, and pair from the same
    md5 formula."""
    return _fixture_ids(df, id_col).mapInPandas(
        _image_neardup_fixture_batches, PAYLOAD_SCHEMA
    )


DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("dhash", LongType()),
    ]
)


def _dhash_value(payload: bytes) -> int | None:
    """dHash of one decoded image payload, or None if undecodable.

    Gradient hash over the native grid (channel-0 intensity):
    bit(r, c) = px[r][c+1] > px[r][c], packed at r*8 + c over the
    top-left 8x(8+1) window -> <= 64 comparisons.  The 9x7 gate
    fixture yields 56 bits; a full 8-row/9+-wide image can set bit 63,
    so fold to SIGNED two's complement before emitting — an unfolded
    2^63 doesn't fit the declared LongType and crashes the Arrow batch
    (review r07).  XOR/bit_count downstream are sign-agnostic."""
    from swisscourtrulingcorpus_spark.extraction.imagecodec import (
        UnsupportedImageError,
        decode_image,
    )

    try:
        w, h, ch, pix = decode_image(payload)
    except UnsupportedImageError:
        return None
    hv = 0
    for r in range(min(h, 8)):
        for c in range(min(w - 1, 8)):
            a = pix[(r * w + c) * ch]
            b = pix[(r * w + c + 1) * ch]
            if b > a:
                hv |= 1 << (r * 8 + c)
    if hv >= 1 << 63:
        hv -= 1 << 64
    return hv


def _dhash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [
            {
                "doc_id": doc_id,
                "dhash": None if payload is None else _dhash_value(bytes(payload)),
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
        ]
        if rows:
            yield pd.DataFrame(rows)


def image_dhash_fingerprints(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash over REAL decoded pixels
    (`extraction/imagecodec.py`): one slim (doc_id, dhash bigint) row
    per image, computed map-side in Arrow batches — the image payloads
    never shuffle; near-dup pairing downstream is pure JVM bit math
    over the fingerprint table."""
    return media.mapInPandas(_dhash_batches, DHASH_SCHEMA)


#: audio near-dup fixture geometry: 57 windows x 16 samples -> 56
#: adjacent-energy comparison bits (always positive in an int64)
_AU_WINDOWS, _AU_WIN = 57, 16


def _audio_neardup_samples(d: int) -> list[int]:
    """Deterministic per-doc PCM shared by 32-doc clusters: window w of
    cluster g holds 16 flat samples at the md5-derived level
    v(g, w) in [0, 32768), so the energy ENVELOPE is a pseudorandom
    56-bit pattern per cluster — cross-cluster hamming ~ Binomial(56,
    1/2), accidental pairs ~4e-13.  (A first cut used a single
    linear-congruential wave per cluster: window energies then shared
    structure ACROSS clusters and unrelated clips collided at ~1e-3 —
    the 10x scale run measured alpha_rows 1.34.  Envelope entropy must
    come from the seed, not from arithmetic of the window index.)
    k = d % 4 doc-unique windows shift by +4096 (wrapping), drifting
    <= 2 envelope bits each."""
    g = d // 32
    vals = list(_audio_cluster_levels(g))
    for m in range(d % 4):
        w = (d * 7 + 11 * m) % _AU_WINDOWS
        vals[w] = (vals[w] + 4096) % 32768
    return [v for v in vals for _ in range(_AU_WIN)]


#: bounded FIFO cache of per-cluster window levels — 57 md5 digests per
#: CLUSTER, not per doc (the image fixture's base_cache rationale; the
#: perturbation above copies before mutating)
_AU_LEVEL_CACHE: dict[int, tuple[int, ...]] = {}


def _audio_cluster_levels(g: int) -> tuple[int, ...]:
    levels = _AU_LEVEL_CACHE.get(g)
    if levels is None:
        if len(_AU_LEVEL_CACHE) >= 8:
            _AU_LEVEL_CACHE.pop(next(iter(_AU_LEVEL_CACHE)))
        levels = _AU_LEVEL_CACHE[g] = tuple(
            int(hashlib.md5(f"au|{g}|{w}".encode()).hexdigest()[:4], 16) % 32768
            for w in range(_AU_WINDOWS)
        )
    return levels


def _audio_neardup_payload(d: int) -> bytes:
    """One mono 16-bit PCM WAV of the audio near-dup corpus."""
    from swisscourtrulingcorpus_spark.extraction.audiocodec import encode_wav

    return encode_wav(8000, 1, _audio_neardup_samples(d))


def _audio_neardup_fixture_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = [_audio_neardup_payload(int(d)) for d in pdf["doc_id"]]
        if len(pdf):
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def generate_audio_neardup_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic mono 16-bit PCM corpus with BUILT-IN near-dup
    structure (the audio twin of `generate_image_neardup_fixture`):
    md5-seeded cluster waves, 0-3 shifted windows per doc, pair volume
    linear in corpus size.  The oracle recomputes every sample, window
    energy, hash bit, and pair from the arithmetic alone; the real
    RIFF encode -> decode path is what the Spark side exercises."""
    return _fixture_ids(df, id_col).mapInPandas(
        _audio_neardup_fixture_batches, PAYLOAD_SCHEMA
    )


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ahash", LongType()),
    ]
)


def _ahash_value(payload: bytes) -> int | None:
    """Energy-envelope difference hash of one WAV payload, or None if
    undecodable (channel-interleave-agnostic for mono; bounded to the
    leading 57 windows): bit(j) = energy(window j+1) > energy(window
    j)."""
    from swisscourtrulingcorpus_spark.extraction.audiocodec import (
        UnsupportedAudioError,
        decode_wav,
    )

    try:
        _, ch, _, samples = decode_wav(payload)
    except UnsupportedAudioError:
        return None
    mono = samples[::ch] if ch > 1 else samples
    energies = []
    for w in range(_AU_WINDOWS):
        seg = mono[w * _AU_WIN : (w + 1) * _AU_WIN]
        if len(seg) < _AU_WIN:
            break
        energies.append(sum(abs(s) for s in seg))
    hv = 0
    for j in range(len(energies) - 1):
        if j >= 63:
            break
        if energies[j + 1] > energies[j]:
            hv |= 1 << j
    return hv


def _audio_fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [
            {
                "doc_id": doc_id,
                "ahash": None if payload is None else _ahash_value(bytes(payload)),
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
        ]
        if rows:
            yield pd.DataFrame(rows)


def audio_energy_fingerprints(media: DataFrame) -> DataFrame:
    """Perceptual audio fingerprint over REAL decoded PCM
    (`extraction/audiocodec.py`): the energy-envelope difference hash —
    one slim (doc_id, ahash bigint) row per clip, computed map-side in
    Arrow batches; payloads never shuffle.  Same near-dup pairing
    contract as `image_dhash_fingerprints`."""
    return media.mapInPandas(_audio_fp_batches, AUDIO_FP_SCHEMA)


#: video near-dup fixture geometry: 57 frames of 4x3 RGB -> 56
#: adjacent-frame brightness comparison bits
_VI_FRAMES, _VI_W, _VI_H = 57, 4, 3

_VI_LEVEL_CACHE: dict[int, tuple[int, ...]] = {}


def _video_cluster_levels(g: int) -> tuple[int, ...]:
    levels = _VI_LEVEL_CACHE.get(g)
    if levels is None:
        if len(_VI_LEVEL_CACHE) >= 8:
            _VI_LEVEL_CACHE.pop(next(iter(_VI_LEVEL_CACHE)))
        levels = _VI_LEVEL_CACHE[g] = tuple(
            int(hashlib.md5(f"vi|{g}|{f}".encode()).hexdigest()[:2], 16)
            for f in range(_VI_FRAMES)
        )
    return levels


def _video_neardup_payload(d: int) -> bytes:
    """One 57-frame flat-brightness AVI of the video near-dup corpus."""
    from swisscourtrulingcorpus_spark.extraction.videocodec import encode_avi

    levels = list(_video_cluster_levels(d // 32))
    # k = d % 4 doc-unique FRAMES brightened by +96 (wrapping)
    for m in range(d % 4):
        f = (d * 7 + 11 * m) % _VI_FRAMES
        levels[f] = (levels[f] + 96) % 256
    frames = [bytes([v] * (_VI_W * _VI_H * 3)) for v in levels]
    return encode_avi(_VI_W, _VI_H, frames, us_per_frame=40000)


def _video_neardup_fixture_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = [_video_neardup_payload(int(d)) for d in pdf["doc_id"]]
        if len(pdf):
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def generate_video_neardup_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 57-frame AVI corpus with BUILT-IN near-dup
    structure (the video member of the image/audio fixture family):
    md5-per-frame brightness levels shared by 32-doc clusters, 0-3
    doc-unique brightened frames — temporal-envelope entropy comes from
    the seed, pair volume stays linear, and the oracle recomputes every
    level, bit, and pair from arithmetic alone."""
    return _fixture_ids(df, id_col).mapInPandas(
        _video_neardup_fixture_batches, PAYLOAD_SCHEMA
    )


VIDEO_FP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("vhash", LongType()),
    ]
)


def _vhash_value(payload: bytes) -> int | None:
    """Temporal brightness-envelope hash of one AVI payload, or None if
    undecodable: bit(f) = brightness of frame f+1 > frame f, over the
    leading 57 frames."""
    from swisscourtrulingcorpus_spark.extraction.videocodec import (
        UnsupportedVideoError,
        decode_avi,
    )

    try:
        _, _, _, frames = decode_avi(payload)
    except UnsupportedVideoError:
        return None
    bright = [sum(fr) for fr in frames[:_VI_FRAMES]]
    hv = 0
    for j in range(min(len(bright) - 1, 56)):
        if bright[j + 1] > bright[j]:
            hv |= 1 << j
    return hv


def _video_fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [
            {
                "doc_id": doc_id,
                "vhash": None if payload is None else _vhash_value(bytes(payload)),
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
        ]
        if rows:
            yield pd.DataFrame(rows)


def video_brightness_fingerprints(media: DataFrame) -> DataFrame:
    """Perceptual video fingerprint over REAL decoded frames
    (`extraction/videocodec.py`): the temporal brightness-envelope
    difference hash — one slim (doc_id, vhash bigint) row per clip,
    map-side; payloads never shuffle.  Same pairing contract as the
    image/audio fingerprints (`operators/dedup.py::
    banded_hamming_pairs`)."""
    return media.mapInPandas(_video_fp_batches, VIDEO_FP_SCHEMA)


#: text near-dup fixture geometry: 40 md5 words -> 38 3-word shingles
_TX_WORDS = 40

_TX_WORD_CACHE: dict[int, tuple[str, ...]] = {}


def _text_cluster_words(g: int) -> tuple[str, ...]:
    words = _TX_WORD_CACHE.get(g)
    if words is None:
        if len(_TX_WORD_CACHE) >= 8:
            _TX_WORD_CACHE.pop(next(iter(_TX_WORD_CACHE)))
        words = _TX_WORD_CACHE[g] = tuple(
            hashlib.md5(f"tx|{g}|{i}".encode()).hexdigest()[:6]
            for i in range(_TX_WORDS)
        )
    return words


def _text_neardup_payload(d: int) -> bytes:
    """One UTF-8 text payload of the near-dup corpus: md5 cluster word
    sequence (40 words shared by 32-doc clusters), k = d % 4
    doc-unique word replacements at distinct positions — the text twin
    of the image/audio/video fixture formulas, oracle-recomputable
    from arithmetic alone."""
    words = list(_text_cluster_words(d // 32))
    for j in range(d % 4):
        p = (d * 11 + 7 * j) % _TX_WORDS
        words[p] = hashlib.md5(f"tp|{d}|{j}".encode()).hexdigest()[:6]
    return " ".join(words).encode("utf-8")


def _media_neardup_payload(d: int) -> bytes:
    """One payload of the HETEROGENEOUS near-dup corpus: doc d carries
    its modality's near-dup fixture payload, modality = (d div 8) % 4
    (image BMP / audio WAV / video AVI / UTF-8 text in 8-id runs, so
    k = d % 4 keeps its full 0-3 perturbation range inside every
    modality).  Within a modality the per-doc formulas are the
    single-modality fixtures' verbatim — clusters are d // 32,
    perturbations d % 4 — so each modality keeps its linear near-dup
    structure and the unified oracle reuses the arithmetic fingerprint
    derivations with a (d div 8) % 4 filter."""
    m = (d // 8) % 4
    if m == 0:
        return _image_neardup_payload(d)
    if m == 1:
        return _audio_neardup_payload(d)
    if m == 2:
        return _video_neardup_payload(d)
    return _text_neardup_payload(d)


def _media_neardup_fixture_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = [_media_neardup_payload(int(d)) for d in pdf["doc_id"]]
        if len(pdf):
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def generate_media_neardup_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Heterogeneous media corpus (ONE binary column, FOUR modalities
    — image/audio/video/text — interleaved by (doc_id // 8) % 4, so
    each modality owns runs of 8 consecutive ids) with each modality's
    built-in near-dup structure — the input shape a real 100 TB media
    lake presents: you don't get a per-format table, you get a payload
    column and a sniffer."""
    return _fixture_ids(df, id_col).mapInPandas(
        _media_neardup_fixture_batches, PAYLOAD_SCHEMA
    )


MEDIA_FP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("fp", LongType()),
    ]
)


def _thash_value(payload: bytes) -> int | None:
    """56-bit SimHash of a UTF-8 text payload, or None if the bytes
    don't decode / normalize to >= 3 words: distinct 3-word shingles
    of the whitespace-normalized lowercase text, per-shingle hash =
    first 14 hex chars of md5('sim|' || shingle) (the `functions/
    hashing.py::h32` convention widened to 56 bits so every band of
    the shared 4x14 join carries entropy — a 32-bit hash would zero
    band 3 for every text doc and quadratically explode that bucket),
    bit b = majority vote with ties to 1 (the `simhash64` rule).
    Matches the corpus-level `operators/dedup.py::simhash64` math
    except for width; the unified oracle recomputes it bit-for-bit."""
    import re

    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError:
        return None
    text = re.sub(r"\s+", " ", text.lower()).strip()
    words = text.split(" ") if text else []
    if len(words) < 3:
        return None
    shingles = {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
    n = len(shingles)
    hs = [
        int(hashlib.md5(("sim|" + s).encode()).hexdigest()[:14], 16)
        for s in shingles
    ]
    hv = 0
    for b in range(56):
        if sum((h >> b) & 1 for h in hs) * 2 >= n:
            hv |= 1 << b
    return hv


def media_fingerprint_rows(pairs) -> list[dict]:
    """Sniff-and-fingerprint for an iterable of (doc_id, payload):
    per-row format dispatch (the `route_media_features` sniff order)
    to the matching perceptual hash — BMP/PNG/JPEG -> dHash, RIFF/WAVE
    -> energy envelope, RIFF/AVI -> brightness envelope, and anything
    without binary magic that decodes as UTF-8 text (>= 3 words) ->
    the 56-bit SimHash (`_thash_value`).  Shared by
    the batch fingerprint router and the streaming registry job so
    both paths compute identical (modality, fp) rows.  Unroutable or
    undecodable payloads emit a null fingerprint under modality
    'unknown' (one bad row never kills the scan)."""
    rows = []
    for doc_id, payload in pairs:
        modality, fp = "unknown", None
        if payload is not None:
            p = bytes(payload)
            if (
                p[:2] == b"BM"
                or p[:8] == b"\x89PNG\r\n\x1a\n"
                or p[:2] == b"\xff\xd8"
            ):
                modality, fp = "image", _dhash_value(p)
            elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                modality, fp = "audio", _ahash_value(p)
            elif p[:4] == b"RIFF" and p[8:12] == b"AVI ":
                modality, fp = "video", _vhash_value(p)
            else:
                # no binary magic: try UTF-8 text (>= 3 words) — the
                # fourth modality of the unified near-dup story
                modality, fp = "text", _thash_value(p)
            if fp is None and modality != "text":
                # magic-prefix collision: a legitimate UTF-8 text doc
                # can start with b'BM' (e.g. "BM25 scoring ...") or
                # even a RIFF-looking prefix; when the binary decode
                # fails, fall through to the text branch before
                # settling on 'unknown' so such docs keep their
                # text-near-dup coverage.
                fp = _thash_value(p)
                modality = "text" if fp is not None else "unknown"
            elif fp is None:
                modality = "unknown"
        rows.append({"doc_id": doc_id, "modality": modality, "fp": fp})
    return rows


def _media_fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = media_fingerprint_rows(zip(pdf["doc_id"], pdf["payload"]))
        if rows:
            yield pd.DataFrame(rows)


def media_fingerprints(media: DataFrame) -> DataFrame:
    """Unified perceptual-fingerprint router over a heterogeneous
    binary column: one map-side Arrow pass sniffs each payload and
    computes its modality's hash (`_dhash_value` / `_ahash_value` /
    `_vhash_value` / `_thash_value`) — payloads never shuffle; the
    output is one slim
    (doc_id, modality, fp bigint) row per payload, ready for the
    shared `banded_hamming_pairs` join grouped by modality."""
    return media.mapInPandas(_media_fp_batches, MEDIA_FP_SCHEMA)


def _adpcm_fixture_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from swisscourtrulingcorpus_spark.extraction.audiocodec import (
        encode_wav_adpcm,
    )

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            n = d % 60 + 20
            samples = [((d * 31 + 7 * i) % 65536) - 32768 for i in range(n)]
            payloads.append(encode_wav_adpcm(8000, samples, block_samples=21))
        if len(pdf):
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def generate_adpcm_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic IMA ADPCM corpus (format tag 0x11): doc d carries
    n = d%60+20 mono samples of the shared arithmetic ramp
    i -> ((d·31 + 7i) mod 65536) − 32768, greedily encoded at 21
    samples/block — small blocks so every payload crosses multiple
    block headers, exercising the step-index carry-over, the odd-tail
    pad nibble, and the header-only tail block the decoder must drop.
    The oracle replays the encode→decode composition as a recursive
    per-sample recurrence over the public IMA step tables, so a nibble
    packing/order, block segmentation, or clamp bug in EITHER codec
    direction fails the hash."""
    return _fixture_ids(df, id_col).mapInPandas(
        _adpcm_fixture_batches, PAYLOAD_SCHEMA
    )


def generate_g711_fixture(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic G.711 corpus: companded byte i of doc d is
    (d + 13i) % 256, alternating mu-law / A-law containers — the
    expansion formulas are pure integer arithmetic, so the oracle
    recomputes every decoded 16-bit sample from the byte alone; the
    RIFF parse -> expansion-table path through real bytes is what the
    gate verifies."""
    return _fixture_ids(df, id_col).mapInPandas(
        _g711_fixture_batches, PAYLOAD_SCHEMA
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "checksum": pdf["payload"].map(
                    lambda b: hashlib.md5(b).hexdigest()
                ),
                "width": pdf["width"],
                "height": pdf["height"],
            }
        )


def decode_image_stub(media: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas — the
    real plumbing (Arrow batches of binary cells, bounded by
    maxRecordsPerBatch), with stub features standing in for pixels."""
    return media.mapInPandas(_feature_batches, FEATURE_SCHEMA)


def resize_image_stub(media: DataFrame, max_dim: int = 256) -> DataFrame:
    """Resize step (1→1): rescale the metadata dims to fit max_dim
    preserving aspect ratio — pure column arithmetic on the metadata
    (a real resize would be a mapInPandas over the payload exactly like
    decode_image_stub; the *scheduling* shape is identical, so the stub
    keeps this one JVM-side where a metadata-only transform belongs)."""
    scale = F.when(
        F.greatest("width", "height") > max_dim,
        F.lit(max_dim) / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    # both dims in ONE projection — sequential withColumn would
    # recompute `scale` against the already-resized width
    return media.withColumns(
        {
            "width": F.floor(F.col("width") * scale).cast("int"),
            "height": F.floor(F.col("height") * scale).cast("int"),
        }
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_offset_ms", LongType()),
        StructField("frame_checksum", StringType()),
    ]
)

_FRAME_INTERVAL_MS = 40  # 25 fps


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        if not len(pdf):
            continue
        checksums = pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest())
        n_frames = (pdf["payload"].map(len) % 5 + 1).to_numpy()
        doc_ids = np.repeat(pdf["doc_id"].to_numpy(), n_frames)
        base = np.repeat(checksums.to_numpy(), n_frames)
        idx = np.concatenate([np.arange(k) for k in n_frames])
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "frame_idx": idx.astype("int32"),
                "ts_offset_ms": (idx * _FRAME_INTERVAL_MS).astype("int64"),
                "frame_checksum": [
                    hashlib.md5(f"{c}#{i}".encode()).hexdigest()
                    for c, i in zip(base, idx)
                ],
            }
        )


def sample_frames_stub(media: DataFrame) -> DataFrame:
    """Frame sampling (1→N fan-out): each payload yields a
    deterministic number of 'frames' (len % 5 + 1) with per-frame
    checksums — the UDTF-shaped multimodal stage (a real implementation
    would pull frames out of a video container here; batch shape,
    fan-out semantics and Arrow plumbing are identical)."""
    return media.mapInPandas(_frame_batches, FRAME_SCHEMA)
