"""Multimodal (image/audio/video) column plumbing.

Design: media are opaque ``binary`` columns plus typed metadata columns.
The Spark-side machinery — schema, Arrow batching via mapInPandas, batch
shape, partitioning — is real and tested; decoding is real too for
PNG/BMP/WAV (``media_codecs``) and baseline JPEG (``jpeg_codec``) via
from-scratch stdlib codecs (this container has no image/audio
libraries); only video / compressed audio remain gated behind
``NotImplementedError`` — those genuinely need ffmpeg.

At 100 TB: binary payloads ride in parquet row groups; feature extraction
is an Arrow-batched mapInPandas (one Python worker per task, vectorized
per batch) — the only sane shape for Python-side media work on Spark.
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory for
large blobs; decode fan-out (e.g. video frame sampling) should emit
multiple rows per input row from the same iterator.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_P31 = 2_147_483_647
_POW_CACHE: dict[int, "object"] = {}


def _np_poly(payload, mult: int) -> int:
    """31-bit polynomial hash of a byte string, vectorized with numpy.

    Horner's fold ``acc = (acc*m + b) % p`` equals
    ``sum(b_j * m^(L-1-j)) mod p``; with powers precomputed mod p every
    term is < 2^39 and a chunked int64 dot stays exact — one numpy op
    per ~16k-byte chunk instead of a Python loop per byte (the
    hot-path rule: vectorize inside the Arrow batch).
    """
    import numpy as np

    b = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
    L = len(b)
    if L == 0:
        return 0
    step = 1 << 14
    pows = _POW_CACHE.get(mult)
    if pows is None:
        # one-time base block (step entries, Python loop)
        base = np.empty(step, dtype=np.int64)
        base[0] = 1
        for i in range(1, step):
            base[i] = (base[i - 1] * mult) % _P31
        _POW_CACHE[mult] = pows = base
    while len(pows) < L:
        # vectorized extension: next block = prev block · m^len  (mod p)
        m_len = pow(mult, len(pows), _P31)
        pows = np.concatenate([pows, (pows * m_len) % _P31])
        _POW_CACHE[mult] = pows
    # chunk so each partial dot stays far below 2^63 (term < 2^39)
    acc = 0
    rev = pows[:L][::-1]
    for i in range(0, L, step):
        acc = (acc + int(np.dot(b[i : i + step], rev[i : i + step]))) % _P31
    return acc


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", LongType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic fake media: utf-8 bytes of the text as the payload.

    Stands in for `spark.read.format("binaryFile")` output so the
    downstream plumbing is exercised end-to-end.
    """
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload").cast(BinaryType()),
        F.lit("text/fake").alias("media_type"),
    )


def decode_media(payload: bytes, media_type: str) -> dict:
    """Decode a media payload to raw pixels/samples.

    Dispatch by ``media_type``: PNG / BMP / WAV decode through the
    from-scratch stdlib codecs (``media_codecs`` — baseline profiles,
    all PNG filter types, round-trip-pinned); baseline JPEG decodes
    through the from-scratch T.81 codec (``jpeg_codec`` — SOF0,
    1/3 components, 4:4:4/4:2:2/4:2:0, restart intervals); images
    prefer PIL when it IS installed (full format coverage, C-speed);
    video and compressed audio still raise NotImplementedError — those
    genuinely need ffmpeg.

    Returns ``{"kind": "image", width, height, channels, pixels}`` or
    ``{"kind": "audio", channels, sample_rate, n_samples, pcm}``.
    """
    from . import media_codecs as mc

    payload = bytes(payload)
    mt = (media_type or "").lower()
    is_png = "png" in mt or payload[:8] == b"\x89PNG\r\n\x1a\n"
    is_jpg = "jpg" in mt or "jpeg" in mt or payload[:2] == b"\xff\xd8"
    if is_png or is_jpg:
        try:  # PIL preferred when installed
            from PIL import Image  # type: ignore

            img = Image.open(__import__("io").BytesIO(payload))
            img.load()
            ch = len(img.getbands())
            return {
                "kind": "image",
                "width": img.width,
                "height": img.height,
                "channels": ch,
                "pixels": img.tobytes(),
            }
        except ImportError:
            if is_png:
                return mc.decode_png(payload)
            from .jpeg_codec import decode_jpeg

            return decode_jpeg(payload)
    if "bmp" in mt or payload[:2] == b"BM":
        return mc.decode_bmp(payload)
    if "wav" in mt or payload[:4] == b"RIFF":
        return mc.decode_wav(payload)
    raise NotImplementedError(
        f"no decoder for media type {media_type!r}: PNG/JPEG/BMP/WAV decode "
        "via from-scratch stdlib codecs; video/compressed audio need ffmpeg"
    )


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("payload_sum", LongType()),
    ]
)


def decode_features(
    df: DataFrame, payload_col: str = "payload", type_col: str = "media_type"
) -> DataFrame:
    """Arrow-batched REAL decoding over binary payloads: each row's
    payload is decoded (``decode_media``) inside a ``mapInPandas``
    worker and summarized to (dimensions, channels, sample counts, and
    a content sum — unsigned pixel bytes for images, signed samples for
    audio).

    This is the de-stubbed twin of ``extract_features``: same batch
    shape and partitioning, but the codec step is real.  At 100 TB the
    decode is embarrassingly parallel (no shuffle, no driver bytes);
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds worker
    memory for large blobs.
    """

    def _decode_one(doc_id, payload, mtype) -> tuple:
        d = decode_media(payload, mtype)
        if d["kind"] == "image":
            return (
                doc_id, "image", d["width"], d["height"], d["channels"],
                None, None, sum(d["pixels"]),
            )
        import array

        # WAV PCM: 8-bit is UNSIGNED, 16/32-bit are signed little-endian
        code = {1: "B", 2: "h", 4: "i"}[d["sample_width"]]
        samples = array.array(code, d["pcm"])
        return (
            doc_id, "audio", None, None, d["channels"],
            d["sample_rate"], d["n_samples"], sum(samples),
        )

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in DECODED_SCHEMA.fields]
        for pdf in batches:
            rows = [
                _decode_one(i, p, t)
                for i, p, t in zip(
                    pdf["doc_id"], pdf[payload_col], pdf[type_col]
                )
            ]
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(_mapper, DECODED_SCHEMA)


def image_ahash(
    df: DataFrame,
    payload_col: str = "payload",
    type_col: str = "media_type",
    id_col: str = "doc_id",
) -> DataFrame:
    """62-bit perceptual average-hash per image: decode the payload
    (real codecs, inside Arrow workers), grayscale each pixel as
    ``(r+g+b)//3`` (identity for 1-channel), take the integer mean,
    and set bit j iff gray_j exceeds it (first 62 pixels, row-major) —
    the classic aHash bit signature, all-integer so an oracle can
    replay it from deterministic pixels.

    Feed the result to ``dedup.hash_hamming_pairs`` for image NEAR-dup
    pairs: re-encodes, small overlays, and brightness-shifted copies
    keep most bits while unrelated images differ in ~half — the image
    member of the dedup family (exact/MinHash/SimHash/embedding/this),
    with the same linear chunk-banding candidate generation.  Decode is
    map-only (no shuffle, no driver bytes); at 100 TB hash first, band
    later, exactly like text SimHash.  Returns (id, ahash).
    """
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("id", LongType()), StructField("ahash", LongType())]
    )

    def _one(payload, mtype) -> int:
        d = decode_media(payload, mtype)
        if d["kind"] != "image":
            raise ValueError("image_ahash: non-image payload")
        px, ch = d["pixels"], d["channels"]
        grays = [
            sum(px[j * ch : j * ch + min(ch, 3)]) // min(ch, 3)
            for j in range(d["width"] * d["height"])
        ]
        mean = sum(grays) // len(grays)
        h = 0
        for j, g in enumerate(grays[:62]):
            if g > mean:
                h |= 1 << j
        return h

    def _mapper(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "ahash": [
                        _one(p, t)
                        for p, t in zip(pdf[payload_col], pdf[type_col])
                    ],
                }
            )

    return df.mapInPandas(_mapper, schema)


def audio_fingerprint(
    df: DataFrame,
    payload_col: str = "payload",
    type_col: str = "media_type",
    id_col: str = "doc_id",
) -> DataFrame:
    """62-bit audio fingerprint per clip: decode the payload (real WAV
    codec, inside Arrow workers), split the PCM stream into 62 equal
    time windows, and set bit j iff window j's mean |amplitude| exceeds
    the clip's overall mean |amplitude| — an integer energy-envelope
    signature (the banding-friendly skeleton of a Shazam-style
    fingerprint; spectral peaks would need an FFT, the envelope needs
    only sums).

    Robust to the transforms that matter for dedup: re-encoding,
    DC-offset-free gain changes scale every window together (bits
    stable), and a localized edit moves only its windows' bits.  Feed
    to ``dedup.hash_hamming_pairs`` for audio NEAR-dup pairs — the
    audio member of the modality dedup triple (text SimHash / image
    aHash / this), same linear chunk-banded candidates.  All-integer
    (sample→window by ``i*62//n``, floor-division means) so an oracle
    replays it exactly.  Returns (id, afp).
    """
    import array

    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("id", LongType()), StructField("afp", LongType())]
    )

    def _one(payload, mtype) -> int:
        d = decode_media(payload, mtype)
        if d["kind"] != "audio":
            raise ValueError("audio_fingerprint: non-audio payload")
        code = {1: "B", 2: "h", 4: "i"}[d["sample_width"]]
        samples = array.array(code, d["pcm"])
        n = len(samples)
        if n == 0:
            raise ValueError(
                "audio_fingerprint: empty PCM payload (zero samples) — "
                "a valid-but-empty WAV has no energy envelope to hash"
            )
        sums = [0] * 62
        cnts = [0] * 62
        total = 0
        for i, s in enumerate(samples):
            w = i * 62 // n
            a = abs(int(s))
            sums[w] += a
            cnts[w] += 1
            total += a
        overall = total // n
        h = 0
        for j in range(62):
            if cnts[j] and sums[j] // cnts[j] > overall:
                h |= 1 << j
        return h

    def _mapper(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "afp": [
                        _one(p, t)
                        for p, t in zip(pdf[payload_col], pdf[type_col])
                    ],
                }
            )

    return df.mapInPandas(_mapper, schema)


def extract_features(
    df: DataFrame,
    batch_fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Default features are byte-level and deterministic (length + 62-bit
    polynomial hash of the payload) so the full mapInPandas path — schema,
    batching, multi-partition execution — runs for real even though the
    codec itself is stubbed.
    """

    def _default(pdf: pd.DataFrame) -> pd.DataFrame:
        p31 = 2_147_483_647
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len),
                "content_hash": [
                    _np_poly(b, 31) * (p31 + 1) + _np_poly(b, 37)
                    for b in pdf["payload"]
                ],
            }
        )

    fn = batch_fn or _default

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(_mapper, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)

FRAME_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_bytes", LongType()),
        StructField("frame_hash", LongType()),
    ]
)

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video-style frame sampling: each payload fans out to ``n_frames``
    rows (doc_id, frame_idx, frame).

    The 1→N row shape is the real contract (same mapInPandas iterator
    emits multiple rows per input); the "decoder" is a deterministic
    byte-range splitter — frame i of a length-L payload is
    ``payload[i*L//n : (i+1)*L//n]`` — where ffmpeg keyframe extraction
    would plug in.
    """

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                length = len(b)
                for i in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(
                        b[i * length // n_frames : (i + 1) * length // n_frames]
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(_mapper, FRAME_SCHEMA)


def frame_features(df: DataFrame) -> DataFrame:
    """Byte-level features per frame (length + 62-bit poly hash) — the
    oracle-checkable stand-in for per-frame embedding extraction."""

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "n_bytes": pdf["frame"].map(len),
                    "frame_hash": [
                        _np_poly(b, 31) * (_P31 + 1) + _np_poly(b, 37)
                        for b in pdf["frame"]
                    ],
                }
            )

    return df.mapInPandas(_mapper, FRAME_FEATURE_SCHEMA)


def resize_media(df: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Image-style resize: payload resampled to exactly ``width*height``
    bytes by deterministic stride sampling (byte j of the output is input
    byte ``j*L // (w*h)``) — where PIL/AVIF decode+resize would plug in.

    Output payloads are fixed-size, the property real thumbnail
    pipelines rely on for downstream batch tensors.
    """
    target = width * height

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def _resample(payload) -> bytes:
                b = bytes(payload)
                if not b:
                    return b""
                return bytes(b[j * len(b) // target] for j in range(target))

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(_resample),
                }
            )

    return df.mapInPandas(_mapper, RESIZED_SCHEMA)


def read_binary_files(
    spark,
    path: str,
    id_pattern: str = r"doc_(\d+)\.",
    glob: str | None = None,
) -> DataFrame:
    """Ingest opaque media blobs through Spark's built-in ``binaryFile``
    source — the scale front door for image/audio/video files.

    The source lists files in parallel, prunes with ``pathGlobFilter``
    (pushed to the listing, not a post-filter), and yields
    (path, modificationTime, length, content) rows with one task per
    file split — no driver-side reads at any corpus size.  The numeric
    id is parsed from the filename; the media type from the extension.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    return raw.select(
        F.regexp_extract(F.col("path"), id_pattern, 1).cast("long").alias("doc_id"),
        F.concat(
            F.lit("application/"),
            F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1)),
        ).alias("media_type"),
        F.col("content").alias("payload"),
    )

def build_signature_index(
    corpus: DataFrame, sig_fn, path: str, sig_col: str
) -> None:
    """Materialize a corpus perceptual-signature index (id, <sig_col>)
    on disk — the multimodal sibling of ``dedup.build_minhash_index`` /
    ``build_containment_index``.  ``sig_fn`` is any Arrow-batched
    signature function returning (id, <sig_col>) — ``image_ahash``,
    ``audio_fingerprint``.  One long per corpus item: the cheapest
    corpus state of any ingest screen.  Feed the path to
    ``streaming.signature_screen_stream``; maintain with
    ``update_signature_index`` per accepted batch (the screen's
    ``self_screen=True`` mode does this inline)."""
    sig_fn(corpus).select("id", sig_col).write.mode("overwrite").parquet(path)


def update_signature_index(
    batch: DataFrame, sig_fn, path: str, sig_col: str
) -> None:
    """Append a screened/accepted batch's signatures to a persisted
    signature index — O(|batch|) decode + append, existing files
    untouched (the ``update_minhash_index`` pattern)."""
    sig_fn(batch).select("id", sig_col).write.mode("append").parquet(path)
