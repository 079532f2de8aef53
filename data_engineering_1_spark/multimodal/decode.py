"""Multimodal columns: opaque binary payloads + typed metadata, decoded /
feature-extracted / frame-sampled through Arrow-batched mapInPandas
(SURVEY.md §2.12 multimodal, [north-star] — no reference counterpart).

The image/audio/video codec libraries are NOT in this container, so every
``_decode_*`` leaf is stubbed: it tries the real library import and falls
back to a DETERMINISTIC FAKE derived from the payload bytes (md5-seeded),
clearly marked below. Everything around the leaf — schemas, Arrow batch
iteration, per-file fan-out, partitioning — is real Spark plumbing and is
what these operators actually test and ship.

Media table convention:
    media_id BIGINT, modality STRING ('image'|'audio'|'video'),
    content BINARY, meta MAP<STRING, STRING>

At 100 TB the content column dominates: scans must prune it unless the
stage truly decodes (Parquet column pruning does this for free when plans
select only metadata), and decode stages repartition by media_id so one
giant video does not serialize a partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURES_SCHEMA = (
    "media_id BIGINT, n_bytes INT, sha256 STRING, width INT, height INT, "
    "mean_luma DOUBLE, decoder STRING"
)
AUDIO_FEATURES_SCHEMA = (
    "media_id BIGINT, n_bytes INT, sha256 STRING, sample_rate INT, "
    "n_samples BIGINT, rms DOUBLE, decoder STRING"
)
FRAME_SCHEMA = (
    "media_id BIGINT, frame_idx INT, ts_ms BIGINT, frame_sha256 STRING, "
    "decoder STRING"
)


def _digest_ints(content: bytes, n: int) -> list[int]:
    """Deterministic pseudo-values from the payload (md5-chained)."""
    out: list[int] = []
    h = hashlib.md5(content).digest()
    while len(out) < n:
        out.extend(h)
        h = hashlib.md5(h).digest()
    return out[:n]


def _decode_image(content: bytes) -> tuple[int, int, float, str]:
    """(width, height, mean_luma, decoder). Tries PIL; otherwise the
    DETERMINISTIC FAKE: dimensions/luma derived from the content hash."""
    try:
        import io

        from PIL import Image  # type: ignore

        img = Image.open(io.BytesIO(content)).convert("L")
        pixels = list(img.getdata())
        return img.width, img.height, sum(pixels) / len(pixels), "pillow"
    except ImportError:
        a, b, c = _digest_ints(content, 3)
        return 16 + a * 4, 16 + b * 4, float(c), "fake-md5"


def _decode_audio(content: bytes) -> tuple[int, int, float, str]:
    """(sample_rate, n_samples, rms, decoder). Tries soundfile (real WAV/
    FLAC/OGG decode); otherwise the DETERMINISTIC FAKE from the content
    hash."""
    try:
        import io

        import numpy as np
        import soundfile  # type: ignore

        data, rate = soundfile.read(io.BytesIO(content), dtype="float64")
        mono = data if data.ndim == 1 else data.mean(axis=1)
        rms = float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0
        return int(rate), int(len(mono)), rms, "soundfile"
    except ImportError:
        a, b, c = _digest_ints(content, 3)
        rates = (8000, 16000, 22050, 44100)
        return rates[a % 4], len(content) * 8 + b, float(c) / 255.0, "fake-md5"


def image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract every image payload. mapInPandas so each
    Arrow batch decodes in one python call; non-image rows are filtered
    JVM-side BEFORE the python boundary (cheaper than shipping them)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content)
                w, h, luma, dec = _decode_image(data)
                rows.append(
                    (mid, len(data), hashlib.sha256(data).hexdigest(), w, h, luma, dec)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_bytes", "sha256", "width", "height",
                    "mean_luma", "decoder",
                ],
            )

    return (
        media.filter(F.col("modality") == "image")
        .select("media_id", "content")
        .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Audio twin of image_features (same plumbing, different leaf)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content)
                rate, n, rms, dec = _decode_audio(data)
                rows.append(
                    (mid, len(data), hashlib.sha256(data).hexdigest(), rate, n, rms, dec)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_bytes", "sha256", "sample_rate",
                    "n_samples", "rms", "decoder",
                ],
            )

    return (
        media.filter(F.col("modality") == "audio")
        .select("media_id", "content")
        .mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one video row fans out to one row per sampled
    frame (the UDTF shape). Frame count/duration come from the typed
    ``meta`` map (duration_ms); the frame decode itself is the
    DETERMINISTIC FAKE (hash-chain per frame index) — a real deployment
    swaps ``_frame_digest`` for an ffmpeg/pyav call, the fan-out plumbing
    is unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, dur in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                data = bytes(content)
                duration = int(dur)
                for idx, ts in enumerate(range(0, duration, every_ms)):
                    digest = hashlib.sha256(
                        data + idx.to_bytes(4, "big")
                    ).hexdigest()
                    rows.append((mid, idx, ts, digest, "fake-md5"))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "ts_ms", "frame_sha256", "decoder"],
            )

    return (
        media.filter(F.col("modality") == "video")
        .select(
            "media_id",
            "content",
            F.coalesce(F.element_at("meta", "duration_ms"), F.lit("0"))
            .cast("bigint")
            .alias("duration_ms"),
        )
        .mapInPandas(run, schema=FRAME_SCHEMA)
    )


RESIZED_SCHEMA = (
    "media_id BIGINT, target_w INT, target_h INT, resized BINARY, "
    "resized_sha256 STRING, decoder STRING"
)


def _resize_image(content: bytes, target_w: int, target_h: int):
    """(resized_bytes, decoder). Tries PIL (real decode->resize->PNG);
    otherwise the DETERMINISTIC FAKE: an md5-chained byte stream of
    exactly target_w*target_h bytes — stable across processes, so the
    Spark-side plumbing (binary column in/out, batch shapes, hashes)
    is fully testable without codecs.

    Per-row degradation contract: with Pillow installed, a corrupt or
    non-decodable payload (UnidentifiedImageError, truncated file OSError,
    etc.) must NOT fail the whole Spark task — it degrades to the fake
    bytes for that row only, tagged ``decode-error:<ExcName>`` so a
    pipeline can quarantine those rows (same malformed-record discipline
    as the PERMISSIVE ingestion modes)."""
    fake = lambda: bytes(_digest_ints(content, target_w * target_h))  # noqa: E731
    try:
        from PIL import Image  # type: ignore
    except ImportError:
        return fake(), "fake-md5"
    try:
        import io

        img = Image.open(io.BytesIO(content))
        out = io.BytesIO()
        img.resize((target_w, target_h)).save(out, format="PNG")
        return out.getvalue(), "pillow"
    except (OSError, ValueError) as exc:
        # Payload-shaped failures only (UnidentifiedImageError and
        # truncated-file errors are OSError subclasses;
        # DecompressionBombError is a ValueError subclass): degrade
        # per-row, never per-task. Programming errors (TypeError etc.)
        # propagate — they are bugs, not bad data (ADVICE r5).
        return fake(), f"decode-error:{type(exc).__name__}"


def resize_images(
    media: DataFrame, target_w: int = 32, target_h: int = 32
) -> DataFrame:
    """Resize every image payload to (target_w, target_h) — the
    batch-preprocessing step a vision training pipeline runs before
    packing examples. Same discipline as the other multimodal ops:
    non-image rows filtered JVM-side, Arrow-batched mapInPandas, binary
    in -> binary out, real-codec leg auto-activates when PIL exists."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content)
                resized, dec = _resize_image(data, target_w, target_h)
                rows.append(
                    (
                        mid,
                        target_w,
                        target_h,
                        resized,
                        hashlib.sha256(resized).hexdigest(),
                        dec,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "target_w", "target_h", "resized",
                    "resized_sha256", "decoder",
                ],
            )

    return (
        media.filter(F.col("modality") == "image")
        .select("media_id", "content")
        .mapInPandas(run, schema=RESIZED_SCHEMA)
    )
