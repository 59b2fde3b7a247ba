"""Multimodal-column plumbing (SURVEY §2 #37-38): treat media as
opaque `binary` payloads with typed metadata, decode via Arrow-batched
`mapInPandas`.

The container has no image/audio libraries, so `decode_batch`'s
actual decoder is a clearly-marked deterministic STUB — but the
Spark-side plumbing is real and tested: binary column construction,
schema contract, partition-preserving mapInPandas, batch shapes.
Swapping `_fake_decode` for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODALITIES = ["image", "audio", "video"]

DECODE_SCHEMA = ("doc_id bigint, modality string, n_bytes int, "
                 "width int, height int, status string")


def with_payload(documents: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata columns.
    (Here the payload is the utf-8 text bytes — in production this is
    the raw media blob read from object storage.)"""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.element_at(F.array(*[F.lit(m) for m in MODALITIES]),
                     (F.col("doc_id") % len(MODALITIES) + 1).cast("int")).alias("modality"),
        F.col("source"),
    )


def multimodal_meta(documents: DataFrame) -> DataFrame:
    """Typed metadata extraction over binary payloads — pure JVM
    expressions, no decode needed (the common fast path at scale:
    filter/route on metadata before ever touching bytes)."""
    p = with_payload(documents)
    return p.select(
        "doc_id", "modality", "source",
        F.length(F.col("payload")).alias("n_bytes"),
        F.md5(F.col("payload").cast("string")).alias("content_md5"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """STUB decoder — deterministic fake in lieu of PIL/ffmpeg (not
    installed here). Returns (width, height, status)."""
    n = len(payload)
    return (n % 640) + 1, ((n * 7) % 480) + 1, "stub-decoded"


def decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: Arrow batches in, decoded metadata out.
    Real plumbing; stubbed decoder (see _fake_decode)."""
    for pdf in it:
        w, h, st = zip(*(_fake_decode(p) for p in pdf["payload"])) if len(pdf) else ((), (), ())
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "modality": pdf["modality"],
            "n_bytes": pdf["payload"].str.len().astype("int32"),
            "width": pd.Series(w, dtype="int32"),
            "height": pd.Series(h, dtype="int32"),
            "status": pd.Series(st, dtype="object"),
        })


def multimodal_decode(documents: DataFrame) -> DataFrame:
    """Decode pipeline: binary payloads → mapInPandas(stub decoder).
    Arrow-batched; partitioning preserved (no shuffle)."""
    # NO spread() here: the stub decode is arithmetic-cheap, so forking
    # 32 Python workers + per-worker package import costs more than the
    # work itself. A real PIL/ffmpeg decode IS CPU-bound — re-add
    # spread(documents) when swapping the stub for a real decoder.
    return with_payload(documents).mapInPandas(decode_batch, DECODE_SCHEMA)


RESIZE_SCHEMA = ("doc_id bigint, modality string, width int, height int, "
                 "target int, out_width int, out_height int, status string")


def resize_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body for image resize. Real plumbing (decoded dims
    in → scaled dims out, aspect preserved); pixel resample STUBBED
    (PIL not installed) — the arithmetic is the contract."""
    target = 256
    for pdf in it:
        w = pdf["width"].astype("int64")
        h = pdf["height"].astype("int64")
        m = pd.concat([w, h], axis=1).max(axis=1).clip(lower=1)
        out_w = (w * target // m).clip(lower=1)
        out_h = (h * target // m).clip(lower=1)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"], "modality": pdf["modality"],
            "width": pdf["width"], "height": pdf["height"],
            "target": pd.Series([target] * len(pdf), dtype="int32"),
            "out_width": out_w.astype("int32"),
            "out_height": out_h.astype("int32"),
            "status": pd.Series(["stub-resized"] * len(pdf), dtype="object"),
        })


def multimodal_resize(documents: DataFrame) -> DataFrame:
    """decode → resize chained mapInPandas stages (Arrow in between,
    no shuffle — the standard media-preprocess pipeline shape)."""
    return multimodal_decode(documents).mapInPandas(resize_batch, RESIZE_SCHEMA)


FRAME_INTERVAL = 7


def multimodal_frame_sample(documents: DataFrame) -> DataFrame:
    """Frame sampling for video rows: deterministic frame indices from
    the payload size (fake 'duration'), exploded one row per sampled
    frame — pure JVM plumbing (sequence + explode), oracle-checkable;
    only the per-frame decode (not included) would need Python."""
    p = multimodal_meta(documents).where(F.col("modality") == "video")
    n_frames = (F.col("n_bytes") % 120) + 1  # fake duration: 1-120 frames
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(FRAME_INTERVAL))
    return (p.select("doc_id", "n_bytes",
                     n_frames.alias("n_frames"),
                     F.explode(idx).alias("frame_idx")))
