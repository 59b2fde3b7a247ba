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

from real_time_fraud_detection_flink_kafka_spark.cache import tracked_persist

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


# --- perceptual near-dup (dHash) ---------------------------------------------
# The multimodal family's DEDUP rung: image-level near-duplicate
# detection via a difference hash (dHash — the aHash/pHash family's
# integer-exact member: no DCT, no floats), banded exactly like
# dedup_simhash. The container has no image codecs, so the "pixel
# grid" is the deterministic stub decoder's: the payload byte stream
# average-pooled into a PHASH_ROWS×PHASH_COLS grid (nearest production
# analog: grayscale downsample). Every step is integer arithmetic —
# ascii codes, floor-division pooling, bit packing — so the DuckDB
# oracle replays it exactly; swapping in a real decoder changes ONE
# expression (the cell-value source), not the banding or verify.

PHASH_ROWS = 6
PHASH_COLS = 11                      # 6×11 pooled cells
PHASH_CELLS = PHASH_ROWS * PHASH_COLS
PHASH_BITS = PHASH_ROWS * (PHASH_COLS - 1)   # 60 dHash bits
PHASH_BANDS = 4                      # 4×15-bit bands (simhash layout)
PHASH_HAMMING_MAX = 3                # pigeonhole-complete at 4 bands
PHASH_MIN_LEN = PHASH_CELLS          # ≥1 byte per pooled cell
PHASH_TWIN_MOD = 5                   # every 5th image doc gets a twin
PHASH_TWIN_OFFSET = 1 << 42          # distinct from DIFF_ADD_OFFSET
PHASH_DELTA_MOD = 7                  # every 7th image doc → the increment


def _phash_corpus(documents: DataFrame) -> DataFrame:
    """(doc_id, text): the image-modality docs long enough to pool
    (length ≥ PHASH_MIN_LEN — mirrored in the oracle, the winnow
    short-doc discipline), UNION a deterministic near-dup TWIN for
    every PHASH_TWIN_MOD-th of them (one mid-byte replaced — the
    corpus ships no image near-dups, so the fixture is what proves
    the operator finds them; the soft_dedup/pii_scrub injection
    pattern). One changed byte moves at most one pooled cell, which
    flips at most its two adjacent dHash comparisons — hamming ≤ 2,
    inside the banding guarantee."""
    img_idx = MODALITIES.index("image")
    base = (documents
            .where((F.col("doc_id") % len(MODALITIES) == img_idx)
                   & (F.length("text") >= PHASH_MIN_LEN))
            .select("doc_id", "text"))
    twin_text = F.expr(
        "concat(substring(text, 1, char_length(text) div 2 - 1), 'x', "
        "substring(text, char_length(text) div 2 + 1))")
    twins = (base.where(F.col("doc_id") % PHASH_TWIN_MOD == 0)
             .select((F.col("doc_id") + F.lit(PHASH_TWIN_OFFSET))
                     .alias("doc_id"),
                     twin_text.alias("text")))
    return base.unionByName(twins)


def image_phash_signatures(documents: DataFrame) -> DataFrame:
    """(doc_id, phash): the 60-bit dHash per image doc. Cell i pools
    byte positions [1 + i·L div 66, (i+1)·L div 66] (1-based,
    inclusive) as an integer mean; bit b compares row-adjacent cells
    (value rises left→right = 1). BOTH arrays are LET-BOUND (the
    dedup_winnow lesson): the per-character array `chs` =
    split(text, '') is materialized ONCE per row and pooled via O(1)
    element_at — the r13 shape pooled with ascii(substring(text, p,
    1)), an O(p) seek per byte that made per-doc cost superlinear in
    payload length (the r13 verdict's 'What's wrong #2') — and the
    66-cell array is bound once so the 120 element_at references in
    the bit pack don't re-run the pooling. Bit-identical to the r13
    expression (ascii of the p-th character either way; size(chs) ==
    char_length(text)); the oracle is unchanged. Row-local, zero
    shuffles — at 100 TB the signature stage is a pure map over the
    scan."""
    return _phash_corpus(documents).select(
        "doc_id", F.expr(phash_expr()).alias("phash"))


def phash_expr() -> str:
    """The dHash SQL expression over a `text` column (see
    `image_phash_signatures` for the shape and let-binding rationale)
    — factored out so the STREAMING intake can signature arriving
    rows with the identical expression without `_phash_corpus`'s
    batch-side twin union."""
    C, W = PHASH_CELLS, PHASH_COLS - 1
    cells = (
        f"transform(sequence(0, {C - 1}), i -> "
        f"aggregate(sequence(1 + (i * size(chs)) div {C}, "
        f"((i + 1) * size(chs)) div {C}), 0L, "
        f"(acc, p) -> acc + ascii(element_at(chs, cast(p as int)))) "
        f"div (((i + 1) * size(chs)) div {C} "
        f"- (i * size(chs)) div {C}))")
    return (
        f"transform(array(split(text, '')), chs -> "
        f"transform(array({cells}), cells -> "
        f"aggregate(sequence(0, {PHASH_BITS - 1}), 0L, (acc, b) -> "
        f"acc + if(element_at(cells, cast((b div {W}) * {PHASH_COLS} "
        f"+ (b % {W}) + 2 as int)) > element_at(cells, cast((b div {W}) "
        f"* {PHASH_COLS} + (b % {W}) + 1 as int)), "
        f"shiftleft(1L, b), 0L)))[0])[0]")


def dedup_image_phash(documents: DataFrame,
                      hamming_max: int = PHASH_HAMMING_MAX) -> DataFrame:
    """Perceptual image near-dup pairs: dHash hamming ≤ hamming_max,
    candidates from 4×15-bit band buckets — `dedup_simhash`'s banding
    applied to the multimodal payload column. Pigeonhole: ≤ 3
    differing bits touch ≤ 3 of the 4 bands, so every qualifying pair
    shares at least one full band — candidate generation is COMPLETE
    (banding-completeness pytest vs the quadratic contract).

    Scale shape: signatures are row-local; the pair stage is the
    banded equi-join on (band_idx, band_key) — candidates bounded by
    per-bucket occupancy, never all-pairs. Same 100-TB posture as
    dedup_simhash (the band key is the shuffle key; a pathological
    bucket is a data property the banding surfaces, not a plan
    choice) — and per-band occupancy is MEASURED by `phash_stats`
    (the ppjoin_stats discipline), so a low-entropy corpus shows up
    as a number before it shows up as a blown-out shuffle."""
    e = phash_band_rows(image_phash_signatures(documents))
    a, b = e.alias("a"), e.alias("b")
    cand = (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.col("a.phash").alias("ph_a"),
                    F.col("b.phash").alias("ph_b"))
            .distinct())
    hamming = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (cand.select("doc_a", "doc_b", hamming.alias("hamming"))
            .where(F.col("hamming") <= hamming_max))


def phash_stats(documents: DataFrame,
                hamming_max: int = PHASH_HAMMING_MAX) -> DataFrame:
    """`dedup_image_phash`'s band-occupancy audit — one row per
    15-bit band over the dHash signatures (same relation shape as
    `simhash_stats`; see dedup._hamming_band_stats for the columns
    and the 100 TB occupancy-growth argument). Value-oracled against
    a DuckDB replay of the signature + banding pipeline."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        _hamming_band_stats,
    )

    return _hamming_band_stats(image_phash_signatures(documents), "phash",
                               PHASH_BANDS, hamming_max)


def phash_band_rows(sig: DataFrame) -> DataFrame:
    """(doc_id, phash, band_idx, band_key) — one row per 15-bit band
    per signed image, the exploded relation both the self-join
    (`dedup_image_phash`) and the delta-vs-corpus intake join key on."""
    bands = F.array(*[
        F.struct(F.lit(j).alias("band_idx"),
                 F.shiftright(F.col("phash"), 15 * j)
                  .bitwiseAND((1 << 15) - 1).alias("band_key"))
        for j in range(PHASH_BANDS)])
    return (sig.select("doc_id", "phash", F.explode(bands).alias("b"))
            .select("doc_id", "phash",
                    F.col("b.band_idx").alias("band_idx"),
                    F.col("b.band_key").alias("band_key")))


def _phash_is_delta():
    """The increment predicate over SIGNED image ids: every
    PHASH_DELTA_MOD-th original image doc (twins — ids past
    PHASH_TWIN_OFFSET — always stay corpus-side, so the injected
    near-dups are things the increment can FIND, and multiples of
    lcm(PHASH_TWIN_MOD, PHASH_DELTA_MOD)·|MODALITIES| give the delta
    a guaranteed near-dup hit while the rest mix near/new)."""
    return ((F.col("doc_id") < PHASH_TWIN_OFFSET)
            & (F.expr(f"(doc_id div {len(MODALITIES)}) "
                      f"% {PHASH_DELTA_MOD}") == 0))


def dedup_phash_incremental(documents: DataFrame,
                            hamming_max: int = PHASH_HAMMING_MAX
                            ) -> DataFrame:
    """Perceptual dedup at INTAKE — `dedup_incremental`'s
    delta-vs-corpus shape for the image payload column: a new
    increment of images is judged against the existing corpus index,
    never corpus-vs-corpus. One row per delta image:
    (doc_id, status, n_same_hash, n_near) where n_same_hash = corpus
    images with the IDENTICAL 60-bit dHash, n_near = corpus images
    within hamming ≤ hamming_max (superset of same-hash), status =
    'same_hash' | 'near_dup' | 'new' by that priority.

    Scale shape (the asymmetric twin of `dedup_image_phash`): the
    corpus side collapses to its banded signature index — the
    relation a production pipeline persists between increments —
    and the delta's band rows probe it with one equi-join on
    (band_idx, band_key); candidate volume is O(delta × bands ×
    occupancy), never corpus². Pigeonhole completeness carries over
    unchanged (≤ hamming_max differing bits leave ≥ 1 of the 4 bands
    equal), so the banded probe finds every qualifying corpus image
    — the oracle is the quadratic delta×corpus contract, and parity
    IS the completeness proof. `phash_stats` measures the occupancy
    this probe inherits."""
    sig = tracked_persist(image_phash_signatures(documents))
    dsig = sig.where(_phash_is_delta())
    csig = sig.where(~_phash_is_delta())
    d, c = phash_band_rows(dsig).alias("d"), phash_band_rows(csig).alias("c")
    cand = (d.join(c, (F.col("d.band_idx") == F.col("c.band_idx"))
                   & (F.col("d.band_key") == F.col("c.band_key")))
            .select(F.col("d.doc_id").alias("doc_id"),
                    F.col("c.doc_id").alias("c_id"),
                    F.col("d.phash").alias("ph_d"),
                    F.col("c.phash").alias("ph_c"))
            .distinct())
    hamming = F.bit_count(F.col("ph_d").bitwiseXOR(F.col("ph_c")))
    hits = (cand.where(hamming <= hamming_max)
            .groupBy("doc_id")
            .agg(F.sum(F.when(F.col("ph_d") == F.col("ph_c"), 1)
                        .otherwise(0)).alias("n_same_hash"),
                 F.count(F.lit(1)).alias("n_near")))
    return (dsig.select("doc_id").join(hits, "doc_id", "left")
            .select("doc_id",
                    F.when(F.coalesce("n_same_hash", F.lit(0)) > 0,
                           F.lit("same_hash"))
                     .when(F.coalesce("n_near", F.lit(0)) > 0,
                           F.lit("near_dup"))
                     .otherwise(F.lit("new")).alias("status"),
                    F.coalesce("n_same_hash", F.lit(0)).cast("bigint")
                     .alias("n_same_hash"),
                    F.coalesce("n_near", F.lit(0)).cast("bigint")
                     .alias("n_near")))


# --- audio segmentation -------------------------------------------------
# The audio-modality twin of video's frame sampling: split each audio
# payload into overlapping fixed-length windows (the universal
# front-end for ASR/audio-embedding pipelines — 1 s windows, 50% hop).
# Like the rest of the family, the decode is a deterministic stub
# (sample rate and sample count derived from the byte length by
# integer arithmetic) while the Spark-side plumbing — modality
# routing, per-row window synthesis, explode — is the real contract.

AUDIO_RATES = (8000, 12000, 16000)   # stub decoder's sample rates
AUDIO_SAMPLES_PER_BYTE = 64          # stub duration: bytes × 64 samples


def multimodal_segment_audio(documents: DataFrame) -> DataFrame:
    """One row per (audio doc, window): seg_start/seg_len in samples,
    window = 1 s at the stub sample rate, hop = window/2 (50%
    overlap), the tail window truncated to the remaining samples —
    the segmentation an ASR/audio-embedding pipeline feeds its
    encoder. seg_idx runs 0..⌊(n_samples−1)/hop⌋ so every sample is
    covered by at least one window and no window starts at or past
    the end.

    Scale shape: row-local sequence+explode inside whole-stage
    codegen (exactly `multimodal_frame_sample`'s plan) — zero
    shuffles, output rows ≈ 2·seconds per doc. At 100 TB this is a
    pure flat-map over the scan."""
    p = multimodal_meta(documents).where(F.col("modality") == "audio")
    sr = F.element_at(
        F.array(*[F.lit(r) for r in AUDIO_RATES]),
        (F.col("n_bytes") % len(AUDIO_RATES) + 1).cast("int"))
    base = p.select(
        "doc_id", "n_bytes", sr.alias("sr"),
        (F.col("n_bytes").cast("long") * AUDIO_SAMPLES_PER_BYTE)
        .alias("n_samples"))
    # all AUDIO_RATES are even, so hop = sr div 2 is exact
    base = base.withColumn("hop", F.expr("sr div 2").cast("long"))
    seg = base.select(
        "doc_id", "n_bytes", "sr", "n_samples", "hop",
        F.explode(F.sequence(
            F.lit(0).cast("long"),
            F.expr("(n_samples - 1) div hop"))).alias("seg_idx"))
    return seg.select(
        "doc_id", "sr", "n_samples",
        F.col("seg_idx").cast("int").alias("seg_idx"),
        (F.col("seg_idx") * F.col("hop")).alias("seg_start"),
        F.least(F.col("sr").cast("long"),
                F.col("n_samples") - F.col("seg_idx") * F.col("hop"))
        .alias("seg_len"))
