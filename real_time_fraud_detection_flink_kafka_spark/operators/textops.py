"""Text-analysis operators over `documents` (SURVEY §2 #33-36):
language ID, quality scoring, token counting, fingerprinting. All
JVM-side expressions (split/regexp/higher-order folds) — no UDFs —
so they stream through whole-stage codegen at scale and mirror into
the DuckDB oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.functions.hashing import rolling_hash

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]

# tiny deterministic marker-token profiles; argmax with fixed
# tie-break order (list order). A real system ships char-ngram
# profiles — the *shape* (per-language score → argmax, all JVM-side)
# is what matters at scale.
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "and", "of"]),
    ("de", ["der", "die", "das", "und"]),
    ("es", ["el", "la", "los", "que"]),
    ("fr", ["le", "les", "des", "est"]),
    ("zh", ["de", "shi", "le", "bu"]),
]

BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _words(text):
    return F.split(F.trim(text), " ")


def token_count(documents: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens + chars per doc."""
    ws = _words(F.col("text"))
    return documents.select(
        "doc_id",
        F.size(ws).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic quality: length, stopword ratio, mean word length,
    uniqueness ratio — composed into one [0,1] score."""
    ws = _words(F.col("text"))
    n_words = F.size(ws)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, w)))
    n_uniq = F.size(F.array_distinct(ws))
    avg_wlen = (F.length(F.col("text")) - (n_words - 1)) / n_words  # chars sans separators
    stop_ratio = n_stop / n_words
    uniq_ratio = n_uniq / n_words
    score = (F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.3
             + (1 - stop_ratio) * 0.2
             + F.least(avg_wlen / F.lit(8.0), F.lit(1.0)) * 0.2
             + uniq_ratio * 0.3)
    return documents.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(avg_wlen, 6).alias("avg_word_len"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-token language ID with deterministic argmax."""
    ws = _words(F.col("text"))
    best_lang = F.lit(LANG_MARKERS[0][0])
    best_score = F.lit(-1)
    for lang, markers in LANG_MARKERS:
        arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(ws, lambda w: F.array_contains(arr, w)))
        # strict > keeps first-listed language on ties
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return documents.select(
        "doc_id", F.col("lang").alias("lang_declared"),
        best_lang.alias("lang_pred"), best_score.alias("marker_hits"))


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint over word tokens."""
    ws = _words(F.col("text"))
    return documents.select("doc_id", rolling_hash(ws).alias("fingerprint"))
