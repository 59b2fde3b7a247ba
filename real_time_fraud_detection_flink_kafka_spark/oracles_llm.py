"""DuckDB oracles for the LLM-data-pipeline operators (dedup,
similarity, text analysis). Hashes mirror functions/hashing.py's
md5-based portable scheme exactly; see that module."""

from __future__ import annotations

from real_time_fraud_detection_flink_kafka_spark.functions.hashing import (
    N_PERM,
    P,
    PERMS,
    md5_int60_sql,
    rolling_hash_sql,
)
from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
    CONTAIN_THRESHOLD as _CONTAIN_T,
    DELTA_MOD,
    _pp_rational,
    HAMMING_MAX,
    JACCARD_THRESHOLD,
    PARA_ENC,
    PARA_W,
    SHINGLE_N,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    SUBSTR_K,
    WINNOW_K,
    WINNOW_MIN_SHARED,
    WINNOW_W,
)
from real_time_fraud_detection_flink_kafka_spark.operators.multimodal import MODALITIES
from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
    BITS_PER_TABLE,
    BRUTE_MAX_ID,
    DIM,
    COS_THRESHOLD,
    HIER_CELLS_MIN,
    HYPERPLANES,
    IVF_DIV,
    IVF_K,
    LSH_BASE_N,
    MAX_BITS,
    N_QUERIES,
    N_TABLES,
    NPROBE,
    RECALL_BAND_EDGES,
    TOP_K,
    WIDE_BITS,
)
from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
    BPE_PATTERN,
    ENTROPY_SCALE,
    LANG_MARKERS,
    STOPWORDS,
)

# candidate-side rationals in lockstep with the Spark plan: the SAME
# half-ulp-relaxed tau (_pp_rational) drives prefix length, size
# filter and positional bound in BOTH engines
_pp_n, _pp_d = _pp_rational(JACCARD_THRESHOLD)
_pp_d_less1 = _pp_d - 1
_pp_nd = _pp_n + _pp_d
# containment join's rational (same relaxation, its own tau)
_ct_n, _ct_d = _pp_rational(_CONTAIN_T)

# simhash signature CTE chain — sig(doc_id, simhash) — shared by the
# dedup_simhash pair oracle and the simhash_stats occupancy audit
_SIMHASH_SIG_CTES = f"""toks AS (
  SELECT doc_id, tok, count(*) AS tf, {md5_int60_sql('tok')} AS h
  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok
),
bits AS (
  SELECT doc_id, b.bit, h, tf
  FROM toks, (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS bit) b
),
per_bit AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (h >> bit) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM bits GROUP BY 1, 2
),
sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
  FROM per_bit GROUP BY 1
)"""


def _band_stats_sql(sig_ctes: str, sig_col: str, n_bands: int,
                    hamming_max: int) -> str:
    """simhash_stats / phash_stats oracle: per-band bucket occupancy
    (n_buckets, max_occ, band_cand_pairs = Σ C(occ,2) before the
    cross-band distinct) + global candidate/verified counts over a
    CTE chain ending in sig(doc_id, {sig_col}) — mirrors
    operators/dedup._hamming_band_stats column for column."""
    return f"""WITH {sig_ctes},
bands AS (
  SELECT doc_id, {sig_col} AS s, j AS band_idx,
         ({sig_col} >> (15 * j)) & 32767 AS band_key
  FROM sig, (SELECT unnest(generate_series(0, {n_bands - 1})) AS j) t
),
occ AS (
  SELECT band_idx, band_key, count(*) AS occ FROM bands GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.s AS s_a, b.s AS s_b
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
)
SELECT CAST(band_idx AS INTEGER) AS band_idx,
       CAST((SELECT count(*) FROM sig) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(max(occ) AS INTEGER) AS max_occ,
       CAST(sum(occ * (occ - 1) // 2) AS BIGINT) AS band_cand_pairs,
       CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT count(*) FROM cand
             WHERE bit_count(xor(s_a, s_b)) <= {hamming_max}) AS BIGINT)
         AS n_verified
FROM occ GROUP BY band_idx"""

_SHINGLE_CTE = f"""w AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
),
ex AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - {SHINGLE_N - 1})) AS i FROM w
),
sh AS (
  SELECT DISTINCT doc_id,
         ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS shingle
  FROM ex
)"""

_JACCARD_SQL = f"""WITH {_SHINGLE_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE round(CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common), 6) >= {JACCARD_THRESHOLD}"""


# Incremental dedup: near-dup counts computed by EXACT delta×corpus
# Jaccard — the oracle for the LSH-bucketed asymmetric path (same
# band-curve-completeness argument as dedup_minhash_lsh).
_INCREMENTAL_SQL = f"""WITH delta AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {DELTA_MOD} = 0
),
corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {DELTA_MOD} <> 0
),
exact AS (
  SELECT d.doc_id, count(*) AS n_exact
  FROM delta d JOIN corpus c ON md5(d.text) = md5(c.text)
  GROUP BY 1
),
{_SHINGLE_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS d_id, b.doc_id AS c_id, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id % {DELTA_MOD} = 0 AND b.doc_id % {DELTA_MOD} <> 0
  GROUP BY 1, 2
),
near AS (
  SELECT d_id AS doc_id, count(*) AS n_near
  FROM common
  JOIN sizes na ON na.doc_id = d_id
  JOIN sizes nb ON nb.doc_id = c_id
  WHERE round(CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common), 6)
        >= {JACCARD_THRESHOLD}
  GROUP BY 1
)
SELECT d.doc_id,
       CASE WHEN coalesce(e.n_exact, 0) > 0 THEN 'exact_dup'
            WHEN coalesce(n.n_near, 0) > 0 THEN 'near_dup'
            ELSE 'new' END AS status,
       coalesce(e.n_exact, 0) AS n_exact,
       coalesce(n.n_near, 0) AS n_near
FROM delta d
LEFT JOIN exact e ON e.doc_id = d.doc_id
LEFT JOIN near n ON n.doc_id = d.doc_id"""


def _substring_ctes(src: str = "documents", k: int | None = None) -> str:
    """CTE chain for the Lee et al. exact-substring pipeline over the
    relation `src` (prefixed sub_* so it composes into other chains,
    e.g. the intake funnel's stage-6 cut over d5): positional
    k-shingle md5 hashes → corpus-wide count ≥ 2 → islands → maximal
    spans in sub_spans. Mirrors dedup.dedup_substring exactly."""
    if k is None:
        k = SUBSTR_K
    return f"""sub_w AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM {src}
), sub_ph AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(ws) - {k} + 1),
            p -> {md5_int60_sql(
                f"array_to_string(array_slice(ws, p, p + {k} - 1), ' ')")})
           AS hs
  FROM sub_w WHERE len(ws) >= {k}
), sub_e AS (
  SELECT doc_id, CAST(u.p AS BIGINT) AS p, hs[u.p] AS h
  FROM sub_ph, unnest(generate_series(1, len(hs))) u(p)
), sub_dup AS (
  SELECT doc_id, p FROM (
    SELECT doc_id, p, count(*) OVER (PARTITION BY h) AS cnt FROM sub_e
  ) WHERE cnt >= 2
), sub_isl AS (
  SELECT doc_id, p,
         p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS run
  FROM sub_dup
), sub_spans AS (
  SELECT doc_id, min(p) AS span_start,
         count(*) + {k} - 1 AS span_len
  FROM sub_isl GROUP BY doc_id, run
)"""


def _bigram_lm_sql(src: str = "documents") -> str:
    """Mirror of pipeline.bigram_lm_score over `src`: Laplace-smoothed
    bigram probabilities over exact integer counts, fixed-point
    per-doc sums (round(p*1e9) bigints) so agg order is irrelevant."""
    return f"""
WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM {src}),
ex AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM w),
pr AS (SELECT doc_id, ws[i] AS a, ws[i + 1] AS b FROM ex),
unic AS (
  SELECT a, count(*) AS cnt_a
  FROM (SELECT unnest(ws) AS a FROM w) GROUP BY 1
),
vv AS (SELECT count(*) AS v FROM unic),
big AS (SELECT a, b, count(*) AS cnt_ab FROM pr GROUP BY 1, 2),
j AS (
  SELECT doc_id,
         CAST(round(CAST(cnt_ab + 1 AS DOUBLE) / CAST(cnt_a + v AS DOUBLE)
                    * 1000000000) AS BIGINT) AS pf
  FROM pr JOIN big USING (a, b) JOIN unic USING (a) CROSS JOIN vv
)
SELECT doc_id, count(*) AS n_bigrams,
       round(sum(pf) / 1000000000.0 / count(*), 6) AS avg_bigram_p
FROM j GROUP BY 1"""


def _trigram_lm_sql(src: str = "documents") -> str:
    """Mirror of pipeline.trigram_lm_score over `src`: model trained
    on the even-doc_id half, Laplace trigram probability for seen
    trigrams, stupid backoff λ=2/5 (bigint multiply + floor div on
    the fixed-point bigram probability) for unseen ones."""
    return f"""
WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM {src}),
ex AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM w),
tg AS (SELECT doc_id, ws[i] AS a, ws[i + 1] AS b, ws[i + 2] AS c FROM ex),
tw AS (SELECT * FROM w WHERE doc_id % 2 = 0),
tex AS (SELECT ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM tw),
tric AS (
  SELECT a, b, c, count(*) AS cnt_abc FROM (
    SELECT ws[i] AS a, ws[i + 1] AS b, ws[i + 2] AS c FROM tex)
  GROUP BY 1, 2, 3
),
bex AS (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM tw),
bigc AS (
  SELECT a, b, count(*) AS cnt_ab FROM (
    SELECT ws[i] AS a, ws[i + 1] AS b FROM bex)
  GROUP BY 1, 2
),
unic AS (
  SELECT a, count(*) AS cnt_a
  FROM (SELECT unnest(ws) AS a FROM tw) GROUP BY 1
),
vv AS (SELECT count(*) AS v FROM unic),
j AS (
  SELECT tg.doc_id, (t.cnt_abc IS NULL) AS backoff,
         CASE WHEN t.cnt_abc IS NOT NULL
              THEN CAST(round(CAST(t.cnt_abc + 1 AS DOUBLE)
                        / CAST(cb.cnt_ab + v AS DOUBLE)
                        * 1000000000) AS BIGINT)
              ELSE (CAST(round(CAST(coalesce(bb.cnt_bc, 0) + 1 AS DOUBLE)
                        / CAST(coalesce(u.cnt_b, 0) + v AS DOUBLE)
                        * 1000000000) AS BIGINT) * 2) // 5
         END AS pf
  FROM tg
  LEFT JOIN tric t USING (a, b, c)
  LEFT JOIN bigc cb USING (a, b)
  LEFT JOIN (SELECT a AS b, b AS c, cnt_ab AS cnt_bc FROM bigc) bb USING (b, c)
  LEFT JOIN (SELECT a AS b, cnt_a AS cnt_b FROM unic) u USING (b)
  CROSS JOIN vv
)
SELECT doc_id, count(*) AS n_trigrams,
       sum(CASE WHEN backoff THEN 1 ELSE 0 END) AS n_backoff,
       round(sum(pf) / 1000000000.0 / count(*), 6) AS avg_trigram_p
FROM j GROUP BY 1"""


def _bigram_lm_split_sql(src: str) -> str:
    """Mirror of pipeline._bigram_lm_score_split over `src`: model
    counts from the even-doc_id half only (fixture ids are odd, so
    the model never sees a fixture), LEFT joins with Laplace
    zero-coalesce so off-model docs keep every bigram row."""
    return f"""
WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM {src}),
tw AS (SELECT * FROM w WHERE doc_id % 2 = 0),
ex AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM w),
pr AS (SELECT doc_id, ws[i] AS a, ws[i + 1] AS b FROM ex),
unic AS (
  SELECT a, count(*) AS cnt_a
  FROM (SELECT unnest(ws) AS a FROM tw) GROUP BY 1
),
vv AS (SELECT count(*) AS v FROM unic),
big AS (
  SELECT a, b, count(*) AS cnt_ab FROM (
    SELECT ws[i] AS a, ws[i + 1] AS b
    FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM tw))
  GROUP BY 1, 2
),
j AS (
  SELECT doc_id,
         CAST(round(CAST(coalesce(cnt_ab, 0) + 1 AS DOUBLE)
                    / CAST(coalesce(cnt_a, 0) + v AS DOUBLE)
                    * 1000000000) AS BIGINT) AS pf
  FROM pr LEFT JOIN big USING (a, b) LEFT JOIN unic USING (a) CROSS JOIN vv
)
SELECT doc_id, count(*) AS n_bigrams,
       round(sum(pf) / 1000000000.0 / count(*), 6) AS avg_bigram_p
FROM j GROUP BY 1"""


def _lm_lift_sql() -> str:
    """Mirror of pipeline.lm_quality_lift: fixture injection (first
    LM_FIX_N train-half docs verbatim at id%4==1, word-reversed at
    id%4==3), both scorers over the union population (their full SQL
    embedded as derived tables over `docsrc` — outer CTEs are in
    scope for nested WITH; the bigram side is the SPLIT-trained
    variant so neither model ever sees a fixture), then per-scorer
    pairwise accuracy and offset rank gap, all floor-divs over
    non-negative integers."""
    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        LM_FIX_N,
        LM_FIX_OFF,
    )

    def metrics(p: str, scored: str) -> str:
        return f"""
{p}fix AS (
  SELECT doc_id AS fid, score AS fs FROM {scored}
  WHERE doc_id >= {LM_FIX_OFF}
),
{p}rnk AS (
  SELECT f.fid, f.fs, count(s.doc_id) AS rnk
  FROM {p}fix f LEFT JOIN {scored} s
    ON s.score < f.fs OR (s.score = f.fs AND s.doc_id < f.fid)
  GROUP BY 1, 2
),
{p}np AS (SELECT count(*) AS n_pop FROM {scored}),
{p}sums AS (
  SELECT sum(CASE WHEN fid % 4 = 1 THEN rnk END) AS sum_rf,
         sum(CASE WHEN fid % 4 = 3 THEN rnk END) AS sum_rg,
         sum(CASE WHEN fid % 4 = 1 THEN 1 ELSE 0 END) AS n_f,
         sum(CASE WHEN fid % 4 = 3 THEN 1 ELSE 0 END) AS n_g
  FROM {p}rnk
),
{p}pairs AS (
  SELECT count(*) AS n_pairs,
         sum(CASE WHEN a.fs > b.fs THEN 1 ELSE 0 END) AS correct_pairs
  FROM {p}rnk a JOIN {p}rnk b ON a.fid % 4 = 1 AND b.fid % 4 = 3
)"""

    def row(name: str, p: str) -> str:
        return f"""
SELECT '{name}' AS scorer,
       CAST(np.n_pop AS INTEGER) AS n_pop,
       CAST(s.n_f AS INTEGER) AS n_fluent,
       CAST(s.n_g AS INTEGER) AS n_garbled,
       CAST(pr.n_pairs AS INTEGER) AS n_pairs,
       CAST(pr.correct_pairs AS INTEGER) AS correct_pairs,
       CAST(pr.correct_pairs * 1000000 // pr.n_pairs AS BIGINT) AS acc_ppm,
       CAST(((s.sum_rf * s.n_g - s.sum_rg * s.n_f)
             + s.n_f * s.n_g * np.n_pop) * 1000000
            // (s.n_f * s.n_g * np.n_pop) AS BIGINT)
         AS rank_gap_offset_ppm
FROM {p}pairs pr CROSS JOIN {p}sums s CROSS JOIN {p}np np"""

    return (f"""
WITH fixbase AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
  ORDER BY doc_id LIMIT {LM_FIX_N}
),
docsrc AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT {LM_FIX_OFF} + doc_id * 4 + 1 AS doc_id, text FROM fixbase
  UNION ALL
  SELECT {LM_FIX_OFF} + doc_id * 4 + 3 AS doc_id,
         array_to_string(list_reverse(string_split(trim(text), ' ')), ' ')
           AS text
  FROM fixbase
),
bsc AS (
  SELECT doc_id, avg_bigram_p AS score
  FROM ({_bigram_lm_split_sql('docsrc')}) q
),
tsc AS (
  SELECT doc_id, avg_trigram_p AS score
  FROM ({_trigram_lm_sql('docsrc')}) q
),"""
            + metrics("b", "bsc") + "," + metrics("t", "tsc")
            + row("bigram", "b") + "\nUNION ALL" + row("trigram", "t"))


def llm_oracles() -> dict[str, str]:
    return {
        "dedup_incremental": _INCREMENTAL_SQL,
        "dedup_exact": """
SELECT min(doc_id) AS canonical_doc_id, count(*) AS n_copies,
       md5(text) AS text_md5
FROM documents GROUP BY md5(text)""",
        # mirrors dedup.soft_dedup_weights: 1/n_copies as an exact
        # ppm floor division, every copy keeps a row
        "soft_dedup_weights": """
WITH grp AS (
  SELECT md5(text) AS text_md5, count(*) AS n_copies
  FROM documents GROUP BY 1
)
SELECT doc_id, text_md5, n_copies,
       CAST(1000000 // n_copies AS BIGINT) AS weight_ppm
FROM (SELECT doc_id, md5(text) AS text_md5 FROM documents) d
JOIN grp USING (text_md5)""",
        # mirrors dedup.dedup_paragraph: same block slicing, integer
        # keeper election, block-ordered clean-text re-join
        "dedup_paragraph": f"""
WITH docs AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
),
blocks AS (
  SELECT doc_id, i AS bidx,
         array_to_string(list_slice(ws, i*{PARA_W}+1, i*{PARA_W}+{PARA_W}), ' ') AS block,
         len(list_slice(ws, i*{PARA_W}+1, i*{PARA_W}+{PARA_W})) AS n_tok
  FROM docs, unnest(range((len(ws)+{PARA_W}-1)//{PARA_W})) AS t(i)
),
hb AS (SELECT *, md5(block) AS h FROM blocks),
keep AS (SELECT h, min(doc_id*{PARA_ENC}+bidx) AS keep_key FROM hb GROUP BY h),
j AS (
  SELECT hb.*, (doc_id*{PARA_ENC}+bidx <> keep_key) AS is_dup
  FROM hb JOIN keep USING (h)
)
SELECT doc_id, CAST(count(*) AS INTEGER) AS n_blocks,
       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS INTEGER) AS n_dup_blocks,
       CAST(sum(n_tok) AS INTEGER) AS n_tokens_before,
       CAST(sum(CASE WHEN is_dup THEN 0 ELSE n_tok END) AS INTEGER) AS n_tokens_after,
       md5(coalesce(string_agg(block, ' ' ORDER BY bidx)
                    FILTER (WHERE NOT is_dup), '')) AS clean_md5
FROM j GROUP BY doc_id""",
        "dedup_ngram_jaccard": _JACCARD_SQL,
        # mirrors dedup.ppjoin_stats (r10 canonicalize-first): clique
        # stats over distinct shingle sets, prefix construction
        # ((df, hash) order, integer prefix length) over one
        # representative per set, verified = the clique-expanded
        # exact-Jaccard output (shared with dedup_ngram_jaccard).
        # num/den come from the SAME relaxed rational as the Spark
        # side (_pp_rational: half-ulp under tau so the rounded
        # verify keeps completeness) — never hard-code 4/5 here
        "ppjoin_stats": f"""
WITH {_SHINGLE_CTE},
shh AS (
  SELECT doc_id, {md5_int60_sql('shingle')} AS sh_h FROM sh
),
hs AS (
  SELECT doc_id, list_sort(list(sh_h)) AS hset FROM shh GROUP BY 1
),
grp AS (
  SELECT hset, min(doc_id) AS rep, count(*) AS m FROM hs GROUP BY hset
),
rsh AS (
  SELECT rep AS doc_id, len(hset) AS n_sh, unnest(hset) AS sh_h FROM grp
),
dfr AS (SELECT sh_h, count(*) AS df FROM rsh GROUP BY 1),
pre AS (
  SELECT doc_id, sh_h, n_sh, rn FROM (
    SELECT r.doc_id, r.sh_h, r.n_sh, d.df,
           row_number() OVER (PARTITION BY r.doc_id
             ORDER BY d.df, r.sh_h) AS rn
    FROM rsh r JOIN dfr d USING (sh_h))
  WHERE rn <= least(n_sh,
                    n_sh - (({_pp_n} * n_sh + {_pp_d_less1}) // {_pp_d}) + 2)
),
cand AS (
  SELECT doc_a, doc_b, n_a, n_b
  FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.n_sh AS n_a, b.n_sh AS n_b,
           min(a.rn) AS i1, min(b.rn) AS j1, count(*) AS ov
    FROM pre a JOIN pre b ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
    WHERE {_pp_d} * least(a.n_sh, b.n_sh) >= {_pp_n} * greatest(a.n_sh, b.n_sh)
    GROUP BY 1, 2, 3, 4)
  WHERE {_pp_nd} * (1 + least(n_a - i1, n_b - j1)) >= {_pp_n} * (n_a + n_b)
    AND ov >= least(2, ({_pp_n} * (n_a + n_b) + {_pp_nd} - 1) // {_pp_nd})
),
vreps AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN grp ga ON ga.rep = c.doc_a JOIN grp gb ON gb.rep = c.doc_b
  WHERE round(len(list_intersect(ga.hset, gb.hset))
              / (c.n_a + c.n_b - len(list_intersect(ga.hset, gb.hset))),
              6) >= {JACCARD_THRESHOLD!r}
),
ver AS (SELECT count(*) AS n_verified FROM ({_JACCARD_SQL}) q)
SELECT CAST((SELECT sum(m) FROM grp) AS BIGINT) AS n_sets,
       CAST((SELECT count(*) FROM grp) AS INTEGER) AS n_distinct_sets,
       CAST((SELECT max(m) FROM grp) AS INTEGER) AS max_clique,
       CAST((SELECT sum(m * (m - 1) // 2) FROM grp) AS BIGINT)
         AS clique_pairs,
       CAST((SELECT count(*) FROM rsh) AS BIGINT) AS n_token_rows,
       CAST((SELECT count(*) FROM pre) AS BIGINT) AS n_prefix_rows,
       CAST((SELECT count(*) FROM pre) * 1000000
            // (SELECT count(*) FROM rsh) AS BIGINT) AS prefix_ppm,
       CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT count(*) FROM vreps) AS BIGINT) AS n_verified_reps,
       CAST((SELECT n_verified FROM ver) AS BIGINT) AS n_verified""",
        # verified-LSH output == exact output at this data's dup
        # profile (r=2/b=8 band curve; see operators/dedup.py docs)
        "dedup_minhash_lsh": _JACCARD_SQL,
        "simhash_stats": _band_stats_sql(_SIMHASH_SIG_CTES, "simhash",
                                         SIMHASH_BANDS, HAMMING_MAX),
        # mirrors dedup.minhash_band_stats: full minhash replay (md5
        # collapse → distinct 3-gram shingles → 60-bit md5 bases →
        # the SAME LCG (a·h+b) mod P permutation constants baked in →
        # per-band fused m_{2j}·P + m_{2j+1} keys, the all-P sentinel
        # for sub-shingle-length docs included), then the identical
        # occupancy/candidate/verified accounting as the hamming
        # audits. Verified = candidate rep pairs at exact Jaccard ≥
        # threshold over the 60-bit shingle-hash sets (empty-set docs
        # have no hset row, matching Spark's null-Jaccard drop).
        "minhash_band_stats": f"""
WITH rep AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
w AS (
  SELECT d.doc_id, string_split(trim(d.text), ' ') AS ws
  FROM documents d JOIN rep USING (doc_id)
),
ex AS (
  SELECT doc_id, ws,
         unnest(generate_series(1, len(ws) - {SHINGLE_N - 1})) AS i
  FROM w
),
sh AS (
  SELECT DISTINCT doc_id,
         ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS shingle
  FROM ex
),
shh AS (
  SELECT doc_id, {md5_int60_sql('shingle')} AS h,
         {md5_int60_sql('shingle')} % {P} AS base
  FROM sh
),
perms(i, a, b) AS (VALUES {", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(PERMS))}),
mins AS (
  SELECT s.doc_id, p.i, min((p.a * s.base + p.b) % {P}) AS mv
  FROM shh s CROSS JOIN perms p GROUP BY 1, 2
),
sigm AS (
  SELECT r.doc_id, p.i, coalesce(m.mv, {P}) AS mv
  FROM rep r CROSS JOIN perms p
  LEFT JOIN mins m ON m.doc_id = r.doc_id AND m.i = p.i
),
bands AS (
  SELECT e.doc_id, CAST(e.i // 2 AS INTEGER) AS band_idx,
         e.mv * {P} + o.mv AS band_key
  FROM sigm e JOIN sigm o ON o.doc_id = e.doc_id AND o.i = e.i + 1
  WHERE e.i % 2 = 0
),
occ AS (
  SELECT band_idx, band_key, count(*) AS occ FROM bands GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
),
hs AS (SELECT doc_id, list(DISTINCT h) AS hset FROM shh GROUP BY 1),
ver AS (
  SELECT count(*) AS n_verified_reps
  FROM cand c
  JOIN hs a ON a.doc_id = c.doc_a
  JOIN hs b ON b.doc_id = c.doc_b
  WHERE round(CAST(len(list_intersect(a.hset, b.hset)) AS DOUBLE)
              / (len(a.hset) + len(b.hset)
                 - len(list_intersect(a.hset, b.hset))), 6)
        >= {JACCARD_THRESHOLD}
)
SELECT CAST(band_idx AS INTEGER) AS band_idx,
       CAST((SELECT count(*) FROM rep) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(max(occ) AS INTEGER) AS max_occ,
       CAST(sum(occ * (occ - 1) // 2) AS BIGINT) AS band_cand_pairs,
       CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT n_verified_reps FROM ver) AS BIGINT)
         AS n_verified_reps
FROM occ GROUP BY band_idx""",
        "dedup_simhash": f"""
WITH {_SIMHASH_SIG_CTES},
bands AS (
  SELECT doc_id, simhash, j AS band_idx, (simhash >> (15 * j)) & 32767 AS band_key
  FROM sig, (SELECT unnest(generate_series(0, {SIMHASH_BANDS - 1})) AS j) t
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS sh_a, b.simhash AS sh_b
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {HAMMING_MAX}""",
        # transitive closure over the same verified pairs, min
        # reachable id per node — mirrors dedup_clusters' label
        # propagation fixpoint
        # exact-substring spans (Lee et al. 2022) — positional
        # k-shingle hashes, count >= 2 marks duplicated positions,
        # p - row_number() islands recover maximal spans; mirrors
        # dedup.dedup_substring exactly (same md5 hashes, same runs)
        "dedup_substring": f"""
WITH {_substring_ctes()}
SELECT doc_id, span_start, span_len FROM sub_spans""",
        # delta-position duplication (corpus-index hit OR >=2 within
        # delta) == total-count >= 2 restricted to delta docs, so the
        # incremental twin shares the full-corpus chain filtered
        "dedup_substring_incremental": f"""
WITH {_substring_ctes()}
SELECT doc_id, span_start, span_len FROM sub_spans
WHERE doc_id % {DELTA_MOD} = 0""",
        # span REMOVAL (the second half of the Lee et al. pipeline):
        # replays the cut arithmetic — every token covered by >= 1
        # span is dropped, counts + cleaned text re-emitted
        "apply_span_removal": f"""
WITH {_substring_ctes()},
sub_toks AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS i, ws[u.i] AS tok
  FROM sub_w, unnest(generate_series(1, len(ws))) u(i)
),
sub_kept AS (
  SELECT t.doc_id, t.i, t.tok FROM sub_toks t
  WHERE NOT EXISTS (SELECT 1 FROM sub_spans s
                    WHERE s.doc_id = t.doc_id
                      AND t.i >= s.span_start
                      AND t.i < s.span_start + s.span_len)
)
SELECT w.doc_id,
       CAST(len(w.ws) AS BIGINT) AS n_tokens_before,
       CAST(count(k.i) AS BIGINT) AS n_tokens_after,
       coalesce(string_agg(k.tok, ' ' ORDER BY k.i), '') AS text_clean
FROM sub_w w LEFT JOIN sub_kept k ON k.doc_id = w.doc_id
GROUP BY 1, len(w.ws)""",
        # winnowing fingerprints (Schleimer et al.) — k-gram hashes,
        # per-window minima, pairs on shared selected hashes; mirrors
        # dedup.dedup_winnow exactly (same guards, same md5 hashing)
        "dedup_winnow": f"""
WITH w0 AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
), g AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(ws) - {WINNOW_K} + 1),
            i -> {md5_int60_sql(
                f"array_to_string(array_slice(ws, i, i + {WINNOW_K} - 1), ' ')")})
           AS grams
  FROM w0 WHERE len(ws) >= {WINNOW_K}
), sel AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(grams) >= {WINNOW_W} THEN
            list_transform(generate_series(1, len(grams) - {WINNOW_W} + 1),
               j -> list_min(array_slice(grams, j, j + {WINNOW_W} - 1)))
            ELSE grams END) AS sels
  FROM g
), e AS (SELECT doc_id, unnest(sels) AS h FROM sel)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {WINNOW_MIN_SHARED}""",
        "dedup_clusters": f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_JACCARD_SQL}) q
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(id, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
),
labels AS (SELECT id, min(r) AS canonical FROM reach GROUP BY 1),
sizes AS (SELECT canonical, count(*) AS cluster_size FROM labels GROUP BY 1)
SELECT l.id AS doc_id, l.canonical AS canonical_id, s.cluster_size
FROM labels l JOIN sizes s ON s.canonical = l.canonical""",
        **_similarity_oracles(),
        **_retrieval_oracles(),
        **_pq_oracles(),
        **_sq_oracles(),
        **_jl_oracles(),
        **_mrl_oracles(),
        **_text_oracles(),
        **_multimodal_oracles(),
        **_pipeline_oracles(),
        **_dsir_oracles(),
        **_corpus_law_oracles(),
        **_label_oracles(),
        "kmeans_centroids": _kmeans_oracle(),
        "ann_ivf_learned": _ann_ivf_learned_oracle(),
        # token-identical moment expressions over fixed-point sums
        # (sum-of-squares identity, no running recurrence)
        "embedding_dim_stats": f"""
WITH comp AS (
  SELECT i - 1 AS dim, embedding[i] AS x
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS s(i)
),
agg AS (
  SELECT dim, count(*) AS n,
         (sum(CAST(round((x) * 1000000) AS BIGINT)) / 1000000.0) AS sx,
         (sum(CAST(round((x * x) * 1000000) AS BIGINT)) / 1000000.0) AS sxx,
         min(x) AS mn, max(x) AS mx
  FROM comp GROUP BY 1
)
SELECT dim, n, sx / n AS mean,
       (sxx - (sx * sx) / n) / n AS var, mn, mx
FROM agg ORDER BY dim""",
    }



def _kmeans_ctes() -> tuple[list[str], str]:
    """The Lloyd-iteration CTE chain shared by the kmeans_centroids
    oracle and the ann_ivf_learned composition: per iteration an
    argmax assignment (row_number with the same cos-desc, cell-asc
    tie-break as max_by(struct(cos, -cell))) and a per-dimension
    fixed-point mean (zipped unnests -> integer sums). Returns (ctes,
    final_centroid_cte_name); the chain also defines `e` (vec_id, v
    as DOUBLE[])."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        KM_ITERS,
        KM_K,
    )

    scale = 1_000_000
    ctes = ["e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
            f"c0 AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {KM_K})"]
    for i in range(1, KM_ITERS + 1):
        prev, cur = f"c{i - 1}", f"c{i}"
        cos = ("(list_dot_product(e.v, c.cv) / "
               "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))))")
        ctes.append(f"""a{i} AS (
  SELECT e.vec_id, e.v, c.cell, {cos} AS cos_c
  FROM e CROSS JOIN {prev} c
  QUALIFY row_number() OVER (PARTITION BY e.vec_id
                             ORDER BY cos_c DESC, c.cell) = 1
)""")
        ctes.append(f"""x{i} AS (
  SELECT cell, unnest(v) AS val, unnest(generate_series(1, len(v))) AS d FROM a{i}
)""")
        ctes.append(f"""u{i} AS (
  SELECT cell, d, sum(CAST(round(val * {scale}) AS BIGINT)) AS s, count(*) AS n
  FROM x{i} GROUP BY 1, 2
)""")
        ctes.append(f"""{cur} AS (
  SELECT cell, list((CAST(s AS DOUBLE) / {float(scale)!r}) / n ORDER BY d) AS cv
  FROM u{i} GROUP BY cell
)""")
    return ctes, f"c{KM_ITERS}"


def _kmeans_oracle() -> str:
    ctes, final = _kmeans_ctes()
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT cell, unnest(generate_series(0, len(cv) - 1)) AS dim,
       unnest(cv) AS centroid_val
FROM {final} ORDER BY cell, dim""")


def _ann_ivf_learned_oracle() -> str:
    """kmeans CTE chain composed with the IVF probe SQL — mirrors
    operators/similarity.ann_ivf_learned (same centroids, same
    assignment/probe/re-rank tie-breaks)."""
    ctes, final = _kmeans_ctes()
    return "WITH " + ",\n".join(ctes) + ",\n" + _ivf_tail(final)


def _dsir_oracles() -> dict[str, str]:
    """DSIR (Xie et al. 2023) mirrors: hashed-bigram feature counts,
    target = quality ≥ threshold slice, Laplace-smoothed likelihood
    ratio in exact bigint floor divisions — replays
    pipeline.dsir_weights / dsir_resample arithmetic step for step."""
    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        DSIR_BUCKETS,
        DSIR_TARGET_QUALITY,
        SAMPLE_MOD,
    )

    score = _quality_parts()["score"]
    b = DSIR_BUCKETS
    chain = f"""w AS (SELECT doc_id, {WS} AS ws FROM documents),
ex AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM w),
feats AS (
  SELECT doc_id, {md5_int60_sql("ws[i] || ' ' || ws[i + 1]")} % {b} AS f,
         count(*) AS c
  FROM ex GROUP BY 1, 2
),
tq AS (SELECT doc_id FROM documents WHERE round({score}, 6) >= {DSIR_TARGET_QUALITY}),
raw AS (SELECT f, CAST(sum(c) AS BIGINT) AS cnt_r FROM feats GROUP BY 1),
tgt AS (SELECT f, CAST(sum(c) AS BIGINT) AS cnt_t
        FROM feats JOIN tq USING (doc_id) GROUP BY 1),
tot AS (SELECT (SELECT CAST(sum(cnt_r) AS BIGINT) FROM raw) AS tot_r,
               (SELECT CAST(coalesce(sum(cnt_t), 0) AS BIGINT) FROM tgt) AS tot_t),
model AS (
  SELECT r.f,
         CAST((coalesce(t.cnt_t, 0) + 1) * 1000000 // (r.cnt_r + 1) AS BIGINT) AS p
  FROM raw r LEFT JOIN tgt t USING (f)
),
g AS (SELECT CAST((tot_r + {b}) * 1000000 // (tot_t + {b}) AS BIGINT) AS g6 FROM tot),
per_doc AS (
  SELECT fe.doc_id, CAST(sum(fe.c * m.p) AS BIGINT) AS num,
         CAST(sum(fe.c) AS BIGINT) AS den
  FROM feats fe JOIN model m USING (f) GROUP BY 1
),
wts AS (
  SELECT doc_id, den AS n_bigrams,
         CAST((num // den) * g6 // 1000000 AS BIGINT) AS mean_ratio6
  FROM per_doc, g
)"""
    return {
        "dsir_weights": f"""
WITH {chain}
SELECT doc_id, n_bigrams, mean_ratio6 FROM wts""",
        "dsir_resample": f"""
WITH {chain},
mx AS (SELECT max(mean_ratio6) AS wmax FROM wts)
SELECT doc_id,
       CAST(mean_ratio6 * {SAMPLE_MOD} // wmax AS BIGINT) AS rate_bp
FROM wts, mx
WHERE {md5_int60_sql("CAST(doc_id AS VARCHAR)")} % {SAMPLE_MOD}
      < mean_ratio6 * {SAMPLE_MOD} // wmax""",
    }


def _label_oracles() -> dict[str, str]:
    """Label-aware embedding ops: hard-negative mining (ann_topk's
    plan + a label-inequality join predicate) and per-label centroid
    outliers (kmeans-discipline fixed-point means, d² as the
    token-identical dot-product composition)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        N_QUERIES,
        OUTLIER_TOP,
        TOP_K,
    )

    return {
        "hard_negatives": f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS query_label, v AS qv
      FROM e WHERE vec_id < {N_QUERIES}),
j AS (
  SELECT query_id, query_label, e.vec_id AS neighbor_id,
         e.label AS neighbor_label, {_cos_sql('qv', 'v')} AS cos_raw
  FROM q, e WHERE e.label <> query_label
),
r AS (
  SELECT query_id, query_label, neighbor_id, neighbor_label, cos_raw,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rnk
  FROM j
)
SELECT query_id, query_label, neighbor_id, neighbor_label,
       round(cos_raw, 6) AS cos_sim, rnk
FROM r WHERE rnk <= {TOP_K}""",
        "label_outliers": f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
x AS (SELECT label, unnest(v) AS val, unnest(generate_series(1, len(v))) AS d
      FROM e),
u AS (SELECT label, d, sum(CAST(round(val * 1000000) AS BIGINT)) AS s,
             count(*) AS n
      FROM x GROUP BY 1, 2),
c AS (SELECT label, list((CAST(s AS DOUBLE) / 1000000.0) / n ORDER BY d) AS cv
      FROM u GROUP BY label),
j AS (
  SELECT e.label, e.vec_id,
         (list_dot_product(v, v) - 2 * list_dot_product(v, cv)
          + list_dot_product(cv, cv)) AS d2
  FROM e JOIN c USING (label)
),
r AS (
  SELECT label, vec_id, d2,
         CAST(row_number() OVER (PARTITION BY label
              ORDER BY d2 DESC, vec_id) AS INTEGER) AS rnk
  FROM j
)
SELECT label, vec_id, round(d2, 6) AS dist2, rnk
FROM r WHERE rnk <= {OUTLIER_TOP}""",
    }


def _corpus_law_oracles() -> dict[str, str]:
    """Zipf fit + cross-source overlap mirrors. zipf_slope: logs snap
    to 1e6 fixed-point bigints (ln runs on identical integer args in
    both engines), sufficient statistics are exact integer sums,
    slope/intercept are token-identical IEEE expressions over the
    exact ints. source_overlap: distinct (source, shingle) sets,
    pairwise intersection counts, 6dp Jaccard."""
    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        CURRICULUM_PHASES,
        ZIPF_TOP,
    )

    num = ("(CAST(n_points AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))")
    den = ("(CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))")
    return {
        "zipf_slope": f"""
WITH tf AS (
  SELECT token, count(*) AS tf
  FROM (SELECT unnest({WS}) AS token FROM documents) GROUP BY 1
),
topr AS (SELECT token, tf FROM tf ORDER BY tf DESC, token ASC LIMIT {ZIPF_TOP}),
pts AS (
  SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY tf DESC, token ASC)
                            AS DOUBLE)) * 1000000.0) AS BIGINT) AS xq,
         CAST(round(ln(CAST(tf AS DOUBLE)) * 1000000.0) AS BIGINT) AS yq
  FROM topr
),
s AS (
  SELECT count(*) AS n_points,
         CAST(sum(xq) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
         CAST(sum(xq * yq) AS BIGINT) AS sxy,
         CAST(sum(xq * xq) AS BIGINT) AS sxx
  FROM pts
)
SELECT n_points,
       round({num} / {den}, 6) AS slope,
       round((CAST(sy AS DOUBLE) / 1000000.0
              - ({num} / {den}) * (CAST(sx AS DOUBLE) / 1000000.0))
             / CAST(n_points AS DOUBLE), 6) AS intercept
FROM s""",
        "curriculum_phases": f"""
WITH q AS (SELECT doc_id, round({_quality_parts()["score"]}, 6) AS quality
           FROM documents),
counts AS (SELECT quality, count(*) AS c FROM q GROUP BY 1),
cum AS (SELECT quality, sum(c) OVER (ORDER BY quality) AS cum FROM counts),
nn AS (SELECT count(*) AS n FROM q),
thr AS (
  SELECT k, min(quality) AS t
  FROM cum, nn, (SELECT unnest(generate_series(1, {CURRICULUM_PHASES - 1})) AS k) ks
  WHERE cum >= (k * n + {CURRICULUM_PHASES} - 1) // {CURRICULUM_PHASES}
  GROUP BY k
)
SELECT doc_id, quality,
       CAST(1 + (SELECT count(*) FROM thr WHERE q.quality > thr.t) AS BIGINT)
         AS phase
FROM q""",
        "source_overlap": f"""
WITH sh AS (
  SELECT DISTINCT d.source, s.shingle
  FROM (
    SELECT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS shingle
    FROM (SELECT doc_id, {WS} AS ws FROM documents),
         unnest(generate_series(1, len(ws) - 2)) u(i)
  ) s JOIN documents d USING (doc_id)
),
sizes AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_shared,
       round(n_shared / (na.n_sh + nb.n_sh - n_shared), 6) AS jaccard
FROM inter
JOIN sizes na ON na.source = src_a
JOIN sizes nb ON nb.source = src_b""",
    }


def _pipeline_oracles() -> dict[str, str]:
    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        BIGRAM_K,
        CHUNK_LEN,
        CHUNK_STRIDE,
        BOILER_K,
        BOILER_MIN_DF,
        BOILER_N,
        DECON_NGRAM,
        DUP_BIGRAM_MAX,
        EVAL_MOD,
        MIX_TARGET_PPM,
        CONTRAST_BUCKETS,
        CONTRAST_SPAN,
        SPAN_LEN,
        SPAN_RATE_PCT,
        SPLIT_TRAIN_PCT,
        SPLIT_VAL_PCT,
        VAL_PCT,
        TEMP_ALPHA,
        TEMP_WEIGHT_SCALE,
        PACK_BUDGET,
        QUALITY_GATE_Q,
        CAL_KEEP_PPM as _CAL_KEEP_PPM,
        DOMAIN_CAP_K as _DOMAIN_CAP_K,
        PACK_SHARDS,
        ES_SAMPLE_K,
        SAMPLE_MOD,
        SAMPLE_RATES_BP,
        TOP_TOK_MAX,
        VOCAB_K,
        CMS_D,
        CMS_K,
        CMS_W,
        FEAT_D,
    )

    grams = " || ' ' || ".join(f"ws[i + {j}]" for j in range(DECON_NGRAM))
    decon_cte = f"""w AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
),
ex AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - {DECON_NGRAM - 1})) AS i FROM w
),
sh AS (
  SELECT DISTINCT doc_id, {grams} AS shingle FROM ex
)"""

    rate = str(SAMPLE_MOD)
    for lang, bp in SAMPLE_RATES_BP.items():
        rate = f"(CASE WHEN lang = '{lang}' THEN {bp} ELSE {rate} END)"
    bucket = f"({md5_int60_sql('CAST(doc_id AS VARCHAR)')} % {SAMPLE_MOD})"
    chunk = f"ws[start + 1 : start + {CHUNK_LEN}]"
    return {
        "decontaminate": f"""
WITH {decon_cte},
ev AS (SELECT doc_id AS eval_doc_id, shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0),
tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % {EVAL_MOD} <> 0)
SELECT tr.doc_id AS train_doc_id,
       count(DISTINCT tr.shingle) AS n_shared_shingles,
       count(DISTINCT eval_doc_id) AS n_eval_docs
FROM tr JOIN ev ON tr.shingle = ev.shingle
GROUP BY 1 ORDER BY 1""",
        # exact train×eval whole-doc Jaccard — the LSH path's verified
        # output equals it under the same band-curve-completeness
        # argument as dedup_minhash_lsh (whose oracle is also exact)
        "decontaminate_fuzzy": f"""
WITH {_SHINGLE_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS train_doc_id, b.doc_id AS eval_doc_id,
         count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id % {EVAL_MOD} <> 0 AND b.doc_id % {EVAL_MOD} = 0
  GROUP BY 1, 2
),
pairs AS (
  SELECT train_doc_id,
         round(CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common), 6)
           AS jaccard
  FROM common
  JOIN sizes na ON na.doc_id = train_doc_id
  JOIN sizes nb ON nb.doc_id = eval_doc_id
)
SELECT train_doc_id, count(*) AS n_eval_docs, max(jaccard) AS max_jaccard
FROM pairs WHERE jaccard >= {JACCARD_THRESHOLD}
GROUP BY 1 ORDER BY 1""",
        # mirrors pipeline.leakage_safe_split: md5 collapse → exact
        # rep-level Jaccard pairs (the verified-LSH path equals the
        # exact join under the dedup_minhash_lsh band-curve argument)
        # → recursive-CTE components (min reachable rep) → the same
        # md5 group-hash split; singleton reps are their own group
        "leakage_safe_split": f"""
WITH RECURSIVE grp_rep AS (
  SELECT md5(text) AS m, min(doc_id) AS rep_id FROM documents GROUP BY 1
),
mem AS (
  SELECT d.doc_id, r.rep_id FROM documents d
  JOIN grp_rep r ON md5(d.text) = r.m
),
rp AS (
  SELECT doc_a, doc_b FROM ({_JACCARD_SQL}) q
  WHERE doc_a IN (SELECT rep_id FROM grp_rep)
    AND doc_b IN (SELECT rep_id FROM grp_rep)
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM rp
  UNION ALL
  SELECT doc_b, doc_a FROM rp
),
reach(id, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
),
lab AS (SELECT id, min(r) AS g FROM reach GROUP BY 1),
assign AS (
  SELECT m.doc_id, coalesce(l.g, m.rep_id) AS group_id
  FROM mem m LEFT JOIN lab l ON l.id = m.rep_id
)
SELECT doc_id, CAST(group_id AS BIGINT) AS group_id,
       CASE WHEN {md5_int60_sql("CAST(group_id AS VARCHAR)")} % 100
                 < {VAL_PCT} THEN 'val' ELSE 'train' END AS split
FROM assign""",
        "vocab_topk": f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents
), agg AS (
  SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
), top AS (
  SELECT * FROM agg ORDER BY tf DESC, token LIMIT {VOCAB_K}
)
SELECT token, tf, df,
       CAST(row_number() OVER (ORDER BY tf DESC, token) AS INTEGER) AS rnk
FROM top""",
        "bigram_topk": f"""
WITH w AS (
  SELECT string_split(trim(text), ' ') AS ws FROM documents
), ex AS (
  SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM w
), p AS (
  SELECT ws[i] || ' ' || ws[i + 1] AS pair FROM ex
), agg AS (
  SELECT pair, count(*) AS tf FROM p GROUP BY 1
), top AS (
  SELECT * FROM agg ORDER BY tf DESC, pair LIMIT {BIGRAM_K}
)
SELECT pair, tf,
       CAST(row_number() OVER (ORDER BY tf DESC, pair) AS INTEGER) AS rnk
FROM top""",
        "bpe_merges": _bpe_merges_sql(),
        "bpe_apply": _bpe_apply_sql(),
        # mirrors pipeline.bigram_lm_score: Laplace-smoothed bigram
        # probabilities over exact integer counts, fixed-point per-doc
        # sums (round(p*1e9) bigints) so agg order is irrelevant
        "bigram_lm_score": _bigram_lm_sql(),
        # mirrors pipeline.trigram_lm_score: model trained on the
        # even-doc_id half, Laplace trigram probability for seen
        # trigrams, stupid backoff λ=2/5 (bigint multiply + floor
        # div on the fixed-point bigram probability) for unseen ones
        "trigram_lm_score": _trigram_lm_sql(),
        # mirrors pipeline.lm_quality_lift: labeled fixture injection
        # (verbatim train docs = fluent, word-reversed = garbled),
        # both scorers over the same population, per-scorer pairwise
        # accuracy + offset rank gap — every division floor-div over
        # non-negative integers
        "lm_quality_lift": _lm_lift_sql(),
        # mirrors dedup.dedup_containment's CONTRACT: exact pairwise
        # max-containment |A∩B| / min(|A|,|B|) over distinct shingle
        # sets, >= tau after 6dp rounding (the quadratic form is the
        # completeness oracle for the prefix-filtered Spark plan)
        "dedup_containment": f"""
WITH {_SHINGLE_CTE},
shh AS (
  SELECT doc_id, {md5_int60_sql('shingle')} AS sh_h FROM sh
),
hs AS (
  SELECT doc_id, list_sort(list(sh_h)) AS hset FROM shh GROUP BY 1
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(CAST(len(list_intersect(a.hset, b.hset)) AS DOUBLE)
               / least(len(a.hset), len(b.hset)), 6) AS containment
  FROM hs a JOIN hs b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, containment FROM p
WHERE containment >= {_CONTAIN_T}""",
        # mirrors dedup.containment_stats: clique accounting +
        # extended-prefix construction replayed stage-by-stage for
        # n_prefix2_rows/n_candidates, BUT n_verified_reps and
        # n_verified are computed from the QUADRATIC contract (all
        # rep pairs / all doc pairs) — so equality with the Spark
        # side's candidate-derived counts IS the 2-evidence filter's
        # completeness check, not a mirrored tautology. num/den come
        # from the containment tau's own relaxed rational (_ct_n/
        # _ct_d) — never hard-code a threshold here
        "containment_stats": f"""
WITH {_SHINGLE_CTE},
shh AS (
  SELECT doc_id, {md5_int60_sql('shingle')} AS sh_h FROM sh
),
hs AS (
  SELECT doc_id, list_sort(list(sh_h)) AS hset FROM shh GROUP BY 1
),
grp AS (
  SELECT hset, min(doc_id) AS rep, count(*) AS m FROM hs GROUP BY hset
),
rsh AS (
  SELECT rep AS doc_id, len(hset) AS n_sh, unnest(hset) AS sh_h FROM grp
),
dfr AS (SELECT sh_h, count(*) AS df FROM rsh GROUP BY 1),
rk AS (
  SELECT r.doc_id, r.sh_h, r.n_sh,
         row_number() OVER (PARTITION BY r.doc_id
           ORDER BY d.df, r.sh_h) AS rn
  FROM rsh r JOIN dfr d USING (sh_h)
),
pre2 AS (
  SELECT * FROM rk
  WHERE rn <= least(n_sh,
                    n_sh - (({_ct_n} * n_sh + {_ct_d - 1}) // {_ct_d}) + 2)
),
cand AS (
  SELECT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.n_sh AS n_a, b.n_sh AS n_b,
           count(*) AS ov, min(b.rn) AS j1
    FROM pre2 a JOIN rk b ON a.sh_h = b.sh_h
    WHERE (a.n_sh < b.n_sh OR (a.n_sh = b.n_sh AND a.doc_id < b.doc_id))
      AND b.rn + (({_ct_n} * a.n_sh + {_ct_d - 1}) // {_ct_d}) <= b.n_sh + 2
    GROUP BY 1, 2, 3, 4)
  WHERE j1 + (({_ct_n} * n_a + {_ct_d - 1}) // {_ct_d}) <= n_b + 1
    AND ov >= least(2, ({_ct_n} * n_a + {_ct_d - 1}) // {_ct_d})
),
vreps AS (
  SELECT ga.rep AS doc_a, gb.rep AS doc_b
  FROM grp ga JOIN grp gb
    ON (len(ga.hset) < len(gb.hset)
        OR (len(ga.hset) = len(gb.hset) AND ga.rep < gb.rep))
  WHERE round(CAST(len(list_intersect(ga.hset, gb.hset)) AS DOUBLE)
              / least(len(ga.hset), len(gb.hset)), 6) >= {_CONTAIN_T}
),
vall AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM hs a JOIN hs b ON a.doc_id < b.doc_id
  WHERE round(CAST(len(list_intersect(a.hset, b.hset)) AS DOUBLE)
              / least(len(a.hset), len(b.hset)), 6) >= {_CONTAIN_T}
)
SELECT CAST((SELECT sum(m) FROM grp) AS BIGINT) AS n_sets,
       CAST((SELECT count(*) FROM grp) AS INTEGER) AS n_distinct_sets,
       CAST((SELECT max(m) FROM grp) AS INTEGER) AS max_clique,
       CAST((SELECT sum(m * (m - 1) // 2) FROM grp) AS BIGINT)
         AS clique_pairs,
       CAST((SELECT count(*) FROM rsh) AS BIGINT) AS n_token_rows,
       CAST((SELECT count(*) FROM pre2) AS BIGINT) AS n_prefix2_rows,
       CAST((SELECT count(*) FROM pre2) * 1000000
            // (SELECT count(*) FROM rsh) AS BIGINT) AS prefix2_ppm,
       CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT count(*) FROM vreps) AS BIGINT) AS n_verified_reps,
       CAST((SELECT count(*) FROM vall) AS BIGINT) AS n_verified""",
        "repetition_stats": f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2
), top AS (
  SELECT doc_id, max(tf) AS top_tf, sum(tf) AS n_tokens FROM tf GROUP BY 1
), rl AS (
  SELECT doc_id,
         len(ws) - 1 AS n_bigrams,
         (SELECT count(DISTINCT ws[i] || ' ' || ws[i + 1])
          FROM unnest(generate_series(1, len(ws) - 1)) AS u(i)) AS n_uniq_bigrams
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents)
)
SELECT t.doc_id, t.n_tokens,
       round(t.top_tf / t.n_tokens, 6) AS top_tok_frac,
       CASE WHEN rl.n_bigrams > 0
            THEN round((rl.n_bigrams - rl.n_uniq_bigrams) / rl.n_bigrams, 6)
            ELSE 0.0 END AS dup_bigram_frac,
       (round(t.top_tf / t.n_tokens, 6) > {TOP_TOK_MAX!r}
        OR CASE WHEN rl.n_bigrams > 0
                THEN round((rl.n_bigrams - rl.n_uniq_bigrams) / rl.n_bigrams, 6)
                ELSE 0.0 END > {DUP_BIGRAM_MAX!r}) AS flagged
FROM top t JOIN rl USING (doc_id)""",
        "source_mix": """
WITH per AS (
  SELECT source, count(*) AS n_docs,
         sum(len(string_split(trim(text), ' '))) AS n_tokens
  FROM documents GROUP BY 1
)
SELECT source, n_docs, n_tokens,
       round(n_tokens / (SELECT sum(n_tokens) FROM per), 6) AS token_share
FROM per""",
        "stratified_sample": f"""
SELECT doc_id, lang, {bucket} AS sample_bucket
FROM documents WHERE {bucket} < {rate}""",
        # mirrors pipeline.weighted_sample_es: A-ES keys ln(u)/w from
        # the portable md5 uniform, global top-k, rank on the k rows
        "weighted_sample_es": f"""
WITH keyed AS (
  SELECT doc_id, len({WS}) + 1 AS w_tokens,
         ln(({md5_int60_sql("CAST(doc_id AS VARCHAR)")} + 1)
            / {float(1 << 60)!r})
           / CAST(len({WS}) + 1 AS DOUBLE) AS es_key
  FROM documents
)
SELECT doc_id, w_tokens, CAST(rnk AS INTEGER) AS rnk,
       round(es_key, 6) AS es_key
FROM (SELECT *, row_number() OVER (ORDER BY es_key DESC, doc_id) AS rnk
      FROM keyed)
WHERE rnk <= {ES_SAMPLE_K}""",
        # mirrors pipeline.mix_rebalance: N* = min(tokens_s / w_s),
        # rate_s = w_s·N*/tokens_s — identical-ordered IEEE doubles
        # from exact integer token counts, then the md5 keep gate
        "mix_rebalance": f"""
WITH per AS (
  SELECT source, sum(len(string_split(trim(text), ' '))) AS tokens_s
  FROM documents GROUP BY 1
), wts AS (
  SELECT source, tokens_s,
         (CASE {' '.join(f"WHEN source = '{s}' THEN {p}" for s, p in MIX_TARGET_PPM.items())}
          END) / 1000000.0 AS w
  FROM per
  WHERE source IN ({', '.join(f"'{s}'" for s in MIX_TARGET_PPM)})
), ns AS (SELECT min(tokens_s / w) AS nstar FROM wts),
rates AS (
  SELECT source, least(1.0, w * nstar / tokens_s) AS rate FROM wts, ns
)
SELECT doc_id, source,
       CAST(floor(rate * {SAMPLE_MOD}) AS INTEGER) AS rate_bp
FROM documents JOIN rates USING (source)
WHERE {bucket} < floor(rate * {SAMPLE_MOD})""",
        # mirrors pipeline.dataset_split: md5 bucket decides alone
        "dataset_split": f"""
SELECT doc_id, source,
       CAST({md5_int60_sql('CAST(doc_id AS VARCHAR)')} % 100 AS INTEGER) AS bucket,
       CASE WHEN {md5_int60_sql('CAST(doc_id AS VARCHAR)')} % 100 < {SPLIT_TRAIN_PCT}
            THEN 'train'
            WHEN {md5_int60_sql('CAST(doc_id AS VARCHAR)')} % 100 < {SPLIT_VAL_PCT}
            THEN 'val' ELSE 'test' END AS split
FROM documents""",
        # mirrors pipeline.contrastive_pairs: row-local crops, md5
        # bucket pairing, |buckets|-row arg-min negative map
        "contrastive_pairs": f"""
WITH base AS (
  SELECT doc_id,
         array_to_string(list_slice(ws, 1, {CONTRAST_SPAN}), ' ') AS anchor_text,
         array_to_string(list_slice(ws, {CONTRAST_SPAN} + 1,
                                    2 * {CONTRAST_SPAN}), ' ') AS positive_text,
         {md5_int60_sql('CAST(doc_id AS VARCHAR)')} % {CONTRAST_BUCKETS} AS bucket
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents)
  WHERE len(ws) >= 2 * {CONTRAST_SPAN}
),
neg AS (
  SELECT ((bucket - 1 + {CONTRAST_BUCKETS}) % {CONTRAST_BUCKETS}) AS bucket,
         neg_doc_id, negative_text
  FROM (SELECT bucket, min(doc_id) AS neg_doc_id,
               arg_min(anchor_text, doc_id) AS negative_text
        FROM base GROUP BY bucket)
)
SELECT b.doc_id, b.anchor_text, b.positive_text,
       n.neg_doc_id, n.negative_text
FROM base b JOIN neg n USING (bucket)
WHERE n.neg_doc_id <> b.doc_id""",
        # mirrors pipeline.span_corruption: integer segment layout +
        # md5 offset gate, row-local slicing — no FP anywhere
        "span_corruption": f"""
WITH docs AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws,
         len(string_split(trim(text), ' ')) AS n
  FROM documents
),
base AS (
  SELECT doc_id, ws, n,
         (n * {SPAN_RATE_PCT}) // 100 // {SPAN_LEN} AS n_spans,
         n // greatest((n * {SPAN_RATE_PCT}) // 100 // {SPAN_LEN}, 1) AS seg_len
  FROM docs
  WHERE (n * {SPAN_RATE_PCT}) // 100 // {SPAN_LEN} >= 1
),
sp AS (
  SELECT doc_id, ws, k AS sentinel_id,
         k * seg_len
         + ({md5_int60_sql("CAST(doc_id AS VARCHAR) || ':' || CAST(k AS VARCHAR)")}
            % greatest(seg_len - {SPAN_LEN} + 1, 1)) AS span_start
  FROM base, unnest(generate_series(0, n_spans - 1)) AS t(k)
)
SELECT doc_id, CAST(sentinel_id AS INTEGER) AS sentinel_id,
       CAST(span_start AS INTEGER) AS span_start,
       CAST({SPAN_LEN} AS INTEGER) AS span_len,
       array_to_string(list_slice(ws, span_start + 1,
                                  span_start + {SPAN_LEN}), ' ') AS span_text
FROM sp""",
        # mirrors pipeline.temperature_mix: fixed-point p^alpha
        # weights (integer sum, order-free), per-row double rate
        # arithmetic in the identical op order, shared md5 gate
        "temperature_mix": f"""
WITH per AS (
  SELECT source, sum(len(string_split(trim(text), ' '))) AS tokens_s
  FROM documents GROUP BY 1
), tot AS (SELECT sum(tokens_s) AS _tot FROM per),
wts AS (
  SELECT source, tokens_s,
         CAST(round(pow(tokens_s / _tot, {TEMP_ALPHA!r})
                    * {TEMP_WEIGHT_SCALE}) AS BIGINT) AS pa_fp
  FROM per, tot
), z AS (SELECT sum(pa_fp) AS _z FROM wts),
wq AS (SELECT source, tokens_s, pa_fp / _z AS q FROM wts, z),
ns AS (SELECT min(tokens_s / q) AS _nstar FROM wq),
rates AS (
  SELECT source, least(1.0, q * _nstar / tokens_s) AS rate FROM wq, ns
)
SELECT doc_id, source,
       CAST(floor(rate * {SAMPLE_MOD}) AS INTEGER) AS rate_bp
FROM documents JOIN rates USING (source)
WHERE {bucket} < floor(rate * {SAMPLE_MOD})""",
        # mirrors pipeline.quality_percentile_gate: exact discrete
        # quantile over the VALUE HISTOGRAM (never a global sort)
        "quality_percentile_gate": f"""
WITH qd AS (
  SELECT doc_id, round({_quality_parts()['score']}, 6) AS quality FROM documents
), counts AS (
  SELECT quality, count(*) AS c FROM qd GROUP BY 1
), cum AS (
  SELECT quality,
         sum(c) OVER (ORDER BY quality ROWS UNBOUNDED PRECEDING) AS cum
  FROM counts
), n AS (SELECT count(*) AS n FROM qd),
thr AS (
  SELECT min(quality) AS q_threshold FROM cum, n
  WHERE cum >= ceil({QUALITY_GATE_Q!r} * n)
)
SELECT doc_id, quality, q_threshold
FROM qd, thr WHERE quality >= q_threshold""",
        # mirrors pipeline.quality_calibrate_by_source: per-source
        # value histogram, strictly-below running sum, exact ppm
        "quality_calibrate_by_source": f"""
WITH q AS (
  SELECT doc_id, source, round({_quality_parts()['score']}, 6) AS quality
  FROM documents
), hist AS (
  SELECT source, quality, count(*) AS c FROM q GROUP BY 1, 2
), calib AS (
  SELECT source, quality,
         coalesce(sum(c) OVER (PARTITION BY source ORDER BY quality
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cnt_below,
         sum(c) OVER (PARTITION BY source) AS n_source
  FROM hist
)
SELECT doc_id, q.source, q.quality,
       CAST(n_source AS INTEGER) AS n_source,
       CAST((1000000 * cnt_below) // n_source AS BIGINT) AS below_ppm,
       ((1000000 * cnt_below) // n_source >= {_CAL_KEEP_PPM}) AS keep
FROM q JOIN calib USING (source, quality)""",
        # mirrors pipeline.domain_cap's CONTRACT (top-cap per source
        # under (quality DESC, doc_id)); the Spark plan decides via
        # the bounded histogram + boundary-bucket rank, which equals
        # this per-source rank because rank = cnt_above + tie_rn
        "domain_cap": f"""
WITH q AS (
  SELECT doc_id, source, round({_quality_parts()['score']}, 6) AS quality
  FROM documents
), r AS (
  SELECT doc_id, source, quality,
         row_number() OVER (PARTITION BY source
                            ORDER BY quality DESC, doc_id) AS rn
  FROM q
)
SELECT doc_id, source, quality, (rn <= {_DOMAIN_CAP_K}) AS kept FROM r""",
        # mirrors pipeline.boilerplate_ngrams: guarded gram-hash
        # transform, distinct per doc, df ranking with hash tie-break
        "boilerplate_ngrams": f"""
WITH w0 AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
), g AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(ws) >= {BOILER_N} THEN
            list_transform(generate_series(1, len(ws) - {BOILER_N} + 1),
               i -> {md5_int60_sql(
                   f"array_to_string(array_slice(ws, i, i + {BOILER_N} - 1), ' ')")})
            ELSE CAST([] AS BIGINT[]) END) AS grams
  FROM w0
), e AS (SELECT doc_id, unnest(grams) AS h FROM g),
agg AS (
  SELECT h, count(*) AS df, min(doc_id) AS example_doc FROM e GROUP BY 1
)
SELECT h, df, example_doc FROM agg
WHERE df >= {BOILER_MIN_DF}
ORDER BY df DESC, h LIMIT {BOILER_K}""",
        # mirrors pipeline.dedup_rate_by_source
        "dedup_rate_by_source": """
SELECT source, count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_uniq,
       round(1 - count(DISTINCT md5(text)) / count(*), 6) AS dup_rate
FROM documents GROUP BY 1 ORDER BY 1""",
        "chunk_documents": f"""
WITH w AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
), st AS (
  SELECT doc_id, ws,
         unnest(generate_series(0, len(ws) - 1, {CHUNK_STRIDE})) AS start
  FROM w
)
SELECT doc_id,
       CAST(start // {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
       CAST(len({chunk}) AS INTEGER) AS n_tokens,
       md5(array_to_string({chunk}, ' ')) AS chunk_md5
FROM st""",
        # replays pack_sequences' greedy fold exactly: recursion steps
        # one row per shard per iteration, threading (pack_id, acc)
        "pack_sequences": f"""
WITH RECURSIVE t AS (
  SELECT doc_id, CAST(doc_id % {PACK_SHARDS} AS INTEGER) AS shard,
         CAST(len(string_split(trim(text), ' ')) AS INTEGER) AS n_tokens,
         row_number() OVER (PARTITION BY doc_id % {PACK_SHARDS}
                            ORDER BY doc_id) AS rn
  FROM documents
),
rec AS (
  SELECT shard, rn, doc_id, n_tokens,
         CAST(0 AS INTEGER) AS pack_id, n_tokens AS acc
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.shard, t.rn, t.doc_id, t.n_tokens,
         CAST(CASE WHEN rec.acc + t.n_tokens > {PACK_BUDGET}
                   THEN rec.pack_id + 1 ELSE rec.pack_id END AS INTEGER),
         CASE WHEN rec.acc + t.n_tokens > {PACK_BUDGET}
              THEN t.n_tokens ELSE rec.acc + t.n_tokens END
  FROM rec JOIN t ON t.shard = rec.shard AND t.rn = rec.rn + 1
)
SELECT doc_id, shard, pack_id, n_tokens FROM rec""",
        # all-integer build + probe (md5 bucket, count, min) — the
        # sketch pipeline itself is value-exact between engines
        "heavy_hitters_cms": f"""
WITH tok AS (
  SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents
), js AS (
  SELECT unnest(generate_series(0, {CMS_D - 1})) AS j
), hashed AS (
  SELECT w, j,
         {md5_int60_sql("CAST(j AS VARCHAR) || ':' || w")} % {CMS_W} AS b
  FROM tok, js
), sketch AS (
  SELECT j, b, count(*) AS cnt FROM hashed GROUP BY 1, 2
), exact AS (
  SELECT w, count(*) AS exact_tf FROM tok GROUP BY 1
), top AS (
  SELECT * FROM exact ORDER BY exact_tf DESC, w LIMIT {CMS_K}
), probes AS (
  SELECT w, exact_tf, j,
         {md5_int60_sql("CAST(j AS VARCHAR) || ':' || w")} % {CMS_W} AS b
  FROM top, js
), est AS (
  SELECT w, exact_tf, min(cnt) AS est_tf
  FROM probes JOIN sketch USING (j, b) GROUP BY 1, 2
)
SELECT w, exact_tf, est_tf,
       CAST(row_number() OVER (ORDER BY exact_tf DESC, w) AS INTEGER) AS rnk
FROM est""",
        "feature_hash_docs": f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM documents
)
SELECT doc_id,
       {md5_int60_sql("'feat:' || w")} % {FEAT_D} AS feature,
       CAST(sum(CASE WHEN {md5_int60_sql("'sign:' || w")} % 2 = 0
                     THEN 1 ELSE -1 END) AS BIGINT) AS weight
FROM tok
GROUP BY 1, 2
HAVING sum(CASE WHEN {md5_int60_sql("'sign:' || w")} % 2 = 0
                THEN 1 ELSE -1 END) <> 0""",
    }


def _bpe_ctes(all_merges: bool) -> tuple[list[str], list[str], int]:
    """Chained-CTE replay of operators/pipeline.py:_bpe_train — each
    round re-counts pairs on the PREVIOUS round's merged text (same
    double-space encoding, same replace semantics, same tie-break).
    Returns (ctes, per-round winner selects, last it index). With
    `all_merges` the chain materializes the replace after the final
    rule too (the encoded corpus `bpe_apply` reads)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        MERGE_JOINER,
        N_MERGES,
    )

    ctes = ["it0 AS (SELECT doc_id, ' ' || replace(trim(text), ' ', '  ') || ' ' AS t FROM documents)"]
    selects = []
    last = 0
    for i in range(N_MERGES):
        ctes.append(f"""c{i} AS (
  SELECT ws[i] AS tok_a, ws[i + 1] AS tok_b, count(*) AS tf
  FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
        FROM (SELECT string_split(trim(t), '  ') AS ws FROM it{i}))
  GROUP BY 1, 2
)""")
        ctes.append(f"b{i} AS (SELECT * FROM c{i} ORDER BY tf DESC, tok_a, tok_b LIMIT 1)")
        selects.append(f"SELECT {i + 1} AS merge_rank, tok_a || ' ' || tok_b AS pair, tf FROM b{i}")
        if all_merges or i + 1 < N_MERGES:
            ctes.append(f"""it{i + 1} AS (
  SELECT doc_id, replace(t, ' ' || b.tok_a || '  ' || b.tok_b || ' ',
                    ' ' || b.tok_a || '{MERGE_JOINER}' || b.tok_b || ' ') AS t
  FROM it{i}, b{i} b
)""")
            last = i + 1
    return ctes, selects, last


def _bpe_merges_sql() -> str:
    ctes, selects, _ = _bpe_ctes(all_merges=False)
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


def _bpe_apply_sql() -> str:
    """Mirror of pipeline.bpe_apply: the fully-merged corpus projected
    to per-doc token count + md5 of the encoded text."""
    ctes, _, last = _bpe_ctes(all_merges=True)
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT doc_id, CAST(len(ws) AS INTEGER) AS n_tokens,
       md5(array_to_string(ws, ' ')) AS encoded_md5
FROM (SELECT doc_id, string_split(trim(t), '  ') AS ws FROM it{last})""")


def _cos_sql(a: str, b: str) -> str:
    return (f"(list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))")


def _ivf_tail(cents: str) -> str:
    """IVF assignment/probe/re-rank CTE tail over a centroid CTE
    `cents` (cell, cv) and the shared `e` (vec_id, v) relation —
    mirrors operators/similarity.ann_ivf exactly, incl. tie-breaks to
    the lower cell / neighbor id. Used with both the seeded centroid
    CTE (ann_ivf) and the k-means chain (ann_ivf_learned)."""
    return f"""ac AS (
  SELECT e.vec_id, cell, {_cos_sql('e.v', 'cv')} AS cos_c,
         row_number() OVER (PARTITION BY e.vec_id
              ORDER BY {_cos_sql('e.v', 'cv')} DESC, cell) AS arn
  FROM e, {cents} c
),
assigned AS (SELECT vec_id, cell FROM ac WHERE arn = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
pr AS (
  SELECT query_id, cell,
         row_number() OVER (PARTITION BY query_id
              ORDER BY {_cos_sql('qv', 'cv')} DESC, cell) AS prn
  FROM q, {cents} c
),
probes AS (SELECT query_id, cell FROM pr WHERE prn <= {NPROBE}),
scored AS (
  SELECT query_id, a.vec_id AS neighbor_id, {_cos_sql('qv', 'e.v')} AS cos_raw
  FROM probes JOIN assigned a USING (cell)
  JOIN q USING (query_id)
  JOIN e ON e.vec_id = a.vec_id
  WHERE a.vec_id <> query_id
),
r AS (
  SELECT query_id, neighbor_id, cos_raw,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, round(cos_raw, 6) AS cos_sim, rnk
FROM r WHERE rnk <= {TOP_K}"""


def _ann_ivf_ndcg_sql() -> str:
    """Mirrors similarity.ann_ivf_ndcg: the full ann_ivf query as a
    derived table, exact top-k gains, fixed-point discount weights as
    a CASE over the approx rank, integer DCG sum, one ideal-DCG
    division at the end."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        NDCG_IDCG_FP,
        NDCG_W_FP,
    )

    ivf = ("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
"""
           + f"c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {IVF_K}),\n"
           + _ivf_tail("c"))
    wcase = ("CASE a.rnk "
             + " ".join(f"WHEN {i} THEN {wf}"
                        for i, wf in enumerate(NDCG_W_FP, start=1))
             + " END")
    return f"""
WITH approx AS (
  SELECT query_id, neighbor_id, rnk FROM ({ivf}) iv
),
e2 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
exact AS (
  SELECT query_id, neighbor_id, {TOP_K} + 1 - rnk AS gain FROM (
    SELECT eq.vec_id AS query_id, e2.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY eq.vec_id
               ORDER BY {_cos_sql('eq.v', 'e2.v')} DESC, e2.vec_id) AS rnk
    FROM (SELECT vec_id, v FROM e2 WHERE vec_id < {N_QUERIES}) eq, e2
    WHERE e2.vec_id <> eq.vec_id) x
  WHERE rnk <= {TOP_K}
),
j AS (
  SELECT a.query_id, coalesce(x.gain, 0) * ({wcase}) AS gw
  FROM approx a LEFT JOIN exact x USING (query_id, neighbor_id)
)
SELECT query_id, CAST(count(*) AS INTEGER) AS n_ranked,
       CAST(sum(gw) AS BIGINT) AS dcg_fp,
       round(CAST(sum(gw) AS DOUBLE) / {NDCG_IDCG_FP}, 6) AS ndcg
FROM j GROUP BY 1"""


def _hp_literal(hp: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in hp) + "]"


def _table_sig_sql(t: int, width: int) -> str:
    """`width`-bit sign signature of table t (hyperplane layout is
    t*MAX_BITS+i, matching similarity.HYPERPLANES)."""
    base = t * MAX_BITS
    return " + ".join(
        f"(CASE WHEN list_dot_product(v, {_hp_literal(HYPERPLANES[base + i])}) > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(width)
    )


def _bucket_union_sql(width: int = BITS_PER_TABLE) -> str:
    """Static-width (vec_id, tbl, bucket) union over relation `e`."""
    return "\nUNION ALL\n".join(
        f"  SELECT vec_id, {t} AS tbl, ({_table_sig_sql(t, width)}) AS bucket FROM e"
        for t in range(N_TABLES)
    )


def _bucket_dynamic_sql() -> str:
    """SCALE-AWARE-width (vec_id, tbl, bucket) relation over `e`:
    the full MAX_BITS signature masked by 2^bits, where bits =
    lsh_bits_for(count(*)) computed IN SQL with the identical
    integer arithmetic (`//` + `bin` length) as the Spark side —
    masking the full signature equals truncating the sign fold at
    `bits` terms, so buckets match the engine bit-for-bit at every
    corpus size (similarity.lsh_bits_for)."""
    full_union = "\nUNION ALL\n".join(
        f"  SELECT vec_id, {t} AS tbl,"
        f" ({_table_sig_sql(t, MAX_BITS)})::BIGINT AS full_sig FROM e"
        for t in range(N_TABLES)
    )
    return f"""  SELECT vec_id, tbl, (full_sig % (1::BIGINT << bits)) AS bucket
  FROM (
{full_union}
  ) fs, (
    SELECT LEAST({MAX_BITS}, {BITS_PER_TABLE} +
           CASE WHEN m1 <= 0 THEN 0 ELSE length(bin(m1)) END) AS bits
    FROM (SELECT greatest(count(*) - 1, 0) // {LSH_BASE_N} AS m1 FROM e) mm
  ) p"""


def _pq_ctes(src: str = "e") -> tuple[list[str], str]:
    """Product-quantization CTE chain mirroring
    operators/similarity.pq_codebooks_rel / _pq_assign: subvector
    explode, seeded codebooks, PQ_ITERS Lloyd rounds (argmin-d2 with
    lower-code tie-break, fixed-point dim means). `src` names the
    (vec_id, v) relation the subvectors come from — the default `e`
    (raw embeddings, defined here) or a caller-defined CTE such as
    the IVF-PQ residual relation. Returns (ctes,
    final_codebook_cte); the chain also defines `s` (vec_id, sub,
    sv)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        PQ_ITERS,
        PQ_K,
        PQ_M,
        PQ_SCALE,
        PQ_SUB,
    )

    # rank-equivalent distance: |c|^2 - 2<sv,c> (see _pq_assign)
    d2 = ("(list_dot_product(c.cv, c.cv)"
          " - 2 * list_dot_product(s.sv, c.cv))")
    ctes = ([] if src != "e" else
            ["e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"])
    ctes += [
        f"""s AS (
  SELECT vec_id, m.m AS sub, v[m.m * {PQ_SUB} + 1 : m.m * {PQ_SUB} + {PQ_SUB}] AS sv
  FROM {src} CROSS JOIN (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m) m
)""",
        f"""pc0 AS (
  SELECT sub, vec_id AS code, sv AS cv FROM s WHERE vec_id < {PQ_K}
)""",
    ]
    for i in range(1, PQ_ITERS + 1):
        prev = f"pc{i - 1}"
        ctes.append(f"""pa{i} AS (
  SELECT s.vec_id, s.sub, s.sv, c.code, {d2} AS d2
  FROM s JOIN {prev} c USING (sub)
  QUALIFY row_number() OVER (PARTITION BY s.vec_id, s.sub
                             ORDER BY d2, c.code) = 1
)""")
        ctes.append(f"""px{i} AS (
  SELECT sub, code, unnest(sv) AS val,
         unnest(generate_series(1, len(sv))) AS d
  FROM pa{i}
)""")
        ctes.append(f"""pu{i} AS (
  SELECT sub, code, d,
         sum(CAST(round(val * {PQ_SCALE}) AS BIGINT)) AS sm, count(*) AS n
  FROM px{i} GROUP BY 1, 2, 3
)""")
        ctes.append(f"""pc{i} AS (
  SELECT sub, code,
         list((CAST(sm AS DOUBLE) / {float(PQ_SCALE)!r}) / n ORDER BY d) AS cv
  FROM pu{i} GROUP BY sub, code
)""")
    return ctes, f"pc{PQ_ITERS}"


def _pq_adc_ctes() -> list[str]:
    """The full PQ chain through per-(query, neighbor) fixed-point ADC
    scores (`psc`): codebooks + corpus encode + broadcast distance
    table — shared by the ann_pq_adc oracle and the recall
    composition."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        N_QUERIES,
        PQ_SCALE,
    )

    ctes, cb = _pq_ctes()
    # rank-equivalent distance: |c|^2 - 2<sv,c> (see _pq_assign)
    d2 = ("(list_dot_product(c.cv, c.cv)"
          " - 2 * list_dot_product(s.sv, c.cv))")
    ctes.append(f"""penc AS (
  SELECT s.vec_id, s.sub, c.code
  FROM s JOIN {cb} c USING (sub)
  QUALIFY row_number() OVER (PARTITION BY s.vec_id, s.sub
                             ORDER BY {d2}, c.code) = 1
)""")
    ctes.append(f"""pq_q AS (
  SELECT vec_id AS query_id, sub, sv AS qsv FROM s WHERE vec_id < {N_QUERIES}
)""")
    ctes.append(f"""pdtab AS (
  SELECT query_id, sub, code,
         CAST(round(list_dot_product(q.qsv, c.cv) * {PQ_SCALE}) AS BIGINT)
           AS pdot_fp
  FROM pq_q q JOIN {cb} c USING (sub)
)""")
    ctes.append("""psc AS (
  SELECT d.query_id, penc.vec_id AS neighbor_id, sum(pdot_fp) AS fp
  FROM penc JOIN pdtab d USING (sub, code)
  WHERE penc.vec_id <> d.query_id
  GROUP BY 1, 2
)""")
    return ctes


def _ivfpq_oracle() -> str:
    """IVF-PQ composition — mirrors operators/similarity.ann_ivfpq:
    k-means LEARNED coarse cells (the shared `_kmeans_ctes` Lloyd
    chain — residuals vs cell MEANS are what the PQ codebook can
    cover), assignment/probe with ann_ivf's tie-breaks, residual
    v−c, the PQ chain trained over residuals (`_pq_ctes(src='res')`),
    and compressed-domain scoring fp_qc + Σ fp_tab in fixed-point
    ints."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        N_QUERIES,
        NPROBE,
        PQ_M,
        PQ_SCALE,
        PQ_SUB,
        TOP_K,
    )

    d2 = ("(list_dot_product(c.cv, c.cv)"
          " - 2 * list_dot_product(s.sv, c.cv))")
    km_ctes, km_final = _kmeans_ctes()
    coarse = km_ctes + [
        f"ivc AS (SELECT cell, cv FROM {km_final})",
        f"""iac AS (
  SELECT e.vec_id, cell, row_number() OVER (PARTITION BY e.vec_id
       ORDER BY {_cos_sql('e.v', 'cv')} DESC, cell) AS arn
  FROM e, ivc c
)""",
        "iassigned AS (SELECT vec_id, cell FROM iac WHERE arn = 1)",
        """res AS (
  SELECT e.vec_id, a.cell,
         list_transform(generate_series(1, len(e.v)), i -> e.v[i] - c.cv[i]) AS v
  FROM e JOIN iassigned a USING (vec_id) JOIN ivc c USING (cell)
)""",
    ]
    pq, cb = _pq_ctes(src="res")
    penc = f"""penc AS (
  SELECT s.vec_id, s.sub, c.code
  FROM s JOIN {cb} c USING (sub)
  QUALIFY row_number() OVER (PARTITION BY s.vec_id, s.sub
                             ORDER BY {d2}, c.code) = 1
)"""
    tail = [
        f"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES})",
        f"""ipr AS (
  SELECT query_id, cell, row_number() OVER (PARTITION BY query_id
       ORDER BY {_cos_sql('qv', 'cv')} DESC, cell) AS prn
  FROM q, ivc c
)""",
        f"iprobes AS (SELECT query_id, cell FROM ipr WHERE prn <= {NPROBE})",
        f"""qs AS (
  SELECT query_id, m.m AS sub,
         qv[m.m * {PQ_SUB} + 1 : m.m * {PQ_SUB} + {PQ_SUB}] AS qsv
  FROM q CROSS JOIN (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m) m
)""",
        f"""dtab AS (
  SELECT query_id, sub, code,
         CAST(round(list_dot_product(qs.qsv, c.cv) * {PQ_SCALE}) AS BIGINT)
           AS fp_tab
  FROM qs JOIN {cb} c USING (sub)
)""",
        f"""qctab AS (
  SELECT query_id, cell,
         CAST(round(list_dot_product(q.qv, c.cv) * {PQ_SCALE}) AS BIGINT)
           AS fp_qc
  FROM q, ivc c
)""",
        """candv AS (
  SELECT p.query_id, a.vec_id, a.cell
  FROM iprobes p JOIN iassigned a USING (cell)
  WHERE a.vec_id <> p.query_id
)""",
        """isc AS (
  SELECT cd.query_id, cd.vec_id, cd.cell, sum(d.fp_tab) AS fp_res
  FROM candv cd JOIN penc ON penc.vec_id = cd.vec_id
  JOIN dtab d ON d.query_id = cd.query_id
             AND d.sub = penc.sub AND d.code = penc.code
  GROUP BY 1, 2, 3
)""",
        """itot AS (
  SELECT isc.query_id, isc.vec_id AS neighbor_id, qc.fp_qc + isc.fp_res AS fp
  FROM isc JOIN qctab qc ON qc.query_id = isc.query_id AND qc.cell = isc.cell
)""",
    ]
    return ("WITH " + ",\n".join(coarse + pq + [penc] + tail) + f"""
SELECT query_id, neighbor_id,
       round(CAST(fp AS DOUBLE) / {float(PQ_SCALE)!r}, 6) AS approx_dot,
       CAST(rnk AS INTEGER) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
           ORDER BY fp DESC, neighbor_id) AS rnk FROM itot) t
WHERE rnk <= {TOP_K}""")


def _pq_oracles() -> dict[str, str]:
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        N_QUERIES,
        PQ_SCALE,
        TOP_K,
    )

    ctes, cb = _pq_ctes()
    codebook_sql = ("WITH " + ",\n".join(ctes) + f"""
SELECT CAST(sub AS INTEGER) AS sub, CAST(code AS INTEGER) AS code,
       unnest(generate_series(0, len(cv) - 1)) AS dim,
       unnest(cv) AS centroid_val
FROM {cb} ORDER BY sub, code, dim""")

    adc = _pq_adc_ctes()
    topk_tail = f"""
SELECT query_id, neighbor_id,
       round(CAST(fp AS DOUBLE) / {float(PQ_SCALE)!r}, 6) AS approx_dot,
       CAST(rnk AS INTEGER) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
           ORDER BY fp DESC, neighbor_id) AS rnk FROM psc) t
WHERE rnk <= {TOP_K}"""
    adc_sql = "WITH " + ",\n".join(adc) + topk_tail

    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        PQ_SHORTLIST,
    )

    short_cte = f"""pq_short AS (
  SELECT query_id, neighbor_id
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY fp DESC, neighbor_id) AS srnk FROM psc) t
  WHERE srnk <= {PQ_SHORTLIST}
)"""
    rr_cte = f"""pq_rr AS (
  SELECT s.query_id, s.neighbor_id, {_cos_sql('qe.v', 'ne.v')} AS cos_raw
  FROM pq_short s
  JOIN e qe ON qe.vec_id = s.query_id
  JOIN e ne ON ne.vec_id = s.neighbor_id
)"""
    rerank_sql = ("WITH " + ",\n".join(_pq_adc_ctes() + [short_cte, rr_cte])
                  + f"""
SELECT query_id, neighbor_id, round(cos_raw, 6) AS cos_sim,
       CAST(rnk AS INTEGER) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
           ORDER BY cos_raw DESC, neighbor_id) AS rnk FROM pq_rr) t
WHERE rnk <= {TOP_K}""")

    recall_ctes = _pq_adc_ctes() + [
        f"""pq_top AS (
  SELECT query_id, neighbor_id
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY fp DESC, neighbor_id) AS rnk FROM psc) t
  WHERE rnk <= {TOP_K}
)""",
        short_cte,
        rr_cte,
        f"""rr_top AS (
  SELECT query_id, neighbor_id
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cos_raw DESC, neighbor_id) AS rnk FROM pq_rr) t
  WHERE rnk <= {TOP_K}
)""",
        f"""exact_top AS (
  SELECT query_id, neighbor_id
  FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY {_cos_sql('q.qv', 'e.v')} DESC, e.vec_id) AS rnk
    FROM (SELECT vec_id AS query_id, v AS qv FROM e
          WHERE vec_id < {N_QUERIES}) q, e
    WHERE e.vec_id <> q.query_id) r
  WHERE rnk <= {TOP_K}
)""",
    ]
    recall_sql = ("WITH " + ",\n".join(recall_ctes) + """
SELECT x.query_id, CAST(count(*) AS INTEGER) AS n_true,
       CAST(count(p.neighbor_id) AS INTEGER) AS n_adc,
       CAST(count(r.neighbor_id) AS INTEGER) AS n_rerank,
       round(CAST(count(p.neighbor_id) AS DOUBLE) / count(*), 6)
         AS recall_adc,
       round(CAST(count(r.neighbor_id) AS DOUBLE) / count(*), 6)
         AS recall_rerank
FROM exact_top x
LEFT JOIN pq_top p USING (query_id, neighbor_id)
LEFT JOIN rr_top r USING (query_id, neighbor_id)
GROUP BY 1""")
    # unreferenced trailing CTEs (pq_q/pdtab/psc) are never evaluated
    # by DuckDB's lazy CTE planner — penc is the last one this reads
    encode_sql = ("WITH " + ",\n".join(_pq_adc_ctes()) + """
SELECT vec_id, CAST(sub AS INTEGER) AS sub, CAST(code AS INTEGER) AS code
FROM penc""")
    return {"pq_codebooks": codebook_sql, "ann_pq_adc": adc_sql,
            "ann_pq_rerank": rerank_sql, "ann_pq_recall": recall_sql,
            "pq_encode": encode_sql, "ann_ivfpq": _ivfpq_oracle()}


def _sq_ctes() -> list[str]:
    """SQ8 CTE chain mirroring operators/similarity.sq_params /
    sq8_encode_rel / _sq8_decoded token-for-token: one min/max pass
    per dimension, linear encode to 0..SQ_LEVELS with the same
    round/clamp/int sequence, linear decode back to x̂ doubles.
    Defines `e` (vec_id, v), `enc` (vec_id, codes), `dec`
    (neighbor_id, xh) and the params relation `p` (mns, mxs)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        DIM,
        SQ_LEVELS,
    )

    return [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        """comp AS (
  SELECT i - 1 AS dim, v[i] AS x
  FROM e, unnest(generate_series(1, len(v))) AS s(i)
)""",
        "st AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM comp GROUP BY 1)",
        ("p AS (SELECT list(mn ORDER BY dim) AS mns, "
         "list(mx ORDER BY dim) AS mxs FROM st)"),
        f"""enc AS (
  SELECT vec_id,
         list_transform(generate_series(1, {DIM}), i ->
           CAST(CASE WHEN mxs[i] > mns[i]
                THEN least({SQ_LEVELS}, greatest(0,
                     round((v[i] - mns[i]) / (mxs[i] - mns[i]) * {SQ_LEVELS})))
                ELSE 0 END AS INT)) AS codes
  FROM e, p
)""",
        f"""dec AS (
  SELECT vec_id AS neighbor_id,
         list_transform(generate_series(1, {DIM}), i ->
           mns[i] + codes[i] * (mxs[i] - mns[i]) / {SQ_LEVELS}) AS xh
  FROM enc, p
)""",
    ]


def _sq_oracles() -> dict[str, str]:
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        DIM,
        N_QUERIES,
        TOP_K,
    )

    ctes = _sq_ctes()
    encode_sql = ("WITH " + ",\n".join(ctes[:5]) + f"""
SELECT vec_id, i - 1 AS dim, codes[i] AS code
FROM enc, unnest(generate_series(1, {DIM})) AS s(i)
ORDER BY vec_id, dim""")

    topk_ctes = ctes + [
        f"""q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
)""",
        f"""r AS (
  SELECT query_id, neighbor_id, cos_raw,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rnk
  FROM (SELECT query_id, neighbor_id, {_cos_sql('qv', 'xh')} AS cos_raw
        FROM q, dec WHERE neighbor_id <> query_id) j
)""",
    ]
    sq8_sql = ("WITH " + ",\n".join(topk_ctes) + f"""
SELECT query_id, neighbor_id, round(cos_raw, 6) AS approx_cos, rnk
FROM r WHERE rnk <= {TOP_K}""")

    recall_ctes = topk_ctes + [
        f"sq_top AS (SELECT query_id, neighbor_id FROM r WHERE rnk <= {TOP_K})",
        f"""exact_top AS (
  SELECT query_id, neighbor_id
  FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY {_cos_sql('q.qv', 'e.v')} DESC, e.vec_id) AS rnk
    FROM q, e WHERE e.vec_id <> q.query_id) x
  WHERE rnk <= {TOP_K}
)""",
    ]
    recall_sql = ("WITH " + ",\n".join(recall_ctes) + """
SELECT x.query_id, CAST(count(*) AS INTEGER) AS n_true,
       CAST(count(s.neighbor_id) AS INTEGER) AS n_sq8,
       round(CAST(count(s.neighbor_id) AS DOUBLE) / count(*), 6)
         AS recall_sq8
FROM exact_top x
LEFT JOIN sq_top s USING (query_id, neighbor_id)
GROUP BY 1""")
    return {"sq8_encode": encode_sql, "ann_sq8": sq8_sql,
            "ann_sq8_recall": recall_sql}


def _jl_oracles() -> dict[str, str]:
    """Mirrors operators/similarity.jl_project / ann_jl /
    ann_jl_recall: each projected component is list_dot_product
    against the identical LCG direction literal (the same left fold
    as the engine's `dot`), so pv doubles match bitwise and the
    projected-space ranking replays exactly."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        JL_DIM,
        JL_MATRIX,
        JL_SHORTLIST,
        N_QUERIES,
        TOP_K,
    )

    pv = ("[" + ", ".join(
        f"list_dot_product(v, {_hp_literal(JL_MATRIX[j])})"
        for j in range(JL_DIM)) + "]")
    base = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"proj AS (SELECT vec_id, {pv} AS pv FROM e)",
    ]
    project_sql = ("WITH " + ",\n".join(base) + f"""
SELECT vec_id, i - 1 AS dim, pv[i] AS val
FROM proj, unnest(generate_series(1, {JL_DIM})) AS s(i)
ORDER BY vec_id, dim""")

    topk_ctes = base + [
        f"""q AS (
  SELECT vec_id AS query_id, pv AS qpv FROM proj WHERE vec_id < {N_QUERIES}
)""",
        f"""r AS (
  SELECT query_id, neighbor_id, cos_raw,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rnk
  FROM (SELECT query_id, p.vec_id AS neighbor_id,
               {_cos_sql('qpv', 'p.pv')} AS cos_raw
        FROM q, proj p WHERE p.vec_id <> query_id) j
)""",
    ]
    jl_sql = ("WITH " + ",\n".join(topk_ctes) + f"""
SELECT query_id, neighbor_id, round(cos_raw, 6) AS approx_cos, rnk
FROM r WHERE rnk <= {TOP_K}""")

    rerank_ctes = topk_ctes + [
        f"short AS (SELECT query_id, neighbor_id FROM r WHERE rnk <= {JL_SHORTLIST})",
        f"""rr AS (
  SELECT query_id, neighbor_id, cos_raw,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rrnk
  FROM (SELECT s.query_id, s.neighbor_id,
               {_cos_sql('eq.v', 'ec.v')} AS cos_raw
        FROM short s
        JOIN e eq ON eq.vec_id = s.query_id
        JOIN e ec ON ec.vec_id = s.neighbor_id) x
)""",
    ]
    rerank_sql = ("WITH " + ",\n".join(rerank_ctes) + f"""
SELECT query_id, neighbor_id, round(cos_raw, 6) AS cos_sim,
       rrnk AS rnk
FROM rr WHERE rrnk <= {TOP_K}""")

    recall_ctes = rerank_ctes + [
        f"jl_top AS (SELECT query_id, neighbor_id FROM r WHERE rnk <= {TOP_K})",
        f"rr_top AS (SELECT query_id, neighbor_id FROM rr WHERE rrnk <= {TOP_K})",
        f"""exact_top AS (
  SELECT query_id, neighbor_id
  FROM (
    SELECT eq.vec_id AS query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY eq.vec_id
               ORDER BY {_cos_sql('eq.v', 'e.v')} DESC, e.vec_id) AS rnk
    FROM (SELECT vec_id, v FROM e WHERE vec_id < {N_QUERIES}) eq, e
    WHERE e.vec_id <> eq.vec_id) x
  WHERE rnk <= {TOP_K}
)""",
    ]
    recall_sql = ("WITH " + ",\n".join(recall_ctes) + """
SELECT x.query_id, CAST(count(*) AS INTEGER) AS n_true,
       CAST(count(s.neighbor_id) AS INTEGER) AS n_jl,
       CAST(count(rr2.neighbor_id) AS INTEGER) AS n_rerank,
       round(CAST(count(s.neighbor_id) AS DOUBLE) / count(*), 6)
         AS recall_jl,
       round(CAST(count(rr2.neighbor_id) AS DOUBLE) / count(*), 6)
         AS recall_rerank
FROM exact_top x
LEFT JOIN jl_top s USING (query_id, neighbor_id)
LEFT JOIN rr_top rr2 USING (query_id, neighbor_id)
GROUP BY 1""")
    return {"jl_project": project_sql, "ann_jl": jl_sql,
            "ann_jl_rerank": rerank_sql, "ann_jl_recall": recall_sql}


def _mrl_oracles() -> dict[str, str]:
    """Mirrors operators/similarity.ann_mrl / ann_mrl_rerank /
    ann_mrl_recall: the JL oracle chain with the projection replaced
    by a prefix slice (list_slice(v, 1, MRL_DIM)) — same reduced-
    space ranking, same shortlist + exact re-rank, same recall
    accounting."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        MRL_DIM,
        MRL_SHORTLIST,
        N_QUERIES,
        TOP_K,
    )

    base = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"proj AS (SELECT vec_id, list_slice(v, 1, {MRL_DIM}) AS pv FROM e)",
    ]
    topk_ctes = base + [
        f"""q AS (
  SELECT vec_id AS query_id, pv AS qpv FROM proj WHERE vec_id < {N_QUERIES}
)""",
        f"""r AS (
  SELECT query_id, neighbor_id, cos_raw,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rnk
  FROM (SELECT query_id, p.vec_id AS neighbor_id,
               {_cos_sql('qpv', 'p.pv')} AS cos_raw
        FROM q, proj p WHERE p.vec_id <> query_id) j
)""",
    ]
    mrl_sql = ("WITH " + ",\n".join(topk_ctes) + f"""
SELECT query_id, neighbor_id, round(cos_raw, 6) AS approx_cos, rnk
FROM r WHERE rnk <= {TOP_K}""")

    rerank_ctes = topk_ctes + [
        f"short AS (SELECT query_id, neighbor_id FROM r WHERE rnk <= {MRL_SHORTLIST})",
        f"""rr AS (
  SELECT query_id, neighbor_id, cos_raw,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rrnk
  FROM (SELECT s.query_id, s.neighbor_id,
               {_cos_sql('eq.v', 'ec.v')} AS cos_raw
        FROM short s
        JOIN e eq ON eq.vec_id = s.query_id
        JOIN e ec ON ec.vec_id = s.neighbor_id) x
)""",
    ]
    rerank_sql = ("WITH " + ",\n".join(rerank_ctes) + f"""
SELECT query_id, neighbor_id, round(cos_raw, 6) AS cos_sim,
       rrnk AS rnk
FROM rr WHERE rrnk <= {TOP_K}""")

    recall_ctes = rerank_ctes + [
        f"mrl_top AS (SELECT query_id, neighbor_id FROM r WHERE rnk <= {TOP_K})",
        f"rr_top AS (SELECT query_id, neighbor_id FROM rr WHERE rrnk <= {TOP_K})",
        f"""exact_top AS (
  SELECT query_id, neighbor_id
  FROM (
    SELECT eq.vec_id AS query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY eq.vec_id
               ORDER BY {_cos_sql('eq.v', 'e.v')} DESC, e.vec_id) AS rnk
    FROM (SELECT vec_id, v FROM e WHERE vec_id < {N_QUERIES}) eq, e
    WHERE e.vec_id <> eq.vec_id) x
  WHERE rnk <= {TOP_K}
)""",
    ]
    recall_sql = ("WITH " + ",\n".join(recall_ctes) + """
SELECT x.query_id, CAST(count(*) AS INTEGER) AS n_true,
       CAST(count(s.neighbor_id) AS INTEGER) AS n_mrl,
       CAST(count(rr2.neighbor_id) AS INTEGER) AS n_rerank,
       round(CAST(count(s.neighbor_id) AS DOUBLE) / count(*), 6)
         AS recall_mrl,
       round(CAST(count(rr2.neighbor_id) AS DOUBLE) / count(*), 6)
         AS recall_rerank
FROM exact_top x
LEFT JOIN mrl_top s USING (query_id, neighbor_id)
LEFT JOIN rr_top rr2 USING (query_id, neighbor_id)
GROUP BY 1""")
    return {"ann_mrl": mrl_sql, "ann_mrl_rerank": rerank_sql,
            "ann_mrl_recall": recall_sql}


def _retrieval_oracles() -> dict[str, str]:
    """Mirrors operators/retrieval.hybrid_rrf: bm25's scored CTE +
    ann_topk's cosine, each rank-truncated to RRF_POOL, fused with
    EXACT bigint floor divisions RRF_SCALE // (RRF_K + rank)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.retrieval import (
        RRF_K,
        RRF_POOL,
        RRF_SCALE,
        RRF_TOPN,
    )
    from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
        BM25_B,
        BM25_K1,
        BM25_SCALE,
    )

    ws = WS
    return {
        "hybrid_rrf": f"""
WITH words AS (
  SELECT doc_id, len({ws}) AS dl, unnest({ws}) AS word FROM documents
),
tf AS (SELECT doc_id, dl, word, count(*) AS tf FROM words GROUP BY 1, 2, 3),
dfr AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
qid AS (SELECT min(doc_id) AS _qid FROM documents),
qterms AS (SELECT DISTINCT word, _qid FROM words, qid WHERE doc_id = _qid),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS _n,
                 (sum(len({ws})) / count(*)) AS _avgdl
          FROM documents),
dfq AS (SELECT word, df, _qid FROM dfr JOIN qterms USING (word)),
scored AS (
  SELECT doc_id,
         sum(CAST(round(ln(1 + (_n - df + 0.5) / (df + 0.5))
             * (tf * ({BM25_K1} + 1))
             / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / _avgdl))
             * {BM25_SCALE}) AS BIGINT)) AS fp
  FROM tf JOIN dfq USING (word) CROSS JOIN stats
  WHERE doc_id <> _qid GROUP BY 1
),
lex AS (
  SELECT doc_id, rank_lex FROM (
    SELECT doc_id, row_number() OVER (ORDER BY fp DESC, doc_id) AS rank_lex
    FROM scored) WHERE rank_lex <= {RRF_POOL}
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv, vec_id AS _q FROM e, qid WHERE vec_id = _qid),
semj AS (
  SELECT e.vec_id AS doc_id, {_cos_sql('qv', 'v')} AS cos_raw
  FROM e, q WHERE e.vec_id <> _q
),
sem AS (
  SELECT doc_id, rank_sem FROM (
    SELECT doc_id, row_number() OVER (ORDER BY cos_raw DESC, doc_id) AS rank_sem
    FROM semj) WHERE rank_sem <= {RRF_POOL}
),
fused AS (
  SELECT doc_id, coalesce(rank_lex, 0) AS rank_lex,
         coalesce(rank_sem, 0) AS rank_sem,
         (CASE WHEN coalesce(rank_lex, 0) > 0
               THEN {RRF_SCALE} // ({RRF_K} + rank_lex) ELSE 0 END
          + CASE WHEN coalesce(rank_sem, 0) > 0
                 THEN {RRF_SCALE} // ({RRF_K} + rank_sem) ELSE 0 END) AS rrf_fp
  FROM lex FULL JOIN sem USING (doc_id)
)
SELECT doc_id, CAST(rnk AS INTEGER) AS rnk,
       CAST(rank_lex AS INTEGER) AS rank_lex,
       CAST(rank_sem AS INTEGER) AS rank_sem,
       round(rrf_fp / {float(RRF_SCALE)!r}, 6) AS rrf
FROM (SELECT *, row_number() OVER (ORDER BY rrf_fp DESC, doc_id) AS rnk
      FROM fused) t
WHERE rnk <= {RRF_TOPN}""",
    }


def _similarity_oracles() -> dict[str, str]:
    bucket_union = _bucket_union_sql()
    return {
        "ann_topk": f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
j AS (
  SELECT query_id, e.vec_id AS neighbor_id, {_cos_sql('qv', 'v')} AS cos_raw
  FROM q, e WHERE e.vec_id <> query_id
),
r AS (
  SELECT query_id, neighbor_id, cos_raw,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rnk
  FROM j
)
SELECT query_id, neighbor_id, round(cos_raw, 6) AS cos_sim, rnk
FROM r WHERE rnk <= {TOP_K}""",
        "ann_lsh": f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), buck AS (
{_bucket_dynamic_sql()}
), cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buck a JOIN buck b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, round({_cos_sql('ea.v', 'eb.v')}, 6) AS cos_sim
FROM cand JOIN e ea ON ea.vec_id = vec_a JOIN e eb ON eb.vec_id = vec_b
WHERE {_cos_sql('ea.v', 'eb.v')} >= {COS_THRESHOLD!r}""",
        # assignment/probe/re-rank mirror operators/similarity.ann_ivf
        # exactly (see _ivf_tail), seeded centroid CTE
        "ann_ivf": ("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
"""
                    + f"c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {IVF_K}),\n"
                    + _ivf_tail("c")),
        # nDCG@k of the IVF ranking vs exact top-k — weights are the
        # shared fixed-point 1/log2(i+1) literals (no log2 at query
        # time); mirrors similarity.ann_ivf_ndcg
        "ann_ivf_ndcg": _ann_ivf_ndcg_sql(),
        "dedup_embedding_cosine": f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < {BRUTE_MAX_ID}
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({_cos_sql('a.v', 'b.v')}, 6) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {_cos_sql('a.v', 'b.v')} >= {COS_THRESHOLD!r}""",
        # measured LSH recall vs the exact baseline on the same slice,
        # per cosine band — mirrors similarity.ann_lsh_recall
        "ann_lsh_recall": f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < {BRUTE_MAX_ID}
), buck AS (
{bucket_union}
), cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buck a JOIN buck b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
), lsh AS (
  SELECT vec_a, vec_b, 1 AS found
  FROM cand JOIN e ea ON ea.vec_id = vec_a JOIN e eb ON eb.vec_id = vec_b
  WHERE {_cos_sql('ea.v', 'eb.v')} >= {COS_THRESHOLD!r}
), exact AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round({_cos_sql('a.v', 'b.v')}, 6) AS cos_sim
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE {_cos_sql('a.v', 'b.v')} >= {COS_THRESHOLD!r}
), j AS (
  SELECT CASE WHEN cos_sim >= {RECALL_BAND_EDGES[0]!r} THEN 'band_095_100'
              WHEN cos_sim >= {RECALL_BAND_EDGES[1]!r} THEN 'band_080_095'
              WHEN cos_sim >= {RECALL_BAND_EDGES[2]!r} THEN 'band_060_080'
              ELSE 'band_thr_060' END AS cos_band,
         coalesce(found, 0) AS found
  FROM exact LEFT JOIN lsh USING (vec_a, vec_b)
)
SELECT cos_band, count(*) AS n_true, sum(found) AS n_found,
       round(CAST(sum(found) AS DOUBLE) / count(*), 6) AS recall
FROM j GROUP BY 1""",
        # LSH vs IVF same-cell blocking, both against the exact
        # baseline — mirrors similarity.ann_recall_compare (assignment
        # ordering identical to _ivf_tail's arn=1)
        "ann_recall_compare": f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < {BRUTE_MAX_ID}
), buck AS (
{bucket_union}
), cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buck a JOIN buck b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
), lsh AS (
  SELECT vec_a, vec_b, 1 AS lsh_found
  FROM cand JOIN e ea ON ea.vec_id = vec_a JOIN e eb ON eb.vec_id = vec_b
  WHERE {_cos_sql('ea.v', 'eb.v')} >= {COS_THRESHOLD!r}
), buckw AS (
{_bucket_union_sql(WIDE_BITS)}
), candw AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckw a JOIN buckw b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
), lshw AS (
  SELECT vec_a, vec_b, 1 AS lshw_found
  FROM candw JOIN e ea ON ea.vec_id = vec_a JOIN e eb ON eb.vec_id = vec_b
  WHERE {_cos_sql('ea.v', 'eb.v')} >= {COS_THRESHOLD!r}
), c AS (
  SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {IVF_K}
), ac AS (
  SELECT e.vec_id, cell,
         row_number() OVER (PARTITION BY e.vec_id
              ORDER BY {_cos_sql('e.v', 'cv')} DESC, cell) AS arn
  FROM e, c
), assigned AS (SELECT vec_id, cell FROM ac WHERE arn = 1),
exact AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round({_cos_sql('a.v', 'b.v')}, 6) AS cos_sim
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE {_cos_sql('a.v', 'b.v')} >= {COS_THRESHOLD!r}
), j AS (
  SELECT CASE WHEN cos_sim >= {RECALL_BAND_EDGES[0]!r} THEN 'band_095_100'
              WHEN cos_sim >= {RECALL_BAND_EDGES[1]!r} THEN 'band_080_095'
              WHEN cos_sim >= {RECALL_BAND_EDGES[2]!r} THEN 'band_060_080'
              ELSE 'band_thr_060' END AS cos_band,
         coalesce(lsh_found, 0) AS lsh_found,
         coalesce(lshw_found, 0) AS lshw_found,
         CASE WHEN aa.cell = ab.cell THEN 1 ELSE 0 END AS ivf_found
  FROM exact LEFT JOIN lsh USING (vec_a, vec_b)
  LEFT JOIN lshw USING (vec_a, vec_b)
  JOIN assigned aa ON aa.vec_id = vec_a
  JOIN assigned ab ON ab.vec_id = vec_b
), g AS (
  SELECT cos_band, count(*) AS n_true,
         sum(lsh_found) AS lsh_f, sum(lshw_found) AS lshw_f,
         sum(ivf_found) AS ivf_f
  FROM j GROUP BY 1
)
SELECT 'lsh' AS generator, cos_band, n_true, lsh_f AS n_found,
       round(CAST(lsh_f AS DOUBLE) / n_true, 6) AS recall FROM g
UNION ALL
SELECT 'lsh_w{WIDE_BITS}' AS generator, cos_band, n_true, lshw_f AS n_found,
       round(CAST(lshw_f AS DOUBLE) / n_true, 6) AS recall FROM g
UNION ALL
SELECT 'ivf_cell' AS generator, cos_band, n_true, ivf_f AS n_found,
       round(CAST(ivf_f AS DOUBLE) / n_true, 6) AS recall FROM g""",
        # cell-blocked semantic near-dup pairs — mirrors
        # similarity.dedup_embedding_blocked (assignment ordering
        # identical to _ivf_tail's arn=1; full table, no slice)
        "dedup_embedding_blocked": _blocked_pairs_sql(),
        "knn_graph": _knn_graph_sql(),
        "ann_graph_search": _graph_search_sql(),
        "ann_graph_recall": _graph_recall_sql(),
        # r11 navigable-graph rung: multi-probe construction + beam
        # walk + the measured greedy-vs-beam comparison row
        "knn_graph_nprobe": _knn_graph_nprobe_sql(),
        "ann_beam_search": _beam_search_sql_default(),
        "ann_beam_recall": _beam_recall_sql(),
        "ann_beam_topk": _beam_topk_sql(),
        "ann_beam_topk_recall": _beam_topk_recall_sql(),
        "ann_beam_curve": _beam_curve_sql(),
        # DiskANN rung: PQ-scored walk + exact rerank, and its
        # exact-walk-vs-pq-walk recall comparison row
        "ann_beam_pq_topk": _beam_pq_sql(),
        "ann_beam_pq_recall": _beam_pq_recall_sql(),
        "ann_beam_pq_curve": _beam_pq_curve_sql(),
        # incremental graph maintenance: new 10% wired into the
        # frozen 90% base graph via the beam walk, plus the
        # insert-vs-rebuild edge capture measurement
        "knn_graph_insert": _graph_insert_sql(),
        "knn_graph_insert_recall": _graph_insert_recall_sql(),
        "knn_graph_insert_curve": _graph_insert_curve_sql(),
        "nav_graph_stats": _nav_graph_stats_sql(),
        # mirrors similarity.knn_triangle_stats: undirected distinct
        # edges from the knn graph, a<b<c canonical wedge + closing
        # edge, 3-corner unnest, exact ppm floor division
        "knn_triangle_stats": f"""
WITH und AS (
  SELECT DISTINCT least(vec_id, nbr_id) AS a,
         greatest(vec_id, nbr_id) AS b
  FROM ({_knn_graph_sql()}) kg
),
tri AS (
  SELECT x.a, x.b, y.b AS c
  FROM und x JOIN und y ON x.b = y.a
  JOIN und z ON z.a = x.a AND z.b = y.b
),
corners AS (SELECT unnest([a, b, c]) AS vec_id FROM tri),
tc AS (SELECT vec_id, count(*) AS n_triangles FROM corners GROUP BY 1),
deg AS (
  SELECT vec_id, count(*) AS degree FROM (
    SELECT a AS vec_id FROM und UNION ALL SELECT b FROM und)
  GROUP BY 1
)
SELECT d.vec_id, CAST(degree AS INTEGER) AS degree,
       CAST(coalesce(n_triangles, 0) AS INTEGER) AS n_triangles,
       CAST(CASE WHEN degree >= 2
            THEN (2 * coalesce(n_triangles, 0) * 1000000)
                 // (degree * (degree - 1)) ELSE 0 END AS BIGINT)
         AS clustering_ppm
FROM deg d LEFT JOIN tc USING (vec_id)""",
        "knn_graph_recall": _knn_graph_recall_sql(),
        # two-level coarse assignment (the O(n·√cells) scale path)
        # and its flat-agreement honesty metric
        "knn_graph_hier": _knn_graph_hier_sql(),
        "ivf_hier_agreement": _ivf_hier_agreement_sql(),
        # blocked pairs → recursive-CTE closure → quality-argmax
        # canonical per cluster — mirrors similarity.semantic_canonicalize
        "semantic_canonicalize": _semantic_canonicalize_sql(),
        # knn_graph consumer: strong-edge components → per-component
        # quality argmax — mirrors similarity.knn_diversity_sample
        "knn_diversity_sample": _knn_diversity_sample_sql(),
        # the same consumer over the two-level graph (the scale path)
        "knn_diversity_sample_hier":
            _knn_diversity_sample_sql(_knn_graph_hier_sql()),
        # greedy diversity re-ranking, each round a chained CTE —
        # mirrors retrieval.mmr_rerank
        "mmr_rerank": _mmr_rerank_sql(),
    }


def _blocked_pairs_sql() -> str:
    # scale-aware cell count in lockstep with similarity.ivf_cells_for
    # (one cell per IVF_DIV vectors, floored at IVF_K) AND the
    # scale-aware ASSIGNMENT in lockstep with _ivf_assigned_auto:
    # the nl1 CASE degenerates the two-level argmax to flat below
    # HIER_CELLS_MIN cells — integer-exact in both engines
    return ("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
""" + _hier_assign_ctes(scale_aware=True) + f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({_cos_sql('ea.v', 'eb.v')}, 6) AS cos_sim,
       CAST(a.cell AS BIGINT) AS cell
FROM hassigned a JOIN hassigned b USING (cell)
JOIN e ea ON ea.vec_id = a.vec_id
JOIN e eb ON eb.vec_id = b.vec_id
WHERE a.vec_id < b.vec_id
  AND {_cos_sql('ea.v', 'eb.v')} >= {COS_THRESHOLD!r}""")


def _knn_graph_sql() -> str:
    """Mirrors similarity.knn_graph: same scale-aware cell count AND
    scale-aware auto assignment as _blocked_pairs_sql (flat below
    HIER_CELLS_MIN cells via the nl1=1 degeneration, two-level past
    it), per-vector top-k window."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import KNN_K

    return ("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
""" + _hier_assign_ctes(scale_aware=True) + f""",
j AS (
  SELECT a.vec_id, b.vec_id AS nbr_id, a.cell,
         {_cos_sql('ea.v', 'eb.v')} AS cos_raw
  FROM hassigned a JOIN hassigned b USING (cell)
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  WHERE a.vec_id <> b.vec_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
           ORDER BY cos_raw DESC, nbr_id) AS rnk
  FROM j
)
SELECT vec_id, nbr_id, CAST(rnk AS INTEGER) AS rnk,
       round(cos_raw, 6) AS cos_sim, CAST(cell AS BIGINT) AS cell
FROM r WHERE rnk <= {KNN_K}""")


def _graph_search_sql() -> str:
    """Mirror of similarity.ann_graph_search: bidirected knn edges,
    fixed entry (1 for query 0, else 0), each greedy round a chained
    CTE — candidates = current node + its neighbors (query excluded),
    argmax ordered (cos_raw DESC, lower cand id), raw cosines carried
    between rounds, rounding only at emission."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        GS_STEPS,
    )

    rounds = []
    for r in range(GS_STEPS):
        # AS MATERIALIZED: c{r} is referenced twice per round, so
        # default CTE inlining doubles the plan tree per step
        # (2^GS_STEPS copies of the knn-graph subquery = DuckDB OOM)
        rounds.append(f""",
a{r} AS MATERIALIZED (
  SELECT c.query_id, d.nbr_id AS cand_id,
         {_cos_sql('q.qv', 'e.v')} AS cos_raw
  FROM c{r} c
  JOIN ed d ON d.src = c.node
  JOIN qs q ON q.query_id = c.query_id
  JOIN e ON e.vec_id = d.nbr_id
  WHERE d.nbr_id <> c.query_id
  UNION ALL
  SELECT query_id, node, cur_cos FROM c{r}
),
c{r + 1} AS MATERIALIZED (
  SELECT query_id, cand_id AS node, cos_raw AS cur_cos FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cos_raw DESC, cand_id) AS rn FROM a{r})
  WHERE rn = 1
)""")
    return (f"""
WITH kg AS MATERIALIZED ({_knn_graph_sql()}),
ed AS MATERIALIZED (SELECT vec_id AS src, nbr_id FROM kg
       UNION SELECT nbr_id, vec_id FROM kg),
e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qs AS MATERIALIZED (SELECT vec_id AS query_id, v AS qv FROM e
       WHERE vec_id < {N_QUERIES}),
c0 AS MATERIALIZED (
  SELECT q.query_id, s.node, {_cos_sql('q.qv', 'e.v')} AS cur_cos
  FROM (SELECT query_id,
               CASE WHEN query_id = 0 THEN 1 ELSE 0 END AS node
        FROM qs) s
  JOIN qs q USING (query_id) JOIN e ON e.vec_id = s.node
)""" + "".join(rounds) + f"""
SELECT query_id, node AS found_id, round(cur_cos, 6) AS cos_sim
FROM c{GS_STEPS}""")


def _graph_recall_sql() -> str:
    """Mirror of similarity.ann_graph_recall: the walk's endpoint
    LEFT-joined to the exact top-k ranking, integer counts + ppm."""
    return f"""
WITH f AS MATERIALIZED ({_graph_search_sql()}),
ee AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
x AS (
  SELECT query_id, neighbor_id, rnk FROM (
    SELECT qq.vec_id AS query_id, ee.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY qq.vec_id
             ORDER BY {_cos_sql('qq.v', 'ee.v')} DESC, ee.vec_id) AS rnk
    FROM ee qq, ee WHERE qq.vec_id < {N_QUERIES}
      AND ee.vec_id <> qq.vec_id)
  WHERE rnk <= {TOP_K}
),
j AS (
  SELECT f.query_id, x.rnk FROM f
  LEFT JOIN x ON x.query_id = f.query_id AND x.neighbor_id = f.found_id
)
SELECT CAST(count(*) AS INTEGER) AS n_queries,
       CAST(sum(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS INTEGER) AS n_top1,
       CAST(sum(CASE WHEN rnk IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER)
         AS n_topk,
       CAST(sum(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS top1_ppm,
       CAST(sum(CASE WHEN rnk IS NOT NULL THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS topk_ppm
FROM j"""


def _probe_assign_ctes() -> str:
    """CTE block ending in `passigned(vec_id, cell, prn)` — mirrors
    similarity._ivf_probed: the scale-aware two-level candidate chain
    of _hier_assign_ctes with a top-GRAPH_NPROBE row_number reducer
    instead of the arn=1 argmax (prn=1 is that argmax to the bit)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        GRAPH_NPROBE,
    )

    base = _hier_assign_ctes(scale_aware=True)
    head, _tail = base.split("hassigned AS (", 1)
    return head + f"""passigned AS (
  SELECT vec_id, cell, arn AS prn FROM (
    SELECT vgrp.vec_id, cm.cell,
           row_number() OVER (PARTITION BY vgrp.vec_id
             ORDER BY {_cos_sql('ev.v', 'c2.cv')} DESC, cm.cell) AS arn
    FROM vgrp
    JOIN cm ON cm.g = vgrp.g
    JOIN e ev ON ev.vec_id = vgrp.vec_id
    JOIN c c2 ON c2.cell = cm.cell) t
  WHERE arn <= {GRAPH_NPROBE}
)"""


def _knn_graph_nprobe_sql(e_where: str = "") -> str:
    """Mirrors similarity.knn_graph_nprobe: multi-probe candidates
    (each vector against the PRIMARY members of its GRAPH_NPROBE best
    cells), per-vector top-k ordered (cos DESC, lower nbr id).
    `e_where` optionally restricts the source relation (the insert
    rung builds the base graph over the existing 90% only) — every
    downstream CTE sources from `e`, so the filter is the whole
    change."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        KNN_K,
    )

    return (f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings{e_where}),
""" + _probe_assign_ctes() + f""",
mem AS (SELECT vec_id AS nbr_id, cell FROM passigned WHERE prn = 1),
j AS (
  SELECT a.vec_id, m.nbr_id, {_cos_sql('ea.v', 'eb.v')} AS cos_raw
  FROM passigned a JOIN mem m USING (cell)
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = m.nbr_id
  WHERE a.vec_id <> m.nbr_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
           ORDER BY cos_raw DESC, nbr_id) AS rnk
  FROM j
)
SELECT vec_id, nbr_id, CAST(rnk AS INTEGER) AS rnk,
       round(cos_raw, 6) AS cos_sim
FROM r WHERE rnk <= {KNN_K}""")


def _beam_search_sql(beam: int, topk: int | None = None) -> str:
    """Mirror of similarity.ann_beam_search at frontier width `beam`:
    bidirected MULTI-PROBE knn edges, same fixed entry as the greedy
    rung, each round a chained materialized CTE — expansion UNION ALL
    stay, per-(query, cand) max dedup (duplicates are bit-identical),
    top-beam ordered (cos_raw DESC, lower cand id), raw cosines
    carried between rounds, rounding only at emission. With `topk`
    set, mirrors ann_beam_topk instead: the k best frontier rows per
    query as (query_id, neighbor_id, rnk, cos_sim)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        GS_STEPS,
    )

    rounds = []
    for r in range(GS_STEPS):
        rounds.append(f""",
a{r} AS MATERIALIZED (
  SELECT query_id, cand_id, max(cos_raw) AS cos_raw FROM (
    SELECT c.query_id, d.nbr_id AS cand_id,
           {_cos_sql('q.qv', 'e.v')} AS cos_raw
    FROM c{r} c
    JOIN ed d ON d.src = c.node
    JOIN qs q ON q.query_id = c.query_id
    JOIN e ON e.vec_id = d.nbr_id
    WHERE d.nbr_id <> c.query_id
    UNION ALL
    SELECT query_id, node, cur_cos FROM c{r}) t
  GROUP BY 1, 2
),
c{r + 1} AS MATERIALIZED (
  SELECT query_id, cand_id AS node, cos_raw AS cur_cos FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cos_raw DESC, cand_id) AS rn FROM a{r})
  WHERE rn <= {beam}
)""")
    return (f"""
WITH kg AS MATERIALIZED ({_knn_graph_nprobe_sql()}),
ed AS MATERIALIZED (SELECT vec_id AS src, nbr_id FROM kg
       UNION SELECT nbr_id, vec_id FROM kg),
e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qs AS MATERIALIZED (SELECT vec_id AS query_id, v AS qv FROM e
       WHERE vec_id < {N_QUERIES}),
c0 AS MATERIALIZED (
  SELECT q.query_id, s.node, {_cos_sql('q.qv', 'e.v')} AS cur_cos
  FROM (SELECT query_id,
               CASE WHEN query_id = 0 THEN 1 ELSE 0 END AS node
        FROM qs) s
  JOIN qs q USING (query_id) JOIN e ON e.vec_id = s.node
)""" + "".join(rounds) + f"""
{_beam_emit_sql(topk)}""")


def _beam_emit_sql(topk: int | None) -> str:
    """Final emission clause for _beam_search_sql (f-string helper —
    c{GS_STEPS} is the last round's frontier)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        GS_STEPS,
    )

    if topk is None:
        return f"""
SELECT query_id, node AS found_id, round(cur_cos, 6) AS cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cur_cos DESC, node) AS rn FROM c{GS_STEPS})
WHERE rn = 1"""
    return f"""
SELECT query_id, node AS neighbor_id, CAST(rn AS INTEGER) AS rnk,
       round(cur_cos, 6) AS cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cur_cos DESC, node) AS rn FROM c{GS_STEPS})
WHERE rn <= {topk}"""


def _beam_topk_sql() -> str:
    """ann_beam_topk's oracle: the BEAM_EF-wide frontier's TOP_K best
    rows per query."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        BEAM_EF,
    )

    return _beam_search_sql(BEAM_EF, topk=TOP_K)


def _beam_topk_recall_sql() -> str:
    """ann_beam_topk_recall's oracle: set recall@k of the beam-served
    top-k vs the exact ranking — integer hits + one ppm floor div."""
    return f"""
WITH f AS MATERIALIZED ({_beam_topk_sql()}),
ee AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
xk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT qq.vec_id AS query_id, ee.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY qq.vec_id
             ORDER BY {_cos_sql('qq.v', 'ee.v')} DESC, ee.vec_id) AS rnk
    FROM ee qq, ee WHERE qq.vec_id < {N_QUERIES}
      AND ee.vec_id <> qq.vec_id)
  WHERE rnk <= {TOP_K}
)
SELECT CAST((SELECT count(DISTINCT query_id) FROM f) AS INTEGER)
         AS n_queries,
       {TOP_K} AS k,
       CAST((SELECT count(*) FROM f
             JOIN xk ON xk.query_id = f.query_id
                    AND xk.neighbor_id = f.neighbor_id) AS INTEGER)
         AS n_hits,
       CAST((SELECT count(*) FROM f
             JOIN xk ON xk.query_id = f.query_id
                    AND xk.neighbor_id = f.neighbor_id) * 1000000
            // ((SELECT count(DISTINCT query_id) FROM f) * {TOP_K})
            AS BIGINT) AS recall_ppm"""


def _beam_curve_sql() -> str:
    """ann_beam_curve's oracle: one labeled recall row per beam width
    (BEAM_CURVE) over the same graph and exact top-k ranking."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        BEAM_CURVE,
    )

    def block(beam: int) -> str:
        return f"""
SELECT {beam} AS beam,
       CAST(count(*) AS INTEGER) AS n_queries,
       CAST(sum(CASE WHEN x.rnk = 1 THEN 1 ELSE 0 END) AS INTEGER)
         AS n_top1,
       CAST(sum(CASE WHEN x.rnk IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER)
         AS n_topk,
       CAST(sum(CASE WHEN x.rnk = 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS top1_ppm,
       CAST(sum(CASE WHEN x.rnk IS NOT NULL THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS topk_ppm
FROM ({_beam_search_sql(beam)}) f
LEFT JOIN xk x ON x.query_id = f.query_id AND x.neighbor_id = f.found_id"""

    blocks = "\nUNION ALL\n".join(block(b) for b in BEAM_CURVE)
    return f"""
WITH ee AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
xk AS MATERIALIZED (
  SELECT query_id, neighbor_id, rnk FROM (
    SELECT qq.vec_id AS query_id, ee.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY qq.vec_id
             ORDER BY {_cos_sql('qq.v', 'ee.v')} DESC, ee.vec_id) AS rnk
    FROM ee qq, ee WHERE qq.vec_id < {N_QUERIES}
      AND ee.vec_id <> qq.vec_id)
  WHERE rnk <= {TOP_K}
)
{blocks}"""


def _beam_pq_sql(beam: int | None = None) -> str:
    """Mirror of similarity.ann_beam_pq_topk — the DiskANN rung: the
    beam walk over the multi-probe graph scored by fixed-point PQ ADC
    table lookups (integer scores: the per-(query, cand) dedup max
    and every tie-break are EXACT, no float-order question inside the
    rounds), then exact-cosine re-rank of the final frontier only.
    Code positions are DENSE per-subspace ranks (row_number over
    code) because Lloyd can drop codes — both engines index the
    lookup arrays through the same (sub, code) ordering. `beam`
    parameterizes the frontier width (the PQ-domain ef curve);
    None = PQ_SERVE_BEAM, the serving default (the measured
    crossover width — ann_beam_pq_curve's conclusion)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        GS_STEPS,
        PQ_M,
        PQ_SCALE,
        PQ_SERVE_BEAM,
    )

    if beam is None:
        beam = PQ_SERVE_BEAM

    pq, cb = _pq_ctes()  # defines e, s, pc{PQ_ITERS}
    # replace the plain `e` with the MATERIALIZED one the walk reuses
    pq = pq[1:]
    d2 = ("(list_dot_product(c.cv, c.cv)"
          " - 2 * list_dot_product(s.sv, c.cv))")
    # DuckDB lists are 1-based; pos is 0-based
    score = " + ".join(f"t.tabs[{m + 1}][p.pcodes[{m + 1}] + 1]"
                       for m in range(PQ_M))
    walk_ctes = [f"""cbp AS (
  SELECT sub, code, cv,
         row_number() OVER (PARTITION BY sub ORDER BY code) - 1 AS pos
  FROM {cb}
)""", f"""penc AS (
  SELECT s.vec_id, s.sub, c.code
  FROM s JOIN cbp c USING (sub)
  QUALIFY row_number() OVER (PARTITION BY s.vec_id, s.sub
                             ORDER BY {d2}, c.code) = 1
)""", """pa AS MATERIALIZED (
  SELECT p.vec_id, list(c.pos ORDER BY p.sub) AS pcodes
  FROM penc p JOIN cbp c USING (sub, code)
  GROUP BY p.vec_id
)""", f"""pq_q AS (
  SELECT vec_id AS query_id, sub, sv AS qsv FROM s WHERE vec_id < {N_QUERIES}
)""", f"""pd AS (
  SELECT query_id, q.sub, c.pos,
         CAST(round(list_dot_product(q.qsv, c.cv) * {PQ_SCALE}) AS BIGINT)
           AS fp
  FROM pq_q q JOIN cbp c USING (sub)
)""", """pt1 AS (
  SELECT query_id, sub, list(fp ORDER BY pos) AS tab FROM pd GROUP BY 1, 2
)""", """ptabs AS MATERIALIZED (
  SELECT query_id, list(tab ORDER BY sub) AS tabs FROM pt1 GROUP BY 1
)""", f"""c0 AS MATERIALIZED (
  SELECT t.query_id, s0.node, {score} AS cur_fp
  FROM (SELECT query_id,
               CASE WHEN query_id = 0 THEN 1 ELSE 0 END AS node
        FROM ptabs) s0
  JOIN ptabs t USING (query_id)
  JOIN pa p ON p.vec_id = s0.node
)"""]
    for r in range(GS_STEPS):
        walk_ctes.append(f"""a{r} AS MATERIALIZED (
  SELECT query_id, cand_id, max(fp_raw) AS fp_raw FROM (
    SELECT c.query_id, d.nbr_id AS cand_id, {score} AS fp_raw
    FROM c{r} c
    JOIN ed d ON d.src = c.node
    JOIN ptabs t ON t.query_id = c.query_id
    JOIN pa p ON p.vec_id = d.nbr_id
    WHERE d.nbr_id <> c.query_id
    UNION ALL
    SELECT query_id, node, cur_fp FROM c{r}) u
  GROUP BY 1, 2
)""")
        walk_ctes.append(f"""c{r + 1} AS MATERIALIZED (
  SELECT query_id, cand_id AS node, fp_raw AS cur_fp FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY fp_raw DESC, cand_id) AS rn FROM a{r})
  WHERE rn <= {beam}
)""")
    walk_ctes.append(f"""rr AS (
  SELECT f.query_id, f.node AS neighbor_id,
         {_cos_sql('qe.v', 'ne.v')} AS cos_raw
  FROM c{GS_STEPS} f
  JOIN e qe ON qe.vec_id = f.query_id
  JOIN e ne ON ne.vec_id = f.node
)""")
    head = [f"""kg AS MATERIALIZED ({_knn_graph_nprobe_sql()})""",
            """ed AS MATERIALIZED (SELECT vec_id AS src, nbr_id FROM kg
       UNION SELECT nbr_id, vec_id FROM kg)""",
            """e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"""]
    return ("WITH " + ",\n".join(head + pq + walk_ctes) + f"""
SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rnk,
       round(cos_raw, 6) AS cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos_raw DESC, neighbor_id) AS rn FROM rr)
WHERE rn <= {TOP_K}""")


def _beam_pq_recall_sql() -> str:
    """ann_beam_pq_recall's oracle: one labeled set-recall@k row for
    the exact-scored beam serve and one for the PQ-scored walk +
    exact rerank, both vs the exact ranking — BOTH at the shared ef=8
    (the floor measurement; the serving default lives at
    PQ_SERVE_BEAM and is what `ann_beam_pq_topk`'s own oracle
    replays)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        BEAM_EF,
    )
    def row(method: str, rel: str) -> str:
        return f"""
SELECT '{method}' AS method,
       CAST((SELECT count(DISTINCT query_id) FROM {rel}) AS INTEGER)
         AS n_queries,
       {TOP_K} AS k,
       CAST((SELECT count(*) FROM {rel}
             JOIN xk ON xk.query_id = {rel}.query_id
                    AND xk.neighbor_id = {rel}.neighbor_id) AS INTEGER)
         AS n_hits,
       CAST((SELECT count(*) FROM {rel}
             JOIN xk ON xk.query_id = {rel}.query_id
                    AND xk.neighbor_id = {rel}.neighbor_id) * 1000000
            // ((SELECT count(DISTINCT query_id) FROM {rel}) * {TOP_K})
            AS BIGINT) AS recall_ppm"""

    return f"""
WITH g AS MATERIALIZED ({_beam_topk_sql()}),
f AS MATERIALIZED ({_beam_pq_sql(BEAM_EF)}),
ee AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
xk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT qq.vec_id AS query_id, ee.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY qq.vec_id
             ORDER BY {_cos_sql('qq.v', 'ee.v')} DESC, ee.vec_id) AS rnk
    FROM ee qq, ee WHERE qq.vec_id < {N_QUERIES}
      AND ee.vec_id <> qq.vec_id)
  WHERE rnk <= {TOP_K}
)
{row('exact_walk', 'g')}
UNION ALL
{row('pq_walk', 'f')}"""


def _beam_pq_curve_sql() -> str:
    """ann_beam_pq_curve's oracle: one labeled set-recall@k row per
    PQ-domain width (PQ_BEAM_CURVE) plus the exact walk at the ef=8
    serving default — each walk chain a self-contained MATERIALIZED
    CTE block, all against one shared exact ranking."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        BEAM_EF,
        PQ_BEAM_CURVE,
    )

    def row(method: str, beam: int, rel: str) -> str:
        return f"""
SELECT '{method}' AS method, CAST({beam} AS INTEGER) AS beam,
       CAST((SELECT count(DISTINCT query_id) FROM {rel}) AS INTEGER)
         AS n_queries,
       {TOP_K} AS k,
       CAST((SELECT count(*) FROM {rel}
             JOIN xk ON xk.query_id = {rel}.query_id
                    AND xk.neighbor_id = {rel}.neighbor_id) AS INTEGER)
         AS n_hits,
       CAST((SELECT count(*) FROM {rel}
             JOIN xk ON xk.query_id = {rel}.query_id
                    AND xk.neighbor_id = {rel}.neighbor_id) * 1000000
            // ((SELECT count(DISTINCT query_id) FROM {rel}) * {TOP_K})
            AS BIGINT) AS recall_ppm"""

    blocks = [f"g AS MATERIALIZED ({_beam_topk_sql()})"]
    rows = [row("exact_walk", BEAM_EF, "g")]
    for b in PQ_BEAM_CURVE:
        blocks.append(f"f{b} AS MATERIALIZED ({_beam_pq_sql(b)})")
        rows.append(row("pq_walk", b, f"f{b}"))
    blocks_sql = ",\n".join(blocks)
    rows_sql = "\nUNION ALL\n".join(rows)
    return f"""
WITH {blocks_sql},
ee AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
xk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT qq.vec_id AS query_id, ee.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY qq.vec_id
             ORDER BY {_cos_sql('qq.v', 'ee.v')} DESC, ee.vec_id) AS rnk
    FROM ee qq, ee WHERE qq.vec_id < {N_QUERIES}
      AND ee.vec_id <> qq.vec_id)
  WHERE rnk <= {TOP_K}
)
{rows_sql}"""


def _insert_cut_sql() -> str:
    """The 90/10 split boundary as one scalar subquery (mirrors
    similarity._insert_split's 1-row broadcast)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        INSERT_DEN,
        INSERT_NUM,
    )

    return (f"(SELECT count(*) * {INSERT_NUM} // {INSERT_DEN}"
            " FROM embeddings)")


def _graph_insert_sql(beam: int | None = None) -> str:
    """Mirror of similarity.knn_graph_insert: the beam walk of
    `_beam_search_sql` with the base graph built over the existing
    90% only, the arriving 10% as the query relation, walks SEEDED
    from each new vector's multi-probe base cells (r12 —
    `_insert_seeds`: the min-id primary member of each of its
    GRAPH_NPROBE best cells under the base's scale-aware two-level
    ranking, plus node 0 as the connectivity fallback, DISTINCT),
    and per-query top-KNN_K emission as graph edges. With `beam`
    None the width is the log2-scaled default (`insert_beam_params`,
    the bm scalar subquery); an int pins it (the insert curve)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        BEAM_EF,
        GRAPH_NPROBE,
        GS_STEPS,
        INSERT_BEAM_COEF,
        KNN_K,
    )

    beam_sql = "(SELECT b FROM bm)" if beam is None else str(int(beam))
    cut = _insert_cut_sql()
    e_where = f" WHERE vec_id < {cut}"
    rounds = []
    for r in range(GS_STEPS):
        rounds.append(f""",
a{r} AS MATERIALIZED (
  SELECT query_id, cand_id, max(cos_raw) AS cos_raw FROM (
    SELECT c.query_id, d.nbr_id AS cand_id,
           {_cos_sql('q.qv', 'e.v')} AS cos_raw
    FROM c{r} c
    JOIN ed d ON d.src = c.node
    JOIN qs q ON q.query_id = c.query_id
    JOIN e ON e.vec_id = d.nbr_id
    UNION ALL
    SELECT query_id, node, cur_cos FROM c{r}) t
  GROUP BY 1, 2
),
c{r + 1} AS MATERIALIZED (
  SELECT query_id, cand_id AS node, cos_raw AS cur_cos FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cos_raw DESC, cand_id) AS rn FROM a{r})
  WHERE rn <= {beam_sql}
)""")
    return (f"""
WITH kg AS MATERIALIZED ({_knn_graph_nprobe_sql(e_where)}),
ed AS MATERIALIZED (SELECT vec_id AS src, nbr_id FROM kg
       UNION SELECT nbr_id, vec_id FROM kg),
e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       FROM embeddings WHERE vec_id < {cut}),
qs AS MATERIALIZED (SELECT vec_id AS query_id,
       CAST(embedding AS DOUBLE[]) AS qv
       FROM embeddings WHERE vec_id >= {cut}),
""" + _hier_assign_ctes(scale_aware=True) + f""",
qgrp AS (
  SELECT query_id, g FROM (
    SELECT qs.query_id, l1.g,
           row_number() OVER (PARTITION BY qs.query_id
             ORDER BY {_cos_sql('qs.qv', 'l1.gv')} DESC, l1.g) AS arn
    FROM qs, l1) t WHERE arn = 1
),
qprobe AS (
  SELECT query_id, cell FROM (
    SELECT qgrp.query_id, cm.cell,
           row_number() OVER (PARTITION BY qgrp.query_id
             ORDER BY {_cos_sql('q.qv', 'c2.cv')} DESC, cm.cell) AS arn
    FROM qgrp
    JOIN cm ON cm.g = qgrp.g
    JOIN qs q ON q.query_id = qgrp.query_id
    JOIN c c2 ON c2.cell = cm.cell) t
  WHERE arn <= {GRAPH_NPROBE}
),
minm AS (SELECT cell, min(vec_id) AS node FROM hassigned GROUP BY cell),
seeds AS (SELECT query_id, node FROM qprobe JOIN minm USING (cell)
          UNION SELECT query_id, CAST(0 AS BIGINT) AS node FROM qs),
bm AS (SELECT greatest({BEAM_EF},
                       {INSERT_BEAM_COEF} * (length(bin(count(*))) - 1)) AS b
       FROM e),
c0 AS MATERIALIZED (
  SELECT q.query_id, s.node, {_cos_sql('q.qv', 'e.v')} AS cur_cos
  FROM seeds s JOIN qs q USING (query_id) JOIN e ON e.vec_id = s.node
)""" + "".join(rounds) + f"""
SELECT query_id AS vec_id, node AS nbr_id, CAST(rn AS INTEGER) AS rnk,
       round(cur_cos, 6) AS cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cur_cos DESC, node) AS rn FROM c{GS_STEPS})
WHERE rn <= {KNN_K}""")


def _graph_insert_recall_sql(beam: int | None = None) -> str:
    """knn_graph_insert_recall's oracle: the sampled inserted nodes'
    walk-adopted edges vs their exact k-NN against the base corpus.
    `beam` pins the walk width (the insert curve's blocks)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        KNN_K,
    )

    cut = _insert_cut_sql()
    return f"""
WITH ins AS MATERIALIZED ({_graph_insert_sql(beam)}),
ee AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sq AS (SELECT vec_id AS sid, v AS sv FROM ee
       WHERE vec_id >= {cut} AND vec_id < {cut} + {N_QUERIES}),
xk AS (
  SELECT sid, vec_id FROM (
    SELECT sq.sid, ee.vec_id,
           row_number() OVER (PARTITION BY sq.sid
             ORDER BY {_cos_sql('sq.sv', 'ee.v')} DESC, ee.vec_id) AS rnk
    FROM sq, ee WHERE ee.vec_id < {cut})
  WHERE rnk <= {KNN_K}
),
got AS (SELECT * FROM ins WHERE vec_id IN (SELECT sid FROM sq))
SELECT CAST((SELECT count(DISTINCT vec_id) FROM got) AS INTEGER)
         AS n_inserted,
       CAST({KNN_K} AS INTEGER) AS k,
       CAST((SELECT count(*) FROM got
             JOIN xk ON xk.sid = got.vec_id
                    AND xk.vec_id = got.nbr_id) AS INTEGER) AS n_hits,
       CAST((SELECT count(*) FROM got
             JOIN xk ON xk.sid = got.vec_id
                    AND xk.vec_id = got.nbr_id) * 1000000
            // ((SELECT count(DISTINCT vec_id) FROM got) * {KNN_K})
            AS BIGINT) AS recall_ppm"""


def _graph_insert_curve_sql() -> str:
    """knn_graph_insert_curve's oracle: one labeled capture row per
    fixed ef-construction width — each block the full insert-recall
    chain at a pinned beam, the `_beam_curve_sql` shape applied to
    index maintenance."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        INSERT_BEAM_CURVE,
    )

    return "\nUNION ALL\n".join(
        f"SELECT CAST({b} AS INTEGER) AS beam, * FROM "
        f"({_graph_insert_recall_sql(b)})"
        for b in INSERT_BEAM_CURVE)


def _nav_graph_stats_sql() -> str:
    """Mirror of similarity.nav_graph_stats: edge + cross-primary-cell
    counts per graph (single-probe vs multi-probe), cells from the
    scale-aware auto assignment."""
    return ("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
""" + _hier_assign_ctes(scale_aware=True) + f""",
g1 AS MATERIALIZED ({_knn_graph_sql()}),
g2 AS MATERIALIZED ({_knn_graph_nprobe_sql()})
SELECT 'single_probe' AS graph,
       CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN a.cell <> b.cell THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cross_cell,
       CAST(sum(CASE WHEN a.cell <> b.cell THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS cross_ppm
FROM g1 JOIN hassigned a ON a.vec_id = g1.vec_id
        JOIN hassigned b ON b.vec_id = g1.nbr_id
UNION ALL
SELECT 'multi_probe' AS graph,
       CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN a.cell <> b.cell THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cross_cell,
       CAST(sum(CASE WHEN a.cell <> b.cell THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS cross_ppm
FROM g2 JOIN hassigned a ON a.vec_id = g2.vec_id
        JOIN hassigned b ON b.vec_id = g2.nbr_id""")


def _beam_search_sql_default() -> str:
    """ann_beam_search's registered oracle — the default BEAM_B."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        BEAM_B,
    )

    return _beam_search_sql(BEAM_B)


def _beam_recall_sql() -> str:
    """Mirror of similarity.ann_beam_recall: one labeled recall row
    per method (greedy = beam 1, beam = BEAM_B) over the same graph
    and exact top-k ranking."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        BEAM_B,
    )

    def block(method: str, beam: int) -> str:
        return f"""
SELECT '{method}' AS method,
       CAST(count(*) AS INTEGER) AS n_queries,
       CAST(sum(CASE WHEN x.rnk = 1 THEN 1 ELSE 0 END) AS INTEGER)
         AS n_top1,
       CAST(sum(CASE WHEN x.rnk IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER)
         AS n_topk,
       CAST(sum(CASE WHEN x.rnk = 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS top1_ppm,
       CAST(sum(CASE WHEN x.rnk IS NOT NULL THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS topk_ppm
FROM ({_beam_search_sql(beam)}) f
LEFT JOIN xk x ON x.query_id = f.query_id AND x.neighbor_id = f.found_id"""

    return f"""
WITH ee AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
xk AS MATERIALIZED (
  SELECT query_id, neighbor_id, rnk FROM (
    SELECT qq.vec_id AS query_id, ee.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY qq.vec_id
             ORDER BY {_cos_sql('qq.v', 'ee.v')} DESC, ee.vec_id) AS rnk
    FROM ee qq, ee WHERE qq.vec_id < {N_QUERIES}
      AND ee.vec_id <> qq.vec_id)
  WHERE rnk <= {TOP_K}
)
{block('greedy', 1)}
UNION ALL
{block('beam', BEAM_B)}"""


def _hier_assign_ctes(scale_aware: bool = False) -> str:
    """CTE block ending in `hassigned(vec_id, cell)` — mirrors
    similarity._ivf_assigned_hier: the first ⌈√cells⌉ seeds are the
    level-1 anchors; cell→group, vector→group, then vector→best cell
    within its group, every argmax ordered (cos DESC, lower id).
    With ``scale_aware`` the anchor count is the same CASE as
    `_ivf_assigned_auto`: 1 below HIER_CELLS_MIN cells (bit-exactly
    the flat argmax — one anchor group holds every cell), ⌊√cells⌋
    at/above it."""
    nl1 = "greatest(1, CAST(floor(sqrt(cells)) AS INTEGER))"
    if scale_aware:
        nl1 = f"CASE WHEN cells < {HIER_CELLS_MIN} THEN 1 ELSE {nl1} END"
    return (f"p AS (SELECT greatest({IVF_K}, count(*) // {IVF_DIV})"
            " AS cells FROM e),\n"
            "c AS (SELECT vec_id AS cell, v AS cv FROM e, p"
            " WHERE vec_id < cells),\n"
            f"nl AS (SELECT {nl1}"
            " AS nl1 FROM p),\n"
            "l1 AS (SELECT cell AS g, cv AS gv FROM c, nl WHERE cell < nl1),\n"
            + f"""cm AS (
  SELECT cell, g FROM (
    SELECT c.cell, l1.g,
           row_number() OVER (PARTITION BY c.cell
             ORDER BY {_cos_sql('c.cv', 'l1.gv')} DESC, l1.g) AS arn
    FROM c, l1) t WHERE arn = 1
),
vgrp AS (
  SELECT vec_id, g FROM (
    SELECT e.vec_id, l1.g,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {_cos_sql('e.v', 'l1.gv')} DESC, l1.g) AS arn
    FROM e, l1) t WHERE arn = 1
),
hassigned AS (
  SELECT vec_id, cell FROM (
    SELECT vgrp.vec_id, cm.cell,
           row_number() OVER (PARTITION BY vgrp.vec_id
             ORDER BY {_cos_sql('ev.v', 'c2.cv')} DESC, cm.cell) AS arn
    FROM vgrp
    JOIN cm ON cm.g = vgrp.g
    JOIN e ev ON ev.vec_id = vgrp.vec_id
    JOIN c c2 ON c2.cell = cm.cell) t
  WHERE arn = 1
)""")


def _knn_graph_hier_sql() -> str:
    """Mirrors similarity.knn_graph_hier: the two-level assignment
    CTEs + the identical within-cell top-k tail as _knn_graph_sql."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import KNN_K

    return ("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
""" + _hier_assign_ctes() + f""",
j AS (
  SELECT a.vec_id, b.vec_id AS nbr_id, a.cell,
         {_cos_sql('ea.v', 'eb.v')} AS cos_raw
  FROM hassigned a JOIN hassigned b USING (cell)
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  WHERE a.vec_id <> b.vec_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
           ORDER BY cos_raw DESC, nbr_id) AS rnk
  FROM j
)
SELECT vec_id, nbr_id, CAST(rnk AS INTEGER) AS rnk,
       round(cos_raw, 6) AS cos_sim, CAST(cell AS BIGINT) AS cell
FROM r WHERE rnk <= {KNN_K}""")


def _ivf_hier_agreement_sql() -> str:
    """Mirrors similarity.ivf_hier_agreement: flat argmax assignment
    vs the two-level one, joined on vec_id, exact ppm."""
    return ("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
""" + _hier_assign_ctes() + f""",
fac AS (
  SELECT e.vec_id, cell, row_number() OVER (PARTITION BY e.vec_id
              ORDER BY {_cos_sql('e.v', 'cv')} DESC, cell) AS arn
  FROM e, c
),
fassigned AS (SELECT vec_id, cell AS cell_flat FROM fac WHERE arn = 1),
j AS (
  SELECT f.vec_id, cell_flat, h.cell AS cell_hier
  FROM fassigned f JOIN hassigned h USING (vec_id)
)
SELECT CAST(count(*) AS INTEGER) AS n_vectors,
       CAST(sum(CASE WHEN cell_flat = cell_hier THEN 1 ELSE 0 END)
            AS INTEGER) AS n_same,
       CAST((1000000 * sum(CASE WHEN cell_flat = cell_hier THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS agreement_ppm
FROM j""")


def _knn_graph_recall_sql() -> str:
    """Mirrors similarity.knn_graph_recall: exact kNN on the slice vs
    the cell-blocked graph on the same slice (cells sized from the
    SLICE count, matching knn_graph(sl))."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import KNN_K

    return ("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE vec_id < """ + str(BRUTE_MAX_ID) + """),
"""
            + (f"p AS (SELECT greatest({IVF_K}, count(*) // {IVF_DIV})"
               " AS cells FROM e),\n")
            + "c AS (SELECT vec_id AS cell, v AS cv FROM e, p"
              " WHERE vec_id < cells),\n"
            + f"""ac AS (
  SELECT e.vec_id, cell, row_number() OVER (PARTITION BY e.vec_id
              ORDER BY {_cos_sql('e.v', 'cv')} DESC, cell) AS arn
  FROM e, c
),
assigned AS (SELECT vec_id, cell FROM ac WHERE arn = 1),
gj AS (
  SELECT a.vec_id, b.vec_id AS nbr_id,
         {_cos_sql('ea.v', 'eb.v')} AS cos_raw
  FROM assigned a JOIN assigned b USING (cell)
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  WHERE a.vec_id <> b.vec_id
),
graph AS (
  SELECT vec_id, nbr_id, 1 AS hit FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY cos_raw DESC, nbr_id) AS rnk FROM gj)
  WHERE rnk <= {KNN_K}
),
xj AS (
  SELECT a.vec_id, b.vec_id AS nbr_id,
         {_cos_sql('a.v', 'b.v')} AS cos_raw
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
),
exact AS (
  SELECT vec_id, nbr_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY cos_raw DESC, nbr_id) AS rnk FROM xj)
  WHERE rnk <= {KNN_K}
),
j AS (
  SELECT exact.vec_id, coalesce(hit, 0) AS hit
  FROM exact LEFT JOIN graph USING (vec_id, nbr_id)
)
SELECT CAST(count(DISTINCT vec_id) AS INTEGER) AS n_vectors,
       CAST(count(*) AS INTEGER) AS n_true_edges,
       CAST(sum(hit) AS INTEGER) AS n_found,
       round(CAST(sum(hit) AS DOUBLE) / count(*), 6) AS recall
FROM j""")


def _semantic_canonicalize_sql() -> str:
    score = _quality_parts()["score"]
    return f"""
WITH RECURSIVE pairs AS (
  SELECT vec_a AS doc_a, vec_b AS doc_b FROM ({_blocked_pairs_sql()}) bq
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(id, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
),
lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY 1),
q AS (SELECT doc_id, round({score}, 6) AS quality FROM documents),
member AS (
  SELECT lab.id AS doc_id, cluster_id, quality
  FROM lab JOIN q ON q.doc_id = lab.id
),
canon AS (
  SELECT cluster_id, doc_id AS canonical_id FROM (
    SELECT cluster_id, doc_id,
           row_number() OVER (PARTITION BY cluster_id
                ORDER BY quality DESC, doc_id) AS rn
    FROM member) t WHERE rn = 1
),
sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM member GROUP BY 1)
SELECT m.doc_id, m.cluster_id, s.cluster_size, m.quality,
       c.canonical_id, (m.doc_id = c.canonical_id) AS keep
FROM member m
JOIN canon c USING (cluster_id)
JOIN sizes s USING (cluster_id)"""


def _mmr_rerank_sql() -> str:
    """Mirrors retrieval.mmr_rerank: relevance pool, fixed-point
    pairwise sims, each greedy round as a chained CTE (winner LIMIT 1
    under the identical (mmr_fp DESC, vec_id) order). The MMR
    objective stays the UNDIVIDED integer 7·rel − 3·max_sim — the
    operator never divides, so neither does the oracle."""
    from real_time_fraud_detection_flink_kafka_spark.operators.retrieval import (
        MMR_FP,
        MMR_K,
        MMR_LAMBDA_DEN,
        MMR_LAMBDA_NUM,
        MMR_POOL,
    )

    lam, mu = MMR_LAMBDA_NUM, MMR_LAMBDA_DEN - MMR_LAMBDA_NUM
    head = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qm AS (SELECT min(vec_id) AS qid FROM e),
q AS (SELECT v AS qv FROM e, qm WHERE vec_id = qid),
scored AS (
  SELECT vec_id, CAST(round({_cos_sql('e.v', 'qv')} * {MMR_FP}) AS BIGINT)
         AS rel_fp
  FROM e, q, qm WHERE vec_id <> qid
),
pool AS (SELECT * FROM scored ORDER BY rel_fp DESC, vec_id LIMIT {MMR_POOL}),
pv AS (SELECT p.vec_id, e.v FROM pool p JOIN e USING (vec_id)),
sims AS (
  SELECT a.vec_id, b.vec_id AS sel_id,
         CAST(round({_cos_sql('a.v', 'b.v')} * {MMR_FP}) AS BIGINT) AS sim_fp
  FROM pv a JOIN pv b ON a.vec_id <> b.vec_id
),
w1 AS (SELECT vec_id, rel_fp, CAST({lam} * rel_fp AS BIGINT) AS mmr_fp
       FROM pool ORDER BY mmr_fp DESC, vec_id LIMIT 1),
s1 AS (SELECT vec_id AS sel_id FROM w1)"""
    rounds = []
    for i in range(2, MMR_K + 1):
        rounds.append(f""",
c{i} AS (
  SELECT p.vec_id, p.rel_fp, max(s.sim_fp) AS ms
  FROM pool p
  JOIN sims s ON s.vec_id = p.vec_id
  JOIN s{i - 1} ON s.sel_id = s{i - 1}.sel_id
  WHERE p.vec_id NOT IN (SELECT sel_id FROM s{i - 1})
  GROUP BY 1, 2
),
w{i} AS (SELECT vec_id, rel_fp,
                CAST({lam} * rel_fp - {mu} * ms AS BIGINT) AS mmr_fp
         FROM c{i} ORDER BY mmr_fp DESC, vec_id LIMIT 1),
s{i} AS (SELECT * FROM s{i - 1} UNION ALL SELECT vec_id FROM w{i})""")
    tail = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INTEGER) AS rnk, vec_id,"
        f" round(rel_fp / {float(MMR_FP)}, 6) AS relevance, mmr_fp FROM w{i}"
        for i in range(1, MMR_K + 1))
    return head + "".join(rounds) + "\n" + tail


def _knn_diversity_sample_sql(graph_sql: str | None = None) -> str:
    """Mirrors similarity.knn_diversity_sample: the graph's edge set
    (flat knn_graph by default; pass _knn_graph_hier_sql() for the
    two-level variant) thresholded on the ROUNDED cos_sim,
    undirected-distinct pairs, recursive-CTE closure, quality argmax
    per component."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        KNN_STRONG_TAU,
    )

    if graph_sql is None:
        graph_sql = _knn_graph_sql()
    score = _quality_parts()["score"]
    return f"""
WITH RECURSIVE g AS (
  SELECT vec_id, nbr_id FROM ({graph_sql}) kg
  WHERE cos_sim >= {KNN_STRONG_TAU}
),
pairs AS (
  SELECT DISTINCT least(vec_id, nbr_id) AS doc_a,
                  greatest(vec_id, nbr_id) AS doc_b
  FROM g
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
deg AS (SELECT src AS id, count(*) AS strong_degree FROM edges GROUP BY 1),
reach(id, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
),
lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY 1),
q AS (SELECT doc_id, round({score}, 6) AS quality FROM documents),
member AS (
  SELECT lab.id AS doc_id, cluster_id, strong_degree, quality
  FROM lab JOIN deg USING (id) JOIN q ON q.doc_id = lab.id
),
canon AS (
  SELECT cluster_id, doc_id AS keep_id FROM (
    SELECT cluster_id, doc_id,
           row_number() OVER (PARTITION BY cluster_id
                ORDER BY quality DESC, doc_id) AS rn
    FROM member) t WHERE rn = 1
),
sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM member GROUP BY 1)
SELECT m.doc_id, m.cluster_id, s.cluster_size,
       CAST(m.strong_degree AS INTEGER) AS strong_degree, m.quality,
       (m.doc_id = c.keep_id) AS keep
FROM member m
JOIN canon c USING (cluster_id)
JOIN sizes s USING (cluster_id)"""


def _str_list(xs: list[str]) -> str:
    return "[" + ", ".join(f"'{x}'" for x in xs) + "]"


WS = "string_split(trim(text), ' ')"


def _quality_parts() -> dict[str, str]:
    """Quality-score SQL fragments (mirror textops.quality_score);
    reusable over any relation exposing a `text` column."""
    n_words = f"len({WS})"
    n_stop = f"len(list_filter({WS}, w -> list_contains({_str_list(STOPWORDS)}, w)))"
    n_uniq = f"len(list_distinct({WS}))"
    avg_wlen = f"((length(text) - ({n_words} - 1)) / {n_words})"
    stop_ratio = f"({n_stop} / {n_words})"
    uniq_ratio = f"({n_uniq} / {n_words})"
    score = (f"(least({n_words} / 100.0, 1.0) * 0.3"
             f" + (1 - {stop_ratio}) * 0.2"
             f" + least({avg_wlen} / 8.0, 1.0) * 0.2"
             f" + {uniq_ratio} * 0.3)")
    return {"n_words": n_words, "stop_ratio": stop_ratio,
            "uniq_ratio": uniq_ratio, "avg_wlen": avg_wlen, "score": score}


def _gopher_rules_sql() -> str:
    """Mirrors textops.gopher_rules: same tf rollup, same integer
    cross-multiplied comparisons — no FP anywhere."""
    from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
        GOPHER_MAX_MWL,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MWL,
        GOPHER_MIN_STOP_TYPES,
        GOPHER_MIN_WORDS,
        GOPHER_TOP_WORD_PCT,
        GOPHER_UNIQ_PCT,
        STOPWORDS,
    )

    stop = _str_list(STOPWORDS)
    return f"""
WITH words AS (
  SELECT doc_id, length(text) AS nc, unnest({WS}) AS word FROM documents
),
tf AS (SELECT doc_id, nc, word, count(*) AS tf FROM words GROUP BY 1, 2, 3),
agg AS (
  SELECT doc_id, nc, sum(tf) AS n_words, count(*) AS n_uniq, max(tf) AS max_tf,
         sum(CASE WHEN list_contains({stop}, word) THEN 1 ELSE 0 END) AS n_stop_types
  FROM tf GROUP BY 1, 2
),
flags AS (
  SELECT doc_id, n_words, max_tf, n_uniq, n_stop_types,
         (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}) AS ok_words,
         ((nc - (n_words - 1)) >= {GOPHER_MIN_MWL} * n_words
          AND (nc - (n_words - 1)) <= {GOPHER_MAX_MWL} * n_words) AS ok_mean_wlen,
         (max_tf * 100 <= n_words * {GOPHER_TOP_WORD_PCT}) AS ok_top_word,
         (n_stop_types >= {GOPHER_MIN_STOP_TYPES}) AS ok_stopwords,
         (n_uniq * 100 >= n_words * {GOPHER_UNIQ_PCT}) AS ok_uniq_ratio
  FROM agg
)
SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
       CAST(max_tf AS INTEGER) AS max_tf,
       CAST(n_uniq AS INTEGER) AS n_uniq,
       CAST(n_stop_types AS INTEGER) AS n_stop_types,
       ok_words, ok_mean_wlen, ok_top_word, ok_stopwords, ok_uniq_ratio,
       (ok_words AND ok_mean_wlen AND ok_top_word AND ok_stopwords
        AND ok_uniq_ratio) AS pass_all
FROM flags"""


def _text_oracles() -> dict[str, str]:
    ws = WS
    p = _quality_parts()
    n_words, stop_ratio, uniq_ratio = p["n_words"], p["stop_ratio"], p["uniq_ratio"]
    avg_wlen, score = p["avg_wlen"], p["score"]
    # fold mirroring textops.lang_id exactly (strict > keeps earlier lang)
    best_lang, best_score = f"'{LANG_MARKERS[0][0]}'", "-1"
    for lang, markers in LANG_MARKERS:
        s = f"len(list_filter({ws}, w -> list_contains({_str_list(markers)}, w)))"
        best_lang = f"(CASE WHEN {s} > {best_score} THEN '{lang}' ELSE {best_lang} END)"
        best_score = f"(CASE WHEN {s} > {best_score} THEN {s} ELSE {best_score} END)"
    from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
        BM25_B,
        BM25_K1,
        BM25_SCALE,
        BM25_TOPN,
        FUZZY_TAU,
        TFIDF_K,
    )

    # ground truth is the UNBLOCKED quadratic join — the blocked plan
    # must reproduce it row-exactly (trigram-completeness argument in
    # textops.fuzzy_match_names)
    drop_at = ("concat(substring({c}, 1, (length({c}) % 5) + 1), "
               "substring({c}, (length({c}) % 5) + 3, length({c})))")
    fuzzy_sql = f"""
WITH clean AS (SELECT DISTINCT p_name FROM part),
dirty AS (SELECT DISTINCT {drop_at.format(c='p_name')} AS dirty_name FROM clean)
SELECT d.dirty_name, c.p_name AS match_name,
       CAST(levenshtein(d.dirty_name, c.p_name) AS INTEGER) AS dist
FROM dirty d, clean c
WHERE levenshtein(d.dirty_name, c.p_name) <= {FUZZY_TAU}"""
    return {
        "fuzzy_match_names": fuzzy_sql,
        # mirrors textops.gopher_rules: every rule an integer
        # comparison (cross-multiplied ratios), nc rides the tf key
        "gopher_rules": _gopher_rules_sql(),
        # mirrors textops.word_entropy: fixed-point tf·ln(tf) terms
        # (order-free bigint sum), per-row double H in one op order
        "word_entropy": f"""
WITH words AS (SELECT doc_id, unnest({ws}) AS word FROM documents),
tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY 1, 2),
agg AS (
  SELECT doc_id, sum(tf) AS n_words, count(*) AS n_uniq,
         sum(CAST(round(tf * ln(tf) * {ENTROPY_SCALE}) AS BIGINT)) AS s_fp
  FROM tf GROUP BY 1
)
SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
       CAST(n_uniq AS INTEGER) AS n_uniq,
       round(ln(n_words) - (s_fp / {ENTROPY_SCALE}) / n_words, 6) AS entropy,
       round(CASE WHEN n_words > 1
                  THEN (ln(n_words) - (s_fp / {ENTROPY_SCALE}) / n_words)
                       / ln(n_words)
                  ELSE 0.0 END, 6) AS norm_entropy
FROM agg""",
        "token_count": f"""
SELECT doc_id,
       CAST({n_words} AS INTEGER) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS INTEGER) AS n_bpe_tokens,
       CAST(length(text) AS INTEGER) AS n_chars_actual
FROM documents""",
        "quality_score": f"""
SELECT doc_id,
       CAST({n_words} AS INTEGER) AS n_words,
       round({stop_ratio}, 6) AS stopword_ratio,
       round({uniq_ratio}, 6) AS uniq_ratio,
       round({avg_wlen}, 6) AS avg_word_len,
       round({score}, 6) AS quality
FROM documents""",
        "lang_id": f"""
SELECT doc_id, lang AS lang_declared,
       {best_lang} AS lang_pred,
       CAST({best_score} AS INTEGER) AS marker_hits
FROM documents""",
        "doc_fingerprint": f"""
SELECT doc_id, {rolling_hash_sql(ws)} AS fingerprint FROM documents""",
        "lang_id_ngram": _lang_id_ngram_sql(),
        "pii_scrub": _pii_scrub_sql(),
        # mirrors textops.bm25_more_like_this: per-term scores as
        # fixed-point bigints so the per-doc sum is order-free; the
        # (1.2 + 1) / (1 - 0.75 + ...) constant arithmetic folds to
        # the identical doubles Python precomputes on the Spark side
        "bm25_more_like_this": f"""
WITH words AS (
  SELECT doc_id, len({ws}) AS dl, unnest({ws}) AS word FROM documents
),
tf AS (SELECT doc_id, dl, word, count(*) AS tf FROM words GROUP BY 1, 2, 3),
dfr AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
qid AS (SELECT min(doc_id) AS _qid FROM documents),
qterms AS (SELECT DISTINCT word, _qid FROM words, qid WHERE doc_id = _qid),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS _n,
                 (sum(len({ws})) / count(*)) AS _avgdl
          FROM documents),
dfq AS (SELECT word, df, _qid FROM dfr JOIN qterms USING (word)),
scored AS (
  SELECT doc_id, CAST(count(*) AS INTEGER) AS n_terms,
         sum(CAST(round(ln(1 + (_n - df + 0.5) / (df + 0.5))
             * (tf * ({BM25_K1} + 1))
             / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / _avgdl))
             * {BM25_SCALE}) AS BIGINT)) AS fp
  FROM tf JOIN dfq USING (word) CROSS JOIN stats
  WHERE doc_id <> _qid GROUP BY 1
)
SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, n_terms,
       round(CAST(fp AS DOUBLE) / {float(BM25_SCALE)!r}, 6) AS bm25
FROM (SELECT *, row_number() OVER (ORDER BY fp DESC, doc_id) AS rnk
      FROM scored) t
WHERE rnk <= {BM25_TOPN}""",
        # mirrors textops.tfidf_topk: rank on the ROUNDED score so a
        # last-ulp ln() drift between libm and the JVM can't flip rows
        "tfidf_topk": f"""
WITH words AS (
  SELECT doc_id, unnest({ws}) AS word FROM documents
),
tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY 1, 2),
dfr AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(count(*) AS DOUBLE) AS _n FROM documents),
scored AS (
  SELECT doc_id, word, tf, df, round(tf * ln(_n / df), 6) AS tfidf
  FROM tf JOIN dfr USING (word) CROSS JOIN n
)
SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, word,
       CAST(tf AS INTEGER) AS tf, CAST(df AS INTEGER) AS df, tfidf
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY tfidf DESC, word) AS rnk FROM scored) t
WHERE rnk <= {TFIDF_K}""",
    }


def _pii_scrub_sql() -> str:
    """Mirror of textops.pii_scrub: deterministic PII injection, then
    staged count-and-redact (emails on the injected text, IPs after
    the email scrub, phones after the IP scrub — the staging order
    matters and is replayed exactly). regexp_replace needs the 'g'
    flag: DuckDB replaces first-match by default, Spark globally."""
    from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
        PII_EMAIL,
        PII_INJECT_MOD,
        PII_IPV4,
        PII_PHONE,
    )

    inject = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com from 10.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)"
        " || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)"
        " || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    )
    return f"""
WITH t0 AS (
  SELECT doc_id,
         CASE WHEN doc_id % {PII_INJECT_MOD} <> 0 THEN {inject}
              ELSE text END AS t
  FROM documents
), s1 AS (
  SELECT doc_id, len(regexp_extract_all(t, '{PII_EMAIL}')) AS n_emails,
         regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g') AS t
  FROM t0
), s2 AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t, '{PII_IPV4}')) AS n_ips,
         regexp_replace(t, '{PII_IPV4}', '<IP>', 'g') AS t
  FROM s1
), s3 AS (
  SELECT doc_id, n_emails, n_ips,
         len(regexp_extract_all(t, '{PII_PHONE}')) AS n_phones,
         regexp_replace(t, '{PII_PHONE}', '<PHONE>', 'g') AS t
  FROM s2
)
SELECT doc_id, CAST(n_emails AS INTEGER) AS n_emails,
       CAST(n_ips AS INTEGER) AS n_ips,
       CAST(n_phones AS INTEGER) AS n_phones,
       md5(t) AS scrubbed_md5,
       CAST(length(t) AS INTEGER) AS scrubbed_len
FROM s3"""


def _lang_id_ngram_sql() -> str:
    """Mirror of textops.lang_id_ngram: space-padded char trigrams,
    per-language profile overlap, argmax with first-listed tie-break.
    The empty-doc guard matters: Spark's sequence(1,0) reverses while
    DuckDB's generate_series(1,0) is empty, so both sides CASE on
    length >= 3."""
    from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
        LANG_TRIGRAMS,
    )

    padded = "(' ' || trim(text) || ' ')"
    tris = (f"CASE WHEN length({padded}) >= 3 THEN "
            f"list_distinct(list_transform("
            f"generate_series(1, length({padded}) - 2), "
            f"i -> substr({padded}, CAST(i AS INTEGER), 3))) "
            f"ELSE [] END")
    best_lang, best_score = f"'{LANG_TRIGRAMS[0][0]}'", "-1"
    for lang, profile in LANG_TRIGRAMS:
        prof = "[" + ", ".join("'" + t.replace("'", "''") + "'"
                               for t in profile) + "]"
        s = f"len(list_intersect(tris, {prof}))"
        best_lang = f"(CASE WHEN {s} > {best_score} THEN '{lang}' ELSE {best_lang} END)"
        best_score = f"(CASE WHEN {s} > {best_score} THEN {s} ELSE {best_score} END)"
    return f"""
WITH t AS (SELECT doc_id, lang, {tris} AS tris FROM documents)
SELECT doc_id, lang AS lang_declared,
       {best_lang} AS lang_pred,
       CAST({best_score} AS INTEGER) AS tri_hits
FROM t"""


def corpus_prep_oracle(min_quality: float) -> str:
    """Full prep pipeline mirror: exact dedup → near-dup drop →
    quality gate → stats + fingerprint."""
    p = _quality_parts()
    return f"""
WITH kept1 AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
d1 AS (SELECT d.* FROM documents d JOIN kept1 USING (doc_id)),
w AS (SELECT doc_id, {WS} AS ws FROM d1),
ex AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - {SHINGLE_N - 1})) AS i FROM w),
sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS shingle FROM ex),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_b FROM common
  JOIN sizes na ON na.doc_id = doc_a
  JOIN sizes nb ON nb.doc_id = doc_b
  WHERE round(CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common), 6) >= {JACCARD_THRESHOLD}
),
d2 AS (SELECT * FROM d1 WHERE doc_id NOT IN (SELECT DISTINCT doc_b FROM pairs))
SELECT doc_id,
       CAST({p['n_words']} AS INTEGER) AS n_words,
       round({p['uniq_ratio']}, 6) AS uniq_ratio,
       round({p['score']}, 6) AS quality,
       {rolling_hash_sql(WS)} AS fingerprint
FROM d2
WHERE round({p['score']}, 6) >= {min_quality!r}"""



def _intake_ctes(min_quality: float) -> str:
    """The shared six-stage intake CTE chain (raw → exact dedup d1 →
    near-dup d2 → decontaminated d3 → sampled d4 → quality-gated d5)
    — consumed by both corpus_to_packs_oracle (which packs d5) and
    corpus_filter_funnel_oracle (which counts every stage)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        DECON_NGRAM,
        EVAL_MOD,
        SAMPLE_MOD,
        SAMPLE_RATES_BP,
    )

    p = _quality_parts()
    grams8 = " || ' ' || ".join(f"ws8[i + {j}]" for j in range(DECON_NGRAM))
    rate = str(SAMPLE_MOD)
    for lang, bp in SAMPLE_RATES_BP.items():
        rate = f"(CASE WHEN lang = '{lang}' THEN {bp} ELSE {rate} END)"
    bucket = f"({md5_int60_sql('CAST(doc_id AS VARCHAR)')} % {SAMPLE_MOD})"
    return f"""kept1 AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
d1 AS (SELECT d.* FROM documents d JOIN kept1 USING (doc_id)),
w AS (SELECT doc_id, {WS} AS ws FROM d1),
ex AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - {SHINGLE_N - 1})) AS i FROM w),
sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS shingle FROM ex),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
neardup AS (
  SELECT doc_b FROM common
  JOIN sizes na ON na.doc_id = doc_a
  JOIN sizes nb ON nb.doc_id = doc_b
  WHERE round(CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common), 6) >= {JACCARD_THRESHOLD}
),
d2 AS (SELECT * FROM d1 WHERE doc_id NOT IN (SELECT DISTINCT doc_b FROM neardup)),
w8 AS (SELECT doc_id, {WS} AS ws8 FROM d2),
ex8 AS (SELECT doc_id, ws8, unnest(generate_series(1, len(ws8) - {DECON_NGRAM - 1})) AS i FROM w8),
sh8 AS (SELECT DISTINCT doc_id, {grams8} AS shingle FROM ex8),
flagged AS (
  SELECT DISTINCT tr.doc_id
  FROM (SELECT * FROM sh8 WHERE doc_id % {EVAL_MOD} <> 0) tr
  JOIN (SELECT * FROM sh8 WHERE doc_id % {EVAL_MOD} = 0) ev
    ON tr.shingle = ev.shingle
),
d3 AS (SELECT * FROM d2 WHERE doc_id % {EVAL_MOD} <> 0
       AND doc_id NOT IN (SELECT doc_id FROM flagged)),
d4 AS (SELECT * FROM d3 WHERE {bucket} < {rate}),
d5 AS (SELECT * FROM d4 WHERE round({p['score']}, 6) >= {min_quality!r})"""


def corpus_to_packs_oracle(min_quality: float) -> str:
    """Six-stage intake mirror ending in the recursive packing CTE."""
    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        PACK_BUDGET,
        PACK_SHARDS,
    )

    return f"""
WITH RECURSIVE
{_intake_ctes(min_quality)},
t AS (
  SELECT doc_id, CAST(doc_id % {PACK_SHARDS} AS INTEGER) AS shard,
         CAST(len({WS}) AS INTEGER) AS n_tokens,
         row_number() OVER (PARTITION BY doc_id % {PACK_SHARDS}
                            ORDER BY doc_id) AS rn
  FROM d5
),
rec AS (
  SELECT shard, rn, doc_id, n_tokens,
         CAST(0 AS INTEGER) AS pack_id, n_tokens AS acc
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.shard, t.rn, t.doc_id, t.n_tokens,
         CAST(CASE WHEN rec.acc + t.n_tokens > {PACK_BUDGET}
                   THEN rec.pack_id + 1 ELSE rec.pack_id END AS INTEGER),
         CASE WHEN rec.acc + t.n_tokens > {PACK_BUDGET}
              THEN t.n_tokens ELSE rec.acc + t.n_tokens END
  FROM rec JOIN t ON t.shard = rec.shard AND t.rn = rec.rn + 1
)
SELECT doc_id, shard, pack_id, n_tokens FROM rec"""


def corpus_filter_funnel_oracle(min_quality: float) -> str:
    """Per-stage attrition mirror: doc and token counts after every
    intake stage (same shared CTE chain as corpus_to_packs), plus the
    stage-6 exact-substring cut over the quality survivors (the
    sub_* chain replayed on d5; kept tokens = len(ws) − covered
    positions, zero-token docs drop)."""
    nt = f"sum(len({WS}))"
    stages = [("00_raw", "documents"), ("01_exact_dedup", "d1"),
              ("02_near_dup", "d2"), ("03_decontaminated", "d3"),
              ("04_sampled", "d4"), ("05_quality", "d5")]
    selects = "\nUNION ALL ".join(
        f"SELECT '{name}' AS stage, count(*) AS n_docs, {nt} AS n_tokens FROM {rel}"
        for name, rel in stages)
    return f"""
WITH {_intake_ctes(min_quality)},
{_substring_ctes("d5")},
sub_toks AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS i
  FROM sub_w, unnest(generate_series(1, len(ws))) u(i)
),
span_after AS (
  SELECT w.doc_id, len(w.ws) - count(c.i) AS n_after
  FROM sub_w w
  LEFT JOIN (
    SELECT DISTINCT t.doc_id, t.i
    FROM sub_toks t JOIN sub_spans s
      ON s.doc_id = t.doc_id
     AND t.i >= s.span_start AND t.i < s.span_start + s.span_len
  ) c ON c.doc_id = w.doc_id
  GROUP BY w.doc_id, len(w.ws)
)
{selects}
UNION ALL SELECT '06_span_dedup' AS stage, count(*) AS n_docs,
          coalesce(sum(n_after), 0) AS n_tokens
FROM span_after WHERE n_after > 0"""


def _multimodal_oracles() -> dict[str, str]:
    from real_time_fraud_detection_flink_kafka_spark.operators.multimodal import (
        AUDIO_RATES,
        AUDIO_SAMPLES_PER_BYTE,
        FRAME_INTERVAL,
        PHASH_BANDS,
        PHASH_CELLS,
        PHASH_COLS,
        PHASH_DELTA_MOD,
        PHASH_HAMMING_MAX,
        PHASH_MIN_LEN,
        PHASH_TWIN_MOD,
        PHASH_TWIN_OFFSET,
    )

    mod_case = "".join(
        f" WHEN {i} THEN '{m}'" for i, m in enumerate(MODALITIES)
    )
    video_idx = MODALITIES.index("video")
    image_idx = MODALITIES.index("image")
    audio_idx = MODALITIES.index("audio")
    nb = "CAST(octet_length(encode(text)) AS INTEGER)"
    C, W = PHASH_CELLS, PHASH_COLS - 1
    # dHash signature CTE chain — sig(doc_id, phash) — shared by the
    # dedup_image_phash pair oracle and the phash_stats occupancy
    # audit. Integer pooling over ascii codes mirrors
    # multimodal.image_phash_signatures exactly (ASCII corpus: DuckDB
    # ord == Spark ascii per byte).
    phash_sig_ctes = f"""imgs AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % {len(MODALITIES)} = {image_idx}
    AND length(text) >= {PHASH_MIN_LEN}
),
allimgs AS (
  SELECT doc_id, text FROM imgs
  UNION ALL
  SELECT doc_id + {PHASH_TWIN_OFFSET},
         substr(text, 1, length(text) // 2 - 1) || 'x'
           || substr(text, length(text) // 2 + 1)
  FROM imgs WHERE doc_id % {PHASH_TWIN_MOD} = 0
),
cells AS (
  SELECT doc_id, i,
         list_sum(list_transform(
           generate_series(1 + (i * length(text)) // {C},
                           ((i + 1) * length(text)) // {C}),
           p -> ord(substr(text, p, 1))))
         // (((i + 1) * length(text)) // {C}
             - (i * length(text)) // {C}) AS cv
  FROM allimgs, (SELECT unnest(generate_series(0, {C - 1})) AS i) g
),
sig AS (
  SELECT c1.doc_id,
         CAST(sum(CASE WHEN c2.cv > c1.cv
              THEN (CAST(1 AS BIGINT)
                    << ((c1.i // {PHASH_COLS}) * {W} + (c1.i % {PHASH_COLS})))
              ELSE 0 END) AS BIGINT) AS phash
  FROM cells c1
  JOIN cells c2 ON c2.doc_id = c1.doc_id AND c2.i = c1.i + 1
  WHERE c1.i % {PHASH_COLS} < {W}
  GROUP BY c1.doc_id
)"""
    return {
        # dHash perceptual near-dup: the oracle is the QUADRATIC
        # contract (all image pairs with hamming <= max) — equality
        # with Spark's banded join IS the pigeonhole completeness
        # check (<=3 differing bits leave >=1 of 4 bands equal).
        "dedup_image_phash": f"""
WITH {phash_sig_ctes}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_HAMMING_MAX}""",
        "phash_stats": _band_stats_sql(phash_sig_ctes, "phash",
                                       PHASH_BANDS, PHASH_HAMMING_MAX),
        # delta-vs-corpus quadratic contract: every PHASH_DELTA_MOD-th
        # original image doc (twins stay corpus-side) LEFT-joined
        # against ALL corpus signatures by brute-force hamming —
        # equality with Spark's banded probe IS the pigeonhole
        # completeness proof for the intake path too
        "dedup_phash_incremental": f"""
WITH {phash_sig_ctes},
d AS (
  SELECT doc_id, phash FROM sig
  WHERE doc_id < {PHASH_TWIN_OFFSET}
    AND (doc_id // {len(MODALITIES)}) % {PHASH_DELTA_MOD} = 0
),
c AS (
  SELECT doc_id, phash FROM sig
  WHERE NOT (doc_id < {PHASH_TWIN_OFFSET}
             AND (doc_id // {len(MODALITIES)}) % {PHASH_DELTA_MOD} = 0)
),
hits AS (
  SELECT d.doc_id,
         coalesce(sum(CASE WHEN c.phash = d.phash THEN 1 ELSE 0 END), 0)
           AS n_same_hash,
         count(c.doc_id) AS n_near
  FROM d LEFT JOIN c
    ON bit_count(xor(d.phash, c.phash)) <= {PHASH_HAMMING_MAX}
  GROUP BY 1
)
SELECT doc_id,
       CASE WHEN n_same_hash > 0 THEN 'same_hash'
            WHEN n_near > 0 THEN 'near_dup'
            ELSE 'new' END AS status,
       CAST(n_same_hash AS BIGINT) AS n_same_hash,
       CAST(n_near AS BIGINT) AS n_near
FROM hits""",
        "multimodal_meta": f"""
SELECT doc_id,
       (CASE (doc_id % {len(MODALITIES)}){mod_case} END) AS modality,
       source,
       {nb} AS n_bytes,
       md5(text) AS content_md5
FROM documents""",
        # audio segmentation: 1 s windows at the stub sample rate,
        # 50% hop, truncated tail — integer arithmetic end to end
        # (all AUDIO_RATES even, so hop = sr // 2 is exact)
        "multimodal_segment_audio": f"""
WITH au AS (
  SELECT doc_id, {nb} AS n_bytes,
         CAST([{", ".join(str(r) for r in AUDIO_RATES)}]
              [({nb} % {len(AUDIO_RATES)}) + 1] AS INTEGER) AS sr,
         CAST({nb} AS BIGINT) * {AUDIO_SAMPLES_PER_BYTE} AS n_samples
  FROM documents
  WHERE doc_id % {len(MODALITIES)} = {audio_idx}
)
SELECT doc_id, sr, n_samples,
       CAST(k AS INTEGER) AS seg_idx,
       CAST(k * (sr // 2) AS BIGINT) AS seg_start,
       CAST(least(CAST(sr AS BIGINT),
                  n_samples - k * (sr // 2)) AS BIGINT) AS seg_len
FROM au, LATERAL unnest(generate_series(0, (n_samples - 1) // (sr // 2)))
     AS g(k)""",
        "multimodal_frame_sample": f"""
SELECT doc_id, {nb} AS n_bytes, ({nb} % 120) + 1 AS n_frames,
       CAST(unnest(generate_series(0, ({nb} % 120), {FRAME_INTERVAL})) AS INTEGER) AS frame_idx
FROM documents
WHERE doc_id % {len(MODALITIES)} = {video_idx}""",
        # The "decoder" is a deterministic stub (multimodal._fake_decode):
        # width/height are pure arithmetic on the utf-8 byte length, so
        # the whole pipeline is oracle-checkable end to end.
        "multimodal_decode": f"""
SELECT doc_id,
       (CASE (doc_id % {len(MODALITIES)}){mod_case} END) AS modality,
       {nb} AS n_bytes,
       CAST(({nb} % 640) + 1 AS INTEGER) AS width,
       CAST((({nb} * 7) % 480) + 1 AS INTEGER) AS height,
       'stub-decoded' AS status
FROM documents""",
        "multimodal_resize": f"""
WITH dec AS (
  SELECT doc_id,
         (CASE (doc_id % {len(MODALITIES)}){mod_case} END) AS modality,
         CAST(({nb} % 640) + 1 AS BIGINT) AS width,
         CAST((({nb} * 7) % 480) + 1 AS BIGINT) AS height
  FROM documents)
SELECT doc_id, modality,
       CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
       CAST(256 AS INTEGER) AS target,
       CAST(greatest((width * 256) // greatest(width, height, 1), 1) AS INTEGER) AS out_width,
       CAST(greatest((height * 256) // greatest(width, height, 1), 1) AS INTEGER) AS out_height,
       'stub-resized' AS status
FROM dec""",
    }
