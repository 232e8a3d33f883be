"""Eleventh extension batch (x164+): substring-level duplication,
code-switch detection, and deterministic weighted sampling.

- x164 duplicated-span detection — the substring-level complement of the
  document-level dedup family (ExactSubstr in "Deduplicating Training
  Data Makes Language Models Better", arXiv:2107.06499): find maximal
  token spans that occur verbatim in ≥2 documents.  Fixed-width token
  shingles are hashed and counted; positions whose shingle is shared
  cross-document are merged per-document into maximal spans with a
  gaps-and-islands pass.
- x165 code-switch / mixed-language detection — chunk-level language ID
  (the x3 marker argmax applied per 25-token chunk) rolled up to a
  per-document language-mixing profile.  Catches documents whose
  dominant-language label hides embedded foreign spans — a real
  training-data contamination mode that document-level lang-ID misses.
- x166 weighted sample without replacement — Efraimidis–Spirakis A-ES
  (key = ln(u) / w, top-k by key) with the uniform u derived from
  md5(doc_id), so the "random" sample is fully deterministic and
  engine-portable.  One pass + global top-k; the distributed form of
  weighted reservoir sampling.

Scale notes per query in docstrings; no query shuffles document text —
only hashes, positions, and counts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from social_warner_spark.functions.text import LANG_MARKERS, tokens, shingles_from_tokens
from social_warner_spark.queries.common import T, r6

#: x164 — width (in word tokens) of the duplicated-span shingle.  Spans
#: shorter than this are not detectable; matches the 50-token window of
#: arXiv:2107.06499 scaled to the testdata's short documents.
SPAN_W = 8

#: x165 — tokens per language-ID chunk.
CHUNK_TOKENS = 25

#: x166 — sample size.
SAMPLE_K = 100

_LANGS = sorted(LANG_MARKERS)


def x164_dup_spans(spark, sf_dir):
    """Maximal cross-document duplicated token spans per document.

    Plan: tokenize once; posexplode ``SPAN_W``-gram shingles to
    (doc_id, pos, h=md5-64(shingle)) — the text itself never shuffles,
    only 16-hex-char hashes.  Shingle hashes seen in ≥2 distinct docs
    (one partial-agg shuffle) mark their positions as duplicated; a
    per-document gaps-and-islands window (new island when the gap
    between hit positions exceeds the shingle width) merges overlapping
    hits into maximal spans.  Output: per doc, the span count, total
    duplicated tokens, and duplicated fraction.

    100 TB: the shingle-hash agg is the only corpus-sized shuffle
    (map-side combine; 16-byte keys).  The island window partitions by
    doc — partition size bounded by document length.  At full scale use
    the full 128-bit md5 (collision headroom) and a Bloom-filter
    pre-join on the duplicated-hash set.
    """
    d = T(spark, sf_dir, "documents").select("doc_id", tokens(F.col("text")).alias("toks"))
    d = d.select("doc_id", F.size("toks").alias("n_toks"), "toks")
    sh = d.select(
        "doc_id",
        "n_toks",
        F.posexplode(shingles_from_tokens(F.col("toks"), SPAN_W)).alias("pos", "shingle"),
    ).select("doc_id", "n_toks", "pos", F.substring(F.md5("shingle"), 1, 16).alias("h"))

    dup = (
        sh.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    hits = sh.join(dup, "h").select("doc_id", "n_toks", "pos")

    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn(
        "nf",
        F.when(F.col("pos") - F.lag("pos").over(w) <= SPAN_W, F.lit(0)).otherwise(F.lit(1)),
    )
    grp = isl.withColumn("g", F.sum("nf").over(w))
    spans = grp.groupBy("doc_id", "n_toks", "g").agg(
        F.min("pos").alias("s0"), (F.max("pos") + SPAN_W - 1).alias("s1")
    )
    return spans.groupBy("doc_id", "n_toks").agg(
        F.count("*").alias("n_dup_spans"),
        F.sum(F.col("s1") - F.col("s0") + 1).alias("dup_tokens"),
    ).select(
        "doc_id",
        "n_dup_spans",
        "dup_tokens",
        r6(F.col("dup_tokens") / F.col("n_toks").cast("double")).alias("dup_frac"),
    )


def x165_mixed_language(spark, sf_dir):
    """Per-document language-mixing profile from chunk-level lang-ID.

    Each 25-token chunk gets the x3 marker-argmax language ('und' when
    no marker hits); the rollup reports chunks, distinct non-'und'
    languages, the dominant chunk language (max chunk count, ties by
    language code), and its share of chunks.

    Plan: one token explode → one (doc, chunk) partial-agg shuffle with
    conditional counts (rows after it are |chunks|-sized, never
    token-sized) → |doc|-sized rollups.  100 TB: the token explode is a
    narrow map over the scan; everything post-agg is bounded by
    documents × chunks-per-doc.
    """
    d = T(spark, sf_dir, "documents").select("doc_id", tokens(F.col("text")).alias("toks"))
    tok = d.select("doc_id", F.posexplode("toks").alias("pos", "token")).select(
        "doc_id", F.floor(F.col("pos") / CHUNK_TOKENS).alias("chunk_id"), "token"
    )
    counts = tok.groupBy("doc_id", "chunk_id").agg(
        *[
            F.sum(F.when(F.col("token").isin(*LANG_MARKERS[lg]), 1).otherwise(0)).alias(f"s_{lg}")
            for lg in _LANGS
        ]
    )
    best = None
    for lg in _LANGS:  # left fold → first max wins (lexicographic tie-break)
        cur = F.struct(F.col(f"s_{lg}").alias("score"), F.lit(lg).alias("lg"))
        best = cur if best is None else F.when(cur["score"] > best["score"], cur).otherwise(best)
    chunk_lang = counts.select(
        "doc_id",
        "chunk_id",
        F.when(best["score"] > 0, best["lg"]).otherwise(F.lit("und")).alias("chunk_lang"),
    )

    lang_counts = chunk_lang.groupBy("doc_id", "chunk_lang").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), "chunk_lang")
    dom = lang_counts.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    per_doc = lang_counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_chunks"),
        F.sum(F.when(F.col("chunk_lang") != "und", 1).otherwise(0)).alias("n_langs"),
    )
    return per_doc.join(dom, "doc_id").select(
        "doc_id",
        "n_chunks",
        "n_langs",
        F.col("chunk_lang").alias("dom_lang"),
        r6(F.col("cnt") / F.col("n_chunks").cast("double")).alias("dom_share"),
    )


def x166_weighted_sample(spark, sf_dir):
    """Deterministic weighted sample without replacement (A-ES, k=100).

    Efraimidis–Spirakis: each doc gets key = ln(u) / w with weight
    w = n_chars and u ∈ (0,1] uniform; the top-k keys are a weighted
    sample without replacement.  u is derived from the first 8 hex
    chars of md5(doc_id) — no RNG, so both engines select the identical
    sample.  Keys are rounded to 6dp and tie-broken by doc_id so the
    boundary row is engine-stable (same protocol as every rounded
    ranking in the suite).

    Plan: narrow map + global top-k (TakeOrderedAndProject — k rows per
    partition then k at the driver; no global sort).  This IS the
    distributed form of weighted reservoir sampling: at 100 TB each
    executor keeps a k-row heap and only k-row partials move.
    """
    d = T(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("double")
        + 1.0
    ) / F.lit(4294967296.0)
    key = F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    return (
        d.select("doc_id", "n_chars", r6(key).alias("es_key"))
        .orderBy(F.desc("es_key"), "doc_id")
        .limit(SAMPLE_K)
    )


QUERIES = {
    "x164_dup_spans": x164_dup_spans,
    "x165_mixed_language": x165_mixed_language,
    "x166_weighted_sample": x166_weighted_sample,
}

_MARKER_IN = {lg: ", ".join(f"'{w}'" for w in LANG_MARKERS[lg]) for lg in _LANGS}

_CHUNK_BEST_EXPR = "s_" + _LANGS[0]
_CHUNK_BEST_LG = f"'{_LANGS[0]}'"
for _lg in _LANGS[1:]:
    _CHUNK_BEST_LG = f"CASE WHEN s_{_lg} > {_CHUNK_BEST_EXPR} THEN '{_lg}' ELSE {_CHUNK_BEST_LG} END"
    _CHUNK_BEST_EXPR = f"GREATEST({_CHUNK_BEST_EXPR}, s_{_lg})"

#: Portable hex→uint64 (first 8 md5 hex chars) as a DuckDB fold — the
#: mirror of Spark's conv(substr(md5(x),1,8),16,10).
_HEX8_TO_INT = (
    "reduce(list_transform(string_split_regex(substr(md5({x}), 1, 8), ''),"
    " c -> CAST(CASE WHEN c BETWEEN '0' AND '9' THEN ascii(c)-48"
    " ELSE ascii(c)-87 END AS BIGINT)), (a, b) -> a*16+b)"
)

ORACLES = {
    "x164_dup_spans": f"""
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
        ), pos AS (
            SELECT doc_id, len(t) AS n_toks, t,
                   unnest(generate_series(1, len(t) - {SPAN_W} + 1)) AS i
            FROM toks
        ), sh AS (
            SELECT doc_id, n_toks, i - 1 AS pos,
                   substr(md5(array_to_string(t[i:i+{SPAN_W - 1}], ' ')), 1, 16) AS h
            FROM pos
        ), dup AS (
            SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
        ), hits AS (
            SELECT doc_id, n_toks, pos FROM sh JOIN dup USING (h)
        ), isl AS (
            SELECT doc_id, n_toks, pos,
                   CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                             <= {SPAN_W} THEN 0 ELSE 1 END AS nf
            FROM hits
        ), grp AS (
            SELECT doc_id, n_toks, pos,
                   SUM(nf) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
            FROM isl
        ), spans AS (
            SELECT doc_id, n_toks, g,
                   MIN(pos) AS s0, MAX(pos) + {SPAN_W} - 1 AS s1
            FROM grp GROUP BY doc_id, n_toks, g
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
               CAST(SUM(s1 - s0 + 1) AS BIGINT) AS dup_tokens,
               ROUND(SUM(s1 - s0 + 1) / CAST(n_toks AS DOUBLE), 6) AS dup_frac
        FROM spans
        GROUP BY doc_id, n_toks
    """,
    "x165_mixed_language": f"""
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
        ), tok AS (
            SELECT doc_id,
                   (unnest(generate_series(1, len(t))) - 1) // {CHUNK_TOKENS} AS chunk_id,
                   unnest(t) AS token
            FROM toks
        ), counts AS (
            SELECT doc_id, chunk_id,
                   {", ".join(f"COUNT(*) FILTER (WHERE token IN ({_MARKER_IN[lg]})) AS s_{lg}" for lg in _LANGS)}
            FROM tok GROUP BY doc_id, chunk_id
        ), chunk_lang AS (
            SELECT doc_id, chunk_id,
                   CASE WHEN {_CHUNK_BEST_EXPR} > 0 THEN {_CHUNK_BEST_LG}
                        ELSE 'und' END AS chunk_lang
            FROM counts
        ), lang_counts AS (
            SELECT doc_id, chunk_lang, COUNT(*) AS cnt
            FROM chunk_lang GROUP BY doc_id, chunk_lang
        ), dom AS (
            SELECT doc_id, chunk_lang, cnt,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY cnt DESC, chunk_lang) AS rn
            FROM lang_counts
        ), per_doc AS (
            SELECT doc_id,
                   CAST(SUM(cnt) AS BIGINT) AS n_chunks,
                   CAST(COUNT(*) FILTER (WHERE chunk_lang != 'und') AS BIGINT) AS n_langs
            FROM lang_counts GROUP BY doc_id
        )
        SELECT p.doc_id, p.n_chunks, p.n_langs,
               d.chunk_lang AS dom_lang,
               ROUND(d.cnt / CAST(p.n_chunks AS DOUBLE), 6) AS dom_share
        FROM per_doc p JOIN dom d ON p.doc_id = d.doc_id AND d.rn = 1
    """,
    "x166_weighted_sample": f"""
        SELECT doc_id, n_chars,
               ROUND(ln(({_HEX8_TO_INT.format(x="CAST(doc_id AS VARCHAR)")} + 1.0)
                        / 4294967296.0)
                     / CAST(GREATEST(n_chars, 1) AS DOUBLE), 6) AS es_key
        FROM documents
        ORDER BY es_key DESC, doc_id
        LIMIT {SAMPLE_K}
    """,
}
