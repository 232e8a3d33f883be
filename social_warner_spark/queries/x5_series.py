"""Fifth extension batch: corpus composition operators — mixture
rebalancing, context chunking, token-budget selection, unigram-LM
scoring — plus the SCD2 history build.

These are the "what goes into the training run" half of the pipeline
(the x3-series covered "what gets removed").  All follow the standard
determinism protocol: md5-hash randomness, exact-integer token math,
6dp rounding on computed doubles, fixed float expression shapes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from social_warner_spark.functions.text import quality_score, token_count_ws, tokens
from social_warner_spark.queries.common import (
    T,
    TS_FMT_MICRO_DUCK,
    TS_FMT_MICRO_SPARK,
    r6,
)

#: x41 — context window geometry (tokens).
CHUNK = 64
STRIDE = 48
#: x42 — per-language token budget.
LANG_BUDGET = 5000


def x40_mixture_rebalance(spark, sf_dir):
    """Corpus mixture rebalancing: given a uniform per-language target
    share, compute each language's deterministic keep-rate
    (min(1, target_tokens / lang_tokens)) and flag which docs a
    rate-proportional md5 sample keeps.  The rate table is a handful of
    rows broadcast back — the corpus scan never shuffles.

    The hash-threshold compare happens in hex-string space (4 hex chars
    = 65536 buckets) so ANY engine selects identical rows; rate ≥ 1
    short-circuits the compare (a 5-hex threshold would break the
    fixed-width string ordering)."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count_ws(F.col("text")).alias("n_tokens")
    )
    langstats = d.groupBy("lang").agg(F.sum("n_tokens").alias("lang_tokens"))
    tot = langstats.agg(
        F.sum("lang_tokens").alias("total_tokens"), F.count("*").alias("n_langs")
    )
    rate = F.least(
        F.lit(1.0), (F.col("total_tokens") / F.col("n_langs")) / F.col("lang_tokens")
    )
    rates = langstats.crossJoin(F.broadcast(tot)).select(
        "lang",
        r6(rate).alias("keep_rate"),
        F.lpad(
            F.lower(F.conv(F.floor(rate * 65536).cast("string"), 10, 16)), 4, "0"
        ).alias("thresh"),
        (rate >= 1.0).alias("keep_all"),
    )
    h4 = F.substring(F.md5(F.concat_ws("|", F.lit("mix"), F.col("doc_id").cast("string"))), 1, 4)
    return (
        d.join(F.broadcast(rates), "lang")
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "keep_rate",
            (F.col("keep_all") | (h4 < F.col("thresh"))).cast("int").alias("keep"),
        )
    )


def x41_chunking(spark, sf_dir):
    """Context-window chunking: split each doc into 64-token chunks with
    16-token overlap (stride 48), emitting offsets AND the chunk text.
    The chunk starts come from `sequence()` over the doc's own length —
    a narrow per-row explode, no shuffle anywhere."""
    staged = T(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).select("doc_id", "toks", F.size("toks").alias("n"))
    exploded = staged.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(STRIDE))
        ).alias("start"),
    )
    return exploded.select(
        "doc_id",
        (F.col("start") / STRIDE).cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start_tok"),
        F.least(F.col("start") + CHUNK, F.col("n")).cast("long").alias("end_tok"),
        F.array_join(F.slice("toks", F.col("start") + 1, F.lit(CHUNK)), " ").alias(
            "chunk_text"
        ),
    )


def x42_budget_selection(spark, sf_dir):
    """Data selection under a token budget: per language, take docs in
    (quality desc, doc_id) order until the 5000-token budget is spent —
    the deterministic greedy selection used to compose a training mix.

    r07: the per-lang running sum is a GROUPED distributed cumsum
    (operators/ordered.py) — ``Window.partitionBy(lang)`` is ~10
    single-task corpus sorts at 100 TB; range partitioning on
    (lang, q desc, doc_id) stays balanced under any language mix."""
    from social_warner_spark.operators.ordered import with_grouped_cumsum

    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        token_count_ws(F.col("text")).alias("n_tokens"),
        r6(quality_score(F.col("text"))).alias("q"),
    )
    cum = with_grouped_cumsum(
        d, ["lang"], [F.desc("q"), "doc_id"], {"cum_tokens": "n_tokens"}
    )
    return cum.where(F.col("cum_tokens") <= LANG_BUDGET).select(
        "doc_id", "lang", "q", "cum_tokens"
    )


def x43_unigram_logprob(spark, sf_dir):
    """Unigram language-model scoring: fit the corpus's own unigram
    distribution, then score each doc by its mean token log-probability —
    the classic cheap perplexity-ish quality signal (low avg_logp = the
    doc is full of corpus-rare tokens).  Token stats are one groupBy;
    the vocabulary total is a single broadcast row."""
    tok = T(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    tokstats = tok.groupBy("tok").agg(F.count("*").alias("c"))
    tot = tokstats.agg(F.sum("c").alias("total"))
    return (
        tok.join(tokstats, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            r6(F.avg(F.log(F.col("c") / F.col("total")))).alias("avg_logp"),
        )
    )


def x44_scd2_history(spark, sf_dir):
    """SCD2 (type-2 slowly-changing dimension) history build: each
    user's event stream becomes validity intervals — valid_from = the
    event, valid_to = the next event (NULL while current).  The
    warehouse-side twin of the reference's append-only load
    (data_load.py WRITE_APPEND): same rows, but queryable as-of any
    point in time.  One shuffle on user_id; lead() rides the sort."""
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.date_format("ts", TS_FMT_MICRO_SPARK).alias("valid_from"),
        F.date_format(nxt, TS_FMT_MICRO_SPARK).alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


QUERIES = {
    "x40_mixture_rebalance": x40_mixture_rebalance,
    "x41_chunking": x41_chunking,
    "x42_budget_selection": x42_budget_selection,
    "x43_unigram_logprob": x43_unigram_logprob,
    "x44_scd2_history": x44_scd2_history,
}

#: quality_score's SQL form — kept textually identical to the x4_quality
#: oracle (queries/x_series.py) so both stay in lockstep.
_QUALITY_SQL = """
               0.5 * LEAST(CAST(len(string_split(trim(text), ' ')) AS DOUBLE) / 200.0, 1.0)
             + 0.3 * (1.0 - LEAST(ABS(length(regexp_replace(text, '\\s+', '', 'g')) / GREATEST(CAST(len(string_split(trim(text), ' ')) AS DOUBLE), 1.0) - 5.0) / 5.0, 1.0))
             + 0.2 * (1.0 - length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                            / GREATEST(CAST(length(text) AS DOUBLE), 1.0))
"""

ORACLES = {
    "x40_mixture_rebalance": """
        WITH d AS (
            SELECT doc_id, lang,
                   CAST(len(string_split(trim(text), ' ')) AS INT) AS n_tokens
            FROM documents
        ), langstats AS (
            SELECT lang, SUM(n_tokens) AS lang_tokens FROM d GROUP BY lang
        ), tot AS (
            SELECT SUM(lang_tokens) AS total_tokens, COUNT(*) AS n_langs FROM langstats
        ), rates AS (
            SELECT lang,
                   ROUND(LEAST(CAST(1.0 AS DOUBLE), (total_tokens / n_langs) / lang_tokens), 6) AS keep_rate,
                   lpad(lower(to_hex(CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE), (total_tokens / n_langs) / lang_tokens) * 65536) AS BIGINT))), 4, '0') AS thresh,
                   (LEAST(CAST(1.0 AS DOUBLE), (total_tokens / n_langs) / lang_tokens) >= 1.0) AS keep_all
            FROM langstats, tot
        )
        SELECT doc_id, d.lang, CAST(n_tokens AS BIGINT) AS n_tokens, keep_rate,
               CAST(keep_all OR substr(md5('mix|' || doc_id), 1, 4) < thresh AS INT) AS keep
        FROM d JOIN rates ON d.lang = rates.lang
    """,
    "x41_chunking": f"""
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS t,
                   len(string_split(trim(text), ' ')) AS n
            FROM documents
        ), st AS (
            SELECT doc_id, t, n, unnest(range(0, n, {STRIDE})) AS start FROM toks
        )
        SELECT doc_id,
               start // {STRIDE} AS chunk_id,
               start AS start_tok,
               LEAST(start + {CHUNK}, n) AS end_tok,
               array_to_string(t[start + 1 : LEAST(start + {CHUNK}, n)], ' ') AS chunk_text
        FROM st
    """,
    "x42_budget_selection": f"""
        WITH d AS (
            SELECT doc_id, lang,
                   CAST(len(string_split(trim(text), ' ')) AS INT) AS n_tokens,
                   ROUND({_QUALITY_SQL}, 6) AS q
            FROM documents
        ), ranked AS (
            SELECT doc_id, lang, q,
                   CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY q DESC, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS cum_tokens
            FROM d
        )
        SELECT doc_id, lang, q, cum_tokens FROM ranked
        WHERE cum_tokens <= {LANG_BUDGET}
    """,
    "x43_unigram_logprob": """
        WITH tok AS (
            SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents
        ), ts AS (
            SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok
        ), tot AS (
            SELECT SUM(c) AS total FROM ts
        )
        SELECT doc_id, COUNT(*) AS n_tokens,
               ROUND(AVG(ln(c / total)), 6) AS avg_logp
        FROM tok JOIN ts USING (tok), tot
        GROUP BY doc_id
    """,
    "x44_scd2_history": f"""
        SELECT user_id, event_id, event_type AS state,
               strftime(ts, '{TS_FMT_MICRO_DUCK}') AS valid_from,
               strftime(LEAD(ts) OVER w, '{TS_FMT_MICRO_DUCK}') AS valid_to,
               CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
}
