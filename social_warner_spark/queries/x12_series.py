"""x12 series — round-3 multimodal REAL-decode queries (x215+).

These close the round-2 verdict's C5 gap: the PNG and WAV payloads are
not just header-probed (x49) but fully decoded — zlib IDAT + the five
PNG row filters (W3C PNG spec §9.4), RIFF chunk walk + signed PCM
frames — in pure stdlib inside mapInPandas, and the decoded pixel /
sample statistics are oracle-checked against the integer formulas the
synthesizer embedded in the real bytes.  A decoder that mis-reverses a
filter, drops a channel, or mis-signs a sample hash-mismatches
immediately.

Statistics travel as exact integer sums out of the decode operator; the
single double division/sqrt happens engine-side under the repo's r6
rounding convention so cross-engine hashes agree.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from social_warner_spark.queries.common import T, r6


def x215_png_pixels(spark, sf_dir):
    """Real PNG pixel statistics per document (odd ids).

    Per doc, a REAL RGB PNG is synthesized (pixel (x,y,c) =
    (7·id+31·y+13·x+5·c) mod 256, row filters cycling through all five
    types, real zlib IDAT + CRCs), then operators/multimodal.decode_png
    inflates and unfilters the actual bytes back to samples.  The
    oracle states the same pixel formula over generate_series — the
    engine must reproduce every byte of the image to match.

    100 TB: decode is per-item mapInPandas (zero shuffle, horizontal
    scale); only integer sums leave Python, one division engine-side.
    """
    from social_warner_spark.operators.multimodal import (
        png_pixel_stats,
        with_synth_media_content,
    )

    d = (
        T(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .where(F.col("doc_id") % 2 == 1)
    )
    stats = png_pixel_stats(with_synth_media_content(d), id_col="doc_id")
    return stats.select(
        F.col("item_id").alias("doc_id"),
        "width",
        "height",
        "n_values",
        r6(F.col("value_sum") / F.col("n_values").cast("double")).alias("pixel_mean"),
        F.col("value_min").alias("pixel_min"),
        F.col("value_max").alias("pixel_max"),
    )


def x216_wav_samples(spark, sf_dir):
    """Real WAV PCM sample statistics per document (even ids).

    Per doc, a REAL integer-PCM WAV is synthesized (sample (k,c) =
    ((31·id+7·k+3·c) mod 2001) − 1000 as signed 16-bit interleaved
    frames), then operators/multimodal.decode_wav_samples walks the
    RIFF chunks and re-signs every sample.  Mean and RMS derive from
    exact integer sums; the oracle restates the formula in SQL.
    """
    from social_warner_spark.operators.multimodal import (
        wav_sample_stats,
        with_synth_media_content,
    )

    d = (
        T(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .where(F.col("doc_id") % 2 == 0)
    )
    stats = wav_sample_stats(with_synth_media_content(d), id_col="doc_id")
    n_total = (F.col("n_samples") * F.col("n_channels")).cast("double")
    return stats.select(
        F.col("item_id").alias("doc_id"),
        "sample_rate",
        "n_channels",
        "n_samples",
        r6(F.col("sample_sum") / n_total).alias("sample_mean"),
        r6(F.sqrt(F.col("sample_sq_sum").cast("double") / n_total)).alias("rms"),
        F.col("sample_min"),
        F.col("sample_max"),
    )


#: x218 — frame length (interleaved samples) and quiet-frame RMS bound.
FRAME_N = 100
QUIET_RMS = 550.0


def x217_image_ahash(spark, sf_dir):
    """Perceptual average-hash bucketing over REAL decoded images.

    Per image, operators/multimodal.png_ahash decodes the actual PNG
    bytes and fingerprints 16 probe points against the mean brightness
    — all integer comparisons, so the oracle restates the identical
    bits from the pixel formula.  Images are then bucketed by hash
    (window count): the standard cheap pre-filter an image dedup
    pipeline runs before pixel- or embedding-level comparison.

    100 TB: per-item decode (zero shuffle) + one window on the 16-bit
    hash key — bucket cardinality ≤ 65536, heavily combinable.
    """
    from pyspark.sql import Window

    from social_warner_spark.operators.multimodal import (
        png_ahash,
        with_synth_media_content,
    )

    d = (
        T(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .where(F.col("doc_id") % 2 == 1)
    )
    hashed = png_ahash(with_synth_media_content(d), id_col="doc_id")
    return hashed.select(
        F.col("item_id").alias("doc_id"),
        "phash",
        F.count("*").over(Window.partitionBy("phash")).cast("long").alias("n_bucket"),
    )


def x218_wav_frames(spark, sf_dir):
    """Audio loudness segmentation over REAL decoded PCM: 100-sample
    frame RMS profile per clip — frame count, quiet-frame count
    (RMS < 550), and the min/max frame RMS (dynamic range).

    operators/multimodal.wav_frame_rms_cells expands each clip to
    exact integer (count, Σv²) frame cells; RMS and the segmentation
    are derived RELATIONALLY from the cells, so the Python boundary
    ships integers only.  The voice-activity/silence-trim shape of an
    audio training-data pipeline.
    """
    from social_warner_spark.operators.multimodal import (
        wav_frame_rms_cells,
        with_synth_media_content,
    )

    d = (
        T(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .where(F.col("doc_id") % 2 == 0)
    )
    cells = wav_frame_rms_cells(with_synth_media_content(d), frame=FRAME_N, id_col="doc_id")
    rms = cells.select(
        "item_id",
        F.sqrt(F.col("sq_sum").cast("double") / F.col("n_in_frame")).alias("r"),
    )
    return rms.groupBy("item_id").agg(
        F.count("*").cast("long").alias("n_frames"),
        F.sum((F.col("r") < QUIET_RMS).cast("long")).alias("n_quiet"),
        r6(F.min("r")).alias("rms_min"),
        r6(F.max("r")).alias("rms_max"),
    ).withColumnRenamed("item_id", "doc_id")


#: x219 — Bradley–Terry MM iterations.
BT_ROUNDS = 5


def x219_bradley_terry(spark, sf_dir):
    """Bradley–Terry preference strengths over event types — the
    pairwise-preference model under RLHF reward data and LLM-judge
    win-rate leaderboards, fitted fully relationally.

    Preference pairs: per user, type i beats type j when the user's
    mean value for i exceeds that for j (compared as cross-multiplied
    integer-count sums — one fp multiply each side, no division).  The
    minorization-maximization recurrence p_i ← W_i / Σ_j n_ij/(p_i+p_j)
    (Hunter 2004, doi:10.1214/aos/1079120141) runs 5 rounds over the
    symmetrized (i, j, n, w) relation; each round is one |pairs|-row
    join-agg, strengths normalized to mean 1 and floored at 1e-9 (both
    engines identically) for the all-losses edge.  No driver-side
    vectors: k, Σp, and the strengths are 1-row/|types|-row relations.

    100 TB: the user-pair stage is |users|·C(types,2) rows off ONE
    groupBy; MM rounds touch only the |types|²-bounded sym relation.
    """
    e = T(spark, sf_dir, "events").select("user_id", "event_type", "value")
    per = e.groupBy("user_id", "event_type").agg(
        F.sum("value").alias("sv"), F.count("*").alias("cv")
    )
    a = per.select(
        F.col("user_id").alias("u"), F.col("event_type").alias("i"),
        F.col("sv").alias("si"), F.col("cv").alias("ci"),
    )
    b = per.select(
        F.col("user_id").alias("u"), F.col("event_type").alias("j"),
        F.col("sv").alias("sj"), F.col("cv").alias("cj"),
    )
    cmp_ = (
        a.join(b, "u")
        .where(F.col("i") < F.col("j"))
        .select(
            "i", "j",
            (F.col("si") * F.col("cj") > F.col("sj") * F.col("ci")).cast("long").alias("wi"),
            (F.col("si") * F.col("cj") < F.col("sj") * F.col("ci")).cast("long").alias("wj"),
        )
    )
    g = (
        cmp_.groupBy("i", "j")
        .agg(F.sum("wi").alias("wi"), F.sum("wj").alias("wj"))
        .where(F.col("wi") + F.col("wj") > 0)
    )
    sym = (
        g.select("i", "j", (F.col("wi") + F.col("wj")).alias("n"), F.col("wi").alias("w"))
        .unionByName(
            g.select(
                F.col("j").alias("i"), F.col("i").alias("j"),
                (F.col("wi") + F.col("wj")).alias("n"), F.col("wj").alias("w"),
            )
        )
        .localCheckpoint(eager=True)  # tiny relation; cuts the MM-loop lineage
    )
    tot = sym.groupBy("i").agg(F.sum("w").alias("wins"), F.sum("n").alias("games"))
    p = sym.select("i").distinct().withColumn("p", F.lit(1.0))
    k_df = p.agg(F.count("*").alias("k"))
    for _ in range(BT_ROUNDS):
        pi = p.select("i", F.col("p").alias("p_i"))
        pj = p.select(F.col("i").alias("j"), F.col("p").alias("p_j"))
        den = (
            sym.join(pi, "i").join(pj, "j")
            .groupBy("i")
            .agg(F.sum(F.col("n") / (F.col("p_i") + F.col("p_j"))).alias("den"))
        )
        raw = tot.join(den, "i").select("i", (F.col("wins") / F.col("den")).alias("pr_"))
        s = raw.agg(F.sum("pr_").alias("s"))
        # |types|-row strengths, referenced 3× next round (pi, pj, Σp):
        # eager checkpoint cuts the 3^rounds lineage compounding.
        p = (
            raw.crossJoin(F.broadcast(s))
            .crossJoin(F.broadcast(k_df))
            .select(
                "i",
                F.greatest(
                    F.col("pr_") * F.col("k") / F.col("s"), F.lit(1e-9)
                ).alias("p"),
            )
            .localCheckpoint(eager=True)
        )
    wr = Window.orderBy(F.desc("bt_score"), "event_type")
    return (
        tot.join(p, "i")
        .select(
            F.col("i").alias("event_type"),
            F.col("games").cast("long").alias("games"),
            F.col("wins").cast("long").alias("wins"),
            r6(F.col("p")).alias("bt_score"),
        )
        .withColumn("rk", F.row_number().over(wr).cast("int"))
    )


def _bt_oracle(rounds: int) -> str:
    parts = [
        "WITH per AS MATERIALIZED (SELECT user_id, event_type, SUM(value) AS sv, "
        "COUNT(*) AS cv FROM events GROUP BY 1, 2)",
        "pr AS MATERIALIZED (SELECT a.event_type AS i, b.event_type AS j, "
        "SUM(CASE WHEN a.sv * b.cv > b.sv * a.cv THEN 1 ELSE 0 END) AS wi, "
        "SUM(CASE WHEN a.sv * b.cv < b.sv * a.cv THEN 1 ELSE 0 END) AS wj "
        "FROM per a JOIN per b ON a.user_id = b.user_id "
        "AND a.event_type < b.event_type GROUP BY 1, 2)",
        "g AS MATERIALIZED (SELECT * FROM pr WHERE wi + wj > 0)",
        "sym AS MATERIALIZED (SELECT i, j, wi + wj AS n, wi AS w FROM g "
        "UNION ALL SELECT j, i, wi + wj, wj FROM g)",
        "tot AS MATERIALIZED (SELECT i, SUM(w) AS wins, SUM(n) AS games FROM sym GROUP BY i)",
        "kk AS (SELECT COUNT(*) AS k FROM (SELECT DISTINCT i FROM sym))",
        "p0 AS MATERIALIZED (SELECT DISTINCT i, CAST(1.0 AS DOUBLE) AS p FROM sym)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT s.i, SUM(s.n / (pi.p + pj.p)) AS den FROM sym s "
            f"JOIN p{r - 1} pi ON s.i = pi.i JOIN p{r - 1} pj ON s.j = pj.i "
            f"GROUP BY s.i)"
        )
        parts.append(
            f"r{r} AS (SELECT t.i, t.wins / d.den AS pr_ FROM tot t "
            f"JOIN d{r} d ON t.i = d.i)"
        )
        parts.append(f"s{r} AS (SELECT SUM(pr_) AS s FROM r{r})")
        parts.append(
            f"p{r} AS MATERIALIZED (SELECT i, GREATEST(pr_ * k / s, 1e-9) AS p "
            f"FROM r{r}, s{r}, kk)"
        )
    final = (
        "SELECT t.i AS event_type, CAST(t.games AS BIGINT) AS games, "
        "CAST(t.wins AS BIGINT) AS wins, ROUND(p.p, 6) AS bt_score, "
        "CAST(ROW_NUMBER() OVER (ORDER BY ROUND(p.p, 6) DESC, t.i) AS INT) AS rk "
        f"FROM tot t JOIN p{rounds} p ON t.i = p.i"
    )
    return ",\n".join(parts) + "\n" + final


QUERIES = {
    "x215_png_pixels": x215_png_pixels,
    "x216_wav_samples": x216_wav_samples,
    "x217_image_ahash": x217_image_ahash,
    "x218_wav_frames": x218_wav_frames,
    "x219_bradley_terry": x219_bradley_terry,
}

ORACLES = {
    "x219_bradley_terry": _bt_oracle(BT_ROUNDS),
    "x215_png_pixels": """
        WITH px AS (
            SELECT d.doc_id,
                   16 + d.doc_id % 32 AS w,
                   9 + d.doc_id % 17 AS h,
                   (7 * d.doc_id + 31 * y.y + 13 * x.x + 5 * c.c) % 256 AS v
            FROM documents d,
                 UNNEST(range(0, 9 + d.doc_id % 17)) AS y(y),
                 UNNEST(range(0, 16 + d.doc_id % 32)) AS x(x),
                 UNNEST(range(0, 3)) AS c(c)
            WHERE d.doc_id % 2 = 1
        )
        SELECT doc_id,
               CAST(w AS INT) AS width,
               CAST(h AS INT) AS height,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               ROUND(SUM(v) / CAST(COUNT(*) AS DOUBLE), 6) AS pixel_mean,
               CAST(MIN(v) AS INT) AS pixel_min,
               CAST(MAX(v) AS INT) AS pixel_max
        FROM px GROUP BY doc_id, w, h
    """,
    "x217_image_ahash": """
        WITH dims AS (
            SELECT doc_id, 16 + doc_id % 32 AS w, 9 + doc_id % 17 AS h
            FROM documents WHERE doc_id % 2 = 1
        ), tot AS (
            SELECT d.doc_id, d.w, d.h,
                   SUM((7 * d.doc_id + 31 * y.y + 13 * x.x + 5 * c.c) % 256) AS total
            FROM dims d,
                 UNNEST(range(0, d.h)) AS y(y),
                 UNNEST(range(0, d.w)) AS x(x),
                 UNNEST(range(0, 3)) AS c(c)
            GROUP BY d.doc_id, d.w, d.h
        ), bits AS (
            SELECT t.doc_id,
                   SUM(CASE WHEN (
                         ((7 * t.doc_id + 31 * ((13 * k.k) % t.h)
                           + 13 * ((7 * k.k) % t.w)) % 256)
                       + ((7 * t.doc_id + 31 * ((13 * k.k) % t.h)
                           + 13 * ((7 * k.k) % t.w) + 5) % 256)
                       + ((7 * t.doc_id + 31 * ((13 * k.k) % t.h)
                           + 13 * ((7 * k.k) % t.w) + 10) % 256)
                       ) * t.w * t.h > t.total
                       THEN CAST(1 AS BIGINT) << k.k ELSE 0 END) AS phash
            FROM tot t, UNNEST(range(0, 16)) AS k(k)
            GROUP BY t.doc_id
        )
        SELECT doc_id, CAST(phash AS BIGINT) AS phash,
               CAST(COUNT(*) OVER (PARTITION BY phash) AS BIGINT) AS n_bucket
        FROM bits
    """,
    "x218_wav_frames": """
        WITH par AS (
            SELECT doc_id,
                   1 + (doc_id // 2) % 2 AS nch,
                   100 + n_chars % 256 AS ns
            FROM documents WHERE doc_id % 2 = 0
        ), cells AS (
            SELECT p.doc_id,
                   (k.k * p.nch + c.c) // 100 AS frame_idx,
                   COUNT(*) AS n,
                   SUM(CAST(((31 * p.doc_id + 7 * k.k + 3 * c.c) % 2001) - 1000 AS BIGINT)
                       * (((31 * p.doc_id + 7 * k.k + 3 * c.c) % 2001) - 1000)) AS sq
            FROM par p,
                 UNNEST(range(0, p.ns)) AS k(k),
                 UNNEST(range(0, p.nch)) AS c(c)
            GROUP BY p.doc_id, frame_idx
        ), rms AS (
            SELECT doc_id, SQRT(sq / CAST(n AS DOUBLE)) AS r FROM cells
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(SUM(CASE WHEN r < 550 THEN 1 ELSE 0 END) AS BIGINT) AS n_quiet,
               ROUND(MIN(r), 6) AS rms_min,
               ROUND(MAX(r), 6) AS rms_max
        FROM rms GROUP BY doc_id
    """,
    "x216_wav_samples": """
        WITH par AS (
            SELECT doc_id,
                   8000 * (1 + doc_id % 3) AS sr,
                   1 + (doc_id // 2) % 2 AS nch,
                   100 + n_chars % 256 AS ns
            FROM documents WHERE doc_id % 2 = 0
        ), s AS (
            SELECT p.doc_id, p.sr, p.nch, p.ns,
                   ((31 * p.doc_id + 7 * k.k + 3 * c.c) % 2001) - 1000 AS v
            FROM par p,
                 UNNEST(range(0, p.ns)) AS k(k),
                 UNNEST(range(0, p.nch)) AS c(c)
        )
        SELECT doc_id,
               CAST(sr AS INT) AS sample_rate,
               CAST(nch AS INT) AS n_channels,
               CAST(ns AS BIGINT) AS n_samples,
               ROUND(SUM(v) / CAST(COUNT(*) AS DOUBLE), 6) AS sample_mean,
               ROUND(SQRT(SUM(CAST(v AS DOUBLE) * v) / COUNT(*)), 6) AS rms,
               CAST(MIN(v) AS INT) AS sample_min,
               CAST(MAX(v) AS INT) AS sample_max
        FROM s GROUP BY doc_id, sr, nch, ns
    """,
}
