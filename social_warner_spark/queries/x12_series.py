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


QUERIES = {
    "x215_png_pixels": x215_png_pixels,
    "x216_wav_samples": x216_wav_samples,
}

ORACLES = {
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
