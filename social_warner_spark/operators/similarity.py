"""Similarity search over embedding columns (north-star C3; SURVEY.md L3).

Three tiers:

- cosine_topk: exact brute force.  Probes are broadcast (they're the small
  side by construction); scoring is a JVM-side map over the full corpus —
  embarrassingly parallel, no shuffle until the final per-probe top-k
  (a windowed rank over probe partitions, which AQE keeps tight because the
  scored relation is already filtered to k·|probes| candidates only at the
  window, not before — so the shuffle carries |corpus|·|probes| rows ONLY
  when probes are few; for large probe sets use the bucketed variant).
- cosine_topk_bucketed: sign-bit LSH (axis hyperplanes) — corpus and probes
  bucketed by the sign pattern of the first `planes` dimensions; candidates
  share a bucket.  Recall measured against cosine_topk in tests.
- cosine_topk_pandas: the same exact scoring as an Arrow-vectorized pandas
  UDF (numpy matmul per batch) — demonstrates the sanctioned Python escape
  hatch for very wide vectors; results identical to cosine_topk.
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.types import DoubleType

from social_warner_spark.functions.vectors import cosine


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-probe top-k by (rounded cosine desc, neighbor id) — rounding
    before ranking makes tie order engine-independent."""
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("probe_id", "neighbor_id", "cos", "rk")
    )


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe (self-matches excluded)."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vc"))
    p = probes.select(F.col(id_col).alias("probe_id"), F.col(vec_col).alias("vp"))
    scored = (
        c.join(F.broadcast(p), F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("vp"), F.col("vc")), 6))
    )
    return _ranked_topk(scored, k)


def sign_bucket(vec: Column, planes: int = 4) -> Column:
    """Axis-hyperplane LSH bucket: concat of sign bits of the first
    `planes` dimensions.  2^planes buckets; deterministic; SQL-portable."""
    from social_warner_spark.functions.vectors import sign_bits

    return sign_bits(vec, 0, planes)


def sign_bucket_variants(vec: Column, planes: int, multiprobe: int = 1) -> Column:
    """Array of sign buckets within Hamming distance ≤ multiprobe of the
    vector's own bucket (0 or 1 supported).  Multi-probe LSH: querying the
    adjacent buckets recovers neighbors that fall just across a hyperplane
    — the standard recall fix that keeps candidate generation an EQUI-join
    (probe variants explode; no inequality join appears)."""
    from social_warner_spark.functions.vectors import sign_bits

    assert multiprobe in (0, 1)
    variants = [sign_bits(vec, 0, planes)]
    if multiprobe >= 1:
        variants += [sign_bits(vec, 0, planes, flip=i) for i in range(planes)]
    return F.array(*variants)


def cosine_topk_bucketed(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    planes: int = 4,
    multiprobe: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's LSH bucket
    (plus, with ``multiprobe=1``, every bucket one sign-flip away).

    The probe-corpus join is an equi-join on the bucket key — at scale this
    is the difference between a full cross product and a (1+planes)/2^planes
    slice per probe.  Multi-probe trades a planes-fold increase in probe-side
    rows (probes are the small side; they explode, the corpus never does)
    for the recall lost to hyperplane-boundary neighbors.  Recall vs the
    exact variant is tested by tolerance.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vc"),
        sign_bucket(F.col(vec_col), planes).alias("bk"),
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("vp"),
        F.explode(sign_bucket_variants(F.col(vec_col), planes, multiprobe)).alias("bk"),
    )
    scored = (
        c.join(F.broadcast(p), "bk")
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("vp"), F.col("vc")), 6))
    )
    return _ranked_topk(scored, k)


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid by rounded cosine
    (ties → lowest cluster id).  Centroids are broadcast (nlist is small by
    construction); the argmax is a `max_by` HASH AGGREGATE over the nlist
    candidates per vector — partial aggregation runs map-side, so the
    shuffle carries one pre-reduced row per vector instead of sorting
    nlist·|corpus| rows under a window.  Ordering key (ccos, -cluster)
    makes ties resolve to the lowest cluster id, matching the SQL oracle's
    `row_number() ... ORDER BY ccos DESC, cluster` exactly.
    """
    scored = (
        corpus.select(id_col, vec_col)
        .join(F.broadcast(centroids.select("cluster", F.col("cvec"))), how="cross")
        .withColumn("ccos", F.round(cosine(F.col(vec_col), F.col("cvec")), 6))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.first(vec_col).alias(vec_col),  # constant within the group
            F.max_by(
                "cluster", F.struct(F.col("ccos"), (-F.col("cluster")).alias("nc"))
            ).alias("cluster"),
        )
        .select(id_col, vec_col, "cluster")
    )


def ivf_centroids(
    corpus: DataFrame,
    nlist: int = 8,
    iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic IVF centroids: seed with the vectors of the `nlist`
    lowest ids, then `iters` Lloyd steps (assign → per-dimension mean).

    Every mean component is rounded to 6dp so the centroid set is
    engine-reproducible (cross-engine float sums differ only past the
    rounding point).  The mean is computed distributed: posexplode to
    (cluster, dim, value), partial-aggregated avg per (cluster, dim), then
    re-assembled — no vectors ever sit on the driver.
    """
    w = Window.orderBy(id_col)
    centroids = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(nlist)
        .select(
            (F.row_number().over(w) - 1).alias("cluster"),
            F.col(vec_col).cast("array<double>").alias("cvec"),
        )
    )
    for _ in range(iters):
        assigned = ivf_assign(corpus, centroids, vec_col, id_col)
        centroids = (
            assigned.select("cluster", F.posexplode(F.col(vec_col).cast("array<double>")))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("col"), 6).alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda x: x["m"]
                ).alias("cvec")
            )
        )
    return centroids


def cosine_topk_ivf(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: search only the `nprobe` clusters whose
    centroids are nearest each probe.

    The 100 TB shape: centroid fit touches the corpus `iters + 1` times with
    one small shuffle each; the search replaces the |corpus| × |probes|
    cross product with an equi-join on cluster id covering nprobe/nlist of
    the corpus per probe.  Recall vs the exact scorer is tolerance-tested;
    the pipeline itself is deterministic (seeded centroids, rounded means)
    and therefore fully oracle-checkable.
    """
    from social_warner_spark.caching import register_persisted

    # nlist rows, but the lineage behind them is `iters + 1` corpus passes
    # — persist so the two consumers (corpus assignment, probe routing)
    # don't each re-run the Lloyd fit
    centroids = register_persisted(
        ivf_centroids(corpus, nlist, iters, vec_col, id_col).persist()
    )
    assigned = ivf_assign(corpus, centroids, vec_col, id_col)

    wp = Window.partitionBy("probe_id").orderBy(F.desc("ccos"), F.asc("cluster"))
    probe_clusters = (
        probes.select(F.col(id_col).alias("probe_id"), F.col(vec_col).alias("vp"))
        .join(F.broadcast(centroids), how="cross")
        .withColumn("ccos", F.round(cosine(F.col("vp"), F.col("cvec")), 6))
        .withColumn("crk", F.row_number().over(wp))
        .where(F.col("crk") <= nprobe)
        .select("probe_id", "vp", "cluster")
    )
    scored = (
        assigned.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vc"), "cluster"
        )
        .join(F.broadcast(probe_clusters), "cluster")
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("vp"), F.col("vc")), 6))
    )
    return _ranked_topk(scored, k)


def cosine_topk_pandas(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k with numpy-vectorized scoring via a pandas UDF.

    The probe matrix is closed over (broadcast with the serialized UDF);
    each Arrow batch of corpus vectors is scored as one matmul.
    """
    import numpy as np

    p_rows = probes.select(id_col, vec_col).collect()  # bounded: probe set is small
    p_ids = [r[id_col] for r in p_rows]
    P = np.array([r[vec_col] for r in p_rows], dtype="float64")
    P = P / np.linalg.norm(P, axis=1, keepdims=True)

    @F.pandas_udf("array<struct<probe_id: long, cos: double>>")
    def score(batch: pd.Series) -> pd.Series:
        M = np.array(batch.tolist(), dtype="float64")
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = M @ P.T  # (batch, probes)
        return pd.Series(
            [
                [
                    {"probe_id": int(p_ids[j]), "cos": round(float(S[i, j]), 6)}
                    for j in range(len(p_ids))
                ]
                for i in range(S.shape[0])
            ]
        )

    scored = (
        corpus.select(F.col(id_col).alias("neighbor_id"), score(F.col(vec_col)).alias("s"))
        .select("neighbor_id", F.explode("s").alias("s"))
        .select(
            F.col("s.probe_id").alias("probe_id"),
            "neighbor_id",
            F.col("s.cos").alias("cos"),
        )
        .where(F.col("probe_id") != F.col("neighbor_id"))
    )
    return _ranked_topk(scored, k)


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization — the storage path
    for vector corpora at 100 TB (4× smaller than float32, 8× than
    float64, before encoding).

    scale = 127 / max|v_i|; q_i = clamp(round(v_i·scale), ±127).  Returns
    (id, scale, n_sat, recon_err): saturated-element count and the L2
    reconstruction error ‖v − q/scale‖₂ — the quality signal that decides
    whether int8 is acceptable for a given embedding family.

    Pure narrow map (whole-stage codegen, zero shuffle, no Python); all
    arithmetic in double with half-away-from-zero rounding, which both
    Spark and the SQL oracle implement identically.
    """
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = df.select(F.col(id_col), vd.alias("_v"))
    amax = F.array_max(F.transform(F.col("_v"), F.abs))
    scaled = staged.withColumn("_scale", F.lit(127.0) / F.greatest(amax, F.lit(1e-12)))
    quant = lambda x: F.least(
        F.greatest(F.round(x * F.col("_scale"), 0).cast("int"), F.lit(-127)), F.lit(127)
    )
    q = scaled.withColumn("_q", F.transform(F.col("_v"), quant))
    sqerr = F.zip_with(
        F.col("_v"),
        F.col("_q"),
        lambda a, b: (a - b / F.col("_scale")) * (a - b / F.col("_scale")),
    )
    err = F.sqrt(F.aggregate(sqerr, F.lit(0.0), lambda acc, x: acc + x))
    n_sat = F.size(F.filter(F.col("_q"), lambda x: F.abs(x) == 127))
    return q.select(
        F.col(id_col),
        F.round(F.col("_scale"), 6).alias("scale"),
        n_sat.cast("long").alias("n_sat"),
        F.round(err, 6).alias("recon_err"),
    )
