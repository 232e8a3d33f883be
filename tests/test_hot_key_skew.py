"""Adversarial-FREQUENCY fixtures on the real dedup/graph entry points
(r9 verdict task 8).  The hypothesis properties in test_property.py cover
adversarial *topology*; these cover adversarial *key frequency* — one
token/shingle/node carrying ~10%+ of the corpus, the shape that melts a
shuffle partition at 100 TB — driven through the same operators the
declared queries use (x15 minhash_neardup_pairs, x27
propagate_min_labels, x239 lpa_fixed; l2's exact_jaccard_pairs hot-cap
fixture already lives in test_extensions.py).

Every expectation is computed by an independent Python brute-force on
the same synthetic rows, and the graph operators are additionally run
under different input partitionings — hot keys must change the timing,
never the answer."""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F


def _union_find_components(n_ids, pairs):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


def test_minhash_lsh_hot_bucket_clique_is_exact(spark):
    """One duplicate class holding 10% of the corpus = one LSH bucket
    with a quadratic clique (the hot-bucket case: every band key of the
    30 identical docs collides).  The reported pair set must still be
    exactly {candidates ∩ J >= t} with exact Jaccard values — anchored
    against exact_jaccard_pairs (independently oracle-checked via l2) —
    and the J=1 clique pairs are GUARANTEED recalled (identical shingle
    sets -> identical signatures -> every band collides)."""
    from social_warner_spark.operators.dedup import (
        exact_jaccard_pairs,
        minhash_neardup_pairs,
    )

    n, clique = 300, 30
    hot_text = "identical viral chain letter forwarded verbatim every time"
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < clique, F.lit(hot_text))
        .otherwise(
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"w{j}q"), F.col("id").cast("string"))
                    for j in range(10)
                ],
            )
        )
        .alias("text"),
    )
    thresh = 0.9
    got = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in minhash_neardup_pairs(docs, threshold=thresh).collect()
    }
    exact = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in exact_jaccard_pairs(docs, thresh).collect()
    }
    clique_pairs = set(itertools.combinations(range(clique), 2))
    assert set(exact) == clique_pairs  # fixture sanity: only the clique dups
    assert set(got) <= set(exact)  # precision is exact by construction
    assert set(got) >= clique_pairs  # guaranteed recall for J=1
    assert all(got[p] == 1.0 for p in clique_pairs)


def test_propagate_min_labels_hot_hub_star(spark):
    """Connected components with one hub node incident to 10% of all
    nodes (a 60-edge star) plus chains and 2-cliques: the hub key
    dominates both edge directions of the shuffle.  Expected labels from
    an independent union-find; THREE different input partitionings must
    produce the identical labelling (hot keys shift work, not answers)."""
    from social_warner_spark.operators.dedup import propagate_min_labels

    star = [(0, i) for i in range(100, 160)]  # hub 0 ~ 10% of 600 ids
    # chain diameter stays under the operator's default 20-round budget
    # (round count = component diameter, documented contract)
    chains = [(i, i + 1) for i in range(200, 215)]
    pairs_py = star + chains + [(300, 301), (302, 303)]
    ids = sorted({x for p in pairs_py for x in p})
    want = _union_find_components(ids, pairs_py)

    pairs = spark.createDataFrame(pairs_py, "a long, b long")
    outs = set()
    for nparts in (1, 7, 32):
        got = {
            r.id: r.lab
            for r in propagate_min_labels(pairs.repartition(nparts)).collect()
        }
        assert got == want, f"nparts={nparts}"
        outs.add(tuple(sorted(got.items())))
    assert len(outs) == 1


def test_lpa_fixed_hot_celebrity_node(spark):
    """Synchronous LPA with one celebrity node voted for by 10% of the
    graph (60 in-edges onto node 0 -> one hot (node, lbl) count cell and
    one hot join key).  Expected labels from an independent Python
    replay of the same deterministic rounds (max count, min-label
    tie-break, no-in-edge nodes keep their label); two partitionings
    must agree."""
    from social_warner_spark.operators.graph import lpa_fixed

    # followers 100..159 each follow celebrity 0 AND their ring neighbor;
    # 0 follows nobody (keeps its own label -> a stable attractor).
    edges_py = [(i, 0) for i in range(100, 160)]
    edges_py += [(i, 100 + (i - 99) % 60) for i in range(100, 160)]
    nodes_py = sorted({x for e in edges_py for x in e})
    iters = 3

    labels = {v: v for v in nodes_py}
    for _ in range(iters):
        votes = {}
        for src, dst in edges_py:
            votes.setdefault(src, []).append(labels[dst])
        new = {}
        for v in nodes_py:
            if v not in votes:
                new[v] = labels[v]
            else:
                counts = {}
                for lbl in votes[v]:
                    counts[lbl] = counts.get(lbl, 0) + 1
                new[v] = min(counts, key=lambda l: (-counts[l], l))
        labels = new

    nodes = spark.createDataFrame([(v,) for v in nodes_py], "node long")
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    for nparts in (1, 13):
        got = {
            r.node: r.lbl
            for r in lpa_fixed(
                nodes, edges.repartition(nparts), iters=iters
            ).collect()
        }
        assert got == labels, f"nparts={nparts}"
