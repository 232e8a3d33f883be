"""Scale spot-check: the heaviest / most scale-sensitive queries must
ALSO oracle-match at sf0.1 (10× the standard correctness SF).

Motivated by a real find: the prefix-filter boundary bug (x121) only
manifested at sf0.1 — rounding-grain-admissible pairs that escape the
pigeonhole guarantee need enough rows to exist at all.  This suite
keeps a curated set of shingle-heavy, iterative, and
threshold-boundary queries honest at the bench scale.
"""

from __future__ import annotations

import os

import pytest

#: Bench-scale (sf0.1) mirrors are the heaviest suite; they run in the
#: builder's full-tier gate (`-m ""`), not the driver-facing default
#: (see pytest.ini — r10 verdict task 1).
pytestmark = pytest.mark.slow

from social_warner_spark.queries import all_oracles, all_queries

from tests.oracle_harness import compare, duck_connection

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Curated: every entry is either volume-sensitive (candidate explosion,
#: threshold boundaries, recursion depth) or this round's new machinery.
SCALE_SET = [
    "l2_jaccard_pairs",        # exact-Jaccard candidate explosion
    "x121_prefix_filter_pairs",  # the sf0.1-only boundary-bug site
    "x15_minhash_lsh_pairs",   # banding collisions grow with corpus
    "x7_embed_neardup",        # band-join candidate volume
    "x24_ann_ivf",             # centroid assignment at 10× vectors
    "x16_corpus_prep",         # composite thresholds
    "x31_full_pipeline",       # flagship composition
    "x164_dup_spans",          # shared-shingle islands at 10× docs
    "x170_bpe_merges",         # data-dependent rule sequence changes with corpus
    "x172_ks_drift",           # KS sup over a 10× value grid
    "x176_source_set_cover",   # greedy picks change with corpus
    "x178_twopass_median",     # bucket-boundary rank location at 10× rows
    "x27_neardup_clusters",    # propagation chain depth grows with corpus
    "x61_semantic_dedup",      # IVF-bucketed cosine thresholds at 10× vectors
    "x215_png_pixels",         # round-3 real-decode machinery at 10× docs
    "x216_wav_samples",        # round-3 real-decode machinery at 10× docs
    "x220_pq_ann",             # codebook fit + ADC shortlist at 10× vectors
    "x221_kcenter_coreset",    # farthest-point argmax ties at 10× candidates
    "x223_quantile_normalize", # rank interpolation against a 10× global ECDF
    "x224_hard_negative_mining",  # bucket candidate volume at 10× vectors
    "x226_d4_prune",           # cluster sizes / prune boundaries at 10×
    "x229_margin_bitext_mining",  # pair volume + kNN normalizers at 10×
    "x239_label_propagation",  # vote ties / propagation depth at 10× edges
    "x241_greedy_wordpiece",   # top-50 gram ranking boundary at 10× weight
    "x243_fellegi_sunter",     # EM pattern mix shifts with 10× block pairs
    "x251_propensity_matching",  # caliper-boundary candidates at 10× docs
    # x15–x21-series scale-sensitive additions
    "x259_adamic_adar",        # wedge volume + score ties at 10× edges
    "x262_winnowing_overlap",  # fingerprint collisions at 10× docs
    "x270_markov_attribution", # transition mix shifts with 10× journeys
    "x277_rouge_pairs",        # pair source + clipped overlap at 10× docs
    "x282_gmm_em",             # EM fixed point shifts with 10× values
    "x287_mmr_rerank",         # pool composition changes at 10× docs
    "x291_jsd_source_matrix",  # top-V vocabulary boundary at 10× tokens
    # round-4: every query the full-set sf0.1 strict mirror caught —
    # large-magnitude rounding, decimal-rational ties, float-sum noise
    # past the rounding grid (see COVERAGE.md round-4 section)
    "x17_range_frame",         # ~4e8 windowed sum vs the rounding grid
    "x148_acctbal_risk",       # quartile-interpolation 2dp ties
    "x321_bitemporal_asof",    # int-cents revenue + amendment-tie ledger
    "x344_histogram_design",   # integer-cent SSE moments + quantile cuts
    "x372_lww_vs_arrival",     # 3.8e10 cents sums + md5 arrival ordering
    "x378_drift_cells",        # round-4 stateful-twin KS grid at 10× rows
    # round-5: machinery changed this round
    "x33_gapfill_interpolate",  # day-partitioned halo gap-fill layout
    "x377_misra_gries_twin",   # guaranteed-set projection, k=1024 fold
    "x130_user_trends",        # minute-rescaled integer moments
    "x212_neyman_allocation",  # singleton-stratum NULL guard
]

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", SCALE_SET)
def test_scale_spot_check(spark, name):
    sdf = QUERIES[name](spark, SF01)
    con = duck_connection(SF01)
    try:
        ddf = con.execute(ORACLES[name]).df()
    finally:
        con.close()
    ok, msg = compare(sdf, ddf)
    assert ok, f"{name} @ sf0.1: {msg}"
