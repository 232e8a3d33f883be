"""Semantic invariants for the x14-series operators — properties
stronger than oracle equality on one configuration.  The heavyweight
checks are full independent PURE-PYTHON reimplementations (no Spark, no
DuckDB) of the iterative algorithms, compared exactly."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd
import pyspark.sql.functions as F


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_holt_matches_pure_python_recursion(spark, sf_smoke):
    """x238: replay Holt's recursion in plain Python over the pandas
    daily grid; level/trend/rmse must agree to 1e-6."""
    from social_warner_spark.queries.x14_series import (
        HW_ALPHA,
        HW_BETA,
        x238_holt_smoothing,
    )

    got = {r.event_type: r for r in x238_holt_smoothing(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    for etype, grp in ev.groupby("event_type"):
        ys = grp.groupby("day")["value"].sum().sort_index().to_list()
        level, trend, sse = ys[0], ys[1] - ys[0], 0.0
        for y in ys[1:]:
            f = level + trend
            new_l = HW_ALPHA * y + (1 - HW_ALPHA) * f
            trend = HW_BETA * (new_l - level) + (1 - HW_BETA) * trend
            sse += (y - f) * (y - f)
            level = new_l
        row = got[etype]
        assert row.n_days == len(ys)
        assert abs(row.level - level) < 1e-5
        assert abs(row.trend - trend) < 1e-5
        assert abs(row.forecast_next - (level + trend)) < 1e-5
        assert abs(row.rmse - math.sqrt(sse / (len(ys) - 1))) < 1e-5


def _python_lpa(nodes, edges, iters):
    labels = {n: n for n in nodes}
    nbrs = defaultdict(list)
    for s, d in edges:
        nbrs[s].append(d)
    for _ in range(iters):
        new = {}
        for n in nodes:
            if not nbrs[n]:
                new[n] = labels[n]
                continue
            votes = Counter(labels[d] for d in nbrs[n])
            # tie-break: max count, then lexicographically smallest label
            top = max(votes.values())
            new[n] = min(l for l, c in votes.items() if c == top)
        labels = new
    return labels


def test_lpa_matches_pure_python(spark, sf_smoke):
    """x239: 3 synchronous rounds replayed in Python over the same
    bipartite graph give the exact same community histogram."""
    from social_warner_spark.queries.x14_series import (
        LPA_ITERS,
        x239_label_propagation,
    )

    got = {
        r.community: r.n_nodes
        for r in x239_label_propagation(spark, sf_smoke).collect()
    }
    orders = pd.read_parquet(f"{sf_smoke}/orders.parquet")
    li = pd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    cust = pd.read_parquet(f"{sf_smoke}/customer.parquet")
    supp = pd.read_parquet(f"{sf_smoke}/supplier.parquet")
    merged = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    pairs = {
        (int(c) * 2, int(s) * 2 + 1)
        for c, s in zip(merged["o_custkey"], merged["l_suppkey"])
    }
    edges = list(pairs) + [(b, a) for a, b in pairs]
    nodes = [int(k) * 2 for k in cust["c_custkey"]] + [
        int(k) * 2 + 1 for k in supp["s_suppkey"]
    ]
    labels = _python_lpa(nodes, edges, LPA_ITERS)
    want = Counter(labels.values())
    assert got == dict(want)
    assert sum(got.values()) == len(nodes)


def test_wordpiece_matches_pure_python_greedy(spark, sf_smoke):
    """x241: rebuild the piece vocab by the same rule and greedily
    segment every word in Python; per-doc word/piece counts must agree
    exactly, and greedy segments must reconstruct each word."""
    from social_warner_spark.queries.x14_series import (
        WP_MAX_PIECE,
        WP_TOP_NGRAMS,
        x241_greedy_wordpiece,
    )

    docs = _docs(sf_smoke)
    wordc = Counter()
    doc_words = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        ws = [w for w in text.strip().split() if w]
        doc_words[doc_id] = ws
        wordc.update(ws)

    grams = Counter()
    for w, c in wordc.items():
        for n in range(2, WP_MAX_PIECE + 1):
            for i in range(len(w) - n + 1):
                grams[w[i : i + n]] += c
    top = sorted(grams.items(), key=lambda kv: (-kv[1], kv[0]))[:WP_TOP_NGRAMS]
    vocab = {g for g, _ in top} | {ch for w in wordc for ch in w}

    def segment(w):
        pos, out = 0, []
        while pos < len(w):
            for n in range(WP_MAX_PIECE, 0, -1):
                if w[pos : pos + n] in vocab and pos + n <= len(w):
                    out.append(w[pos : pos + n])
                    pos += n
                    break
        return out

    pieces = {w: segment(w) for w in wordc}
    for w, segs in pieces.items():
        assert "".join(segs) == w

    got = {r.doc_id: r for r in x241_greedy_wordpiece(spark, sf_smoke).collect()}
    for doc_id, ws in doc_words.items():
        if not ws:
            continue
        row = got[doc_id]
        assert row.n_words == len(ws)
        assert row.n_pieces == sum(len(pieces[w]) for w in ws)


def test_fellegi_sunter_matches_pure_python_em(spark, sf_smoke):
    """x243: recompute the blocked agreement patterns and run the two EM
    rounds in plain Python; m/u/prior must agree to 1e-6, and all
    probabilities must be proper (0, 1) values with m > u per field."""
    from social_warner_spark.queries.x14_series import (
        FS_BAL_EPS,
        FS_EM_ROUNDS,
        FS_KEY_MOD,
        FS_M0,
        FS_P0,
        FS_U0,
        x243_fellegi_sunter,
    )

    cust = pd.read_parquet(f"{sf_smoke}/customer.parquet")
    pat = Counter()
    by_nation = cust.groupby("c_nationkey")
    for _, g in by_nation:
        rows = list(
            g[["c_custkey", "c_mktsegment", "c_acctbal"]].itertuples(index=False)
        )
        for i in range(len(rows)):
            for j in range(len(rows)):
                a, b = rows[i], rows[j]
                if not a.c_custkey < b.c_custkey:
                    continue
                g1 = int(a.c_mktsegment == b.c_mktsegment)
                g2 = int(abs(a.c_acctbal - b.c_acctbal) < FS_BAL_EPS)
                g3 = int(a.c_custkey % FS_KEY_MOD == b.c_custkey % FS_KEY_MOD)
                pat[(g1, g2, g3)] += 1

    m = [FS_M0] * 3
    u = [FS_U0] * 3
    p = FS_P0
    for _ in range(FS_EM_ROUNDS):
        sw = snw = 0.0
        swg = [0.0] * 3
        snwg = [0.0] * 3
        stot = 0
        for (g1, g2, g3), n in pat.items():
            gs = (g1, g2, g3)
            lm, lu = p, 1 - p
            for i, gi in enumerate(gs):
                lm *= m[i] if gi else 1 - m[i]
                lu *= u[i] if gi else 1 - u[i]
            wm = lm / (lm + lu)
            sw += n * wm
            snw += n * (1 - wm)
            stot += n
            for i, gi in enumerate(gs):
                swg[i] += n * wm * gi
                snwg[i] += n * (1 - wm) * gi
        m = [swg[i] / sw for i in range(3)]
        u = [snwg[i] / snw for i in range(3)]
        p = sw / stot

    got = {r.field: r for r in x243_fellegi_sunter(spark, sf_smoke).collect()}
    for i, field in enumerate(("segment", "balance", "keymod")):
        row = got[field]
        assert abs(row.m_est - m[i]) < 1e-5, field
        assert abs(row.u_est - u[i]) < 1e-5, field
        assert 0.0 < row.u_est < row.m_est < 1.0, field
        assert abs(row.match_prior - p) < 1e-5


def test_kneser_ney_scores_are_proper_and_complete(spark, sf_smoke):
    """x237: every document with >=2 tokens gets a row, every average
    log-probability is negative (probabilities < 1), and for a sampled
    context the discounted+backoff mass over OBSERVED continuations
    stays within (0, 1] — the mass-conservation property of KN."""
    from social_warner_spark.queries.x14_series import KN_D, x237_kneser_ney

    docs = _docs(sf_smoke)
    expect_rows = sum(1 for t in docs["text"] if len(t.strip().split()) >= 2)
    out = x237_kneser_ney(spark, sf_smoke).collect()
    assert len(out) == expect_rows
    assert all(r.avg_kn_logp < 0 for r in out)

    bigrams = Counter()
    for t in docs["text"]:
        ws = t.strip().split()
        bigrams.update(zip(ws, ws[1:]))
    ctx_tot = Counter()
    fwd = Counter()
    rev = Counter()
    for (w1, w2), c in bigrams.items():
        ctx_tot[w1] += c
        fwd[w1] += 1
        rev[w2] += 1
    btypes = len(bigrams)
    w1 = max(ctx_tot, key=lambda w: (ctx_tot[w], w))
    mass = sum(
        (bigrams[(a, b)] - KN_D) / ctx_tot[w1]
        + KN_D * fwd[w1] / ctx_tot[w1] * rev[b] / btypes
        for (a, b) in bigrams
        if a == w1
    )
    assert 0.0 < mass <= 1.0 + 1e-12


def test_snips_weight_identity(spark, sf_smoke):
    """x246: with the empirical logging propensities, the mean
    importance weight per segment is exactly 1 when every action is
    present in the segment (sum over actions of n_sa * (1/|A|)/(n_sa/
    n_seg) = n_seg) — so SNIPS and IPS coincide; both must sit inside
    the segment's value range."""
    from social_warner_spark.queries.x14_series import (
        IPS_SEGMENTS,
        x246_snips_offpolicy,
    )

    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ev["segment"] = ev["user_id"] % IPS_SEGMENTS
    n_actions = ev["event_type"].nunique()
    out = {r.segment: r for r in x246_snips_offpolicy(spark, sf_smoke).collect()}
    for seg, grp in ev.groupby("segment"):
        row = out[seg]
        assert row.n == len(grp)
        if grp["event_type"].nunique() == n_actions:
            assert abs(row.ips_value - row.snips_value) < 1e-5
        assert grp["value"].min() - 1e-6 <= row.snips_value
        assert row.snips_value <= grp["value"].max() + 1e-6


def test_l_diversity_flags_consistent(spark, sf_smoke):
    """x240: k >= l >= 1 for every class, class sizes sum to the table
    size, and both flags restate their thresholds."""
    from social_warner_spark.queries.x14_series import (
        LDIV_K,
        LDIV_L,
        x240_l_diversity,
    )

    rows = x240_l_diversity(spark, sf_smoke).collect()
    cust = pd.read_parquet(f"{sf_smoke}/customer.parquet")
    assert sum(r.k for r in rows) == len(cust)
    for r in rows:
        assert r.k >= r.l >= 1
        assert r.k_anon_ok == (r.k >= LDIV_K)
        assert r.l_diverse_ok == (r.l >= LDIV_L)


def test_mcnemar_cells_partition_corpus(spark, sf_smoke):
    """x242: the four cross-table cells partition the corpus; the
    statistic and accuracies restate the cells."""
    from social_warner_spark.queries.x14_series import x242_mcnemar

    r = x242_mcnemar(spark, sf_smoke).first()
    assert r.n_both + r.n_a_only + r.n_b_only + r.n_neither == r.n
    assert abs(r.acc_a - (r.n_both + r.n_a_only) / r.n) < 1e-6
    assert abs(r.acc_b - (r.n_both + r.n_b_only) / r.n) < 1e-6
    disc = r.n_a_only + r.n_b_only
    want = 0.0 if disc == 0 else (abs(r.n_a_only - r.n_b_only) - 1) ** 2 / disc
    assert abs(r.mcnemar_chi2 - want) < 1e-6
    assert r.mcnemar_chi2 >= 0.0


def test_naive_bayes_confusion_covers_scored_test_docs(spark, sf_smoke):
    """x244: one prediction per test doc that shares >=1 token with the
    train vocabulary; predicted classes come from the train split."""
    from social_warner_spark.queries.x14_series import (
        NB_SPLIT_MOD,
        x244_naive_bayes,
    )

    docs = _docs(sf_smoke)
    train = docs[docs["doc_id"] % NB_SPLIT_MOD != 0]
    test = docs[docs["doc_id"] % NB_SPLIT_MOD == 0]
    train_vocab = {w for t in train["text"] for w in t.strip().split()}
    scored = sum(
        1
        for t in test["text"]
        if any(w in train_vocab for w in t.strip().split())
    )
    rows = x244_naive_bayes(spark, sf_smoke).collect()
    assert sum(r.n for r in rows) == scored
    train_langs = set(train["lang"])
    assert {r.pred_lang for r in rows} <= train_langs


def test_chi2_matches_pure_python_for_top_token(spark, sf_smoke):
    """x245: recompute the contingency chi-square in Python for every
    returned token; values and the top-k membership rule must agree."""
    from social_warner_spark.queries.x14_series import x245_chi2_tokens

    docs = _docs(sf_smoke)
    n_docs = len(docs)
    n_en = int((docs["lang"] == "en").sum())
    presence = defaultdict(lambda: [0, 0])
    for lang, text in zip(docs["lang"], docs["text"]):
        for w in set(text.strip().split()):
            presence[w][0 if lang == "en" else 1] += 1

    def chi2(w):
        a, b = presence[w]
        c, d = n_en - a, n_docs - n_en - b
        num = float(n_docs) * float(a * d - b * c) * float(a * d - b * c)
        den = float(a + b) * float(c + d) * float(a + c) * float(b + d)
        return num / den

    rows = x245_chi2_tokens(spark, sf_smoke).collect()
    assert len(rows) <= 20
    for r in rows:
        assert r.doc_freq == sum(presence[r.w])
        assert abs(r.chi2 - chi2(r.w)) < 1e-4
        assert r.chi2 >= 0.0


def test_textrank_matches_pure_python_pagerank(spark, sf_smoke):
    """x247: rebuild the co-occurrence graph and run the identical
    3-iteration 6dp-rounded PageRank in Python; the top-20 list must
    match exactly (rank, word, position)."""
    from social_warner_spark.queries.x14_series import (
        TR_TOP_K,
        x247_textrank_keywords,
    )

    docs = _docs(sf_smoke)
    pairs = set()
    for t in docs["text"]:
        ws = t.strip().split()
        for a, b in zip(ws, ws[1:]):
            if a != b:
                pairs.add((a, b))
    edges = set()
    for a, b in pairs:
        edges.add((a, b))
        edges.add((b, a))
    nodes = sorted({a for a, _ in edges})
    out = defaultdict(list)
    for a, b in edges:
        out[a].append(b)
    pr = {n: 1.0 for n in nodes}
    for _ in range(3):
        inflow = defaultdict(float)
        for a in nodes:
            share = pr[a] / len(out[a])
            for b in out[a]:
                inflow[b] += share
        pr = {n: round(0.15 + 0.85 * inflow[n], 6) for n in nodes}
    want = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))[:TR_TOP_K]
    got = sorted(
        x247_textrank_keywords(spark, sf_smoke).collect(), key=lambda r: r.rn
    )
    assert [(r.word, round(r.pr, 6)) for r in got] == [
        (w, round(p, 6)) for w, p in want
    ]


def test_welch_matches_statistics_module(spark, sf_smoke):
    """x248: recompute Welch t/df per event type from the raw values
    with python statistics; also t_stat sign must match mean_diff."""
    import statistics as st

    from social_warner_spark.queries.x14_series import (
        WELCH_BASELINE,
        x248_welch_ttest,
    )

    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    base = ev[ev["event_type"] == WELCH_BASELINE]["value"].to_list()
    n0, m0, v0 = len(base), st.fmean(base), st.variance(base)
    rows = {r.event_type: r for r in x248_welch_ttest(spark, sf_smoke).collect()}
    assert WELCH_BASELINE not in rows
    for etype, grp in ev.groupby("event_type"):
        if etype == WELCH_BASELINE:
            continue
        vals = grp["value"].to_list()
        n, m, v = len(vals), st.fmean(vals), st.variance(vals)
        se2 = v / n + v0 / n0
        t = (m - m0) / math.sqrt(se2)
        df = se2 * se2 / (
            (v / n) ** 2 / (n - 1) + (v0 / n0) ** 2 / (n0 - 1)
        )
        r = rows[etype]
        assert abs(r.t_stat - t) < 1e-4
        assert abs(r.welch_df - df) < 1e-3
        assert (r.t_stat >= 0) == (r.mean_diff >= 0)
        assert min(n, n0) - 1 <= r.welch_df <= n + n0 - 2 + 1e-9


def test_cusum_matches_pure_python_recursion(spark, sf_smoke):
    """x249: replay the calibrate-then-fold CUSUM recursion in Python on
    the same TIE-NUDGED 6dp grid the query uses (mu and every fold round
    carry the +1e-9 nudge — k = 0.5*sigma makes each update an exact 7dp
    rational, so un-nudged rounding sits on the half-grid where float
    representation error picks the side; the r08 nudge commit moved the
    Spark fold onto the nudged grid but left this replay on the raw one,
    off by one 6dp step in max_sp).  All outputs must agree exactly."""
    from social_warner_spark.queries.x14_series import (
        CUSUM_CAL_N,
        CUSUM_HS,
        CUSUM_KS,
        x249_cusum_drift,
    )

    got = {r.event_type: r for r in x249_cusum_drift(spark, sf_smoke).collect()}
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    ev["day"] = ev["ts"].dt.floor("D")
    for etype, grp in ev.groupby("event_type"):
        ys = [
            round(v, 6)
            for v in grp.groupby("day")["value"].mean().sort_index()
        ]
        if len(ys) <= CUSUM_CAL_N:
            assert etype not in got
            continue
        cal = ys[:CUSUM_CAL_N]
        mu = round(sum(cal) / CUSUM_CAL_N + 1e-9, 6)
        sigma = round(
            math.sqrt(
                sum((y - mu) * (y - mu) for y in cal) / (CUSUM_CAL_N - 1)
            ),
            6,
        )
        k, h = CUSUM_KS * sigma, CUSUM_HS * sigma
        sp = sn = max_sp = 0.0
        alarms, first = 0, 0
        for i, y in enumerate(ys[CUSUM_CAL_N:], start=1):
            sp = round(max(0.0, sp + (y - mu - k)) + 1e-9, 6)
            sn = round(max(0.0, sn + (mu - y - k)) + 1e-9, 6)
            if sp > h or sn > h:
                alarms += 1
                if first == 0:
                    first = i
            max_sp = max(max_sp, sp)
        r = got[etype]
        assert r.n_days == len(ys)
        assert abs(r.mu - mu) < 1e-9 and abs(r.sigma - sigma) < 1e-9
        assert r.n_alarm_days == alarms
        assert r.first_alarm_idx == first
        assert abs(r.max_sp - max_sp) < 1e-9


def test_isotonic_matches_classic_pav_and_is_monotone(spark, sf_smoke):
    """x250: the minimax closed form must equal the classic
    stack-based pool-adjacent-violators fit (weighted), and the fitted
    curve must be non-decreasing."""
    from social_warner_spark.queries.x14_series import (
        ISO_BIN_W,
        x250_isotonic_calibration,
    )

    docs = _docs(sf_smoke)
    agg = defaultdict(lambda: [0, 0])
    for n_chars, lang in zip(docs["n_chars"], docs["lang"]):
        b = int(n_chars // ISO_BIN_W)
        agg[b][0] += 1
        agg[b][1] += int(lang == "en")
    xs = sorted(agg)
    # classic PAV: merge adjacent blocks while means decrease
    blocks = [[agg[x][0], agg[x][1]] for x in xs]  # [weight, sum]
    merged = []
    for w, s in blocks:
        merged.append([w, s])
        while (
            len(merged) >= 2
            and merged[-2][1] * merged[-1][0] >= merged[-1][1] * merged[-2][0]
        ):
            w2, s2 = merged.pop()
            merged[-1][0] += w2
            merged[-1][1] += s2
    # expand block means back to bins
    fit = []
    bi = 0
    for w, s in merged:
        acc = 0
        while acc < w:
            acc += agg[xs[bi]][0]
            fit.append(s / w)
            bi += 1
    want = dict(zip(xs, fit))
    rows = sorted(
        x250_isotonic_calibration(spark, sf_smoke).collect(),
        key=lambda r: r.xb,
    )
    assert [r.xb for r in rows] == xs
    fitted = [r.fitted_rate for r in rows]
    assert fitted == sorted(fitted), "isotonic fit must be non-decreasing"
    for r in rows:
        assert abs(r.fitted_rate - want[r.xb]) < 1e-5


def test_propensity_matching_matches_brute_force(spark, sf_smoke):
    """x251: brute-force the nearest-control match (caliper, tie on
    min control id) in Python and recompute the ATT."""
    from social_warner_spark.queries.x14_series import (
        PSM_CALIPER,
        PSM_STOPWORDS,
        PSM_TREAT_MAX_SRC,
        x251_propensity_matching,
    )

    docs = _docs(sf_smoke)
    stop = set(PSM_STOPWORDS)
    recs = []
    for doc_id, text, source, n_chars in zip(
        docs["doc_id"], docs["text"], docs["source"], docs["n_chars"]
    ):
        ws = text.strip().split()
        score = sum(1 for w in ws if w in stop) / len(ws)
        treated = int(source[3:]) < PSM_TREAT_MAX_SRC
        recs.append((int(doc_id), treated, score, int(n_chars)))
    controls = [(i, s, y) for i, t, s, y in recs if not t]
    diffs, n_matched, n_treated = [], 0, 0
    for i, t, s, y in recs:
        if not t:
            continue
        n_treated += 1
        cands = [
            (abs(s - cs), ci, cy)
            for ci, cs, cy in controls
            if abs(s - cs) <= PSM_CALIPER
        ]
        if not cands:
            continue
        _, _, cy = min(cands)
        n_matched += 1
        diffs.append(y - cy)
    r = x251_propensity_matching(spark, sf_smoke).first()
    assert r.n_treated == n_treated
    assert r.n_matched == n_matched
    assert r.n_unmatched == n_treated - n_matched
    assert abs(r.att - sum(diffs) / len(diffs)) < 1e-5


def test_dirichlet_ql_matches_pure_python(spark, sf_smoke):
    """x252: recompute the smoothed query-likelihood score for every
    returned doc in Python; ranks and 6dp scores must match."""
    from social_warner_spark.queries.x14_series import (
        DQL_MU,
        DQL_TERMS,
        DQL_TOPK,
        x252_dirichlet_ql,
    )

    docs = _docs(sf_smoke)
    toks = {i: t.strip().split() for i, t in zip(docs["doc_id"], docs["text"])}
    ctot = float(sum(len(ws) for ws in toks.values()))
    cf = {
        q: float(sum(ws.count(q) for ws in toks.values())) for q in DQL_TERMS
    }
    scores = {
        i: round(
            sum(
                math.log(
                    (ws.count(q) + DQL_MU * cf[q] / ctot)
                    / (len(ws) + DQL_MU)
                )
                for q in DQL_TERMS
            ),
            6,
        )
        for i, ws in toks.items()
    }
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:DQL_TOPK]
    got = sorted(x252_dirichlet_ql(spark, sf_smoke).collect(), key=lambda r: r.rk)
    assert [(r.doc_id, round(r.score, 6)) for r in got] == want
    assert all(r.score < 0 for r in got)


def test_rbo_bounds_and_python_recompute(spark, sf_smoke):
    """x253: RBO must lie in [0, 1], agreement = overlap/k, and the RBO
    sum recomputed in Python from the two independently re-derived
    rankings must agree."""
    from social_warner_spark.operators.search import bm25_scores
    from social_warner_spark.queries.common import T
    from social_warner_spark.queries.x14_series import (
        DQL_TERMS,
        RBO_K,
        RBO_P,
        _dql_ranked,
        x253_rbo_rank_agreement,
    )

    r = x253_rbo_rank_agreement(spark, sf_smoke).first()
    assert 0.0 <= r.rbo <= 1.0
    assert abs(r.agreement_at_k - r.overlap_at_k / RBO_K) < 1e-9

    d = T(spark, sf_smoke, "documents")
    a_rows = (
        bm25_scores(d, list(DQL_TERMS))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(RBO_K)
        .collect()
    )
    a_rank = {row.doc_id: i + 1 for i, row in enumerate(a_rows)}
    b_rank = {row.doc_id: row.rk for row in _dql_ranked(d).collect()}
    rbo = 0.0
    for dep in range(1, RBO_K + 1):
        x = sum(
            1
            for doc, ra in a_rank.items()
            if ra <= dep and b_rank.get(doc, RBO_K + 1) <= dep
        )
        rbo += (RBO_P ** (dep - 1)) * x / dep
    rbo *= 1 - RBO_P
    assert abs(r.rbo - rbo) < 1e-5
    assert r.overlap_at_k == sum(1 for doc in a_rank if doc in b_rank)


def test_gini_matches_pure_python(spark, sf_smoke):
    """x254: exact Python recompute of the Gini coefficient and bounds."""
    from social_warner_spark.queries.x14_series import x254_gini_sources

    docs = _docs(sf_smoke)
    per = defaultdict(int)
    for src, text in zip(docs["source"], docs["text"]):
        per[src] += len(text.strip().split())
    xs = sorted(per.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(xs)
    tot = sum(v for _, v in xs)
    gini = 2.0 * sum((i + 1) * v for i, (_, v) in enumerate(xs)) / (
        n * tot
    ) - (n + 1.0) / n
    r = x254_gini_sources(spark, sf_smoke).first()
    assert r.n_sources == n and r.total_tokens == tot
    assert abs(r.gini - gini) < 1e-6
    assert 0.0 <= r.gini < 1.0
    assert abs(r.top_share - max(per.values()) / tot) < 1e-6


def test_ndcg_matches_pure_python(spark, sf_smoke):
    """x255: full leave-one-out replay in Python — holdout, popularity
    WITHOUT held occurrences, discounted gains."""
    from social_warner_spark.queries.x14_series import (
        NDCG_K,
        x255_ndcg_popularity,
    )

    li = pd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    pairs = {(int(o), int(p)) for o, p in zip(li["l_orderkey"], li["l_partkey"])}
    by_order = defaultdict(set)
    for o, p in pairs:
        by_order[o].add(p)
    held = {o: max(ps) for o, ps in by_order.items() if len(ps) >= 2}
    pop = Counter()
    for o, ps in by_order.items():
        for p in ps:
            if held.get(o) != p:
                pop[p] += 1
    top = sorted(pop.items(), key=lambda kv: (-kv[1], kv[0]))[:NDCG_K]
    rank = {p: i + 1 for i, (p, _) in enumerate(top)}
    gains = [
        1.0 / math.log2(rank[h] + 1.0) if h in rank else 0.0
        for h in held.values()
    ]
    r = x255_ndcg_popularity(spark, sf_smoke).first()
    assert r.n_eval == len(held)
    assert r.hits_at_k == sum(1 for h in held.values() if h in rank)
    assert abs(r.ndcg_at_k - sum(gains) / len(gains)) < 1e-6
    assert r.ndcg_at_k <= r.hits_at_k / r.n_eval + 1e-9


def test_bcubed_matches_per_element_definition(spark, sf_smoke):
    """x256: recompute B3 from the PER-ELEMENT definition (mean over
    elements of |C(e) ∩ G(e)|/|C(e)|) using the system labels Spark
    produced and gold labels derived in Python — verifying the
    closed-form cell algebra against the textbook formula."""
    from social_warner_spark.operators.dedup import neardup_clusters
    from social_warner_spark.queries.common import T
    from social_warner_spark.queries.x14_series import (
        B3_THRESHOLD,
        x256_bcubed_dedup_eval,
    )

    docs = _docs(sf_smoke)
    gold = {}
    first_by_text = {}
    for i, t in sorted(zip(docs["doc_id"], docs["text"])):
        gold[i] = first_by_text.setdefault(t, i)
    sysc = {
        r.doc_id: r.cluster_id
        for r in neardup_clusters(
            T(spark, sf_smoke, "documents"), threshold=B3_THRESHOLD
        ).collect()
    }
    sys_members = defaultdict(set)
    gold_members = defaultdict(set)
    for e in gold:
        sys_members[sysc[e]].add(e)
        gold_members[gold[e]].add(e)
    ps, rs = [], []
    for e in gold:
        c, g = sys_members[sysc[e]], gold_members[gold[e]]
        inter = len(c & g)
        ps.append(inter / len(c))
        rs.append(inter / len(g))
    p, r_ = sum(ps) / len(ps), sum(rs) / len(rs)
    row = x256_bcubed_dedup_eval(spark, sf_smoke).first()
    assert row.n_docs == len(gold)
    assert abs(row.bcubed_precision - p) < 1e-6
    assert abs(row.bcubed_recall - r_) < 1e-6
    assert 0.0 < row.bcubed_f1 <= 1.0
