"""r12 family pins: scipy-free Python replays of the new operators at
sf0.001 — conformal coverage, group-sequential OBF, query-likelihood
retrieval, MRR/MAP, and the HMM Viterbi decode."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_split_conformal_coverage_replay(spark):
    from ningaloo_turtle_etl_spark.operators.trend import (
        split_conformal_coverage,
    )

    ev = load_table(spark, "events", SF_DIR)
    got = {
        r["event_type"]: r
        for r in split_conformal_coverage(
            ev, "event_type", "value", "event_id", alpha=0.1
        ).collect()
    }
    rows = (
        ev.where(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
        .collect()
    )
    groups: dict[str, list] = {}
    for r in rows:
        h = hashlib.md5(str(r["event_id"]).encode()).hexdigest()
        cal = int(h[0], 16) < 8
        groups.setdefault(r["event_type"], []).append(
            (cal, r["event_id"], round(r["value"] * 1e6))
        )
    for g, items in groups.items():
        cal = [(i, vm) for c, i, vm in items if c]
        tst = [(i, vm) for c, i, vm in items if not c]
        n_cal = len(cal)
        mu = sum(vm for _, vm in cal) / n_cal
        scores = sorted((abs(vm - mu), i) for i, vm in cal)
        k = min(math.ceil((n_cal + 1) * 0.9), n_cal)
        qhat = scores[k - 1][0]
        cov = sum(1 for _, vm in tst if abs(vm - mu) <= qhat) / len(tst)
        assert got[g]["n_cal"] == n_cal
        assert got[g]["n_test"] == len(tst)
        assert abs(got[g]["q_hat"] - round(qhat / 1e6, 6)) < 1e-9
        assert abs(got[g]["coverage"] - round(cov, 6)) < 1e-9
        # the finite-sample validity contract (generous band: one group
        # at sf0.001 has a few hundred test rows)
        assert 0.8 <= got[g]["coverage"] <= 1.0


def test_group_sequential_obf_replay(spark):
    from ningaloo_turtle_etl_spark.operators.trend import (
        group_sequential_obf,
    )

    ev = load_table(spark, "events", SF_DIR).where(F.col("ts").isNotNull())
    out = group_sequential_obf(
        ev, "event_type", "value", F.to_date("ts"), "click", "view"
    ).collect()
    assert out, "no looks produced"
    rows = (
        ev.where(
            F.col("value").isNotNull()
            & F.col("event_type").isin(["click", "view"])
        )
        .select(
            F.to_date("ts").alias("day"),
            "event_type",
            F.round(F.col("value") * 1e6, 0).cast("long").alias("vm"),
        )
        .collect()
    )
    daily: dict = {}
    for r in rows:
        key = (r["day"], r["event_type"])
        n, s, q = daily.get(key, (0, 0, 0))
        daily[key] = (n + 1, s + r["vm"], q + r["vm"] * r["vm"])
    days = sorted({d for d, _ in daily})

    def cum(arm, upto):
        n = s = q = 0
        for d in days:
            if d > upto:
                break
            if (d, arm) in daily:
                dn, ds, dq = daily[(d, arm)]
                n, s, q = n + dn, s + ds, q + dq
        return n, s, q

    n_looks = len(out)
    for r in out[:5]:
        nt, st, qt = cum("click", r["day"])
        nc, sc, qc = cum("view", r["day"])
        assert (nt, nc) == (r["n_treat"], r["n_ctrl"])
        mt, mc = st / nt, sc / nc
        vt = (qt / nt - mt * mt) / (nt - 1)
        vc = (qc / nc - mc * mc) / (nc - 1)
        z = (mt - mc) / math.sqrt(vt + vc)
        assert abs(r["z"] - round(z, 6)) < 1e-9
        b = 2.24 / math.sqrt(r["look"] / n_looks)
        assert abs(r["boundary"] - round(b, 6)) < 1e-9
        assert r["crossed"] == (abs(z) > b)
    # OBF boundaries shrink monotonically over looks
    bs = [r["boundary"] for r in out]
    assert bs == sorted(bs, reverse=True)


def test_query_likelihood_replay(spark):
    from ningaloo_turtle_etl_spark.operators.search import (
        build_inverted_index,
        query_likelihood_topk,
        top_bigram,
    )
    from ningaloo_turtle_etl_spark.operators.text import tokens  # noqa: F401

    docs = load_table(spark, "documents", SF_DIR)
    a, b = top_bigram(docs)
    idx = build_inverted_index(docs)
    got = query_likelihood_topk(idx, [a, b], k=10, mu=50.0).collect()
    # python replay from the raw docs
    import re

    corpus = {
        r["doc_id"]: [
            t for t in re.split(r"\s+", r["text"].lower()) if t != ""
        ]
        for r in docs.select("doc_id", "text").collect()
    }
    q = sorted({a, b})
    ctot = sum(len(t) for t in corpus.values())
    ctf = {
        t: sum(doc.count(t) for doc in corpus.values()) for t in q
    }
    scores = {}
    matched = {}
    for d, toks in corpus.items():
        if not any(t in toks for t in q):
            continue
        s = 0
        m = 0
        for t in q:
            tf = toks.count(t)
            m += 1 if tf else 0
            s += round(
                math.log(
                    (tf + 50.0 * (ctf[t] / ctot)) / (len(toks) + 50.0)
                )
                * 1e6
            )
        scores[d] = s
        matched[d] = m
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["doc_id"], r["ql_score"], r["n_query_terms_matched"])
            for r in got] == [
        (d, round(s / 1e6, 6), matched[d]) for d, s in top
    ]


def test_retrieval_mrr_map_replay(spark):
    from ningaloo_turtle_etl_spark.queries.llm_ops import retrieval_mrr_map

    got = {r["query_id"]: r for r in retrieval_mrr_map(spark, SF_DIR).collect()}
    emb = load_table(spark, "embeddings", SF_DIR).collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in emb}
    labs = {r["vec_id"]: r["label"] for r in emb}
    for qid in range(5):
        qv = vecs[qid]
        qn = math.sqrt(float((qv * qv).sum()))
        scored = sorted(
            (
                -round(
                    float(np.dot(vecs[c], qv))
                    / (math.sqrt(float((vecs[c] * vecs[c]).sum())) * qn),
                    6,
                ),
                c,
            )
            for c in vecs
            if c != qid
        )
        top = [c for _, c in scored[:10]]
        rels = [1 if labs[c] == labs[qid] else 0 for c in top]
        n_rel_total = sum(1 for c in vecs if c != qid and labs[c] == labs[qid])
        frr = next((i + 1 for i, r in enumerate(rels) if r), 0)
        cum = 0
        ap_micro = 0
        for i, r in enumerate(rels):
            if r:
                cum += 1
                ap_micro += round(cum / (i + 1) * 1e6)
        rr = round(1.0 / frr, 6) if frr else 0.0
        ap = (
            round(ap_micro / 1e6 / min(n_rel_total, 10), 6)
            if n_rel_total
            else 0.0
        )
        g = got[qid]
        assert g["n_rel_total"] == n_rel_total
        assert g["first_rel_rank"] == frr
        assert abs(g["reciprocal_rank"] - rr) < 1e-9
        assert abs(g["ap_at_k"] - ap) < 1e-9


def test_hmm_viterbi_replay(spark):
    import itertools

    from ningaloo_turtle_etl_spark.operators.temporal import (
        HMM_E,
        HMM_PI,
        HMM_T,
        hmm_viterbi_paths,
    )

    ev = load_table(spark, "events", SF_DIR).where(F.col("ts").isNotNull())
    got = {
        (r["first_type"], r["path"]): r
        for r in hmm_viterbi_paths(
            ev, "user_id", "event_type", ["ts", "event_id"], steps=4
        ).collect()
    }
    rows = ev.select("user_id", "event_type", "ts", "event_id").collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    census: dict = {}
    paths = list(itertools.product((0, 1), repeat=4))
    for u, evs in by_user.items():
        evs.sort()
        obs = [t for _, _, t in evs[:4]]
        if len(obs) < 4:
            continue
        best_p, best_path = None, None
        for pth in paths:
            p = HMM_PI[pth[0]] * HMM_E[obs[0]][pth[0]]
            for i in range(1, 4):
                p = p * HMM_T[pth[i - 1]][pth[i]] * HMM_E[obs[i]][pth[i]]
            if best_p is None or p > best_p:
                best_p, best_path = p, "".join(map(str, pth))
        key = (obs[0], best_path)
        n, s = census.get(key, (0, 0))
        # Spark ROUND is HALF_UP (away from zero); python round() banks
        ll = math.log(best_p) * 1e6
        llu = int(math.copysign(math.floor(abs(ll) + 0.5), ll))
        census[key] = (n + 1, s + llu)
    assert set(census) == set(got)

    def r6(x: float) -> float:  # Spark ROUND: HALF_UP, away from zero
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

    for key, (n, s) in census.items():
        assert got[key]["n_users"] == n
        assert abs(
            got[key]["avg_best_loglik"] - r6(s / 1e6 / n)
        ) < 1e-9


def test_eb_shrunk_rates_replay(spark):
    from ningaloo_turtle_etl_spark.operators.trend import eb_shrunk_rates

    ev = load_table(spark, "events", SF_DIR).withColumn(
        "user_bucket", F.col("user_id") % 64
    )
    got = {
        r["user_bucket"]: r
        for r in eb_shrunk_rates(
            ev, "user_bucket", F.col("event_type") == "purchase"
        ).collect()
    }
    rows = ev.select("user_bucket", "event_type").collect()
    agg: dict = {}
    for r in rows:
        n, x = agg.get(r["user_bucket"], (0, 0))
        agg[r["user_bucket"]] = (
            n + 1,
            x + (1 if r["event_type"] == "purchase" else 0),
        )
    rms = {
        g: int(math.copysign(math.floor(abs(x / n * 1e6) + 0.5), x))
        for g, (n, x) in agg.items()
    }
    k = len(rms)
    srm = sum(rms.values())
    qrm = sum(v * v for v in rms.values())
    m = srm / k / 1e6
    v = (qrm / k - (srm / k) * (srm / k)) / 1e12
    s0 = (
        m * (1.0 - m) / v - 1.0
        if (k > 1 and v > 0 and m * (1.0 - m) / v > 1)
        else 0.0
    )
    a0, b0 = m * s0, (1.0 - m) * s0
    for g, (n, x) in agg.items():
        r = got[g]
        assert (r["n_trials"], r["n_success"]) == (n, x)
        sh = (x + a0) / (n + a0 + b0)
        assert abs(r["shrunk_rate"] - round(sh, 6)) < 1e-6
        # shrinkage pulls every rate TOWARD the prior mean
        raw = x / n
        assert (sh - raw) * (m - raw) >= -1e-12


def test_seeded_permutation_test_replay(spark):
    from ningaloo_turtle_etl_spark.operators.trend import (
        seeded_permutation_test,
    )

    ev = (
        load_table(spark, "events", SF_DIR)
        .where(
            F.col("value").isNotNull()
            & F.col("event_type").isin(["purchase", "view"])
        )
        .withColumn(
            "_arm", (F.col("event_type") == "purchase").cast("int")
        )
    )
    got = seeded_permutation_test(ev, "value", "event_id", n_perm=48).collect()[0]
    rows = ev.select("_arm", "value", "event_id").collect()
    data = [
        (
            r["_arm"],
            round(r["value"] * 1e6),
            int(hashlib.md5(str(r["event_id"]).encode()).hexdigest()[:15], 16),
        )
        for r in rows
    ]
    n_all = len(data)
    s_all = sum(vm for _, vm, _ in data)
    n_b = sum(a for a, _, _ in data)
    s_b = sum(vm for a, vm, _ in data if a == 1)

    def delta(nb, sb):
        return abs(sb / nb - (s_all - sb) / (n_all - nb))

    d_obs = delta(n_b, s_b)
    extreme = 0
    for b in range(48):
        pn = sum(1 for _, _, h in data if (h >> b) & 1)
        ps = sum(vm for _, vm, h in data if (h >> b) & 1)
        if 0 < pn < n_all and delta(pn, ps) >= d_obs:
            extreme += 1
    assert got["n_a"] == n_all - n_b and got["n_b"] == n_b
    assert got["n_extreme"] == extreme
    assert abs(got["p_value"] - round((extreme + 1) / 49.0, 6)) < 1e-9
    # add-one estimate is bounded away from 0 and capped at 1
    assert 1.0 / 49.0 <= got["p_value"] <= 1.0


def test_k_truss_synthetic(spark):
    import pytest

    from ningaloo_turtle_etl_spark.operators.graph import k_truss

    # 5-clique (every edge in 3 triangles) + a pendant chain hanging off
    # node 0: the 4-truss keeps exactly the clique and peels the chain.
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = [(0, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(clique + chain, "src long, dst long")
    out = k_truss(df, k=4).collect()
    assert len(out) == 10
    assert all(r["support"] == 3 for r in out)
    assert {(r["a"], r["b"]) for r in out} == set(clique)
    with pytest.raises(ValueError):
        k_truss(df, k=2)


def test_k_truss_mixed_support_and_peel_to_empty(spark):
    """r14 focused pin for the single-pass triangle-credit rewrite (the
    3-way unionAll became one explode): two 4-cliques sharing one edge
    give MIXED supports (shared edge sits in 4 triangles, the rest in
    2), so a miscounted side-credit would surface; k=5 then peels the
    whole graph to empty across multiple rounds (the fused lazy-
    checkpoint count drives the loop)."""
    from ningaloo_turtle_etl_spark.operators.graph import k_truss

    c1 = [(a, b) for a in (0, 1, 2, 3) for b in (0, 1, 2, 3) if a < b]
    c2 = [(a, b) for a in (0, 1, 4, 5) for b in (0, 1, 4, 5) if a < b]
    df = spark.createDataFrame(sorted(set(c1 + c2)), "src long, dst long")
    got = {(r["a"], r["b"]): r["support"] for r in k_truss(df, k=4).collect()}
    want = {e: (4 if e == (0, 1) else 2) for e in sorted(set(c1 + c2))}
    assert got == want
    assert k_truss(df, k=5).count() == 0
