"""ANN signature scaling + MinHash banding configurability.

Round-3 scale fixes: the LSH plane count grows ~log2(n) so expected bucket
occupancy (the per-probe candidate volume) stays bounded as the vector
collection grows — the difference between ~n*64 and n^2/256 work at 10^12
vectors — and the MinHash banding (bands x rows) is a real parameter whose
S-curve threshold moves as theory predicts.
"""

from __future__ import annotations

import math

import pytest

from opengxt_spark import ann, textops, world


def test_planes_for_bounds_expected_occupancy():
    for exp in range(2, 14):  # n = 1e2 .. 1e13
        n = 10**exp
        p = ann.planes_for(n)
        assert 8 <= p <= 40
        assert n / 2**p <= ann.TARGET_OCCUPANCY, (n, p)
    # monotone non-decreasing in n
    ps = [ann.planes_for(10**e) for e in range(2, 14)]
    assert ps == sorted(ps)
    # gate-scale collections stay at the recall-friendly floor
    assert ann.planes_for(500) == 8
    assert ann.planes_for(2000) == 8


def test_ann_dynamic_width_matches_explicit(spark, sf_dir):
    """n_planes=None resolves from the (memoized) table count; at gate scale
    that is the 8-plane default, so results match the explicit call."""
    world.register_tables(spark, sf_dir)
    dyn = {tuple(r) for r in ann.ann_topk_lsh(spark, k=3).collect()}
    fixed = {tuple(r) for r in ann.ann_topk_lsh(spark, k=3, n_planes=8).collect()}
    assert dyn == fixed and dyn


def test_ann_occupancy_matched_width_beats_overpartitioned(spark, sf_dir):
    """Recall@5 against the brute baseline is higher at the occupancy-matched
    width (planes_for(500) = 8) than at an over-partitioned 12 planes —
    the empirical rationale for sizing planes from n instead of fixing them:
    too many buckets for the collection strands true neighbors outside the
    Hamming-1 probe set, too few explodes candidate volume."""
    world.register_tables(spark, sf_dir)
    brute = ann.cosine_topk(spark, k=5).collect()
    truth = {(r["qid"], r["nid"]) for r in brute}

    def recall(n_planes: int) -> float:
        got = {
            (r["qid"], r["nid"])
            for r in ann.ann_topk_lsh(spark, k=5, n_planes=n_planes).collect()
        }
        return len(truth & got) / len(truth)

    r8, r12 = recall(8), recall(12)
    assert r8 > r12 > 0.0, (r8, r12)
    assert r8 >= 0.1, r8


def test_minhash_scurve_threshold_moves():
    # 4x4 is a near-dup sieve; 8x2 admits looser pairs
    assert textops.lsh_candidate_prob(0.8, 4, 4) > 0.8
    assert textops.lsh_candidate_prob(0.3, 4, 4) < 0.05
    assert textops.lsh_candidate_prob(0.3, 8, 2) > 0.5
    # threshold j* ~ (1/b)^(1/r)
    assert math.isclose((1 / 4) ** (1 / 4), 0.707, abs_tol=0.01)


def test_minhash_configs_nest_on_candidates(spark, sf_dir):
    """Same 16 signature slots, different banding: every 4x4 candidate pair
    shares 4 consecutive slots, hence at least one 2-slot half of them —
    so the 8x2 candidate set is a superset on this data layout."""
    world.register_tables(spark, sf_dir)
    tight = {
        (r["did_a"], r["did_b"])
        for r in textops.minhash_lsh_pairs(spark, bands=4, rows=4).collect()
    }
    loose = {
        (r["did_a"], r["did_b"])
        for r in textops.minhash_lsh_pairs(spark, bands=8, rows=2).collect()
    }
    assert tight and tight <= loose

def test_ivf_stride_sizing():
    # C ~ sqrt(n): stride = n/C grows like sqrt(n)
    for n in (100, 10_000, 1_000_000, 10**12):
        s = ann.ivf_stride_for(n)
        c = n // s
        root = math.isqrt(n)
        assert root / 2 <= c <= 2 * root, (n, s, c)
    assert ann.ivf_stride_for(3) == 2


def test_ivf_assign_partitions_all_vectors(spark, sf_dir):
    world.register_tables(spark, sf_dir)
    rows = ann.ivf_assign(spark, stride=20).collect()
    n = spark.table("embeddings").count()
    assert len(rows) == n  # every vector in exactly one list
    cids = {r["cid"] for r in rows}
    assert all(c % 20 == 1 for c in cids)
    # centroids belong to their own list (cos=1 is its own argmax)
    own = {r["vec_id"]: r["cid"] for r in rows}
    for c in cids:
        assert own[c] == c


def test_ivf_recall_vs_brute(spark, sf_dir):
    """IVF top-5 recall against the exact baseline must beat the
    random-scan floor (the fraction of the collection a query's 2 probed
    lists cover) by a wide margin — i.e. centroid affinity concentrates
    true neighbors into the probed lists."""
    world.register_tables(spark, sf_dir)
    n = spark.table("embeddings").count()
    truth = {(r["qid"], r["nid"]) for r in ann.cosine_topk(spark, k=5).collect()}
    got = {
        (r["qid"], r["nid"])
        for r in ann.ann_topk_ivf(spark, k=5, stride=20).collect()
    }
    recall = len(truth & got) / len(truth)
    floor = 2.0 * 20.0 / n  # probes * avg list occupancy / n = probes*stride/n
    assert recall >= max(2.5 * floor, 0.15), (recall, floor)


def test_ivf_dynamic_stride_runs(spark, sf_dir):
    world.register_tables(spark, sf_dir)
    rows = ann.ann_topk_ivf(spark, k=3).collect()
    assert rows and all(r["rnk"] <= 3 for r in rows)


def test_ivf_two_level_work_bound(spark, sf_dir):
    """The coarse-quantized assignment scores O(n log C) centroid pairs,
    not n*C: with C=125 lists the shortlist is ~(m+1) probe buckets of
    ~C/2^m centroids each, well under both n*C/2 and the O(n*sqrt(C))
    budget the design claims (VERDICT r3 item #2)."""
    world.register_tables(spark, sf_dir)
    n = spark.table("embeddings").count()
    stats = ann.ivf_assign_scored_pairs(spark, stride=4)
    c = stats["n_centroids"]
    assert c >= 100  # the bound is vacuous for a handful of centroids
    brute = n * c
    assert stats["scored"] <= brute / 2, stats
    assert stats["scored"] <= n * 6 * math.isqrt(c), stats
    # fallback (empty shortlist) should be a rare exception, not a path
    assert stats["fallback_vecs"] <= max(n // 50, 2), stats


def test_ivf_two_level_agrees_with_brute(spark, sf_dir):
    """Shortlist argmax finds the true nearest centroid for the large
    majority of vectors (the coarse LSH rarely hides the argmax), and
    every vector still lands in exactly one list."""
    world.register_tables(spark, sf_dir)
    n = spark.table("embeddings").count()
    two = {r["vec_id"]: r["cid"]
           for r in ann.ivf_assign(spark, stride=20).collect()}
    brute = {r["vec_id"]: r["cid"]
             for r in ann.ivf_assign_brute(spark, stride=20).collect()}
    assert len(two) == n and set(two) == set(brute)
    agree = sum(1 for v, c in two.items() if brute[v] == c) / n
    assert agree >= 0.5, agree


def test_neardup_clusters_invariants(spark, sf_dir):
    """Connected-component contract: labels are component minima — every
    edge's two endpoints share a cluster, each cluster's id is its own
    minimum member, keep marks exactly one doc per cluster, and every
    document is labeled."""
    from opengxt_spark import textops

    world.register_tables(spark, sf_dir)
    out = {r["did"]: (r["cluster"], r["keep"])
           for r in textops.neardup_clusters(spark).collect()}
    n_docs = spark.table("documents").count()
    assert len(out) == n_docs
    edges = [
        (r["did_a"], r["did_b"])
        for r in textops.minhash_lsh_pairs(spark, bands=8, rows=2)
        .where("n_match >= 8").collect()
    ]
    assert edges, "fixture should produce a non-trivial candidate graph"
    for a, b in edges:
        assert out[a][0] == out[b][0], (a, b, out[a], out[b])
    clusters = {}
    for did, (cl, keep) in out.items():
        clusters.setdefault(cl, []).append((did, keep))
    for cl, members in clusters.items():
        assert cl == min(d for d, _ in members)
        assert sum(1 for _, k in members if k) == 1
        assert dict(members)[cl] is True or dict(members)[cl] == True  # noqa: E712


# ---------------------------------------------------------------------------
# Product quantization (PQ / ADC / IVF-PQ)
# ---------------------------------------------------------------------------


def _load_vectors(sf_dir):
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    order = sorted(range(len(t["vec_id"])), key=lambda i: t["vec_id"][i])
    return np.array([t["embedding"][i] for i in order], dtype=np.float64)


def test_pq_codes_bounds_and_determinism(spark, sf_dir):
    """Every vector gets one code per subspace, all in [0, PQ_K); the
    encoding is deterministic (data-sampled codebooks, no RNG)."""
    world.register_tables(spark, sf_dir)
    n = spark.table("embeddings").count()
    rows = ann.pq_codes(spark, cstride=ann.PQ_CSTRIDE_GATE).collect()
    assert len(rows) == n
    for r in rows:
        for j in range(ann.PQ_M):
            assert 0 <= r[f"c{j}"] < ann.PQ_K
    again = ann.pq_codes(spark, cstride=ann.PQ_CSTRIDE_GATE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_pq_compression_contract():
    """The stored footprint is PQ_M 4-bit codes: 32x below the raw float
    array, and the subspaces tile the dimension exactly."""
    assert ann.PQ_M * ann.PQ_SUB == ann.DIM
    assert ann.PQ_K <= 16  # 4-bit codes -> PQ_M/2 bytes packed, <=PQ_M unpacked
    raw = ann.DIM * 4          # float32 payload
    packed = ann.PQ_M          # one byte per code (4 bits used)
    assert raw // packed == 32


def test_pq_adc_equals_reconstructed_l2(spark, sf_dir):
    """ADC semantics: adist(q, c) must equal the exact L2^2 between the
    query vector and candidate's codeword reconstruction — verified in
    numpy from the parquet for every reported pair."""
    import numpy as np

    world.register_tables(spark, sf_dir)
    V = _load_vectors(sf_dir)
    cstride = ann.PQ_CSTRIDE_GATE
    cw = {c: V[c * cstride + 2] for c in range(ann.PQ_K)}
    codes = {
        r["vec_id"]: [r[f"c{j}"] for j in range(ann.PQ_M)]
        for r in ann.pq_codes(spark, cstride=cstride).collect()
    }
    out = ann.pq_adc_topk(spark, cstride=cstride).collect()
    assert out
    for r in out:
        recon = np.concatenate([
            cw[codes[r["nid"]][j]][j * ann.PQ_SUB:(j + 1) * ann.PQ_SUB]
            for j in range(ann.PQ_M)
        ])
        want = float(((V[r["qid"]] - recon) ** 2).sum())
        assert abs(want - r["adist"]) < 1e-6, (r, want)


def test_pq_adc_recall_vs_exact_l2(spark, sf_dir):
    """Deterministic recall floor: ADC top-5 must beat random scan by 10x
    (synthetic near-random embeddings are PQ's worst case; measured 0.18
    at sf0.001 vs 0.01 chance)."""
    import numpy as np

    world.register_tables(spark, sf_dir)
    V = _load_vectors(sf_dir)
    n = len(V)
    qids = [i for i in range(n) if i % 25 == 0]
    truth = {}
    for q in qids:
        d = ((V - V[q]) ** 2).sum(1)
        d[q] = np.inf
        truth[q] = set(np.lexsort((np.arange(n), d))[:5].tolist())
    got = {}
    for r in ann.pq_adc_topk(spark, cstride=ann.PQ_CSTRIDE_GATE).collect():
        got.setdefault(r["qid"], set()).add(r["nid"])
    recall = sum(len(truth[q] & got.get(q, set())) for q in qids) / (5 * len(qids))
    assert recall >= 10.0 * 5.0 / n, recall


def test_ivfpq_recall_and_shape(spark, sf_dir):
    """IVF-PQ compounds list filtering and quantization; it must still
    beat the probes*stride/n coverage floor vs the EXACT ranking, and emit
    dense ranks 1..k per query."""
    import numpy as np

    world.register_tables(spark, sf_dir)
    V = _load_vectors(sf_dir)
    n = len(V)
    qids = [i for i in range(n) if i % 25 == 0]
    truth = {}
    for q in qids:
        d = ((V - V[q]) ** 2).sum(1)
        d[q] = np.inf
        truth[q] = set(np.lexsort((np.arange(n), d))[:5].tolist())
    rows = ann.ann_topk_ivfpq(
        spark, stride=20, m=4, cstride=ann.PQ_CSTRIDE_GATE
    ).collect()
    got, ranks = {}, {}
    for r in rows:
        got.setdefault(r["qid"], set()).add(r["nid"])
        ranks.setdefault(r["qid"], []).append(r["rnk"])
    for q, rs in ranks.items():
        assert sorted(rs) == list(range(1, len(rs) + 1))
    recall = sum(len(truth[q] & got.get(q, set())) for q in qids) / (5 * len(qids))
    floor = 2.0 * 20.0 / n
    assert recall >= floor, (recall, floor)


def test_pq_packed_roundtrips_codes(spark, sf_dir):
    """The packed bigint unpacks to exactly the per-subspace codes, and
    fits 4 bytes (< 2^32)."""
    world.register_tables(spark, sf_dir)
    codes = {
        r["vec_id"]: [r[f"c{j}"] for j in range(ann.PQ_M)]
        for r in ann.pq_codes(spark, cstride=ann.PQ_CSTRIDE_GATE).collect()
    }
    packed = {
        r["vec_id"]: r["packed"]
        for r in ann.pq_codes_packed(spark, cstride=ann.PQ_CSTRIDE_GATE).collect()
    }
    assert packed.keys() == codes.keys()
    for vid, p in packed.items():
        assert 0 <= p < 2 ** 32
        assert [(p // 16 ** j) % 16 for j in range(ann.PQ_M)] == codes[vid]


def test_min_label_components_chain_log_rounds(spark):
    """Adversarial chain graph 0~1~2~...~n: pointer jumping must converge
    in O(log n) rounds (plain min-label propagation needs n rounds), and
    every node must label to the component min."""
    import math

    from opengxt_spark import textops

    n = 300
    nodes = spark.range(n).selectExpr("id AS did")
    fwd = spark.range(n - 1).selectExpr("id AS src", "id + 1 AS dst")
    edges = fwd.unionAll(fwd.selectExpr("dst AS src", "src AS dst"))
    lbl, rounds = textops._min_label_components(spark, edges, nodes, 40)
    rows = lbl.collect()
    assert all(r["lbl"] == 0 for r in rows) and len(rows) == n
    assert rounds <= 2 * math.ceil(math.log2(n)) + 2, rounds

    # two disjoint chains keep distinct component minima
    e2 = spark.sql(
        "SELECT id AS src, id + 1 AS dst FROM RANGE(0, 9) "
        "UNION ALL SELECT id, id + 1 FROM RANGE(20, 29)"
    )
    e2 = e2.unionAll(e2.selectExpr("dst AS src", "src AS dst"))
    n2 = spark.sql(
        "SELECT id AS did FROM RANGE(0, 10) "
        "UNION ALL SELECT id FROM RANGE(20, 30)"
    )
    lbl2, _ = textops._min_label_components(spark, e2, n2, 40)
    got = {r["did"]: r["lbl"] for r in lbl2.collect()}
    assert all(got[i] == 0 for i in range(10))
    assert all(got[i] == 20 for i in range(20, 30))


def test_ivfpq_residual_recall_ge_nonresidual(spark):
    """Residual PQ (IVFADC) must recall at least as well as the
    non-residual IVF-PQ at the same stride/m/cstride vs exact L2 truth,
    on CLUSTERED data — the regime residualization exists for (codewords
    spend on within-list variation instead of between-list offsets). On
    isotropic-random vectors residuals have ~2x the variance of the raw
    vectors and genuinely hurt, so the property is tested where it is
    defined: a deterministic 16-cluster table registered over the
    embeddings view."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(16, ann.DIM) * 1.0
    n = 400
    V = np.stack([
        centers[i % 16] + 0.12 * rng.randn(ann.DIM) for i in range(n)
    ])
    rows = [(i, [float(x) for x in V[i]]) for i in range(n)]
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    ).createOrReplaceTempView("embeddings")

    qids = [i for i in range(n) if i % 25 == 0]
    truth = {}
    for q in qids:
        d = ((V - V[q]) ** 2).sum(1)
        d[q] = np.inf
        truth[q] = set(np.lexsort((np.arange(n), d))[:5].tolist())

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["qid"], set()).add(r["nid"])
        hits = sum(len(truth[q] & got.get(q, set())) for q in qids)
        return hits / (5.0 * len(qids))

    kw = dict(stride=20, m=4, cstride=25)
    r_res = recall(ann.ann_topk_ivfpq_residual(spark, **kw))
    r_raw = recall(ann.ann_topk_ivfpq(spark, **kw))
    assert r_res >= r_raw, (r_res, r_raw)
    assert r_res > 0.2, r_res
