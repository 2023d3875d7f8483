"""Training-data pipeline ops: dedup, similarity, text stats, multimodal
plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from noise_spark.datapipe import dedup, multimodal, similarity, textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y"), (4, "x y"), (5, "unique")],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in dedup.exact_dedup(df).collect())
    assert kept == [1, 3, 5]
    groups = dedup.duplicate_groups(df).collect()
    assert sorted((g["n"], g["keep_doc"]) for g in groups) == [(2, 1), (2, 3)]


def test_minhash_identical_docs_same_signature(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "d c b a"), (3, "totally different words here")],
        "doc_id long, text string",
    )
    sig = {r["doc_id"]: (r["mh0"], r["mh1"], r["mh2"], r["mh3"])
           for r in dedup.minhash_signatures(df, n_hashes=4).collect()}
    assert sig[1] == sig[2]  # same token set → same signature
    assert sig[1] != sig[3]


def test_lsh_candidate_pairs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "p q r s t u v w")],
        "doc_id long, text string",
    )
    sig = dedup.minhash_signatures(df, n_hashes=8)
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.lsh_candidate_pairs(sig, bands=4).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_near_duplicates_close(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 5),
            (2, "the quick brown fox jumps over the lazy cat " * 5),
            (3, "completely unrelated text about spark shuffles and joins"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: int(r["simhash"]) for r in dedup.simhash(df, bits=32).collect()}
    d12 = bin(rows[1] ^ rows[2]).count("1")
    d13 = bin(rows[1] ^ rows[3]).count("1")
    assert d12 < d13


def _simhash_py(text: str, bits: int) -> int:
    """Pure-Python reference: tf-weighted majority vote over the bits of
    the 64-bit value formed by md5's first 16 hex chars."""
    import hashlib
    from collections import Counter

    tf = Counter(text.split(" "))
    sums = [0] * bits
    for term, n in tf.items():
        h = int(hashlib.md5(term.encode()).hexdigest()[:16], 16)
        for i in range(bits):
            sums[i] += n if (h >> i) & 1 else -n
    return sum(1 << i for i in range(bits) if sums[i] > 0)


@pytest.mark.parametrize("bits", [32, 62, 64])
def test_simhash_bit_exact_vs_python(spark, bits):
    # decimal casts round HALF_UP and would corrupt bit extraction; the
    # long-arithmetic path must match the reference exactly, incl. bit 63
    # (bits=64 → signature is a two's-complement long)
    texts = ["a b c a", "spark shuffle join", "x", "the the the zebra"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: int(r["simhash"]) for r in dedup.simhash(df, bits=bits).collect()}
    for i, t in enumerate(texts):
        want = _simhash_py(t, bits)
        if bits == 64 and want >= 1 << 63:
            want -= 1 << 64  # two's complement view of the long
        assert got[i] == want, f"bits={bits} doc={i}"


def test_simhash_rejects_bad_bits(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.simhash(df, bits=65)
    with pytest.raises(ValueError):
        dedup.simhash(df, bits=0)


def test_simhash_band_pairs_pigeonhole_recall(spark):
    # pairs within hamming distance <= n_bands-1 MUST be found (pigeonhole)
    sigs = spark.createDataFrame(
        [
            (1, 0b1111000011110000),
            (2, 0b1111000011110001),  # d(1,2)=1
            (3, 0b1111000011000000),  # d(1,3)=2
            (4, 0b0000111100001111),  # d(1,4)=16
        ],
        "doc_id long, simhash long",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_candidate_pairs(sigs, bits=16, n_bands=4).collect()
    }
    assert pairs[(1, 2)] == 1 and pairs[(1, 3)] == 2 and pairs[(2, 3)] == 3
    assert (1, 4) not in pairs  # beyond max_hamming


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],  # chain + pairs + dup edge
        [(5, 1), (9, 5), (2, 9), (7, 8)],  # chain given in shuffled order
        [(i, i + 1) for i in range(30)],  # long path (log-round convergence)
        [(100, 1), (100, 2), (100, 3), (100, 4)],  # high-degree star
    ],
)
def test_connected_components_vs_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(df).collect()
    }
    assert got == _uf_components(edges)


def test_neardup_lsh_matches_bruteforce_no_cartesian(spark, emb):
    # the LSH-blocked path must equal the exact all-pairs result at this
    # threshold (multi-band recall), with only equi-joins in the plan
    lsh = similarity.neardup_pairs_lsh(emb, dim=64, threshold=0.45, r=2, n_bands=24)
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {(r["id_a"], r["id_b"]) for r in lsh.collect()}

    e = emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    a, b = e.alias("a"), e.alias("b")

    def dot(x, y):
        return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, z: acc + z)

    sim = F.round(
        dot(F.col("a.v"), F.col("b.v"))
        / (F.sqrt(dot(F.col("a.v"), F.col("a.v"))) * F.sqrt(dot(F.col("b.v"), F.col("b.v")))),
        4,
    )
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"), sim.alias("s"))
        .filter(F.col("s") >= 0.45)
        .collect()
    }
    assert got == brute


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "a b c d e f g h i j"),
            (3, "a b c x y z q w e r"),
        ],
        "doc_id long, text string",
    )
    pairs = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.9).collect()
    assert [(p["id_a"], p["id_b"], p["jaccard"]) for p in pairs] == [(1, 2, 1.0)]


def test_ngram_jaccard_stop_shingle_guard(spark):
    """A universal boilerplate shingle must not fan the self-join out to
    k² candidate pairs: with max_shingle_df set, the Zipf-head shingle
    is dropped from intersection AND sizes, so otherwise-unrelated docs
    produce ZERO candidate pairs (threshold=0 surfaces every candidate,
    making the fan-out directly observable)."""
    import pandas as pd

    rows = [(i, f"all rights reserved u{i} v{i} w{i} x{i}") for i in range(40)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    unguarded = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.0).count()
    assert unguarded == 40 * 39 // 2  # every pair, via the shared head shingle
    guarded = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.0, max_shingle_df=5)
    assert guarded.count() == 0
    # near-dup pairs still found through their rare shingles
    rows.append((100, "all rights reserved u1 v1 w1 x1 extra"))
    df2 = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = dedup.ngram_jaccard_pairs(
        df2, n=3, threshold=0.5, max_shingle_df=5
    ).collect()
    assert [(p["id_a"], p["id_b"]) for p in got] == [(1, 100)]


def test_quality_and_langid_and_fingerprint(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat with the hat"),
            (2, "der hund ist nicht mit der katze und"),
            (3, "zz qq ww"),
        ],
        "doc_id long, text string",
    )
    q = {r["doc_id"]: r for r in textstats.quality_metrics(df).collect()}
    assert q[1]["n_tokens"] == 9
    assert 0 < q[1]["distinct_ratio"] < 1
    langs = {r["doc_id"]: r["pred_lang"] for r in textstats.language_id(df).collect()}
    assert langs[1] == "en" and langs[2] == "de" and langs[3] == "und"
    fp = {r["doc_id"]: r["fp"] for r in textstats.fingerprint(df).collect()}
    df2 = spark.createDataFrame([(9, "mat the hat cat sat on the with the")], "doc_id long, text string")
    fp9 = textstats.fingerprint(df2).collect()[0]["fp"]
    assert fp[1] == fp9  # bag fingerprint is order-insensitive


def test_cosine_topk_matches_numpy(spark, emb):
    rows = emb.collect()
    q = np.array(rows[0]["embedding"], dtype=np.float64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    ids = np.array([r["vec_id"] for r in rows])
    order = np.lexsort((ids, -sims))
    want = [int(ids[i]) for i in order[:5]]
    got = [r["vec_id"] for r in similarity.cosine_topk(emb, q, k=5).collect()]
    assert got == want


def test_ann_lsh_recall_clustered(spark):
    """On clustered data (the regime ANN indexes exist for), multi-probe
    RP-LSH must recover most of the exact top-10."""
    rng = np.random.default_rng(3)
    dim, n_clusters, per = 32, 10, 60
    centers = rng.standard_normal((n_clusters, dim)) * 5
    vecs = np.concatenate(
        [centers[c] + rng.standard_normal((per, dim)) * 0.3 for c in range(n_clusters)]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<double>",
    )
    q = vecs[0]
    bucketed = similarity.rp_lsh_buckets(df, dim=dim, n_planes=8).cache()
    exact = [r["vec_id"] for r in similarity.cosine_topk(df, q, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in similarity.ann_topk_lsh(bucketed, q, dim=dim, k=10, n_planes=8, n_probes=6).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8
    assert approx[0] == exact[0] == 0


def test_ann_lsh_beats_random_scan(spark, emb):
    """On unclustered random embeddings recall is bounded by data having
    no neighbor structure — but LSH must still beat the scanned
    fraction by a wide margin."""
    rows = emb.collect()
    q = np.array(rows[0]["embedding"], dtype=np.float64)
    dim = len(q)
    n_planes, n_probes = 8, 6
    bucketed = similarity.rp_lsh_buckets(emb, dim=dim, n_planes=n_planes).cache()
    exact = [r["vec_id"] for r in similarity.cosine_topk(emb, q, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in similarity.ann_topk_lsh(
            bucketed, q, dim=dim, k=10, n_planes=n_planes, n_probes=n_probes
        ).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    scan_fraction = (n_probes + 1) / 2 ** n_planes
    assert recall >= min(0.2, 5 * scan_fraction)
    assert approx[0] == exact[0] == 0  # the query vector itself


def test_ivf_full_probe_equals_exact(spark, emb):
    # probing ALL cells must reduce IVF to exact brute force; probing 2
    # returns a correctly-ranked subset of candidates
    from pyspark.sql import functions as F

    cents = sorted(
        (int(r[0]), [float(x) for x in r["centroid"]])
        for r in similarity.centroids_by(emb, "label").collect()
    )
    q = emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]
    exact = [(r["vec_id"], round(r["sim"], 6)) for r in similarity.cosine_topk(emb, q, k=10).collect()]
    full = [
        (r["vec_id"], round(r["sim"], 6))
        for r in similarity.ivf_topk(emb, q, cents, n_probe=len(cents), k=10).collect()
    ]
    assert full == exact
    two = similarity.ivf_topk(emb, q, cents, n_probe=2, k=10).collect()
    assert len(two) == 10
    sims = [r["sim"] for r in two]
    assert sims == sorted(sims, reverse=True)
    assert set(r["vec_id"] for r in two) <= set(
        r["vec_id"] for r in similarity.ivf_topk(emb, q, cents, n_probe=len(cents), k=1_000_000).collect()
    )


def test_ivf_assign_matmul_matches_expressions(spark, emb):
    # the two physical assignment strategies (chained JVM expressions vs
    # one numpy matmul per Arrow batch) must produce identical cells
    cents = sorted(
        (int(r[0]), [float(x) for x in r["centroid"]])
        for r in similarity.centroids_by(emb, "label").collect()
    )
    by_expr = {
        r["vec_id"]: r["cell"]
        for r in similarity.ivf_assign(emb, cents, expr_max_cells=1000).collect()
    }
    by_matmul = {
        r["vec_id"]: r["cell"]
        for r in similarity.ivf_assign(emb, cents, expr_max_cells=0).collect()
    }
    assert by_expr == by_matmul
    # and the matmul path's plan is one Arrow stage, no Python row UDFs
    plan = similarity.ivf_assign(emb, cents, expr_max_cells=0)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_multimodal_plumbing(spark):
    data = [(i, "image", bytes([i]) * (10 + i), ("image/png", 4, 4, None)) for i in range(6)]
    df = spark.createDataFrame(data, multimodal.MEDIA_SCHEMA)
    meta = multimodal.binary_meta(df).collect()
    assert all(m["n_bytes"] == 10 + m["media_id"] for m in meta)

    # stub decode raises without an injected decoder
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        multimodal.extract_features(df).collect()

    # deterministic fake decoder exercises the real Arrow plumbing
    def fake_decoder(raw: bytes):
        return [float(raw[0])] * 8

    feats = multimodal.extract_features(df, decoder=fake_decoder).collect()
    assert len(feats) == 6
    for r in feats:
        assert r["feature"] == [float(r["media_id"])] * 8
        assert r["n_bytes"] == 10 + r["media_id"]

    vids = spark.createDataFrame(
        [(1, "video", b"\x00", ("video/mp4", None, None, 3500))], multimodal.MEDIA_SCHEMA
    )
    plan = multimodal.frame_sample_plan(vids, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in plan] == [0, 1000, 2000, 3000]
