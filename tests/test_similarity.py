"""ANN path tests: brute-force agreement between SQL and numpy k-NN joins,
IVF recall, LSH bucket behavior — on the real embeddings table."""

import pytest
from pyspark.sql import functions as F

from claude_code_memory_spark.operators.similarity import (
    brute_force_topk,
    ivf_build,
    ivf_topk,
    knn_join_numpy,
    knn_join_sql,
    lsh_bucket_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _qvec(emb, vec_id=0):
    return emb.filter(F.col("vec_id") == vec_id).collect()[0]["embedding"]


def test_knn_sql_vs_numpy_identical(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    a = {
        (r["q_id"], r["rnk"]): r["vec_id"]
        for r in knn_join_sql(queries, emb, k=5).collect()
    }
    b = {
        (r["q_id"], r["rnk"]): r["vec_id"]
        for r in knn_join_numpy(queries, emb, k=5).collect()
    }
    assert a == b  # Arrow/numpy fast path must be bit-compatible


def test_ivf_recall(spark, emb):
    q = _qvec(emb)
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, 10, exclude_id=0).collect()]
    indexed, centers = ivf_build(emb, n_centroids=8)
    indexed = indexed.cache()
    # full probe = exact
    full = [
        r["vec_id"]
        for r in ivf_topk(indexed.filter(F.col("vec_id") != 0), centers, q, 10, nprobe=8).collect()
    ]
    assert full == exact
    # partial probe: meaningful recall at 1/2 the clusters
    half = [
        r["vec_id"]
        for r in ivf_topk(indexed.filter(F.col("vec_id") != 0), centers, q, 10, nprobe=4).collect()
    ]
    assert len(set(half) & set(exact)) >= 5


def test_lsh_bucket_subset_of_corpus(spark, emb):
    q = _qvec(emb)
    res = lsh_bucket_topk(emb, q, k=10, n_planes=6)
    rows = res.collect()
    assert 0 < len(rows) <= 10
    # the query's own vector lands in its own bucket with score 1.0
    assert rows[0]["vec_id"] == 0 and abs(rows[0]["score"] - 1.0) < 1e-5


def test_quantized_topk_recall_and_error_bound(spark, sf_dir):
    """Quantized search must rank nearly identically to exact float search
    (the codes carry ~8 significant bits/dim) and reconstruction error must
    respect the step/2 bound everywhere."""
    from pyspark.sql import functions as F

    from claude_code_memory_spark.operators.quantize import (
        dequantize_vector,
        quantize_table,
        quantize_vector,
        quantized_topk,
    )
    from claude_code_memory_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]

    exact = {r["vec_id"] for r in brute_force_topk(emb, qvec, 10).collect()}
    qt = quantize_table(emb, vec_col="embedding")
    approx = {r["vec_id"] for r in quantized_topk(qt, qvec, 10).collect()}
    assert len(exact & approx) >= 8  # >= 80% recall@10 on 8-bit codes

    # error bound: |x - x̂| <= qstep / 2 for every element of every vector
    e2 = emb.select("embedding", quantize_vector("embedding").alias("q"))
    violations = (
        e2.select(
            F.array_max(
                F.zip_with(
                    F.col("embedding"),
                    dequantize_vector("q"),
                    lambda a, b: F.abs(a.cast("double") - b),
                )
            ).alias("max_err"),
            (F.col("q.qstep") / 2 + 1e-12).alias("bound"),
        )
        .filter(F.col("max_err") > F.col("bound"))
        .count()
    )
    assert violations == 0


def test_ivf_seeded_matches_brute_force_when_exact(spark, emb):
    """ivf_seeded_topk with nprobe == n_centroids scans everything →
    must equal brute force; partial probe returns a subset with
    meaningful recall (the oracle-checked deterministic IVF twin)."""
    from claude_code_memory_spark.operators.similarity import ivf_seeded_topk

    q_df = emb.filter(F.col("vec_id") == 0)
    q = _qvec(emb)
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, 10, exclude_id=0).collect()]
    full = [
        r["vec_id"]
        for r in ivf_seeded_topk(emb, q_df, 10, n_centroids=8, nprobe=8).collect()
    ]
    assert full == exact
    part = [
        r["vec_id"]
        for r in ivf_seeded_topk(emb, q_df, 10, n_centroids=8, nprobe=2).collect()
    ]
    assert len(part) == 10 and len(set(part) & set(exact)) >= 3


def test_ivf_quantized_topk_recall(spark, sf_dir):
    """IVF,SQ8 + refine composite: high recall at partial probe, exact
    equality to brute force at full probe."""
    from claude_code_memory_spark.operators.similarity import (
        brute_force_topk,
        ivf_build,
        ivf_quantized_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    corpus = emb.filter(F.col("vec_id") != 0)
    indexed, centers = ivf_build(corpus, n_centroids=8)
    indexed = indexed.cache()

    exact = [r["vec_id"] for r in brute_force_topk(corpus, qvec, 10).collect()]

    # partial probe: prune to half the clusters, expect most of the true top-k
    approx = [
        r["vec_id"]
        for r in ivf_quantized_topk(indexed, centers, qvec, 10, nprobe=4).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"recall {recall} too low for nprobe=4"

    # full probe + generous refine: quantization error must wash out
    full = [
        r["vec_id"]
        for r in ivf_quantized_topk(
            indexed, centers, qvec, 10, nprobe=8, refine=8
        ).collect()
    ]
    assert full == exact
    indexed.unpersist()


def test_ivf_knn_join_recall_vs_exact(spark, sf_dir):
    """Batch ANN join: same-cell pairs only; recall vs the exact join rises
    with nprobe and hits 1.0 at full probe."""
    from claude_code_memory_spark.operators.similarity import (
        ivf_build,
        ivf_knn_join,
        knn_join_sql,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    indexed, centers = ivf_build(emb, n_centroids=8)
    indexed = indexed.cache()

    exact = {
        (r["q_id"], r["vec_id"])
        for r in knn_join_sql(queries, emb, 5).collect()
    }
    # full probe = every cell scanned = exact result
    full = {
        (r["q_id"], r["vec_id"])
        for r in ivf_knn_join(indexed, centers, queries, 5, nprobe=8).collect()
    }
    assert full == exact

    partial = {
        (r["q_id"], r["vec_id"])
        for r in ivf_knn_join(indexed, centers, queries, 5, nprobe=4).collect()
    }
    recall = len(partial & exact) / len(exact)
    assert recall >= 0.5, f"recall {recall} too low at nprobe=4"
    indexed.unpersist()


class TestMMR:
    """MMR diversity rerank (operators/topk.py::mmr_rerank)."""

    def _cands(self, spark):
        # doc 1 and 2 are near-identical top hits; doc 3 is orthogonal
        # with slightly lower relevance
        rows = [
            (1, 0.99, [1.0, 0.0, 0.0]),
            (2, 0.98, [0.999, 0.01, 0.0]),
            (3, 0.90, [0.0, 1.0, 0.0]),
            (4, 0.10, [0.0, 0.0, 1.0]),
        ]
        return spark.createDataFrame(
            rows, "point_id long, score double, vector array<double>"
        )

    def test_lambda_one_is_pure_relevance(self, spark):
        from claude_code_memory_spark.operators.topk import mmr_rerank

        got = mmr_rerank(self._cands(spark), k=3, lam=1.0).collect()
        assert [r["point_id"] for r in got] == [1, 2, 3]
        assert [r["mmr_rank"] for r in got] == [1, 2, 3]

    def test_diversity_demotes_near_duplicate(self, spark):
        from claude_code_memory_spark.operators.topk import mmr_rerank

        # lam=0.5: after picking doc 1, doc 2's penalty (~cos 1.0) drops
        # its marginal score below orthogonal doc 3
        got = mmr_rerank(self._cands(spark), k=3, lam=0.5).collect()
        assert [r["point_id"] for r in got] == [1, 3, 4]

    def test_empty_and_k_truncation(self, spark):
        from claude_code_memory_spark.operators.topk import mmr_rerank

        empty = self._cands(spark).filter("point_id > 99")
        assert mmr_rerank(empty, k=3).count() == 0
        assert mmr_rerank(self._cands(spark), k=2, lam=1.0).count() == 2

    @pytest.mark.slow
    def test_engine_mmr_search_surface(self, spark, tmp_path):
        from claude_code_memory_spark.api import CodeMemoryEngine

        eng = CodeMemoryEngine(spark, str(tmp_path / "mmrstore"))
        proj = tmp_path / "proj"
        proj.mkdir()
        (proj / "a.py").write_text(
            "def alpha_fn():\n    return 1\n\n\ndef alpha_fn_copy():\n    return 1\n\n\ndef omega():\n    return 2\n"
        )
        eng.index(str(proj))
        plain = eng.search("alpha", mode="semantic", k=3)
        diverse = eng.search("alpha", mode="semantic", k=3, mmr=True, mmr_lambda=0.7)
        assert "mmr_rank" in diverse.columns
        rows = diverse.collect()
        assert 0 < len(rows) <= 3
        assert [r["mmr_rank"] for r in rows] == list(range(1, len(rows) + 1))
        # lam=1 must reproduce the plain semantic ranking exactly
        same = eng.search("alpha", mode="semantic", k=3, mmr=True, mmr_lambda=1.0)
        assert [r["point_id"] for r in same.collect()] == [
            r["point_id"] for r in plain.collect()
        ]


class TestIVFPQ:
    def test_ivfpq_recall_and_monotonicity(self, spark, sf_dir):
        """The composed IVF,PQ index: refined full-probe recall beats the
        unrefined single-cell probe, and the refined operating point
        recovers a usable fraction of the exact top-10."""
        from claude_code_memory_spark.operators.similarity import (
            brute_force_topk,
            ivfpq_build,
            ivfpq_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
        dim = len(emb.first()["embedding"])
        codes, cb, centers = ivfpq_build(emb, dim=dim, n_centroids=8, m=8)
        codes = codes.cache()
        codes.count()

        def recall(nprobe, refine):
            hits = 0
            for r in emb.filter(F.col("vec_id") < 3).collect():
                qv = [float(x) for x in r["embedding"]]
                exact = {
                    x["vec_id"]
                    for x in brute_force_topk(
                        emb, qv, 10, exclude_id=r["vec_id"]
                    ).collect()
                }
                got = ivfpq_topk(
                    codes, cb, centers, qv, k=11, nprobe=nprobe,
                    refine=refine, embeddings=emb if refine else None,
                )
                ids = [x["vec_id"] for x in got.collect() if x["vec_id"] != r["vec_id"]][:10]
                hits += len(exact & set(ids))
            return hits / 30.0

        r_full_refined = recall(nprobe=8, refine=4)
        r_one_raw = recall(nprobe=1, refine=0)
        assert r_full_refined >= r_one_raw
        assert r_full_refined >= 0.4, r_full_refined
        codes.unpersist()
        emb.unpersist()

    def test_residual_encoding_beats_raw_at_same_budget(self, spark, sf_dir):
        """FAISS-faithful residual IVF,PQ: encoding (vec - Lloyd
        centroid) spends the same 16-code budget on a tighter
        distribution, so total quantization error drops vs raw-vector
        codes — and the residual query path still retrieves."""
        from claude_code_memory_spark.operators.similarity import (
            ivfpq_build,
            ivfpq_build_residual,
            ivfpq_topk_residual,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
        dim = len(emb.first()["embedding"])
        raw_codes, _cb, _c = ivfpq_build(emb, dim=dim, n_centroids=8, m=8)
        res_codes, cb, centers = ivfpq_build_residual(
            emb, dim=dim, n_centroids=8, m=8
        )
        e_raw = raw_codes.agg(F.sum("sub_err")).first()[0]
        e_res = res_codes.agg(F.sum("sub_err")).first()[0]
        assert e_res < e_raw, (e_res, e_raw)
        qv = [float(x) for x in emb.first()["embedding"]]
        got = ivfpq_topk_residual(
            res_codes, cb, centers, qv, k=5, nprobe=8, refine=3, embeddings=emb
        ).collect()
        assert len(got) == 5 and got[0]["score"] >= got[-1]["score"]
        emb.unpersist()

    def test_ivfpq_knn_join_recall_and_monotonicity(self, spark, sf_dir):
        """The code-shuffling batch join: recall vs the exact join rises
        with nprobe, and full-probe recall matches what PQ quantization
        allows."""
        from claude_code_memory_spark.operators.similarity import (
            ivfpq_build,
            ivfpq_knn_join,
            knn_join_sql,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
        dim = len(emb.first()["embedding"])
        codes, cb, centers = ivfpq_build(emb, dim=dim, n_centroids=8, m=8)
        codes = codes.cache()
        codes.count()
        queries = (
            emb.filter(F.col("vec_id") < 5)
            .select(
                F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
            )
            .cache()
        )
        exact = {
            (r["q_id"], r["vec_id"])
            for r in knn_join_sql(queries, emb, k=5).collect()
        }

        def recall(nprobe):
            # the refine operating point: exact top-5 recovered within the
            # join's top-15 (a full-precision re-rank of 3k rows per query
            # then yields them — hash embeddings are near-uniform, the
            # adversarial case for PQ, so strict @5 recall is low for ANY
            # 8-byte code; the over-fetch window is the documented contract)
            got = {
                (r["q_id"], r["vec_id"])
                for r in ivfpq_knn_join(
                    queries, codes, cb, centers, k=15, nprobe=nprobe
                ).collect()
            }
            return len(exact & got) / len(exact)

        r1, r8 = recall(1), recall(8)
        assert r8 >= r1
        assert r8 >= 0.4, (r1, r8)
        codes.unpersist()
        emb.unpersist()


class TestBlockedCosinePairs:
    def test_matches_expression_self_join(self, spark, emb):
        """The BLAS verifier must produce the exact pair set and 6-dp
        scores of the expression-path self-join it replaced
        (queries/dedupq.py::dedup_embedding_neardup, round-9 sf1 fix)."""
        from claude_code_memory_spark.functions.vector import cosine_similarity
        from claude_code_memory_spark.operators.similarity import (
            blocked_cosine_pairs,
        )

        sub = emb.limit(400).cache()
        a = sub.select(
            F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"), "label"
        )
        b = sub.select(
            F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"), "label"
        )
        expr = (
            a.join(b, "label")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cos", F.round(cosine_similarity(F.col("ea"), F.col("eb")), 6))
            .filter(F.col("cos") >= 0.3)
            .select("id_a", "id_b", "cos")
        )
        want = {(r["id_a"], r["id_b"]) for r in expr.collect()}
        got_rows = blocked_cosine_pairs(sub, 0.3).collect()
        got = {(r["id_a"], r["id_b"]) for r in got_rows}
        assert got == want
        # scores agree to 6 dp despite BLAS vs left-fold summation order
        want_scores = {(r["id_a"], r["id_b"]): r["cos"] for r in expr.collect()}
        for r in got_rows:
            assert abs(r["cos"] - want_scores[(r["id_a"], r["id_b"])]) <= 1e-6
        sub.unpersist()

    def test_null_blocks_and_zero_vectors_drop(self, spark):
        """NULL block keys never pair (matching equi-join null semantics)
        and zero-norm vectors produce no nan pairs; a 1-row block emits
        nothing."""
        from claude_code_memory_spark.operators.similarity import (
            blocked_cosine_pairs,
        )

        rows = [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 0),
            (3, [0.0, 0.0], 0),   # zero vector: nan cos, never emitted
            (4, [1.0, 1.0], None),  # NULL block: dropped
            (5, [1.0, 1.0], None),
            (6, [1.0, 0.0], 7),   # singleton block
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        got = {(r["id_a"], r["id_b"]) for r in blocked_cosine_pairs(df, 0.5).collect()}
        assert got == {(1, 2)}

    def test_null_and_ragged_vectors_drop(self, spark):
        """NULL embeddings and mismatched-dim rows must not crash the
        task (ADVICE r9: np.stack over None/ragged raised): the join form
        this replaces yields NULL cosine for both, so a NULL vector
        never pairs and cross-length rows never pair — but two rows of
        the SAME unusual length still score against each other."""
        from claude_code_memory_spark.operators.similarity import (
            blocked_cosine_pairs,
        )

        rows = [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.1], 0),
            (3, None, 0),                # NULL vector: dropped, no crash
            (4, [1.0, 0.0, 0.0], 0),     # ragged: pairs only with same-dim
            (5, [1.0, 0.0, 0.1], 0),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        got = {(r["id_a"], r["id_b"]) for r in blocked_cosine_pairs(df, 0.5).collect()}
        assert got == {(1, 2), (4, 5)}

    def test_duplicate_ids_never_self_pair(self, spark):
        """The join's id_a < id_b predicate is on VALUES: two rows
        sharing a vec_id must not emit an id_a == id_b pair (ADVICE r9:
        the positional upper-triangle mask did)."""
        from claude_code_memory_spark.operators.similarity import (
            blocked_cosine_pairs,
        )

        rows = [
            (7, [1.0, 0.0], 0),
            (7, [1.0, 0.01], 0),  # duplicate id, near-identical vector
            (9, [1.0, 0.02], 0),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        pairs = [(r["id_a"], r["id_b"]) for r in blocked_cosine_pairs(df, 0.5).collect()]
        assert all(a < b for a, b in pairs)
        # both id-7 rows still pair with 9, as the join would emit
        assert sorted(pairs) == [(7, 9), (7, 9)]
