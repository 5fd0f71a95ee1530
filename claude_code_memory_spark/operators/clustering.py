"""Deterministic k-means (Lloyd's algorithm) as pure DataFrame algebra,
plus the SemDeDup-style cell-blocked semantic dedup built on top of it.

Why a hand-rolled Lloyd instead of MLlib KMeans: the reference's corpus
curation (collection clustering in storage/qdrant.py and the category
scoring in chat/parser.py) needs *reproducible* cluster assignments —
the same input must cluster identically on any partitioning, or an
incremental re-index flaps its cells. MLlib's KMeans|| init is seeded
but its double accumulations are partition-order dependent; here every
reduction that feeds a comparison is made associative:

- init: centroids = the first ``k`` vectors by id (the deterministic
  bootstrap `ivf_seeded_build` also uses);
- assignment: argmin squared-L2 via the dot identity (three sequential
  dot products — the float evaluation order DuckDB's list_dot_product
  uses, so an oracle replays every tie-break);
- update: per-dimension means summed as DECIMAL(38,12) (associative —
  immune to partition order), divided in double, rounded to 6 dp.

Cost model at scale: each iteration is one NARROW argmin projection
(centroids collected driver-side — k rows — and inlined as literal
arrays, the same move MLlib makes between Lloyd iterations) + one
posexplode/groupBy whose key space is k x dim (tiny shuffle). ``iters``
is a constant; the big table is scanned ``iters + 1`` times and never
shuffled, joined, or fanned out by row. Cache the input before calling
when the scan is the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from claude_code_memory_spark.functions.vector import dot


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster_id",
    cvec_col: str = "__cvec",
) -> DataFrame:
    """Nearest-centroid assignment as a NARROW projection: the ``k``
    centroid rows are collected driver-side (the standard Lloyd-on-Spark
    move — MLlib does the same between iterations) and inlined as literal
    arrays, so the assignment is argmin over an in-row candidate list —
    no join, no window, no shuffle, no row fan-out.

    Arithmetic is unchanged from the join formulation so oracles replay
    it bit-for-bit: per candidate d2 = dot(v,v) - 2*dot(v,c) + dot(c,c)
    (the centroid self-dot is folded driver-side with the same sequential
    IEEE sum the in-plan fold performs), ties broken by lower cluster id
    via struct ordering under ``array_min``.
    """
    cents = sorted(
        ((int(r[cluster_col]), [float(x) for x in r[cvec_col]]) for r in centroids.collect()),
    )
    if not cents:
        raise ValueError("assign_clusters: empty centroid table")
    return _assign_from_cents(
        vectors, cents, vec_col=vec_col, cluster_col=cluster_col
    )


def _assign_from_cents(
    vectors: DataFrame,
    cents: list[tuple[int, list[float]]],
    *,
    vec_col: str = "embedding",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """`assign_clusters` over already-collected (cluster_id, vector)
    rows — the Lloyd loop collects centroids itself (one aggregate job
    per iteration) and feeds them here without a round-trip through a
    centroid DataFrame."""
    v = F.col(vec_col).cast("array<double>")
    dv = dot(v, v)

    def _self_dot(cv: list[float]) -> float:
        acc = 0.0  # mirrors the zip_with+aggregate fold: 0.0 + x0*x0 + ...
        for x in cv:
            acc = acc + x * x
        return acc

    # THREE array literals + one transform, NOT k x dim literal nodes:
    # the per-centroid F.lit construction made the expression tree (and
    # its Janino compile, and the py4j round-trips building it) linear
    # in k*dim — ~1 s of pure driver/compile overhead per assignment at
    # k=8, dim=64, and a broken plan outright at the k=N/256 SemDeDup
    # sizes a real corpus reaches. The arithmetic inside the lambda is
    # node-for-node the old expression (same zip_with+aggregate dot,
    # same d2 = dv - 2<v,c> + <c,c> order, same struct/array_min
    # tie-break), so every oracle replays unchanged.
    #
    # r12: the literals are built as ONE F.expr string each instead of
    # nested F.lit lists — PySpark's lit(list) recurses into per-element
    # lit() py4j calls (k*dim round-trips, measured 0.22 s per assignment
    # at k=8 dim=64, 3 assignments per Lloyd run), while the SQL string
    # parses JVM-side in ~2 ms to a bit-identical literal tree
    # (double_sql_literal round-trip verified incl. subnormals/-0.0).
    from claude_code_memory_spark.functions.vector import double_sql_literal as _dl

    import math as _math

    self_dots = [_self_dot(cv) for _, cv in cents]
    if all(
        _math.isfinite(x) for _, cv in cents for x in cv
    ) and all(_math.isfinite(s) for s in self_dots):
        cand_mat = F.expr(
            "array("
            + ",".join(
                "array(" + ",".join(_dl(x) for x in cv) + ")" for _, cv in cents
            )
            + ")"
        )
        cand_ids = F.expr("array(" + ",".join(str(cid) for cid, _ in cents) + ")")
        cand_self = F.expr("array(" + ",".join(_dl(s) for s in self_dots) + ")")
    else:  # non-finite values have no SQL literal form — per-element lits
        cand_mat = F.lit([cv for _, cv in cents])
        cand_ids = F.lit([cid for cid, _ in cents])
        cand_self = F.lit(self_dots)
    cand = F.transform(
        cand_mat,
        lambda c, i: F.struct(
            (
                F.col("__dv") - 2 * dot(v, c) + F.element_at(cand_self, i + 1)
            ).alias("d2"),
            F.element_at(cand_ids, i + 1).cast("int").alias("cid"),
        ),
    )
    return (
        vectors.withColumn("__dv", dv)
        .withColumn(cluster_col, F.array_min(cand)["cid"])
        .drop("__dv")
    )


def _update_centroids(
    assigned: DataFrame,
    *,
    vec_col: str = "embedding",
    cluster_col: str = "cluster_id",
    cvec_col: str = "__cvec",
) -> DataFrame:
    """Per-cluster mean vector, hash-deterministically: per-dimension sums
    as DECIMAL(38,12) (associative under any partitioning), mean in
    double, rounded to 6 dp. Empty clusters simply vanish (standard
    Lloyd) — the oracle replays that too."""
    exploded = assigned.select(
        cluster_col,
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("__pos", "__val"),
    )
    means = exploded.groupBy(cluster_col, "__pos").agg(
        F.round(
            F.sum(F.col("__val").cast("decimal(38,12)")).cast("double") / F.count("*"), 6
        ).alias("__m")
    )
    return means.groupBy(cluster_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__pos", "__m"))), lambda s: s["__m"]
        ).alias(cvec_col)
    )


def kmeans_lloyd(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster_id",
) -> tuple[DataFrame, DataFrame]:
    """Seeded Lloyd k-means: ``iters`` rounds of assign + decimal-mean
    update, starting from centroids = the first ``k`` vectors by id.

    Returns ``(assigned, centroids)``: the input with ``cluster_col``
    (assignment against the final centroids) and the centroid table
    ``(cluster_col, __cvec ARRAY<DOUBLE>)``. Every arithmetic step is
    replayable in DuckDB — see the module docstring. Reference parity:
    deterministic collection partitioning for incremental re-index
    (storage/qdrant.py collection management; indexer.py:1544-1718 state
    determinism rationale)."""
    # r12 iteration restructure (guide §2.4/§7.3): each Lloyd round used
    # to materialize a centroid DataFrame — posexplode → groupBy(cluster,
    # pos) → groupBy(cluster) collect_list → persist → collect inside the
    # next assignment — paying an extra shuffle stage and an extra AQE
    # job per iteration just to assemble k tiny arrays that were about to
    # be collected anyway. The loop now collects the per-(cluster, pos)
    # decimal means directly (ONE aggregate job per iteration) and
    # assembles the vectors driver-side; the assembly order (sort by pos)
    # is exactly what array_sort(collect_list(struct(pos, m))) produced,
    # and every mean value is the same decimal-sum expression, so the
    # whole chain replays bit-identically in the oracles.
    seed_rows = (
        vectors.filter(F.col(id_col) < k)
        .select(
            F.col(id_col).cast("int").alias(cluster_col),
            F.col(vec_col).cast("array<double>").alias("__cvec"),
        )
        .collect()
    )
    # seeding uses ids 0..k-1 — a non-dense / non-zero-based id space
    # (e.g. hashed point ids) would yield zero centroids and a silently
    # empty assignment; fail loudly instead.
    if not seed_rows:
        raise ValueError(
            f"kmeans_lloyd seeding found no rows with {id_col} < {k}; "
            "ids must be dense from 0 (re-key hashed ids first)"
        )
    cents = sorted(
        (int(r[cluster_col]), [float(x) for x in r["__cvec"]]) for r in seed_rows
    )

    def _mean_rows(assigned: DataFrame) -> list[tuple[int, list[float]]]:
        means = assigned.select(
            cluster_col,
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("__pos", "__val"),
        ).groupBy(cluster_col, "__pos").agg(
            F.round(
                F.sum(F.col("__val").cast("decimal(38,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("__m")
        )
        by_c: dict[int, list] = {}
        for r in means.collect():
            by_c.setdefault(int(r[cluster_col]), []).append((r["__pos"], r["__m"]))
        return sorted(
            (cid, [m for _, m in sorted(pm)]) for cid, pm in by_c.items()
        )

    for _ in range(iters):
        assigned = _assign_from_cents(
            vectors, cents, vec_col=vec_col, cluster_col=cluster_col
        )
        cents = _mean_rows(assigned)  # empty clusters vanish (standard Lloyd)
    final = _assign_from_cents(
        vectors, cents, vec_col=vec_col, cluster_col=cluster_col
    )
    # the returned centroid table is rebuilt from the driver-side rows
    # (a local relation — no lineage replay for consumers that join it)
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    cent_df = vectors.sparkSession.createDataFrame(
        cents,
        StructType(
            [
                StructField(cluster_col, IntegerType(), False),
                StructField("__cvec", ArrayType(DoubleType()), False),
            ]
        ),
    )
    return final, cent_df


def kmeans_lloyd_grouped(
    vectors: DataFrame,
    k: int = 16,
    iters: int = 2,
    *,
    group_cols: tuple[str, ...] = ("sub_idx",),
    id_col: str = "vec_id",
    vec_col: str = "sv",
    cluster_col: str = "cluster_id",
) -> tuple[DataFrame, DataFrame]:
    """Independent seeded Lloyd k-means per group, in ONE plan.

    Same determinism contract as `kmeans_lloyd` (decimal means,
    dot-identity argmin, rounded centroids), but every group trains its
    own codebook concurrently: init = the first ``k`` rows by id within
    each group (per-group window, partitioned — never a global sort),
    assignment joins centroids on the group key (broadcast — k rows per
    group), updates aggregate by (group, cluster, dim). This is how PQ
    trains m subspace codebooks in one pass instead of m sequential
    jobs; any per-tenant / per-shard clustering fits the same shape.

    Returns (assigned, centroids) where both carry ``group_cols``."""
    g = list(group_cols)
    if not g:
        raise ValueError("use kmeans_lloyd for the ungrouped case")
    w0 = Window.partitionBy(*g).orderBy(id_col)
    cent = (
        vectors.withColumn("__rk", F.row_number().over(w0))
        .filter(F.col("__rk") <= k)
        .select(
            *g,
            (F.col("__rk") - 1).cast("int").alias(cluster_col),
            F.col(vec_col).cast("array<double>").alias("__cvec"),
        )
    )

    def assign(cent_df: DataFrame) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        c = F.col("__cvec")
        d2 = dot(v, v) - 2 * dot(v, c) + dot(c, c)
        w = Window.partitionBy(*g, id_col).orderBy("__d2", cluster_col)
        return (
            vectors.join(F.broadcast(cent_df), g)
            .withColumn("__d2", d2)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__d2", "__rn", "__cvec")
        )

    def update(assigned: DataFrame) -> DataFrame:
        exploded = assigned.select(
            *g,
            cluster_col,
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("__pos", "__val"),
        )
        means = exploded.groupBy(*g, cluster_col, "__pos").agg(
            F.round(
                F.sum(F.col("__val").cast("decimal(38,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("__m")
        )
        return means.groupBy(*g, cluster_col).agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__m"))),
                lambda s: s["__m"],
            ).alias("__cvec")
        )

    # r12 iteration restructure (same move as kmeans_lloyd, guide
    # §2.4/§7.3): the lazy 2-iteration chain serialized ~12 AQE stages —
    # per-iteration broadcast builds over unmaterialized aggregate
    # lineage, plus a k-way fan-out join + row_number window per
    # assignment. The loop now collects the per-(group, cluster, pos)
    # decimal means each round (m x k x dim scalars — PQ: 8 x 16 x 8)
    # and assigns from per-group literal centroid arrays via the same
    # argmin expression family as assign_clusters: d2 is the identical
    # (dot(v,v) - 2*dot(v,c)) + <c,c> tree over the identical rounded
    # values (<c,c> pre-folded driver-side in exactly the aggregate's
    # 0.0 + x*x + ... order), and the (d2, cluster_id) array_min
    # tie-break equals the old row_number-over-orderBy selection, so the
    # whole chain replays bit-identically (the trained-PQ oracles pin
    # it). The literal path is gated: pathological group counts (this is
    # also the per-tenant trainer) or non-finite values keep the
    # broadcast-join form above.
    seed_rows = cent.collect()
    literal_ok = bool(seed_rows) and len(seed_rows) * len(
        seed_rows[0]["__cvec"]
    ) <= 100_000
    if literal_ok:
        import math as _math

        literal_ok = all(
            _math.isfinite(x) for r in seed_rows for x in r["__cvec"]
        ) and all(
            isinstance(r[c], int)
            or (isinstance(r[c], str) and r[c].isalnum())
            for r in seed_rows
            for c in g
        )
    if not literal_ok:
        for _ in range(iters):
            cent = update(assign(cent)).persist()  # m x k rows
        return assign(cent), cent

    def _group_key(row) -> tuple:
        return tuple(row[c] for c in g)

    def _to_cents(rows) -> dict[tuple, list[tuple[int, list[float]]]]:
        by_g: dict[tuple, list] = {}
        for r in rows:
            by_g.setdefault(_group_key(r), []).append(
                (int(r[cluster_col]), [float(x) for x in r["__cvec"]])
            )
        return {gk: sorted(cv) for gk, cv in by_g.items()}

    def _self_dot(cv: list[float]) -> float:
        acc = 0.0  # mirrors the zip_with+aggregate fold: 0.0 + x0*x0 + ...
        for x in cv:
            acc = acc + x * x
        return acc

    from claude_code_memory_spark.functions.vector import double_sql_literal as _dl

    def _case_expr(cents: dict, of) -> Column:
        """CASE over the group key selecting a per-group literal array."""
        parts = []
        for gk, cv in cents.items():
            cond = " AND ".join(
                f"{c} = {v!r}" if isinstance(v, str) else f"{c} = {v}"
                for c, v in zip(g, gk)
            )
            parts.append(f"WHEN {cond} THEN {of(cv)}")
        return F.expr("CASE " + " ".join(parts) + " END")

    def assign_lit(cents: dict) -> DataFrame:
        cand_mat = _case_expr(
            cents,
            lambda cv: "array("
            + ",".join(
                "array(" + ",".join(_dl(x) for x in vec) + ")" for _, vec in cv
            )
            + ")",
        )
        cand_ids = _case_expr(
            cents, lambda cv: "array(" + ",".join(str(cid) for cid, _ in cv) + ")"
        )
        cand_self = _case_expr(
            cents,
            lambda cv: "array(" + ",".join(_dl(_self_dot(vec)) for _, vec in cv) + ")",
        )
        v = F.col(vec_col).cast("array<double>")
        dvv = dot(v, v)
        cand = F.transform(
            F.lit(cand_mat),
            lambda c, i: F.struct(
                (dvv - 2 * dot(v, c) + F.element_at(F.lit(cand_self), i + 1)).alias(
                    "d2"
                ),
                F.element_at(F.lit(cand_ids), i + 1).alias("cid"),
            ),
        )
        best = F.array_min(cand)
        out_cols = [
            *g,
            *[c for c in vectors.columns if c not in g],
        ]
        return vectors.withColumn(cluster_col, best["cid"]).select(
            *out_cols, cluster_col
        )

    def _mean_rows(assigned: DataFrame):
        return update(assigned).collect()

    cents = _to_cents(seed_rows)
    for _ in range(iters):
        cents = _to_cents(_mean_rows(assign_lit(cents)))
    final = assign_lit(cents)
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    g_fields = [vectors.schema[c] for c in g]
    cent_rows = [
        (*gk, cid, vec) for gk, cv in sorted(cents.items()) for cid, vec in cv
    ]
    cent_df = vectors.sparkSession.createDataFrame(
        cent_rows,
        StructType(
            [
                *[StructField(f.name, f.dataType, f.nullable) for f in g_fields],
                StructField(cluster_col, IntegerType(), False),
                StructField("__cvec", ArrayType(DoubleType()), False),
            ]
        ),
    )
    return final, cent_df


def semantic_dedup(
    assigned: DataFrame,
    threshold: float = 0.4,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster_id",
    n_salt: int = 1,
) -> DataFrame:
    """SemDeDup-style semantic dedup verdict: within each k-means cell,
    mark every vector that has a lower-id cell-mate with cosine >=
    ``threshold`` as removed (min-id survivor wins).

    The pairwise scan is blocked by the cluster equi-join — never N x N;
    per-cell cost is (n/k)^2, the SemDeDup trade (Abbas et al. 2023,
    arXiv:2303.09540): recall is bounded by cell purity, cost by cell
    size.

    Two mutually exclusive layout strategies, chosen by ``n_salt``:

    - ``n_salt=1`` (default): join keys on the bare cell id — store
      ``assigned`` bucketed by ``cluster_col`` and the self-join is
      co-located and shuffle-free (tests/test_bucketed.py proves the
      exchanges vanish). The right regime when cells outnumber cores.
    - ``n_salt>1``: bucket the probe side by id and replicate the build
      side across buckets, raising the join key space to k x n_salt with
      an IDENTICAL pair set. The right regime when k is SMALLER than the
      cluster's parallelism (k=8 cells would otherwise busy 8 cores and
      idle the rest through the dominant stage); replication adds n_salt
      copies of the build rows — negligible next to the (n/k)^2 fan-out.

    Returns one row per input vector: (id, cluster, removed boolean).
    """
    # Precompute each row's L2 norm BEFORE the self-join: the pairwise
    # filter then evaluates ONE dot product per pair instead of three —
    # at (n/k)^2 pairs per cell that is the dominant cost. sqrt(dot(v,v))
    # per row is bit-identical to computing it per pair, so the oracle's
    # cos expression still replays exactly.
    norm = F.sqrt(dot(F.col(vec_col), F.col(vec_col)))
    salted = n_salt > 1
    a = assigned.select(
        F.col(id_col).alias("__id_a"),
        F.col(vec_col).alias("__va"),
        norm.alias("__na"),
        F.col(cluster_col),
        *(
            [F.pmod(F.col(id_col).cast("long"), F.lit(n_salt)).alias("__salt")]
            if salted
            else []
        ),
    )
    b = assigned.select(
        F.col(id_col).alias("__id_b"),
        F.col(vec_col).alias("__vb"),
        norm.alias("__nb"),
        F.col(cluster_col),
        *(
            [
                F.explode(
                    F.sequence(F.lit(0).cast("long"), F.lit(n_salt - 1).cast("long"))
                ).alias("__salt")
            ]
            if salted
            else []
        ),
    )
    dup_pairs = (
        a.join(b, [cluster_col, "__salt"] if salted else [cluster_col])
        .filter(F.col("__id_a") < F.col("__id_b"))
        .filter(
            F.round(
                dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6
            )
            >= threshold
        )
    )
    removed = dup_pairs.select(F.col("__id_b").alias(id_col)).distinct()
    return assigned.join(
        removed.withColumn("__removed", F.lit(True)), id_col, "left"
    ).select(
        id_col,
        cluster_col,
        F.coalesce(F.col("__removed"), F.lit(False)).alias("removed"),
    )
