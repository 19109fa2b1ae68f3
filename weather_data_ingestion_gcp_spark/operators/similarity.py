"""Similarity search over embedding columns (array<float>).

Two paths:

- **brute-force cosine top-k** — the exactness baseline. Queries broadcast
  (they're small by construction); the corpus never shuffles; per-partition
  top-k via window row_number. All arithmetic stays JVM-side with
  higher-order array functions (zip_with + aggregate), in double precision.
- **IVF (inverted-file) top-k** — the scale path: corpus pre-clustered
  (here: the dataset's own label column, or any k-means assignment), query
  probes only the `nprobe` nearest centroids, searching ~nprobe/k of the
  corpus. At 100 TB the corpus is bucketed/partitioned by cluster id so a
  probe reads only matching partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold in double precision — deterministic accumulation
    order (matches the DuckDB oracle's list_dot_product element order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _norm(v: Column) -> Column:
    return F.sqrt(_dot(v, v))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    Broadcast the query side: the corpus-side scan stays shuffle-free and
    the only exchange is the final per-query top-k. Norms are computed ONCE
    per vector before the pair blowup, so each of the |Q|x|C| pairs costs
    one array fold (the dot product), not three. `dot/(norm_a*norm_b)` is
    the same floating-point expression tree as inline cosine — results are
    bitwise identical (and stay bitwise-comparable to the DuckDB oracle).
    """
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_nrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        _norm(F.col(vec_col)).alias("n_nrm"),
    )
    scored = c.join(F.broadcast(q), F.col("q_id") != F.col("n_id")).select(
        "q_id",
        "n_id",
        (_dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_nrm") * F.col("n_nrm"))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.col("n_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cos_sim", "rk")
    )


def kmeans_assign(
    corpus: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd's k-means over the embedding column, pure
    DataFrame ops — produces the cluster assignment IVF needs when no
    pre-clustering exists.

    Per iteration: one broadcast of k centroids to score assignments (no
    corpus shuffle) + one aggregation for the new centroids (posexplode ->
    (cluster, pos) partial means). Iterations are a driver-side loop over
    small centroid tables — the corpus-side work is Catalyst-planned each
    round. Seeds: the k lowest-id vectors (deterministic, no RNG).
    """
    # Lazy localCheckpoint: materialized once on the first action, reused by
    # every iteration's assignment pass (ids + casts + norms are computed a
    # single time); blocks are reclaimed by the ContextCleaner when the
    # returned DataFrame is dropped. An explicit unpersist here would fire
    # before the caller ever runs an action (everything below is lazy).
    vecs = (
        corpus.select(
            F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
        )
        .withColumn("_nrm", _norm(F.col("_v")))
        .localCheckpoint(eager=False)
    )

    def _assign(cent_row: DataFrame) -> DataFrame:
        """Nearest centroid per vector with NO shuffle and NO xk row blowup:
        the k centroids collapse to a single broadcast row holding an array
        of (cluster, centroid, norm) structs; each vector picks argmax-sim
        in-row via transform + array_max on (sim, -cluster) — struct
        ordering gives highest sim, ties to the LOWEST cluster id (matching
        the previous window orderBy(desc sim, cluster) semantics)."""
        return vecs.crossJoin(F.broadcast(cent_row)).select(
            "_id",
            "_v",
            "_nrm",
            (
                -F.array_max(
                    F.transform(
                        "cents",
                        lambda c: F.struct(
                            (
                                _dot(F.col("_v"), c.getField("centroid"))
                                / (F.col("_nrm") * c.getField("cnrm"))
                            ).alias("sim"),
                            (-c.getField("cluster")).alias("neg_cluster"),
                        ),
                    )
                ).getField("neg_cluster")
            ).alias("cluster"),
        )

    def _to_row(centroids: DataFrame) -> DataFrame:
        return centroids.agg(
            F.array_sort(
                F.collect_list(
                    F.struct("cluster", "centroid", _norm(F.col("centroid")).alias("cnrm"))
                )
            ).alias("cents")
        )

    from pyspark.sql.window import Window

    centroids = (
        vecs.orderBy("_id").limit(k)
        .select(F.col("_v").alias("centroid"))
        .withColumn("cluster", F.row_number().over(Window.orderBy(F.col("centroid")[0])) - 1)
    )
    for _ in range(max_iter):
        assigned = _assign(_to_row(centroids))
        # New centroids: element-wise mean via posexplode partial agg —
        # scale-safe (never collects a cluster's vectors into one list).
        centroids = (
            assigned.select("cluster", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cluster", F.transform("pm", lambda s: s.getField("m")).alias("centroid"))
            .localCheckpoint(eager=False)  # truncate per-iteration lineage
        )
    return _assign(_to_row(centroids)).select(
        F.col("_id").alias(id_col), F.col("cluster").alias("kmeans_cluster")
    )


def hyperplanes(n_bits: int = 16, dim: int = 64, seed: str = "hp") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH: component
    (j, d) = md5("seed|j|d") first 12 hex nibbles, normalized to (-1, 1).

    Derived driver-side with hashlib so the SAME float literals can be
    embedded in both the Spark plan and a SQL oracle — cross-engine
    bitwise-identical bucketing without sharing any RNG.
    """
    import hashlib

    return [
        [
            int(hashlib.md5(f"{seed}|{j}|{d}".encode()).hexdigest()[:12], 16)
            / float(1 << 48)
            * 2.0
            - 1.0
            for d in range(dim)
        ]
        for j in range(n_bits)
    ]


def random_hyperplane_bands(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 16,
    band_bits: int = 4,
    dim: int = 64,
    seed: str = "hp",
) -> DataFrame:
    """(id, band, bsig) rows: sign-LSH signature split into bands.

    bit_j = [dot(v, w_j) > 0]; bands of ``band_bits`` bits bucket together
    (two vectors collide in a band with probability (1 - theta/pi)^band_bits
    — the random-projection analog of MinHash banding). All 16 dot folds
    happen in ONE projection per row; the x4 band explode multiplies rows
    only after signatures are computed.
    """
    W = hyperplanes(n_bits=n_bits, dim=dim, seed=seed)
    v = F.col(vec_col)
    bits = [
        F.when(_dot(v, F.array(*[F.lit(x) for x in w])) > 0, 1).otherwise(0)
        for w in W
    ]
    n_bands = n_bits // band_bits
    band_sigs = []
    for b in range(n_bands):
        sig = F.lit(0)
        for i in range(band_bits):
            sig = sig * 2 + bits[b * band_bits + i]
        band_sigs.append(sig)
    return df.select(
        F.col(id_col).alias("vec_id_"),
        F.posexplode(F.array(*band_sigs)).alias("band", "bsig"),
    ).select(F.col("vec_id_").alias(id_col), "band", "bsig")


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 16,
    band_bits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "hp",
) -> DataFrame:
    """Approximate top-k via random-hyperplane (sign) LSH: candidates are
    pairs sharing ANY signature band; exact cosine ranks them. The
    candidate step is an equi-join on (band, bsig) — at scale the corpus is
    bucketed by band signature so a query touches only colliding buckets,
    the same access pattern as the MinHash-LSH dedup path.
    """
    cb = random_hyperplane_bands(corpus, id_col, vec_col, n_bits, band_bits, dim, seed)
    qb = random_hyperplane_bands(queries, id_col, vec_col, n_bits, band_bits, dim, seed)
    pairs = (
        qb.withColumnRenamed(id_col, "q_id")
        .join(F.broadcast(cb.withColumnRenamed(id_col, "n_id")), ["band", "bsig"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_nrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        _norm(F.col(vec_col)).alias("n_nrm"),
    )
    scored = (
        pairs.join(F.broadcast(q), "q_id")
        .join(c, "n_id")
        .select(
            "q_id",
            "n_id",
            (
                _dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_nrm") * F.col("n_nrm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.col("n_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cos_sim", "rk")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
) -> DataFrame:
    """Approximate top-k: probe the nprobe clusters whose centroids are
    nearest each query, brute-force only inside them.

    Centroids are a tiny aggregate (one row per cluster) — broadcast to the
    query side; the candidate search is an equi-join on cluster id, which at
    scale hits only the probed partitions of a cluster-bucketed corpus.
    """
    # centroid per cluster: element-wise mean via posexplode + re-assemble
    exploded = corpus.select(
        F.col(cluster_col).alias("cluster"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    )
    centroids = (
        exploded.groupBy("cluster", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cluster", F.transform("pm", lambda s: s.getField("m")).alias("centroid"))
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_nrm"),
    )
    probe_w = Window.partitionBy("q_id").orderBy(F.desc("c_sim"), F.col("cluster"))
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "q_id", "q_vec", "q_nrm", "cluster",
            cosine(F.col("q_vec"), F.col("centroid")).alias("c_sim"),
        )
        .withColumn("prk", F.row_number().over(probe_w))
        .filter(F.col("prk") <= nprobe)
        .select("q_id", "q_vec", "q_nrm", "cluster")
    )
    # Per-vector norms computed BEFORE the candidate blowup: each candidate
    # pair costs one dot-product fold. dot/(norm*norm) is the identical
    # floating-point expression tree as inline cosine (oracle-bitwise-safe).
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        _norm(F.col(vec_col)).alias("n_nrm"),
        F.col(cluster_col).alias("cluster"),
    )
    scored = (
        c.join(F.broadcast(probes), "cluster")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            (
                _dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_nrm") * F.col("n_nrm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.col("n_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cos_sim", "rk")
    )
