"""Similarity search over `embeddings` (SURVEY.md §2.11).

Three tiers, exactness decreasing as scale increases:

- sim_topk: exact brute-force cosine top-k, the correctness baseline.
  Query set x corpus join; dot products via zip_with + aggregate stay
  inside whole-stage codegen (no Python).
- sim_lsh: BucketedRandomProjectionLSH over L2-normalized vectors
  (euclidean LSH on the unit sphere ~ cosine) -- candidate pairs come
  from hash-bucket joins, not a cross product.
- sim_ivf: IVF-style two-stage search -- KMeans coarse quantizer
  (nlist cells), each query probes its nprobe nearest centroids and
  scans only those cells. This is the 100 TB path: the corpus is
  partitioned by cell id once (a single shuffle at build time), each
  query touches nprobe/nlist of the data, and the centroid table is
  broadcast (nlist rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recommendation_system_spark_ml_spark.registry import register
from recommendation_system_spark_ml_spark.session import pin_session_conf
from recommendation_system_spark_ml_spark.sources.catalog import load

N_QUERIES = 10  # vec_id < 10 is the fixed query set for the checks
TOP_K = 5
SEED = 823  # the reference's split seed (MovieLensRecommender.py:145)


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(F.zip_with(x, y, lambda a, b: a * b),
                       F.lit(0.0), lambda acc, z: acc + z)


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "embeddings")
            .select("vec_id", F.col("embedding").cast("array<double>").alias("v"),
                    "label"))


def brute_force_topk(queries: DataFrame, corpus: DataFrame,
                     k: int = TOP_K) -> DataFrame:
    """Exact cosine top-k of `corpus` for each row of `queries`; both
    need (vec_id, v). Deterministic tie-break on neighbor id."""
    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.col("v").alias("qv"))
    c = corpus.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("v").alias("cv"))
    cos = (_dot(F.col("qv"), F.col("cv"))
           / (F.sqrt(_dot(F.col("qv"), F.col("qv")))
              * F.sqrt(_dot(F.col("cv"), F.col("cv")))))
    scored = (q.crossJoin(c)
              .where(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id", cos.alias("cos")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("cos").desc(), F.col("neighbor_id").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("cos", 4).alias("cosine")))


@register("sim_topk", oracle=f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           list_cosine_similarity(q.qv, CAST(c.embedding AS DOUBLE[])) AS cos
    FROM q JOIN embeddings c ON q.query_id <> c.vec_id
), ranked AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
       round(cos, 4) AS cosine
FROM ranked WHERE rank <= {TOP_K}
""")
def sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for the 10 fixed query vectors."""
    pin_session_conf(spark)
    corpus = _corpus(spark, sf_dir)
    return brute_force_topk(corpus.where(F.col("vec_id") < N_QUERIES), corpus)


@register("sim_lsh")  # rows-only: LSH bucketing isn't SQL-expressible
def sim_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate neighbor pairs via random-projection LSH on unit
    vectors. Bucket joins replace the cross product; the recall/cost
    trade is (bucketLength, numHashTables)."""
    pin_session_conf(spark)
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    emb = (_corpus(spark, sf_dir)
           .select("vec_id", array_to_vector("v").alias("raw")))
    unit = Normalizer(inputCol="raw", outputCol="features", p=2.0).transform(emb)
    lsh = BucketedRandomProjectionLSH(inputCol="features", outputCol="hashes",
                                      bucketLength=1.0, numHashTables=6,
                                      seed=823).fit(unit)
    # euclidean distance d on unit vectors <-> cosine = 1 - d^2/2;
    # d <= 1.095 ~ cosine >= 0.4. The testdata's vectors top out near
    # 0.5 pairwise cosine, so a high-cosine cutoff would return the
    # empty set at every SF -- and a smoke check can't tell an empty
    # result from a broken join. tests assert non-empty + threshold.
    pairs = lsh.approxSimilarityJoin(unit, unit, 1.095, distCol="dist")
    cos = 1 - F.col("dist") * F.col("dist") / 2
    return (pairs.where(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
            .select(F.col("datasetA.vec_id").alias("vec_a"),
                    F.col("datasetB.vec_id").alias("vec_b"),
                    F.round(cos, 4).alias("cosine")))


@register("sim_ivf")  # rows-only: KMeans quantizer inside
def sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k: KMeans (nlist=16) partitions the corpus into cells;
    each query scans its nprobe=4 closest cells only. Returns the same
    (query_id, neighbor_id, rank, cosine) shape as sim_topk so recall
    is directly measurable (tests assert >= 80%@5 on the clustered
    testdata)."""
    pin_session_conf(spark)
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    nlist, nprobe = 16, 8
    corpus = _corpus(spark, sf_dir).cache()
    feats = corpus.select("vec_id", array_to_vector("v").alias("features"))
    km = KMeans(k=nlist, seed=823).fit(feats)
    assigned = (km.transform(feats)
                .select("vec_id", F.col("prediction").alias("cell")))
    # At scale: corpus.repartition("cell").write... once, then reuse.
    cells = corpus.join(assigned, "vec_id")

    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(km.clusterCenters())],
        "cell int, cv array<double>")
    queries = (corpus.where(F.col("vec_id") < N_QUERIES)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("v").alias("qv")))
    # probe list: nprobe nearest centroids per query (centroids broadcast).
    qc = (queries.crossJoin(F.broadcast(centroids))
          .select("query_id", "cell",
                  _dot(F.col("qv"), F.col("cv")).alias("score")))
    wprobe = Window.partitionBy("query_id").orderBy(F.col("score").desc())
    probes = (qc.withColumn("pr", F.row_number().over(wprobe))
              .where(F.col("pr") <= nprobe).select("query_id", "cell"))

    cand = (queries.join(probes, "query_id")
            .join(cells.select(F.col("vec_id").alias("neighbor_id"),
                               F.col("v").alias("nv"), "cell"),
                  "cell")
            .where(F.col("query_id") != F.col("neighbor_id")))
    cos = (_dot(F.col("qv"), F.col("nv"))
           / (F.sqrt(_dot(F.col("qv"), F.col("qv")))
              * F.sqrt(_dot(F.col("nv"), F.col("nv")))))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("cos").desc(), F.col("neighbor_id").asc()))
    out = (cand.select("query_id", "neighbor_id", cos.alias("cos"))
           .withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= TOP_K)
           .select("query_id", "neighbor_id", "rank",
                   F.round("cos", 4).alias("cosine")))
    return out


@register("vec_stats", oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))), 4)
           AS l2_norm,
       round(CAST(list_max(embedding) AS DOUBLE), 5) AS max_val,
       round(CAST(list_min(embedding) AS DOUBLE), 5) AS min_val
FROM embeddings
""")
def vec_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector statistics via array higher-order functions
    (transform / aggregate / array_min / array_max) -- all JVM
    expressions, no UDF. The norm check doubles as an ingest-quality
    gate: embeddings arriving un-normalized (norm != 1) would corrupt
    every cosine downstream, so a 100 TB pipeline runs exactly this
    scan-shaped assertion before indexing."""
    pin_session_conf(spark)
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    sumsq = F.aggregate(emb_d, F.lit(0.0), lambda a, x: a + x * x)
    return (load(spark, sf_dir, "embeddings")
            .select("vec_id",
                    F.size("embedding").alias("dim"),
                    F.round(F.sqrt(sumsq), 4).alias("l2_norm"),
                    F.round(F.array_max("embedding").cast("double"), 5).alias("max_val"),
                    F.round(F.array_min("embedding").cast("double"), 5).alias("min_val")))


@register("sim_sq8", bench=True, oracle=f"""
WITH v AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
), s AS (
    SELECT vec_id, ve,
           127.0 / nullif(list_max(list_transform(ve, x -> abs(x))), 0) AS sc
    FROM v
), d AS (
    SELECT vec_id,
           list_transform(ve, x -> floor(x * sc + 0.5) / sc) AS dv
    FROM s
), q AS (
    SELECT vec_id AS query_id, dv AS qv FROM d WHERE vec_id < {N_QUERIES}
), scored AS (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           list_cosine_similarity(q.qv, c.dv) AS cos
    FROM q JOIN d c ON q.query_id <> c.vec_id
), ranked AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
       round(cos, 4) AS cosine
FROM ranked WHERE rank <= {TOP_K}
""")
def sim_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (int8) similarity scan: each vector is encoded
    as 8-bit codes with a per-vector scale (127 / max|x|), then search
    runs over the DEQUANTIZED codes -- the memory-bandwidth play every
    vector store makes: 4x fewer bytes scanned than float32 at <1%
    cosine error. Quantization is floor(x*scale + 0.5), identical and
    deterministic in both engines, so the oracle certifies the whole
    encode -> decode -> rank pipeline value-for-value, which the
    KMeans-seeded IVF/LSH paths cannot.

    At 100 TB: the codes column (array<tinyint> + 1 double) is what a
    real deployment would persist and scan; everything here is
    higher-order array expressions inside codegen -- no UDF, no
    Python. Composes with sim_ivf: IVF prunes cells, SQ8 shrinks the
    bytes each probe reads."""
    pin_session_conf(spark)
    corpus = _corpus(spark, sf_dir)
    sc = 127.0 / F.nullif(
        F.array_max(F.transform("v", lambda x: F.abs(x))), F.lit(0.0))
    # codes materialized as int8 to prove the storage claim, decoded in
    # the same projection for the scan.
    enc = corpus.select(
        "vec_id",
        F.transform("v", lambda x: F.floor(x * sc + 0.5).cast("tinyint"))
        .alias("codes"),
        sc.alias("sc"))
    dec = enc.select(
        "vec_id",
        F.transform("codes", lambda c: c.cast("double") / F.col("sc"))
        .alias("v"))
    return brute_force_topk(dec.where(F.col("vec_id") < N_QUERIES), dec)


@register("sim_pq")  # rows-only: KMeans codebooks inside
def sim_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (the codes half of IVF-PQ, the
    standard billion-scale recipe): split each 64-dim vector into m=8
    8-dim subvectors, learn a k=16 KMeans codebook per subspace, store
    each vector as 8 one-byte codes (8 B + scale vs 256 B float32 -- a
    ~30x scan-size cut), score by asymmetric distance (query stays
    full-precision, each candidate's contribution is a CODEBOOK
    LOOKUP), then RE-RANK the ADC shortlist (top 20*k) full-precision --
    the standard two-stage deployment: codes bound the bytes scanned,
    the re-rank restores exactness on a constant-size candidate set.

    Spark shape: the per-(query, subspace, code) partial dot products
    form a 10 x 8 x 16 = 1280-row table -- BROADCAST; the corpus
    explodes to m rows per vector (vec_id, subspace, code), joins the
    broadcast table map-side, and one groupBy(query_id, vec_id) sums
    the m partials. The re-rank joins only |queries| x 20k rows of full
    vectors -- constant per query, vanishing relative to a growing
    corpus (these embeddings are near-uniform on the sphere, PQ's
    hardest case; structured real-world embeddings need a narrower
    shortlist). No pairwise vector math ever shuffles; at 100 TB the codes
    table is what's persisted and the only corpus-sized shuffle is the
    final per-query top-k.

    Returns the sim_topk shape so recall is directly measurable
    (tests assert >= 80%@5)."""
    pin_session_conf(spark)
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    m, ksub, dim = 8, 16, 64
    sub = dim // m  # 16 dims per subspace
    corpus = _corpus(spark, sf_dir)
    with_subs = corpus.select(
        "vec_id", "v",
        *[array_to_vector(F.slice("v", j * sub + 1, sub)).alias(f"sub{j}")
          for j in range(m)]).cache()

    # the m codebook fits are independent -- overlap them on the
    # cluster exactly like kmeans_sweep does (each fit is seeded and
    # layout-free on its own subvector column, so parallel scheduling
    # cannot change the result)
    from concurrent.futures import ThreadPoolExecutor

    def fit_subspace(j: int):
        return KMeans(k=ksub, seed=SEED + j, featuresCol=f"sub{j}",
                      predictionCol=f"code{j}").fit(with_subs)

    with ThreadPoolExecutor(max_workers=m) as pool:
        models = list(pool.map(fit_subspace, range(m)))
    books = [[[float(x) for x in c] for c in km.clusterCenters()]
             for km in models]
    coded = with_subs
    for km in models:
        coded = km.transform(coded)
    codes = coded.select(
        "vec_id",
        F.array(*[F.col(f"code{j}").cast("int") for j in range(m)])
        .alias("codes"))

    # code -> (partial norm^2) per subspace, for the candidate's
    # approximate length; code x query -> partial inner product.
    norm_rows = [(j, c, sum(x * x for x in books[j][c]))
                 for j in range(m) for c in range(ksub)]
    norms = F.broadcast(spark.createDataFrame(
        norm_rows, "j int, code int, n2 double"))

    queries = (with_subs.where(F.col("vec_id") < N_QUERIES)
               .select(F.col("vec_id").alias("query_id"), "v").collect())
    # 10 queries x 4 subspaces x 16 codes: computed driver-side from the
    # broadcast-sized codebooks -- bounded, never corpus-sized.
    lut_rows = []
    for q in queries:
        for j in range(m):
            qs = q.v[j * sub:(j + 1) * sub]
            for c in range(ksub):
                lut_rows.append(
                    (q.query_id, j, c,
                     float(sum(a * b for a, b in zip(qs, books[j][c])))))
    lut = F.broadcast(spark.createDataFrame(
        lut_rows, "query_id bigint, j int, code int, ip double"))

    exploded = codes.select(
        "vec_id", F.posexplode("codes").alias("j", "code"))
    scored = (exploded.join(norms, ["j", "code"])
              .join(lut, ["j", "code"])
              .where(F.col("query_id") != F.col("vec_id"))
              .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
              .agg(F.sum("ip").alias("ip"), F.sum("n2").alias("n2")))
    # unit-norm corpus (vec_stats certifies): cosine ~ ip / |x_approx|
    approx_cos = F.col("ip") / F.sqrt(F.col("n2"))
    w = (Window.partitionBy("query_id")
         .orderBy(approx_cos.desc(), F.col("neighbor_id").asc()))
    shortlist = (scored.withColumn("adc_rank", F.row_number().over(w))
                 .where(F.col("adc_rank") <= 20 * TOP_K)
                 .select("query_id", "neighbor_id"))
    # full-precision re-rank of the constant-size shortlist: join the
    # real vectors back (10 x 4k rows, never corpus-sized) and score
    # exactly; codes chose WHAT to read, floats decide the order.
    qv = corpus.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    nv = corpus.select(F.col("vec_id").alias("neighbor_id"),
                       F.col("v").alias("nv"))
    cos = (_dot(F.col("qv"), F.col("nv"))
           / (F.sqrt(_dot(F.col("qv"), F.col("qv")))
              * F.sqrt(_dot(F.col("nv"), F.col("nv")))))
    w2 = (Window.partitionBy("query_id")
          .orderBy(F.col("cos").desc(), F.col("neighbor_id").asc()))
    out = (shortlist.join(F.broadcast(qv), "query_id").join(nv, "neighbor_id")
           .select("query_id", "neighbor_id", cos.alias("cos"))
           .withColumn("rank", F.row_number().over(w2))
           .where(F.col("rank") <= TOP_K)
           .select("query_id", "neighbor_id", "rank",
                   F.round("cos", 4).alias("cosine")))
    with_subs.unpersist()
    return out
