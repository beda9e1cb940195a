"""Reference-native text ingest: '::'-delimited .dat files (SURVEY.md §2.1).

The reference reads movies.dat / ratings.dat with RDD lambdas plus a
collect-to-pandas round trip (MovieLensRecommender.py:113-129). Here
the same files parse in one Catalyst plan: read.text -> split -> cast.
Types are fixed at ingest (the reference joins an int movieId against a
string one and leans on the analyzer's implicit cast, MLR.py:74 -- a
documented hazard we close).

Because the harness testdata has no MovieLens tables, this module also
carries a deterministic generator for a MovieLens-*shaped* twin
(FIXTURES.md §1): pure DataFrame expressions seeded by xxhash64 -- no
driver loops, no Python RNG -- written as real '::' text files so the
ingest path is exercised end-to-end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GENRES = ("Action", "Adventure", "Animation", "Children's", "Comedy", "Crime",
          "Documentary", "Drama", "Fantasy", "Film-Noir", "Horror", "Musical",
          "Mystery", "Romance", "Sci-Fi", "Thriller", "War", "Western")


def parse_movies(text_df: DataFrame) -> DataFrame:
    """movies.dat lines -> (movieId int, title string, genres string)."""
    parts = F.split("value", "::")
    return text_df.select(
        parts.getItem(0).cast("int").alias("movieId"),
        parts.getItem(1).alias("title"),
        parts.getItem(2).alias("genres"))


def parse_ratings(text_df: DataFrame) -> DataFrame:
    """ratings.dat lines -> typed columns, timestamp dropped (the
    reference discards it, MLR.py:140)."""
    parts = F.split("value", "::")
    return text_df.select(
        parts.getItem(0).cast("int").alias("userId"),
        parts.getItem(1).cast("int").alias("movieId"),
        parts.getItem(2).cast("float").alias("rating"),
        parts.getItem(3).cast("long").alias("timestamp")).drop("timestamp")


def genre_onehot(movies: DataFrame) -> DataFrame:
    """Multi-label one-hot with a runtime-discovered vocabulary:
    split '|' -> explode -> pivot. The distributed replacement for the
    reference's collect-to-pandas loops (MLR.py:117-126); the pivot's
    internal distinct is the vocabulary discovery."""
    exploded = movies.select(
        "movieId", F.explode(F.split("genres", r"\|")).alias("genre"))
    return (exploded.groupBy("movieId").pivot("genre")
            .agg(F.coalesce(F.first(F.lit(1)), F.lit(0)))
            .na.fill(0))


def generate_movielens_twin(spark: SparkSession, out_dir: str,
                            n_movies: int = 200, n_users: int = 150,
                            ratings_per_user: int = 20) -> tuple[str, str]:
    """Write movies.dat / ratings.dat twins (FIXTURES.md §1) and return
    their paths. Idempotent per out_dir; deterministic via xxhash64 --
    scale the row counts and this generator runs distributed as-is.

    Safe under CONCURRENT PROCESSES sharing out_dir (e.g. a test run
    and a driver-mimic at the same scale factor): generation happens in
    a per-PID staging dir and is COMMITTED by an atomic os.rename; a
    loser whose rename fails uses the winner's committed copy (or its
    own staging copy if the target is a crashed partial). Without this,
    two writers interleaving mode=overwrite on the same path served
    readers a half-written twin -- observed as a flaky golden-fixture
    mismatch."""
    movies_path = os.path.join(out_dir, "movies.dat")
    ratings_path = os.path.join(out_dir, "ratings.dat")
    # a crashed writer leaves a partial dir that os.path.exists would
    # accept; the _SUCCESS marker is the real commit record
    if all(os.path.exists(os.path.join(p, "_SUCCESS"))
           for p in (movies_path, ratings_path)):
        return movies_path, ratings_path
    stage = f"{out_dir.rstrip('/')}.stage-{os.getpid()}"
    out_dir = stage  # the writes below land in the staging dir
    final_movies, final_ratings = movies_path, ratings_path
    movies_path = os.path.join(stage, "movies.dat")
    ratings_path = os.path.join(stage, "ratings.dat")

    def h(*cols):
        return F.abs(F.xxhash64(*cols, F.lit(42)))

    movies = spark.range(1, n_movies + 1).select(
        F.col("id").alias("movieId"),
        (1919 + h(F.col("id"), F.lit("year")) % 82).alias("year"))
    # 1-3 genres: always include pmod(h,18); add two more when their
    # coin flips hit. Movie id g (1..18) pins genre g-1 so every genre
    # appears >= once (the reference's runtime vocabulary invariant).
    base = F.when(F.col("movieId") <= len(GENRES), F.col("movieId") - 1) \
        .otherwise(h(F.col("movieId"), F.lit("g0")) % 18)
    extra1 = h(F.col("movieId"), F.lit("g1")) % 18
    extra2 = h(F.col("movieId"), F.lit("g2")) % 18
    use1 = h(F.col("movieId"), F.lit("u1")) % 3 == 0
    use2 = h(F.col("movieId"), F.lit("u2")) % 3 == 0
    garr = F.array_distinct(F.concat(
        F.array(base),
        F.when(use1, F.array(extra1)).otherwise(F.array()),
        F.when(use2, F.array(extra2)).otherwise(F.array())))
    genre_lookup = F.array(*[F.lit(g) for g in GENRES])
    genres_str = F.concat_ws(
        "|", F.transform(garr,
                         lambda i: F.element_at(genre_lookup,
                                                (i + 1).cast("int"))))
    (movies.select(F.concat_ws(
        "::", "movieId",
        F.format_string("Movie %d (%d)", "movieId", "year"),
        genres_str).alias("value"))
     .coalesce(1).write.mode("overwrite").text(movies_path))

    # each user rates exactly ratings_per_user movies: zipf-ish pick,
    # rating = 3 + user bias + movie bias + noise, clamped to 1..5.
    pairs = (spark.range(1, n_users + 1).alias("u")
             .crossJoin(spark.range(ratings_per_user).alias("j"))
             .select(F.col("u.id").alias("userId"), F.col("j.id").alias("j")))
    u01 = (h(F.col("userId"), F.col("j"), F.lit("m")) % 10000) / 10000.0
    movie_id = (F.floor(F.pow(u01, 2.0) * n_movies) % n_movies + 1).cast("int")
    ubias = (h(F.col("userId"), F.lit("ub")) % 3).cast("double") - 1.0
    mbias = (h(movie_id, F.lit("mb")) % 3).cast("double") - 1.0
    noise = (h(F.col("userId"), F.col("j"), F.lit("n")) % 3).cast("double") - 1.0
    rating = F.greatest(F.lit(1.0), F.least(
        F.lit(5.0), F.round(3.0 + 0.7 * ubias + 0.6 * mbias + 0.4 * noise)))
    ts = 946684800 + h(F.col("userId"), F.col("j"), F.lit("t")) % 94608000
    (pairs.select(F.concat_ws(
        "::", "userId", movie_id,
        rating.cast("decimal(2,1)"), ts).alias("value"))
     .coalesce(1).write.mode("overwrite").text(ratings_path))

    # atomic commit: rename each staged dataset into place; on a lost
    # race keep the winner's committed copy, on a crashed partial
    # replace it, and if the target still isn't committed fall back to
    # this process's staging copy.
    import shutil
    final_root = os.path.dirname(final_movies)
    os.makedirs(final_root, exist_ok=True)
    out_paths = []
    for src, dst in ((movies_path, final_movies),
                     (ratings_path, final_ratings)):
        try:
            os.rename(src, dst)
        except OSError:
            if not os.path.exists(os.path.join(dst, "_SUCCESS")):
                # crashed partial at dst: move it ASIDE first (atomic),
                # then rename the staged copy in -- dst is never
                # absent-then-present, so a concurrent reader sees
                # either the old partial or the new committed dataset.
                aside = f"{dst}.bad-{os.getpid()}"
                try:
                    os.rename(dst, aside)
                except OSError:
                    pass
                try:
                    os.rename(src, dst)
                except OSError:
                    pass
                shutil.rmtree(aside, ignore_errors=True)
        out_paths.append(
            dst if os.path.exists(os.path.join(dst, "_SUCCESS")) else src)
    if all(not p.startswith(stage) for p in out_paths):
        shutil.rmtree(stage, ignore_errors=True)
    return out_paths[0], out_paths[1]


def load_movielens(spark: SparkSession, scratch_dir: str
                   ) -> tuple[DataFrame, DataFrame]:
    """Generate-if-needed + parse through the real text ingest path."""
    movies_path, ratings_path = generate_movielens_twin(spark, scratch_dir)
    return (parse_movies(spark.read.text(movies_path)),
            parse_ratings(spark.read.text(ratings_path)))
