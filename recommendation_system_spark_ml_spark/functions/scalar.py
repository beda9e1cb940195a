"""Scalar function families (SURVEY.md §2.6): string / date / math /
array / json / conditional, plus the one demonstrative vectorized
Pandas UDF (§2.9 policy: built-ins first, Arrow-vectorized when Python
is unavoidable, row-at-a-time udf() never).

The reference's scalar surface is split('::'|'|'), casts, and Python
``(x1-x2)**2`` (MovieLensRecommender.py:21,37,118-120,134-139); the
families below are the engine's full public surface over the testdata
types (timestamps, JSON props, arrays)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from recommendation_system_spark_ml_spark.registry import register
from recommendation_system_spark_ml_spark.session import pin_session_conf
from recommendation_system_spark_ml_spark.sources.catalog import load


@register("fn_string", oracle="""
SELECT p_partkey,
       lower(p_name) AS name_lower,
       upper(p_brand) AS brand_upper,
       substring(p_name, 1, 4) AS name_prefix,
       CAST(length(p_name) AS INTEGER) AS name_len,
       p_brand || ':' || p_type AS brand_type,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
       replace(p_type, 'STANDARD', 'STD') AS type_short,
       p_name LIKE '%bolt%' AS is_bolt,
       trim('  ' || p_type || ' ') AS type_trim
FROM part
""")
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    return (load(spark, sf_dir, "part").select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        # concat (NULL-propagating, = the oracle's ||), NOT concat_ws:
        # concat_ws skips NULL fields AND their separators
        F.concat("p_brand", F.lit(":"), "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.replace(F.col("p_type"), F.lit("STANDARD"), F.lit("STD")).alias("type_short"),
        F.col("p_name").like("%bolt%").alias("is_bolt"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("type_trim")))


@register("fn_date", oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mth,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_epoch0,
       CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_ts,
       strftime(o_orderdate, '%Y-%m') AS ym
FROM orders
""")
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    return (load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mth"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).alias("days_since_epoch0"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym")))


@register("fn_math", oracle="""
SELECT l_orderkey, l_linenumber,
       round(pow(l_quantity, 2), 4) AS qty_sq,
       round(sqrt(l_quantity), 6) AS qty_sqrt,
       round(abs(l_discount - 0.05), 4) AS disc_dev,
       round(ln(l_extendedprice), 6) AS price_ln,
       CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decile,
       CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
       CAST(round(l_extendedprice * 100, 0) AS BIGINT) % 97 AS price_mod
FROM lineitem
""")
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    return (load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.floor(F.col("l_quantity") / 10).alias("qty_decile"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        (F.round(F.col("l_extendedprice") * 100, 0).cast("long") % 97).alias("price_mod")))


@register("fn_array", oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
SELECT doc_id,
       CAST(len(words) AS INTEGER) AS n_words,
       list_contains(words, 'spark') AS has_spark,
       words[1] AS first_word,
       words[-1] AS last_word,
       CAST(len(list_filter(words, w -> length(w) > 5)) AS INTEGER) AS n_long_words,
       array_to_string(list_transform(words[1:2], w -> upper(w)), '_') AS head_upper
FROM t
""")
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: split/size/contains/index/filter/transform/join --
    all JVM-side higher-order functions, no Python."""
    pin_session_conf(spark)
    words = F.split(F.col("text"), " ")
    return (load(spark, sf_dir, "documents")
            .select("doc_id", words.alias("words"))
            .select(
                "doc_id",
                F.size("words").alias("n_words"),
                F.array_contains("words", "spark").alias("has_spark"),
                F.col("words").getItem(0).alias("first_word"),
                F.element_at("words", -1).alias("last_word"),
                F.size(F.filter(F.col("words"), lambda w: F.length(w) > 5)).alias("n_long_words"),
                F.array_join(F.transform(F.slice("words", 1, 2), F.upper), "_")
                .alias("head_upper")))


@register("fn_json", oracle="""
SELECT event_id, event_type,
       TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
       TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) % 5 AS k_bucket,
       json_extract_string(props, '$.missing') IS NULL AS missing_absent
FROM events
""", bench=True)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string (events.props): extraction + typed cast. At scale
    prefer from_json with an explicit schema once per pipeline; shown
    via get_json_object here because the props schema is open-ended.
    try_cast on both sides: a non-numeric 'k' value must yield NULL,
    not an ANSI CAST_INVALID_INPUT crash (hostile-probe-caught)."""
    pin_session_conf(spark)
    k = F.get_json_object("props", "$.k").try_cast("int")
    return (load(spark, sf_dir, "events").select(
        "event_id", "event_type",
        k.alias("k_val"),
        (k % 5).alias("k_bucket"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_absent")))


@register("fn_case", oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS size_band,
       CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'filled'
            ELSE 'other' END AS status_name,
       coalesce(nullif(o_orderpriority, '4-NOT SPECIFIED'), 'unspecified') AS priority_clean
FROM orders
""")
def fn_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    return (load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "small")
         .when(F.col("o_totalprice") < 150000, "medium")
         .otherwise("large").alias("size_band"),
        F.when(F.col("o_orderstatus") == "O", "open")
         .when(F.col("o_orderstatus") == "F", "filled")
         .otherwise("other").alias("status_name"),
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")),
                   F.lit("unspecified")).alias("priority_clean")))


@register("udf_pandas", oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
FROM lineitem
""")
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9: the one demonstrative vectorized UDF. The charge formula is
    deliberately also SQL-expressible so the Arrow path itself is
    oracle-verified; real uses are the non-SQL kernels (see
    operators/similarity.py, operators/multimodal.py)."""
    pin_session_conf(spark)

    @F.pandas_udf(T.DoubleType())
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    return (load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_linenumber",
                    F.round(charge("l_extendedprice", "l_discount", "l_tax"), 6)
                    .alias("charge")))


@register("fn_map", oracle="""
SELECT event_id,
       array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       CAST(len(json_keys(props)) AS INTEGER) AS n_keys
FROM events
""")
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions over parsed JSON: from_json to map<string,bigint>
    once, then map_keys / element_at / size -- the schema-on-read
    pattern for open-ended JSON at scale (parse once, not per field)."""
    pin_session_conf(spark)
    # map<string,STRING>, not bigint: one non-numeric value anywhere in
    # the object would null the WHOLE map under a bigint schema (while
    # the oracle's json_keys still sees the keys) -- parse values as
    # strings, then try_cast the field of interest (fuzz-caught).
    m = F.from_json("props", "map<string,string>")
    return (load(spark, sf_dir, "events")
            .select("event_id", m.alias("m"))
            .select("event_id",
                    # guard the NULL map: concat_ws returns '' (never
                    # NULL) on a NULL array, where the oracle's
                    # array_to_string(NULL) stays NULL
                    F.when(F.col("m").isNotNull(),
                           F.concat_ws(",", F.array_sort(F.map_keys("m"))))
                    .alias("keys_csv"),
                    # try_cast, not cast: under ANSI mode (Spark 4
                    # default) a plain cast CRASHES on a non-numeric
                    # value for 'k' where the oracle's TRY_CAST yields
                    # NULL (advice-caught divergence class)
                    F.try_element_at("m", F.lit("k"))
                    .try_cast("bigint").alias("k_val"),
                    F.size(F.map_keys("m")).alias("n_keys")))


@register("fn_posexplode", oracle="""
WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS arr FROM part)
SELECT p_partkey, CAST(g AS INTEGER) AS pos, arr[CAST(g AS BIGINT) + 1] AS word
FROM t, LATERAL (SELECT unnest(generate_series(0, len(arr) - 1)) AS g) gs
""")
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal-preserving flatten (posexplode / LATERAL ... WITH
    ORDINALITY): part names to (position, word) rows. The position
    column is what downstream sequence models need (token order);
    explode alone loses it. Narrow op -- no shuffle, output fan-out is
    bounded by words-per-name."""
    pin_session_conf(spark)
    return (load(spark, sf_dir, "part")
            .select("p_partkey", F.split("p_name", " ").alias("arr"))
            .select("p_partkey", F.posexplode("arr").alias("pos", "word")))


@register("fn_bitwise", oracle="""
SELECT p_partkey,
       CAST(p_size & 7 AS INTEGER) AS size_and,
       CAST(p_size | 8 AS INTEGER) AS size_or,
       CAST(xor(p_size, 5) AS INTEGER) AS size_xor,
       CAST(p_size << 2 AS INTEGER) AS size_shl
FROM part
""")
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression family (&, |, xor, shifts) -- flag unpacking
    and hash mixing at the expression layer, all whole-stage-codegen
    JVM ops."""
    pin_session_conf(spark)
    sz = F.col("p_size")
    return (load(spark, sf_dir, "part")
            .select("p_partkey",
                    sz.bitwiseAND(F.lit(7)).alias("size_and"),
                    sz.bitwiseOR(F.lit(8)).alias("size_or"),
                    sz.bitwiseXOR(F.lit(5)).alias("size_xor"),
                    F.shiftleft(sz, 2).alias("size_shl")))


@register("fn_hash", oracle="""
SELECT c_custkey,
       md5(c_name) AS name_md5,
       sha256(c_name) AS name_sha256,
       CAST(length(c_name) AS INTEGER) AS name_len
FROM customer
""")
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests (md5 / sha2-256): content addressing and
    dedup keys. Standard algorithms, so the hex strings are
    engine-portable -- unlike xxhash64/hash whose seeds are
    engine-specific (those stay internal, see dedup_fingerprint)."""
    pin_session_conf(spark)
    return (load(spark, sf_dir, "customer")
            .select("c_custkey",
                    F.md5("c_name").alias("name_md5"),
                    F.lower(F.sha2("c_name", 256)).alias("name_sha256"),
                    F.length("c_name").alias("name_len")))


@register("fn_null_family", oracle="""
SELECT l_orderkey, l_linenumber,
       coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_flag,
       greatest(l_quantity, CAST(round(l_discount * 100, 0) AS DOUBLE)) AS g,
       least(l_tax, l_discount) AS l,
       (l_discount IS NULL) AS disc_null
FROM lineitem
""")
def fn_null_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling family: nullif / coalesce / greatest / least /
    null-test -- the sentinel-scrubbing idioms every ingest layer
    needs, all codegen'd JVM expressions."""
    pin_session_conf(spark)
    return (load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_linenumber",
                    F.coalesce(F.nullif("l_discount", F.lit(0.0)), F.lit(-1.0))
                    .alias("disc_or_flag"),
                    F.greatest("l_quantity",
                               F.round(F.col("l_discount") * 100, 0).cast("double")).alias("g"),
                    F.least("l_tax", "l_discount").alias("l"),
                    F.isnull("l_discount").alias("disc_null")))


@register("fn_try_cast", oracle="""
SELECT c_custkey,
       TRY_CAST(split_part(c_name, '#', 2) AS BIGINT) AS name_num,
       TRY_CAST(c_mktsegment AS BIGINT) AS seg_num,
       CASE WHEN c_nationkey = 0 THEN NULL
            ELSE round(c_acctbal / c_nationkey, 6) END AS bal_per_nation
FROM customer
""")
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe conversions: try_cast yields NULL (not a job-killing
    exception) on malformed input, try_divide on zero denominators.
    At 100 TB there is ALWAYS a malformed row; try_* turns a 3-hour
    job abort into a null to filter."""
    pin_session_conf(spark)
    return (load(spark, sf_dir, "customer")
            .select("c_custkey",
                    F.try_to_number(F.split_part("c_name", F.lit("#"), F.lit(2)),
                                    F.lit("999999999999")).cast("bigint").alias("name_num"),
                    F.expr("try_cast(c_mktsegment AS BIGINT)").alias("seg_num"),
                    F.round(F.try_divide("c_acctbal",
                                         F.col("c_nationkey").cast("double")), 6)
                    .alias("bal_per_nation")))


@register("fn_variant", oracle="""
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       json_extract_string(props, '$.tag') AS tag
FROM events
""")
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark 4): parse the open-ended JSON once into the
    binary semi-structured type, then typed path extraction. Unlike
    get_json_object (re-parses the string per call) or from_json
    (needs a declared schema), variant keeps the full document
    shredded and binary -- the right ingest type for a 100 TB
    schema-on-read event lake."""
    pin_session_conf(spark)
    v = F.parse_json("props")
    return (load(spark, sf_dir, "events")
            .select("event_id", v.alias("v"))
            .select("event_id",
                    # try_variant_get: a non-numeric 'k' yields NULL
                    # like the oracle's TRY_CAST, instead of an ANSI
                    # cast error (hostile-probe-caught)
                    F.try_variant_get("v", "$.k", "bigint").alias("k_val"),
                    F.variant_get("v", "$.tag", "string").alias("tag")))


@register("udtf_python", oracle="""
SELECT doc_id, CAST(g / 512 AS BIGINT) AS chunk_idx,
       CAST(length(substr(text, CAST(g AS BIGINT) + 1, 512)) AS INTEGER)
           AS chunk_len
FROM (SELECT doc_id, text FROM documents),
     LATERAL (SELECT unnest(generate_series(0, length(text) - 1, 512)) AS g) gs
""")
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): one input row -> many output rows from
    user code -- here a document chunker emitting fixed 512-char spans.
    UDTFs run row-at-a-time in the Python worker, so POLICY: they are
    for logic that genuinely needs per-row Python control flow; this
    same chunking is expressible with sequence+posexplode JVM-side
    (multimodal_frame_sample), which is the hot-path form. The UDTF
    form exists to prove the surface and its exact semantics."""
    pin_session_conf(spark)
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx bigint, chunk_len int")
    class Chunker:
        def eval(self, text: str):
            if text is None:
                return
            for i, start in enumerate(range(0, len(text), 512)):
                yield i, len(text[start:start + 512])

    spark.udtf.register("doc_chunker", Chunker)
    docs = load(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql("""
        SELECT d.doc_id, c.chunk_idx, c.chunk_len
        FROM udtf_docs d, LATERAL doc_chunker(d.text) c""")


@register("udf_grouped_pandas", oracle="""
SELECT l_returnflag, l_orderkey, l_linenumber,
       round((l_quantity - avg(l_quantity) OVER (PARTITION BY l_returnflag))
             / stddev_samp(l_quantity) OVER (PARTITION BY l_returnflag), 6)
           AS qty_z
FROM lineitem
""")
def udf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInPandas (the pandas-UDAF surface): per-group
    z-score normalization, each group handed to pandas as one Arrow
    batch. POLICY twin: the oracle shows the same result as pure
    window expressions -- which is the preferred JVM form; applyInPandas
    is for group-wise logic that needs real pandas/numpy (model
    scoring, scipy stats). One shuffle on the group key; each group
    must fit a worker's memory -- partition keys are chosen
    accordingly (3 flags here, fine; at 100 TB group by a
    higher-cardinality key or pre-aggregate)."""
    pin_session_conf(spark)
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["l_quantity"].mean()
        sd = pdf["l_quantity"].std(ddof=1)
        return pd.DataFrame({
            "l_returnflag": pdf["l_returnflag"],
            "l_orderkey": pdf["l_orderkey"],
            "l_linenumber": pdf["l_linenumber"],
            "qty_z": ((pdf["l_quantity"] - mu) / sd).round(6),
        })

    return (load(spark, sf_dir, "lineitem")
            .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
            .groupBy("l_returnflag")
            .applyInPandas(zscore, schema=("l_returnflag string, l_orderkey bigint, "
                                           "l_linenumber int, qty_z double")))


@register("fn_pad_trim", oracle="""
SELECT n_nationkey,
       lpad(n_name, 20, '*') AS padded_l,
       rpad(n_name, 20, '.') AS padded_r,
       trim('  ' || n_name || '  ') AS trimmed,
       replace(n_name, '_', '-') AS replaced,
       reverse(n_name) AS reversed
FROM nation
""")
def fn_pad_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width formatting family: lpad/rpad/trim/replace/reverse
    -- the record-layout normalizers every mainframe-adjacent ingest
    needs, all codegen'd JVM expressions."""
    pin_session_conf(spark)
    return (load(spark, sf_dir, "nation").select(
        "n_nationkey",
        F.lpad("n_name", 20, "*").alias("padded_l"),
        F.rpad("n_name", 20, ".").alias("padded_r"),
        F.trim(F.concat(F.lit("  "), F.col("n_name"), F.lit("  "))).alias("trimmed"),
        F.replace("n_name", F.lit("_"), F.lit("-")).alias("replaced"),
        F.reverse("n_name").alias("reversed")))


@register("udf_arrow_batch", oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_cents,
       CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
           AS discounted_e4
FROM lineitem
WHERE l_returnflag = 'R'
""")
def udf_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (Spark 4): the zero-copy batch API below mapInPandas
    -- the closure receives pyarrow RecordBatches directly, skipping
    the Arrow->pandas conversion entirely. The right surface when the
    Python kernel is itself Arrow-native (pyarrow.compute, polars,
    DuckDB-in-worker); integer cents math keeps the result exact so
    the oracle can hash-verify the Arrow path end to end. The filter
    still reaches the parquet scan: mapInArrow is a plan node, and
    the projection/predicate sit below it."""
    pin_session_conf(spark)
    import pyarrow as pa
    import pyarrow.compute as pc

    def batches(it):
        for batch in it:
            price_cents = pc.cast(pc.round(pc.multiply(
                batch.column("l_extendedprice"), pa.scalar(100.0))), pa.int64())
            disc_cents = pc.cast(pc.round(pc.multiply(
                batch.column("l_discount"), pa.scalar(100.0))), pa.int64())
            # passthrough columns must be cast to the DECLARED schema
            # types -- mapInArrow hands the arrays to the JVM as-is,
            # and an int32 array under a bigint column fails at read
            yield pa.RecordBatch.from_arrays(
                [pc.cast(batch.column("l_orderkey"), pa.int64()),
                 pc.cast(batch.column("l_linenumber"), pa.int64()),
                 price_cents,
                 pc.multiply(price_cents,
                             pc.subtract(pa.scalar(100, pa.int64()), disc_cents))],
                names=["l_orderkey", "l_linenumber", "price_cents",
                       "discounted_e4"])

    li = (load(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"))
    return li.mapInArrow(
        batches,
        schema=("l_orderkey bigint, l_linenumber bigint, "
                "price_cents bigint, discounted_e4 bigint"))


@register("fn_collation", oracle="""
WITH mixed AS (
    SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                ELSE c_mktsegment END AS seg
    FROM customer
)
SELECT lower(seg) AS segment, count(*) AS n
FROM mixed GROUP BY 1
""")
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collation (Spark 4): group case-mangled segments under
    the UTF8_LCASE collation so 'BUILDING' and 'building' land in one
    group WITHOUT rewriting every comparison site to lower() -- at
    100 TB collation beats lower() because the collated comparison
    happens inside codegen with no derived column materialized, and it
    generalizes to locale-aware rules lower() can't express. The
    output key is normalized with lower() only for a deterministic
    display form; the DuckDB oracle is the lower()-rewrite twin."""
    pin_session_conf(spark)
    mixed = (load(spark, sf_dir, "customer")
             .select(F.when(F.col("c_custkey") % 2 == 0,
                            F.lower("c_mktsegment"))
                     .otherwise(F.col("c_mktsegment")).alias("seg")))
    return (mixed.groupBy(F.expr("collate(seg, 'UTF8_LCASE')").alias("seg_ci"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lower(F.col("seg_ci").cast("string")).alias("segment"), "n"))


@register("fn_url", oracle="""
WITH u AS (
    SELECT c_custkey,
           'https://shop.example.com/' || lower(c_mktsegment) || '/item'
               || CAST(c_custkey % 100 AS VARCHAR)
               || '?cust=' || CAST(c_custkey AS VARCHAR)
               || '&nation=' || CAST(c_nationkey AS VARCHAR) AS url
    FROM customer
)
SELECT c_custkey,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
       regexp_extract(url, '\\?([^#]*)', 1) AS query,
       regexp_extract(url, '[?&]cust=([^&#]*)', 1) AS cust_param
FROM u
""")
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing: host/path/query plus one named query parameter via
    Spark's parse_url -- the web-log/crawl-ingest staple. The oracle
    re-derives every component with plain regexes (DuckDB has no URL
    parser), so the check certifies parse_url against an INDEPENDENT
    implementation rather than mirroring it. Synthetic deterministic
    URLs from customer rows keep it reproducible at every SF; all
    expressions run inside codegen, zero shuffles."""
    pin_session_conf(spark)
    url = F.concat(
        F.lit("https://shop.example.com/"), F.lower("c_mktsegment"),
        F.lit("/item"), (F.col("c_custkey") % 100).cast("string"),
        F.lit("?cust="), F.col("c_custkey").cast("string"),
        F.lit("&nation="), F.col("c_nationkey").cast("string"))
    return (load(spark, sf_dir, "customer")
            .select("c_custkey", url.alias("url"))
            .select(
                "c_custkey",
                F.parse_url("url", F.lit("HOST")).alias("host"),
                F.parse_url("url", F.lit("PATH")).alias("path"),
                F.parse_url("url", F.lit("QUERY")).alias("query"),
                F.parse_url("url", F.lit("QUERY"), F.lit("cust"))
                .alias("cust_param")))


@register("udtf_analyze", oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k,
       json_extract_string(props, '$.device') AS device
FROM events WHERE props IS NOT NULL
""")
def udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4 `analyze()`): the OUTPUT
    SCHEMA is computed at plan time from a constant argument -- here
    a comma-separated key list turns into one string column per key,
    so one registered table function serves any JSON projection
    without per-shape registrations (the modern surface udtf_python's
    fixed-schema chunker doesn't show). Per-row pure extraction; the
    oracle is DuckDB's json_extract_string per requested key.
    POLICY: row-at-a-time Python is the demonstration price -- the
    hot-path forms remain fn_map's from_json and fn_variant's
    parse_json (JVM-side); this key exists to prove the API surface
    and its exact semantics (string-form scalars, NULL on missing/
    null, schema-from-argument)."""
    pin_session_conf(spark)
    import json as _json

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class JsonFields:
        @staticmethod
        def analyze(props: AnalyzeArgument,
                    keys: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for k in str(keys.value).split(","):
                schema = schema.add(k.strip(), StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, props: str, keys: str):
            names = [k.strip() for k in keys.split(",")]
            try:
                obj = _json.loads(props) if props is not None else {}
            except ValueError:
                obj = {}
            if not isinstance(obj, dict):
                obj = {}

            def form(v):
                if v is None:
                    return None
                if isinstance(v, bool):  # JSON true/false, not 'True'
                    return "true" if v else "false"
                if isinstance(v, (dict, list)):
                    return _json.dumps(v, separators=(",", ":"))
                return str(v)

            yield tuple(form(obj.get(n)) for n in names)

    spark.udtf.register("json_fields", JsonFields)
    (load(spark, sf_dir, "events")
     .where(F.col("props").isNotNull())
     .createOrReplaceTempView("udtf_events"))
    return spark.sql("""
        SELECT e.event_id, f.k, f.device
        FROM udtf_events e, LATERAL json_fields(e.props, 'k,device') f""")
