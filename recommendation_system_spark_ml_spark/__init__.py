"""PySpark-native analytics engine with the query/data-processing
capabilities of el-grudge/Recommendation_System_Spark_ML, rebuilt
Spark-first (DataFrame/Catalyst), plus the large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal columns) the 100 TB north star requires.

Layout:
    session      -- SparkSession factory (AQE, shuffle tuning, UTC)
    sources      -- parquet/text scans, catalog, sinks
    operators    -- relational + dedup/similarity/text/multimodal ops
    functions    -- scalar/vector function families
    plans        -- composed end-to-end queries (flagship, reference parity)
    streaming    -- structured-streaming windows + batch twins
    ml           -- KMeans elbow, cluster-average predictor, ALS CV
    registry     -- QuerySpec registry feeding __spark_entry__.py
"""

from recommendation_system_spark_ml_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
