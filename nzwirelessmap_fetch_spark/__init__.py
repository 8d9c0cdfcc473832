"""PySpark-native analytics engine with the query and data-processing
capabilities of ``mhansen/nzwirelessmap-fetch``, rebuilt Spark-first.

The reference (see SURVEY.md) is a single-purpose batch ETL pipeline:
multi-way relational join query + format-conversion operators + versioned
idempotent sinks. This package re-expresses that surface on the Spark
DataFrame/SQL stack and extends it with large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing,
streaming) designed for 100 TB scale.

Layout:
    session     SparkSession factory (AQE, tz pinning, arrow)
    catalog     explicit-schema table registry over parquet fixtures
    functions/  compat helpers (sqlite-LIKE, stable hashing, vector math)
    sources/    readers (parquet/csv/json/jdbc/binaryFile), zip staging
    sinks/      headered CSV / JSON-array / versioned idempotent artifact sinks
    plans/      flagship query + relational operator parity suite
    operators/  dedup, similarity, text analysis, asof/range, sessionize,
                multimodal
    streaming/  Structured Streaming operators over the events table
    pipeline    the reference's end-to-end DAG, Spark-native
"""

__version__ = "0.1.0"
