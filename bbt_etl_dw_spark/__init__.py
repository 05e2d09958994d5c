"""bbt_etl_dw_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference ETL/DW pipeline (oussemabouchoucha/BBT-ETL-DW):
rule-driven data-quality auditing and cleaning, enrichment, tax/currency
(as-of) resolution, anomaly detection, star-schema assembly with
deterministic surrogate keys, SCD2, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis) and Structured Streaming.

Everything is expressed with the DataFrame/SQL API so Catalyst + AQE pick
the physical strategy; Python crosses the JVM boundary only in explicitly
Arrow-batched Pandas-UDF operators.
"""

__version__ = "0.1.0"

from bbt_etl_dw_spark.session import get_spark, tune  # noqa: F401
