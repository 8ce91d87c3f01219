"""spark_stream_analyzer_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of the
reference ``SuviGod/spark-stream-analyzer`` (a Spring Boot app embedding
Spark 3.3, see SURVEY.md), re-expressed as idiomatic PySpark:

* batch + streaming DataFrame pipelines (no RDDs, no row-level Python on
  hot paths);
* Structured Streaming for the live path (file/rate/kafka sources are
  config-swappable, identical post-``load()`` plan);
* a batch analytics layer replacing the reference's Postgres SQL
  (``sql/queries.sql``) with Spark SQL / DataFrame plans;
* EXT: LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal columns) designed for 100 TB scale.
"""

from spark_stream_analyzer_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
