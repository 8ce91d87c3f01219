from spark_stream_analyzer_spark.plans.registry import QUERIES, oracle_sql, queries

__all__ = ["QUERIES", "queries", "oracle_sql"]
