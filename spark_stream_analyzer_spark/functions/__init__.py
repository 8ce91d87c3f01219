from spark_stream_analyzer_spark.functions.scalar import (
    epoch_seconds,
    guarded_ratio,
    int_div,
    round6,
)

__all__ = ["epoch_seconds", "guarded_ratio", "int_div", "round6"]
