from spark_stream_analyzer_spark.streaming.control_http import ControlServer
from spark_stream_analyzer_spark.streaming.lifecycle import StreamController
from spark_stream_analyzer_spark.streaming.sinks import (
    jdbc_snapshot_batch_writer,
    to_console,
    to_jdbc_snapshots,
    to_memory,
    to_parquet_snapshots,
)
from spark_stream_analyzer_spark.streaming.sources import (
    file_lines_stream,
    kafka_lines_stream,
    lines_from_kafka_frames,
    rate_stream,
)
from spark_stream_analyzer_spark.streaming.stateful import (
    running_player_stats_stream,
    snapshot_player_stats_stream,
)

__all__ = [
    "ControlServer",
    "StreamController",
    "file_lines_stream",
    "jdbc_snapshot_batch_writer",
    "kafka_lines_stream",
    "lines_from_kafka_frames",
    "rate_stream",
    "running_player_stats_stream",
    "snapshot_player_stats_stream",
    "to_console",
    "to_jdbc_snapshots",
    "to_memory",
    "to_parquet_snapshots",
]
