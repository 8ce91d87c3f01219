from spark_stream_analyzer_spark.streaming.lifecycle import StreamController
from spark_stream_analyzer_spark.streaming.stateful import (
    running_player_stats_stream,
    snapshot_player_stats_stream,
)

__all__ = [
    "StreamController",
    "running_player_stats_stream",
    "snapshot_player_stats_stream",
]
