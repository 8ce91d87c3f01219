"""CLI: list and run registry queries, or serve the stream control plane.

Usage:
    python -m spark_stream_analyzer_spark list
    python -m spark_stream_analyzer_spark run <query> [--sf-dir DIR] [--limit N] [--explain]
    python -m spark_stream_analyzer_spark serve --folder DIR [--port P]

`serve` is the reference deployment shape (SparkStreamingService +
MainController): a streaming pipeline controlled over HTTP
(POST /start?folderPath=..., POST /stop, GET /status), file-replay
source standing in for the Kafka topics.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="spark_stream_analyzer_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registry queries")

    runp = sub.add_parser("run", help="run one registry query")
    runp.add_argument("query")
    runp.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--explain", action="store_true", help="print the formatted plan")

    servep = sub.add_parser("serve", help="HTTP-controlled streaming pipeline")
    servep.add_argument("--folder", default=None, help="default replay folder")
    servep.add_argument("--port", type=int, default=8081)
    servep.add_argument("--host", default="127.0.0.1")

    args = p.parse_args(argv)

    from spark_stream_analyzer_spark.plans import registry

    if args.cmd == "list":
        for name in sorted(registry.queries()):
            print(name)
        return 0

    from spark_stream_analyzer_spark import get_spark

    if args.cmd == "run":
        qs = registry.queries()
        if args.query not in qs:
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        spark = get_spark(app_name=f"ssa-run-{args.query}")
        df = qs[args.query](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        df.show(args.limit, truncate=False)
        print(f"({df.count()} rows total)")
        return 0

    # serve
    from spark_stream_analyzer_spark.sources.wire import (
        parse_damage_lines,
        parse_kill_lines,
    )
    from spark_stream_analyzer_spark.streaming.control_http import ControlServer
    from spark_stream_analyzer_spark.streaming.sinks import to_console
    from spark_stream_analyzer_spark.streaming.sources import file_lines_stream
    from spark_stream_analyzer_spark.streaming.stateful import (
        snapshot_player_stats_stream,
    )

    spark = get_spark(app_name="ssa-serve")

    def build(folder: str | None):
        folder = folder or args.folder
        if not folder:
            raise ValueError("no folder: pass /start?folderPath=... or --folder")
        events = parse_kill_lines(file_lines_stream(spark, folder)).unionByName(
            parse_damage_lines(file_lines_stream(spark, folder))
        )
        return to_console(snapshot_player_stats_stream(events))

    srv = ControlServer(build, host=args.host, port=args.port)
    srv.start()
    host, port = srv.address
    print(f"control plane on http://{host}:{port} (POST /start, POST /stop, GET /status)")
    try:
        import signal

        signal.pause()
    except (KeyboardInterrupt, AttributeError):
        pass
    finally:
        srv.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
