"""HTTP control plane tests (reference ``MainController.java:29-61``):
start/stop/status over real HTTP against a real streaming query."""

from __future__ import annotations

import json
import urllib.request

from spark_stream_analyzer_spark.sources.wire import parse_kill_lines
from spark_stream_analyzer_spark.streaming.control_http import ControlServer
from spark_stream_analyzer_spark.streaming.sinks import to_memory
from spark_stream_analyzer_spark.streaming.sources import file_lines_stream

KILL = "x,12800,1,Alice,S_A,x,x,Bob,S_B,x,x,Cara,S_C\n"


def _call(addr, method, path):
    host, port = addr
    req = urllib.request.Request(f"http://{host}:{port}{path}", method=method)
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_start_stop_status_roundtrip(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "000.txt").write_text(KILL)

    def build():
        ev = parse_kill_lines(file_lines_stream(spark, str(src)))
        return to_memory(ev, "t_http_ctl", output_mode="append")

    srv = ControlServer(build)
    srv.start()
    try:
        addr = srv.address
        code, body = _call(addr, "GET", "/status")
        assert code == 200 and body == {"running": False}

        code, body = _call(addr, "POST", "/start")
        assert code == 200 and body == {"started": True}
        # reference behavior: refuse a second start while running
        code, body = _call(addr, "POST", "/start")
        assert code == 409 and body == {"started": False}

        srv.controller._query.processAllAvailable()
        code, body = _call(addr, "GET", "/status")
        assert code == 200 and body["running"] and "id" in body
        assert spark.table("t_http_ctl").count() == 3

        code, body = _call(addr, "POST", "/stop")
        assert code == 200 and body == {"stopped": True}
        code, body = _call(addr, "POST", "/stop")
        assert code == 409 and body == {"stopped": False}
        code, body = _call(addr, "GET", "/status")
        assert code == 200 and body == {"running": False}

        # restart works (fresh query from the factory)
        code, body = _call(addr, "POST", "/start")
        assert code == 200 and body == {"started": True}

        code, body = _call(addr, "GET", "/nope")
        assert code == 404
    finally:
        srv.shutdown()


def test_http_start_passes_folder_path(spark, tmp_path):
    """Reference parity: POST /start?folderPath=... reaches the factory
    (MainController.java:29-37)."""
    srcs = {}
    for name in ("one", "two"):
        d = tmp_path / name
        d.mkdir()
        (d / "000.txt").write_text(KILL)
        srcs[name] = str(d)

    seen = []

    def build(folder):
        seen.append(folder)
        ev = parse_kill_lines(file_lines_stream(spark, folder))
        return to_memory(ev, "t_http_folder", output_mode="append")

    srv = ControlServer(build)
    srv.start()
    try:
        addr = srv.address
        quoted = srcs["two"].replace("/", "%2F")
        code, body = _call(addr, "POST", f"/start?folderPath={quoted}")
        assert code == 200 and body == {"started": True}
        srv.controller._query.processAllAvailable()
        assert seen == [srcs["two"]]
        assert spark.table("t_http_folder").count() == 3
        code, _ = _call(addr, "POST", "/stop")
        assert code == 200
    finally:
        srv.shutdown()
