"""CLI runner: handler-ref parsing, config loading, end-to-end --once run
(and the real ``python -m overseer_spark`` surface via subprocess)."""

from __future__ import annotations

import json
import subprocess
import sys
import textwrap

import pytest

from overseer_spark.runner import main, parse_ref, read_config


@pytest.fixture()
def handler_module(tmp_path, monkeypatch):
    mod = tmp_path / "pipe_mod.py"
    mod.write_text(
        textwrap.dedent(
            """
            import json, os
            OUT = os.environ.get("PIPE_OUT", "/tmp/pipe_out.json")
            _done = []
            def _h(name):
                def handler(job):
                    _done.append(name)
                    with open(OUT, "w") as f:
                        json.dump(_done, f)
                return handler
            HANDLERS = {"extract": _h("extract"), "load": _h("load")}
            """
        )
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    return "pipe_mod"


def test_parse_ref_errors():
    with pytest.raises(SystemExit):
        parse_ref("no_colon")
    with pytest.raises(SystemExit):
        parse_ref("json:NOPE")


def test_read_config(tmp_path):
    cfg_file = tmp_path / "c.json"
    cfg_file.write_text(
        json.dumps(
            {"detector_sleep_time": 0.5, "heartbeat": {"tolerance": 3, "sleep_time": 5}}
        )
    )
    cfg = read_config(str(cfg_file))
    assert cfg.detector_sleep_time == 0.5
    assert cfg.heartbeat.tolerance == 3
    assert cfg.sleep_time == 10.0  # default preserved


def test_main_once_drains_graph(handler_module, tmp_path, monkeypatch):
    out = tmp_path / "done.json"
    monkeypatch.setenv("PIPE_OUT", str(out))
    rc = main(
        [
            "--handlers", f"{handler_module}:HANDLERS",
            "--type-graph", '{"extract": [], "load": ["extract"]}',
            "--args", '{"run": "r1"}',
            "--once",
        ]
    )
    assert rc == 0
    assert json.loads(out.read_text()) == ["extract", "load"]


def test_module_entrypoint_subprocess(handler_module, tmp_path):
    out = tmp_path / "done_sub.json"
    env = {"PIPE_OUT": str(out), "PYTHONPATH": f"{tmp_path}:/root/repo"}
    import os

    env = {**os.environ, **env}
    proc = subprocess.run(
        [
            sys.executable, "-m", "overseer_spark",
            "--handlers", f"{handler_module}:HANDLERS",
            "--type-graph", '{"extract": [], "load": ["extract"]}',
            "--once",
        ],
        env=env,
        capture_output=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    assert json.loads(out.read_text()) == ["extract", "load"]
