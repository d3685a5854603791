"""Config-catalog scan + lenient JSON parse unit tests."""

from __future__ import annotations

import json
import os


def test_scan_server_configs(spark, tmp_path):
    from pulsar_project_spark.sources.config_catalog import scan_server_configs

    for server, cfg in {
        "files": {"command": "python", "args": ["-m", "files"], "env": {"ROOT": "/tmp"}},
        "web": {"command": "node", "args": ["web.js"]},
    }.items():
        d = tmp_path / server
        d.mkdir()
        (d / "config.json").write_text(json.dumps(cfg))
        (d / "README.md").write_text("ignored")  # pathGlobFilter must skip

    cat = {r["server"]: r for r in scan_server_configs(spark, str(tmp_path)).collect()}
    assert set(cat) == {"files", "web"}
    assert cat["files"]["command"] == "python"
    assert cat["files"]["args"] == ["-m", "files"]
    assert cat["files"]["env_keys"] == ["ROOT"]
    assert cat["web"]["env_keys"] == []
    assert os.path.basename(cat["web"]["config_path"]) == "config.json"


def test_lenient_parse_fallback():
    from pulsar_project_spark.functions.lenient_json import lenient_parse

    assert lenient_parse("{a: 1, b: 'x',}") == '{"a":1,"b":"x"}'
    assert lenient_parse("['a', 'b',]") == '["a","b"]'
    assert lenient_parse("{'nested': {k: [1, 2,],},}") == '{"nested":{"k":[1,2]}}'
    assert lenient_parse("not json") is None
    assert lenient_parse(None) is None
    # strict JSON passes through canonically
    assert lenient_parse('{"b": 2, "a": 1}') == '{"a":1,"b":2}'
