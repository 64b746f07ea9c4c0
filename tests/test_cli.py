"""CLI surface (volxel_tpu/__main__.py) — the reference's demo-page role
(index.html:24-33 embed contract; packaging §2.4).

Runs the commands in-process via main(argv) so failures carry real
tracebacks; each command writes into tmp_path.
"""

from __future__ import annotations

import json

import pytest

from volxel_tpu.__main__ import main
from volxel_tpu.utils.fixtures import (
    synthetic_ct_volume,
    write_dicom_zip,
)


@pytest.fixture(scope="module")
def scan_zip(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "scan.zip"
    vol = synthetic_ct_volume((16, 24, 24), bits_stored=12)
    path.write_bytes(write_dicom_zip(vol, bits_stored=12))
    return path


def test_cli_render_with_overrides(scan_zip, tmp_path):
    out = tmp_path / "out.png"
    main([
        "render", "--zip", str(scan_zip), "--size", "32x32",
        "--samples", "2", "--set", "physical_majorant=true",
        "--set", "bounces=2", "--out", str(out),
    ])
    assert out.exists() and out.stat().st_size > 0


def test_cli_render_rejects_unknown_override(scan_zip, tmp_path):
    with pytest.raises(SystemExit):
        main([
            "render", "--zip", str(scan_zip), "--size", "16x16",
            "--samples", "1", "--set", "not_a_setting=1",
            "--out", str(tmp_path / "x.png"),
        ])


def test_cli_set_rejects_non_field_attributes():
    """--set must validate against dataclass FIELDS, not hasattr: methods
    and other non-field attributes are not overridable (advisor r3)."""
    from volxel_tpu.__main__ import _apply_setting_override
    from volxel_tpu.api.settings import ViewerSettings

    s = ViewerSettings()
    for bad in ("export_settings=x", "__class__=y", "bounces"):
        with pytest.raises(SystemExit):
            _apply_setting_override(s, bad)
    _apply_setting_override(s, "bounces=3")
    assert s.bounces == 3


def test_cli_ingest_info(scan_zip, capsys):
    main(["ingest", "--zip", str(scan_zip)])
    out = capsys.readouterr().out
    assert "brick" in out.lower() or "extent" in out.lower()


def test_cli_benchmark_spec(scan_zip, tmp_path, capsys):
    from volxel_tpu import Renderer

    spec = {
        "sharedSettings": [Renderer(width=8, height=8).export_settings()],
        "benchmarks": [
            {"zip": scan_zip.name, "renderMode": "raymarch", "settings": 0,
             "name": "cli-bench"},
        ],
    }
    spec["sharedSettings"][0]["display"]["maxSamples"] = 2
    spec_path = scan_zip.parent / "benchmark.json"
    spec_path.write_text(json.dumps(spec))
    out = tmp_path / "results.json"
    main([
        "benchmark", "--spec", str(spec_path), "--size", "8x8",
        "--out", str(out),
    ])
    results = json.loads(out.read_text())
    assert len(results) == 1
    assert results[0]["name"] == "cli-bench"
    assert results[0]["timePerSample"] > 0


def test_cli_info(capsys):
    main(["info"])
    out = capsys.readouterr().out
    assert '"platform"' in out
