"""Coverage for small host utilities: printing helpers and crop detection."""

import subprocess
from pathlib import Path

from click.testing import CliRunner

from biahub_tpu.cli.printing import echo_headline, echo_settings
from biahub_tpu.settings import DeskewSettings
from biahub_tpu.visualize import crop_background


def test_printing_helpers(capsys):
    import click

    @click.command()
    def cmd():
        echo_headline("Deskew settings:")
        echo_settings(
            DeskewSettings(pixel_size_um=0.116, ls_angle_deg=36.0, px_to_scan_ratio=0.38)
        )

    result = CliRunner().invoke(cmd)
    assert result.exit_code == 0
    assert "Deskew settings:" in result.output
    assert "px_to_scan_ratio: 0.38" in result.output


def test_detect_crop_params_without_ffmpeg(tmp_path, monkeypatch):
    """No ffmpeg binary -> graceful None, not a crash."""
    def no_ffmpeg(cmd, **kwargs):
        raise FileNotFoundError(cmd[0])

    monkeypatch.setattr(subprocess, "run", no_ffmpeg)
    assert crop_background.detect_crop_params(tmp_path / "x.mp4") is None


def test_detect_crop_params_parses_ffmpeg_output(tmp_path, monkeypatch):
    class FakeResult:
        stderr = (
            "[Parsed_cropdetect] x1:0 x2:639 crop=608:448:16:16\n"
            "[Parsed_cropdetect] crop=640:464:0:8\n"
        )

    monkeypatch.setattr(subprocess, "run", lambda cmd, **kw: FakeResult())
    assert crop_background.detect_crop_params(tmp_path / "x.mp4") == "640:464:0:8"


def test_process_video_propagates_crop(tmp_path, monkeypatch):
    calls = []

    class FakeResult:
        stderr = "crop=32:32:0:0\n"

    def fake_run(cmd, **kwargs):
        calls.append(cmd)
        return FakeResult()

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = crop_background.process_video(tmp_path / "movie.mp4", tmp_path)
    assert out == Path(tmp_path) / "movie.mp4"
    assert any("crop=32:32:0:0" in " ".join(map(str, c)) for c in calls)
