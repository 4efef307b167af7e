"""ffmpeg-based video background cropping (reference: biahub/visualize/crop_background.py)."""

from __future__ import annotations

import re
import subprocess
from pathlib import Path

import click


def detect_crop_params(file_path) -> str | None:
    """Detect the content bounding box with ffmpeg's cropdetect filter."""
    cmd = [
        "ffmpeg", "-i", str(file_path), "-vf", "cropdetect", "-frames:v", "64",
        "-f", "null", "-",
    ]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (FileNotFoundError, subprocess.TimeoutExpired):
        return None
    matches = re.findall(r"crop=(\S+)", out.stderr)
    return matches[-1] if matches else None


def process_video(file_path, output_dir) -> Path | None:
    """Crop one video to its detected content box."""
    crop = detect_crop_params(file_path)
    if crop is None:
        click.echo(f"No crop detected for {file_path}")
        return None
    output_path = Path(output_dir) / Path(file_path).name
    subprocess.run(
        ["ffmpeg", "-y", "-i", str(file_path), "-vf", f"crop={crop}", str(output_path)],
        capture_output=True,
        check=True,
    )
    return output_path


@click.command("crop-background")
@click.argument("input-dir", type=click.Path(exists=True, file_okay=False))
@click.argument("output-dir", type=click.Path())
def main(input_dir, output_dir):
    """Batch process videos in INPUT-DIR and save the output to OUTPUT-DIR
    (reference: biahub/visualize/crop_background.py:71-84)."""
    Path(output_dir).mkdir(parents=True, exist_ok=True)
    for file_path in sorted(Path(input_dir).glob("*.mp4")):
        click.echo(f"Processing {file_path}")
        process_video(file_path, output_dir)


if __name__ == "__main__":
    main()
