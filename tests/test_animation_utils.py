"""Headless rendering/recording tests for visualize.animation_utils."""

import numpy as np
import pytest
from PIL import Image

from biahub_tpu.visualize.animation_utils import (
    ElementPosition,
    get_contours,
    record_position,
    render_frame,
    suggest_contrast_limits,
)


def test_render_frame_composites_channels_additively():
    a = np.zeros((64, 96), np.float32)
    b = np.zeros((64, 96), np.float32)
    a[10:20, 10:20] = 1.0
    b[30:40, 30:40] = 1.0
    frame = render_frame(
        [a, b], contrast_limits=[(0, 1), (0, 1)], colors=["red", "green"]
    )
    assert frame.shape == (64, 96, 3) and frame.dtype == np.uint8
    assert frame[15, 15, 0] == 255 and frame[15, 15, 1] == 0  # red blob
    assert frame[35, 35, 1] == 255 and frame[35, 35, 0] == 0  # green blob
    assert frame[0, 0].max() == 0  # background black


def test_render_frame_scale_bar_and_text_pixels():
    img = np.zeros((100, 200), np.float32)
    frame = render_frame(
        [img],
        contrast_limits=[(0, 1)],
        pixel_size_um=0.5,
        scale_bar_um=20.0,  # 40 px bar
        text="t = 0h00m",
    )
    # Bottom-right quadrant must contain the white bar pixels
    br = frame[50:, 100:]
    assert (br == 255).any()
    # Top-left quadrant must contain text pixels
    tl = frame[:50, :100]
    assert (tl > 0).any()


def test_render_frame_without_pixel_size_raises():
    with pytest.raises(ValueError):
        render_frame([np.zeros((8, 8))], scale_bar_um=10.0)


def test_record_position_writes_gif_with_buffer_frames(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.random((4, 2, 6, 32, 48), np.float32)
    out = record_position(
        data,
        tmp_path / "movie.gif",
        loop_axes=[(0, (None, None), 1.0), (1, (1, 4), 0.5)],
        channels=[0, 1],
        fps=4,
        buffer_duration=0.5,
        pixel_size_um=0.25,
        scale_bar_um=4.0,
    )
    with Image.open(out) as im:
        # 4 time frames + 2 z frames survive; PIL merges the identical
        # buffer-hold repeats into longer durations on the held frames.
        assert im.n_frames == 6
        assert im.size == (48, 32)
        total_ms = 0
        for i in range(im.n_frames):
            im.seek(i)
            total_ms += im.info["duration"]
        # 10 rendered frames (incl. 4 buffer holds) at 4 fps = 2500 ms
        assert total_ms == 2500


def test_record_position_mp4_requires_ffmpeg(tmp_path, monkeypatch):
    import shutil as _shutil

    monkeypatch.setattr(_shutil, "which", lambda name: None)
    data = np.zeros((2, 1, 2, 16, 16), np.float32)
    with pytest.raises(RuntimeError, match="ffmpeg"):
        record_position(data, tmp_path / "movie.mp4", fps=2, default_duration=1.0)


def test_contours_and_contrast_still_work():
    labels = np.zeros((16, 16), np.int32)
    labels[4:12, 4:12] = 3
    contours = get_contours(labels, thickness=1)
    assert contours[4, 4] == 3 and contours[8, 8] == 0
    lo, hi = suggest_contrast_limits(np.arange(1000.0))
    assert lo < hi
