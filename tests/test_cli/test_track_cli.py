"""Tests of the native tracking engine, ``biahub track``, segment, virtual-stain."""

import numpy as np
import pandas as pd
import yaml
from click.testing import CliRunner
from scipy.ndimage import gaussian_filter

from biahub_tpu.cli.main import cli
from biahub_tpu.io.ngff import open_ome_zarr
from biahub_tpu.segment import threshold_instance_labels
from biahub_tpu.track import central_z_slice, fill_empty_frames, resolve_z_slice
from biahub_tpu.settings import ZSlicing
from biahub_tpu.tracking.engine import link_labels, track_from_foreground_contour


def _moving_blobs(T=5, size=64, n=3, seed=0):
    """(T, Y, X) stack of n gaussian blobs drifting with constant velocities."""
    rng = np.random.default_rng(seed)
    starts = rng.uniform(12, size - 20, (n, 2))
    velocities = rng.uniform(-2, 2, (n, 2))
    stack = np.zeros((T, size, size), np.float32)
    centers = np.zeros((T, n, 2))
    for t in range(T):
        frame = np.zeros((size, size), np.float32)
        for i in range(n):
            cy, cx = starts[i] + velocities[i] * t
            centers[t, i] = (cy, cx)
            frame[int(cy), int(cx)] = 100.0
        stack[t] = gaussian_filter(frame, 2.5)
    return stack, centers


def test_link_labels_follows_objects():
    stack, centers = _moving_blobs()
    labels = np.stack([(frame > 0.5).astype(np.int32) for frame in stack])
    from scipy import ndimage

    instance = np.stack([ndimage.label(f)[0] for f in labels])
    linked, tracks = link_labels(instance, scale=(1, 1), max_distance=10)
    # Three tracks, each spanning all timepoints
    counts = tracks.groupby("track_id")["t"].count()
    assert len(counts) == 3
    assert (counts == 5).all()
    # Every non-first node chains to its predecessor; root tracks keep
    # parent_track_id = -1 (ultrack convention)
    assert (tracks[tracks["t"] > 0]["parent_id"] != -1).all()
    assert (tracks["parent_track_id"] == -1).all()


def test_track_from_foreground_contour_splits_touching():
    # Two touching squares separated by a high-contour ridge
    fg = np.zeros((1, 32, 32), np.float32)
    fg[0, 8:24, 4:28] = 1.0
    contour = np.zeros_like(fg)
    contour[0, :, 15:17] = 1.0
    labels, tracks = track_from_foreground_contour(fg, contour, min_size=4)
    assert len(np.unique(labels[0])) - 1 == 2  # two instances


def test_zslicing_helpers():
    assert central_z_slice(8) == slice(2, 7)  # 5 planes centered on z=4
    assert central_z_slice(21) == slice(5, 16)  # max(3, 10)+1 = 11 planes
    s, n = resolve_z_slice(ZSlicing(method="all"), 10)
    assert s == slice(None) and n == 10
    s, n = resolve_z_slice(ZSlicing(method="range", range=(2, 6)), 10)
    assert s == slice(2, 6) and n == 4
    s, n = resolve_z_slice(ZSlicing(method="focus", window_size=4), 10)
    assert n == 4

    arr = np.arange(4)[:, None] * np.ones((1, 2))
    filled = fill_empty_frames(arr.copy(), [1])
    np.testing.assert_array_equal(filled[1], arr[0])


def test_threshold_instance_labels():
    img = np.zeros((32, 32), np.float32)
    img[4:12, 4:12] = 10.0
    img[20:28, 20:28] = 10.0
    labels = threshold_instance_labels(img, min_size=4)
    assert len(np.unique(labels)) - 1 == 2


def test_track_cli_foreground_contour(tmp_path):
    stack, centers = _moving_blobs(T=4, size=48)
    fg = (stack > 0.5).astype(np.float32)
    contour = 1.0 - stack / stack.max()

    plate_path = tmp_path / "vs.zarr"
    plate = open_ome_zarr(
        plate_path, layout="hcs", mode="w", channel_names=["nuclei_prediction"]
    )
    pos = plate.create_position("A", "1", "0")
    # (T, C, Z, Y, X) with Z=1
    pos.create_image("0", stack[:, None, None])

    config = {
        "target_channel": "nuclei_prediction",
        "output_mode": "2D",
        "z_slicing": {"method": "all"},
        "input_images": [
            {
                "path": None,
                "channels": {
                    "nuclei_prediction": [],
                },
            },
            {
                "path": None,
                "channels": {
                    "foreground": [
                        {
                            "function": "ultrack.imgproc.detect_foreground",
                            "input_channels": ["nuclei_prediction"],
                            "kwargs": {"sigma": 10.0, "threshold": 0.5},
                            "per_timepoint": True,
                        }
                    ],
                    "contour": [
                        {
                            "function": "ultrack.imgproc.robust_invert",
                            "input_channels": ["nuclei_prediction"],
                            "kwargs": {"sigma": 1.0},
                            "per_timepoint": True,
                        }
                    ],
                },
            },
        ],
        "tracking_config": {"linking_config": {"max_distance": 12}},
        "segmentation_method": "foreground_contour",
    }
    config_path = tmp_path / "track.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)
    output_path = tmp_path / "tracks.zarr"

    result = CliRunner().invoke(
        cli,
        [
            "track",
            "-i", str(plate_path / "A/1/0"),
            "-c", str(config_path),
            "-o", str(output_path),
        ],
    )
    assert result.exit_code == 0, result.output
    out = open_ome_zarr(output_path)["A/1/0"]
    assert out.channel_names == ["nuclei_prediction_labels"]
    labels = out.data[:, 0, 0]
    assert labels.max() >= 3  # three tracked objects
    csv_path = output_path / "A/1/0/tracks_A_1_0.csv"
    assert csv_path.exists()
    tracks = pd.read_csv(csv_path)
    counts = tracks.groupby("track_id")["t"].count()
    # At least two objects tracked across most of the movie (blobs that merge
    # mid-movie legitimately end one track and start another)
    assert (counts >= 3).sum() >= 2


def _double(window):
    return window * 2.0


def test_sliding_window_predict_blends():
    from biahub_tpu.virtual_stain import sliding_window_predict

    czyx = np.random.default_rng(0).random((1, 10, 8, 8)).astype(np.float32)
    out = sliding_window_predict(_double, czyx, window_z=4, step=2)
    np.testing.assert_allclose(out, czyx * 2.0, rtol=1e-4)


def test_focus_window_edge_shifts():
    """The focus window keeps its size and shifts (not clips) at z edges
    (reference: biahub/track.py:296-335)."""
    from biahub_tpu.track import _focus_window

    sl, size = _focus_window(center=2, window_size=8, z_shape=20, frac_below=0.5)
    assert (sl.start, sl.stop, size) == (0, 8, 8)  # shifted up from negative
    sl, size = _focus_window(center=19, window_size=8, z_shape=20, frac_below=0.5)
    assert (sl.start, sl.stop, size) == (12, 20, 8)  # shifted down from overflow
    sl, size = _focus_window(center=10, window_size=8, z_shape=20, frac_below=0.5)
    assert (sl.start, sl.stop, size) == (6, 14, 8)
    sl, size = _focus_window(center=3, window_size=50, z_shape=20, frac_below=0.5)
    assert (sl.start, sl.stop, size) == (0, 20, 20)  # window capped at z extent


def test_fill_empty_frames_from_csv(tmp_path):
    """Blank timepoints listed in the CSV are filled from neighbors
    (reference: biahub/track.py:135-254)."""
    import pandas as pd

    from biahub_tpu.track import fill_empty_frames, get_empty_frames_idx_from_csv

    # Reference CSV convention: one row per FOV, "t" holds a list literal
    df = pd.DataFrame({"FOV": ["A/1/0", "B/1/0"], "t": ["[1, 3]", 0]})
    assert get_empty_frames_idx_from_csv(df, "A/1/0") == [1, 3]
    assert get_empty_frames_idx_from_csv(df, "B/1/0") is None  # 0 = none blank
    assert get_empty_frames_idx_from_csv(df, "C/1/0") is None

    data = np.stack([np.full((4, 4), t + 1.0, np.float32) for t in range(5)])
    data[1] = 0
    data[3] = 0
    filled = fill_empty_frames(data.copy(), [1, 3])
    assert filled[1].mean() == 1.0  # nearest previous valid frame (t=0)
    assert filled[3].mean() == 3.0  # nearest previous valid frame (t=2)


def test_track_cli_init_only(tmp_path):
    stack, _ = _moving_blobs(T=3, size=32)
    plate_path = tmp_path / "vs.zarr"
    plate = open_ome_zarr(
        plate_path, layout="hcs", mode="w", channel_names=["nuclei_prediction"]
    )
    pos = plate.create_position("A", "1", "0")
    pos.create_image("0", stack[:, None, None])

    config = {
        "target_channel": "nuclei_prediction",
        "output_mode": "2D",
        "z_slicing": {"method": "all"},
        "input_images": [
            {"path": None, "channels": {"nuclei_prediction": []}},
            {
                "path": None,
                "channels": {
                    "foreground": [
                        {
                            "function": "ultrack.imgproc.detect_foreground",
                            "input_channels": ["nuclei_prediction"],
                            "kwargs": {"sigma": 10.0, "threshold": 0.5},
                            "per_timepoint": True,
                        }
                    ],
                    "contour": [
                        {
                            "function": "ultrack.imgproc.robust_invert",
                            "input_channels": ["nuclei_prediction"],
                            "kwargs": {"sigma": 1.0},
                            "per_timepoint": True,
                        }
                    ],
                },
            },
        ],
        "tracking_config": {"linking_config": {"max_distance": 12}},
        "segmentation_method": "foreground_contour",
    }
    config_path = tmp_path / "track.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)
    output_path = tmp_path / "tracks.zarr"

    result = CliRunner().invoke(
        cli,
        [
            "track", "--init",
            "-i", str(plate_path / "A/1/0"),
            "-c", str(config_path),
            "-o", str(output_path),
        ],
    )
    assert result.exit_code == 0, result.output
    assert "RESOURCES:" in result.output
    # init creates the output plate but runs no tracking
    out = open_ome_zarr(output_path)["A/1/0"]
    assert out.channel_names == ["nuclei_prediction_labels"]
    assert not (output_path / "A/1/0/tracks_A_1_0.csv").exists()


def test_link_labels_division():
    """A blob splitting in two: the parent track ends and both daughters
    start new tracks with parent_track_id set (ultrack convention)."""
    from biahub_tpu.tracking.engine import link_labels

    T, H, W = 4, 40, 40
    labels = np.zeros((T, H, W), np.int32)
    labels[0, 18:22, 18:22] = 1
    labels[1, 18:22, 18:22] = 1
    labels[2, 14:18, 14:18] = 1
    labels[2, 22:26, 22:26] = 2
    labels[3, 12:16, 12:16] = 1
    labels[3, 24:28, 24:28] = 2

    _, df = link_labels(labels, max_distance=15.0)
    parent = df[df.t == 0].track_id.iloc[0]
    assert df[df.t == 1].parent_track_id.iloc[0] == -1  # continuation is root
    daughters = df[df.t == 2]
    assert len(daughters) == 2
    assert set(daughters.parent_track_id) == {parent}
    assert all(daughters.track_id != parent)
    # Daughters continue as their own tracks, still flagged as children
    d3 = df[df.t == 3]
    assert set(d3.track_id) == set(daughters.track_id)
    assert set(d3.parent_track_id) == {parent}
