"""The gated cellpose/ultrack integrations, exercised via mock modules.

cellpose and ultrack are optional heavyweight dependencies that are absent in
CI, which previously left the argument-mapping code dead until someone
installed them on a pod (round-2 verdict). These tests install fake modules
with the real packages' call signatures and assert every gated call site
passes the arguments the reference passes (reference:
biahub/track.py:294-304,406-477, biahub/settings.py:677-730).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest


@pytest.fixture
def fake_cellpose(monkeypatch):
    """A cellpose.models stand-in recording constructor and eval calls."""
    calls = {"init": [], "eval": []}

    class CellposeModel:
        def __init__(self, model_type=None, gpu=False):
            calls["init"].append({"model_type": model_type, "gpu": gpu})

        # Signature mirrors cellpose.models.CellposeModel.eval closely enough
        # for the settings validator's co_varnames introspection.
        def eval(
            self,
            x,
            batch_size=8,
            channels=None,
            channel_axis=None,
            z_axis=None,
            diameter=None,
            do_3D=False,
            flow_threshold=0.4,
            cellprob_threshold=0.0,
            min_size=15,
        ):
            kwargs = {
                "channels": channels,
                "channel_axis": channel_axis,
                "z_axis": z_axis,
                "diameter": diameter,
                "do_3D": do_3D,
                "flow_threshold": flow_threshold,
                "cellprob_threshold": cellprob_threshold,
                "min_size": min_size,
            }
            calls["eval"].append({"x_shape": np.asarray(x).shape, **kwargs})
            mask = (np.asarray(x) > 0.5).astype(np.int32)
            return mask, None, None

    models_mod = types.ModuleType("cellpose.models")
    models_mod.CellposeModel = CellposeModel
    cellpose_mod = types.ModuleType("cellpose")
    cellpose_mod.models = models_mod
    monkeypatch.setitem(sys.modules, "cellpose", cellpose_mod)
    monkeypatch.setitem(sys.modules, "cellpose.models", models_mod)
    return calls


def test_track_cellpose_segmentation_argument_mapping(fake_cellpose):
    """track.cellpose_segmentation maps CellposeConfig fields onto the
    constructor and per-frame eval calls (reference: biahub/track.py:294-304)."""
    from biahub_tpu.settings import CellposeConfig
    from biahub_tpu.track import cellpose_segmentation

    cfg = CellposeConfig(
        input_channel="Phase3D",
        model_type="cyto3",
        diameter=31.5,
        cellprob_threshold=-1.0,
        flow_threshold=0.6,
        min_size=12,
        gpu=False,
    )
    data = {"Phase3D": np.random.default_rng(0).random((3, 16, 16)).astype(np.float32)}
    labels = cellpose_segmentation(data, cfg)

    assert labels.shape == (3, 16, 16)
    assert fake_cellpose["init"] == [{"model_type": "cyto3", "gpu": False}]
    assert len(fake_cellpose["eval"]) == 3  # one call per frame
    for call in fake_cellpose["eval"]:
        assert call["x_shape"] == (16, 16)
        assert call["diameter"] == 31.5
        assert call["channels"] == [0, 0]
        assert call["cellprob_threshold"] == -1.0
        assert call["flow_threshold"] == 0.6
        assert call["min_size"] == 12


def test_segment_data_cellpose_argument_mapping(fake_cellpose):
    """segment.segment_data routes non-otsu models through cellpose with
    channel_axis/z_axis and the configured eval_args."""
    from biahub_tpu.segment import segment_data
    from biahub_tpu.settings import SegmentationModel

    model = SegmentationModel(
        path_to_model="cyto3",
        eval_args={"diameter": 20, "do_3D": True, "min_size": 9},
    )
    czyx = np.random.default_rng(1).random((1, 4, 16, 16)).astype(np.float32)
    out = segment_data(czyx, {"nuc": model}, gpu=False)

    assert out.shape == (1, 1, 4, 16, 16)
    assert fake_cellpose["init"] == [{"model_type": "cyto3", "gpu": False}]
    (call,) = fake_cellpose["eval"]
    assert call["x_shape"] == (1, 4, 16, 16)
    assert call["channel_axis"] == 0
    assert call["z_axis"] == 1
    assert call["diameter"] == 20
    assert call["do_3D"] is True
    assert call["min_size"] == 9


def test_settings_eval_args_validated_against_cellpose_signature(fake_cellpose):
    """With cellpose importable, SegmentationModel rejects eval_args not in
    CellposeModel.eval's signature (reference: biahub/settings.py:677-730)."""
    from biahub_tpu.settings import SegmentationModel

    SegmentationModel(path_to_model="cyto3", eval_args={"diameter": 20})
    with pytest.raises(ValueError, match="Invalid eval arguments.*not_an_arg"):
        SegmentationModel(path_to_model="cyto3", eval_args={"not_an_arg": 1})


def test_get_valid_eval_args_with_mock(fake_cellpose):
    from biahub_tpu.settings import get_valid_eval_args

    valid = get_valid_eval_args()
    assert "diameter" in valid and "flow_threshold" in valid


def test_run_ultrack_passes_solver_arguments(monkeypatch):
    """run_ultrack hands foreground/contours/scale straight to the ultrack
    solver when installed (reference: biahub/track.py:406-477)."""
    recorded = {}

    def fake_track(config, foreground=None, contours=None, scale=None):
        recorded["config"] = config
        recorded["foreground_shape"] = np.asarray(foreground).shape
        recorded["contours_shape"] = np.asarray(contours).shape
        recorded["scale"] = scale
        return "tracks-df", "graph"

    ultrack_mod = types.ModuleType("ultrack")
    ultrack_mod.track = fake_track
    monkeypatch.setitem(sys.modules, "ultrack", ultrack_mod)

    from biahub_tpu.track import run_ultrack

    fg = np.zeros((2, 4, 8, 8), np.float32)
    ct = np.ones((2, 4, 8, 8), np.float32)
    result = run_ultrack({"linking_config": {"max_distance": 30}}, fg, ct, (1, 1, 1))
    assert result == ("tracks-df", "graph")
    assert recorded["config"] == {"linking_config": {"max_distance": 30}}
    assert recorded["foreground_shape"] == (2, 4, 8, 8)
    assert recorded["contours_shape"] == (2, 4, 8, 8)
    assert recorded["scale"] == (1, 1, 1)


def test_run_ultrack_native_fallback_without_package():
    """Without ultrack, the native engine takes over and honors
    linking_config.max_distance."""
    from biahub_tpu.track import run_ultrack

    fg = np.zeros((2, 16, 16), np.float32)
    fg[:, 4:8, 4:8] = 1.0
    ct = 1.0 - fg
    tracks_df, labels = run_ultrack(
        {"linking_config": {"max_distance": 5.0}}, fg, ct, (1.0, 1.0)
    )
    assert labels.shape == fg.shape
    assert tracks_df.track_id.nunique() == 1
