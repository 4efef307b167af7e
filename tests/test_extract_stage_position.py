"""Micromanager stage-position metadata parsing across both dialects.

Mirrors the reference's parameterized cases (reference:
tests/test_extract_stage_position.py) so the DevicePositions vs direct-key
schema variants stay pinned.
"""

from types import SimpleNamespace

import pytest

from biahub_tpu.estimate_stitch import extract_stage_position


def _plate(stage_positions):
    return SimpleNamespace(zattrs={"Summary": {"StagePositions": stage_positions}})


@pytest.mark.parametrize(
    "entry, expected",
    [
        # DevicePositions: z sums every non-XY device's first coordinate
        (
            {
                "Label": "Pos1",
                "DefaultXYStage": "XYStage",
                "DefaultZStage": "ZStage",
                "DevicePositions": [
                    {"Device": "XYStage", "Position_um": [100.0, 200.0]},
                    {"Device": "ZStage1", "Position_um": [50.0]},
                    {"Device": "ZStage2", "Position_um": [25.0]},
                ],
            },
            (75.0, 200.0, 100.0),
        ),
        # direct stage keys
        (
            {
                "Label": "Pos2",
                "DefaultXYStage": "XYStage",
                "DefaultZStage": "ZStage",
                "XYStage": [150.0, 250.0],
                "ZStage": 100.0,
            },
            (100.0, 250.0, 150.0),
        ),
        # missing XY keys: z still read
        (
            {"Label": "Pos3", "DefaultZStage": "ZStage", "ZStage": 75.0},
            (75.0, 0.0, 0.0),
        ),
        # missing Z keys: xy still read
        (
            {
                "Label": "Pos4",
                "DefaultXYStage": "XYStage",
                "XYStage": [300.0, 400.0],
            },
            (0.0, 400.0, 300.0),
        ),
        # no position data at all
        ({"Label": "Pos5"}, (0.0, 0.0, 0.0)),
        # DevicePositions without the XY device: only z accumulates
        (
            {
                "Label": "Pos6",
                "DefaultXYStage": "XYStage",
                "DefaultZStage": "ZStage",
                "DevicePositions": [{"Device": "ZStage1", "Position_um": [30.0]}],
            },
            (30.0, 0.0, 0.0),
        ),
    ],
)
def test_extract_stage_position_dialects(entry, expected):
    assert extract_stage_position(_plate([entry]), entry["Label"]) == expected


def test_extract_stage_position_unknown_label_defaults_to_zero():
    plate = _plate([{"Label": "Pos1", "DefaultZStage": "Z", "Z": 5.0}])
    assert extract_stage_position(plate, "nope") == (0.0, 0.0, 0.0)


def test_extract_stage_position_last_entry_wins():
    """Re-acquisitions append entries with the same label; the most recent
    coordinates are the valid ones."""
    plate = _plate(
        [
            {"Label": "PosA", "DefaultZStage": "Z", "Z": 5.0},
            {"Label": "PosA", "DefaultZStage": "Z", "Z": 9.0},
        ]
    )
    assert extract_stage_position(plate, "PosA") == (9.0, 0.0, 0.0)
