"""The RESOURCES contract between `--init` runs and the Nextflow modules.

The pipeline modules size every task from the 'RESOURCES:{json}' line the CLI
prints in --init mode (nextflow/modules/common.nf::parse_resources; reference
coupling: nextflow/modules/common.nf:6-17 in the upstream repo). This test
re-implements parse_resources with the module's exact semantics and runs it
on real --init output, so a drift on either side fails here.
"""

import json
import re
from pathlib import Path

import numpy as np
import pytest
import yaml
from click.testing import CliRunner

from biahub_tpu.cli.main import cli
from biahub_tpu.io.ngff import open_ome_zarr

NEXTFLOW_DIR = Path(__file__).parents[1] / "nextflow"


def parse_resources(stdout_text: str, prefix: str = "RESOURCES:") -> dict:
    """Python mirror of nextflow/modules/common.nf::parse_resources:
    last line starting with the prefix, JSON payload, integer fields."""
    matching = [
        line for line in stdout_text.strip().splitlines() if line.startswith(prefix)
    ]
    if not matching:
        raise ValueError(f"Expected a '{prefix}' line in command output")
    payload = matching[-1].replace(prefix, "").strip()
    res = json.loads(payload)
    return {
        "cpus": int(res["cpus"]),
        "mem_gb": int(res["mem_gb"]),
        "time_minutes": int(res["time_minutes"]),
    }


@pytest.fixture()
def tiny_plate(tmp_path):
    rng = np.random.default_rng(0)
    plate_path = tmp_path / "plate.zarr"
    plate = open_ome_zarr(plate_path, layout="hcs", mode="w", channel_names=["GFP"])
    plate.create_position("A", "1", "0").create_image(
        "0", rng.random((2, 1, 8, 16, 24), np.float32)
    )
    return plate_path


@pytest.mark.parametrize(
    "verb,config",
    [
        (
            "deskew",
            {"pixel_size_um": 0.116, "ls_angle_deg": 36.0, "px_to_scan_ratio": 0.38},
        ),
        ("flat-field", {"channel_names": ["GFP"]}),
    ],
)
def test_init_output_parses_under_module_semantics(tiny_plate, tmp_path, verb, config):
    config_path = tmp_path / f"{verb}.yml"
    with open(config_path, "w") as f:
        yaml.dump(config, f)
    result = CliRunner().invoke(
        cli,
        [
            verb,
            "-i",
            str(tiny_plate / "A" / "1" / "0"),
            "-c",
            str(config_path),
            "-o",
            str(tmp_path / f"{verb}_out.zarr"),
            "--init",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    res = parse_resources(result.output)
    assert res["cpus"] >= 1
    assert res["mem_gb"] >= 1
    assert res["time_minutes"] >= 1


def test_common_module_semantics_are_pinned():
    """If common.nf's parse_resources changes, this must change with it."""
    text = (NEXTFLOW_DIR / "modules" / "common.nf").read_text()
    assert "prefix = 'RESOURCES:'" in text
    assert "matching.last()" in text  # last matching line wins
    assert "JsonSlurper" in text  # JSON payload, not positional fields
    for key in ("res.cpus as int", "res.mem_gb as int", "res.time_minutes as int"):
        assert key in text


def test_every_step_module_exists_and_uses_the_contract():
    """Pipeline layout mirrors the reference's per-step modules and every
    step sizes itself through parse_resources + retries via --resume."""
    modules = NEXTFLOW_DIR / "modules"
    steps = {
        "flat_field": "flat-field",
        "deskew": "deskew",
        "reconstruct": "reconstruct",
        "virtual_stain": "virtual-stain",
        "tracking": "track",
    }
    pipeline = (NEXTFLOW_DIR / "biahub-tpu.nf").read_text()
    for module, verb in steps.items():
        text = (modules / f"{module}.nf").read_text()
        assert "parse_resources" in text, module
        assert f"--init" in text and f"{verb} --init" in text, module
        assert "--resume" in text, module  # preemption retry re-enters cleanly
        assert f"{module}_wf" in pipeline, module
    assembly = (modules / "assembly.nf").read_text()
    assert "concatenate" in assembly and "assemble_wf" in pipeline
    config = (NEXTFLOW_DIR / "nextflow.config").read_text()
    assert re.search(r"130\.\.145.*retry", config)  # preemption exit codes
