"""The driver contract: `python bench.py` prints ONE parseable JSON line.

Runs the real script on tiny shapes with the cpu backend pinned so the
headline metric name, the JSON shape, and the script's end-to-end health are
regression-tested without TPU hardware.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parents[1]


def test_bench_headline_json_contract():
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("BIAHUB_TPU_FORCE_PALLAS", None)
    result = subprocess.run(
        [
            sys.executable,
            "-c",
            # bench.py honors JAX_PLATFORMS via jax.config (the axon plugin
            # ignores the env var alone).
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "import sys; sys.argv = ['bench.py', '--z', '8', '--y', '16',"
            " '--x', '32', '--iters', '1', '--headline-only'];"
            "import runpy; runpy.run_path('bench.py', run_name='__main__')",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        # Generous: this machine shows intermittent multi-minute load spikes
        # that stretch even the tiny-shape run.
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    json_lines = [
        line for line in result.stdout.splitlines() if line.startswith("{")
    ]
    assert len(json_lines) == 1, result.stdout
    payload = json.loads(json_lines[0])
    # The driver records these fields; the metric name must stay stable.
    assert payload["metric"] == "deconvolve+deskew voxels/sec/chip"
    assert payload["unit"] == "voxel/s"
    assert payload["value"] > 0
    assert payload["vs_baseline"] > 0
    detail = payload["detail"]
    assert detail["fov_zyx"] == [8, 16, 32]
    assert detail["sec_per_volume"] > 0
    assert detail["e2e_chain_sec_per_volume"] > 0
    assert detail["deconvolve_ms"] > 0
