"""Every public name of the reference package resolves under `import biahub`.

Walks the reference checkout's module tree (top-level functions/classes of
non-vendored modules) and asserts each attribute exists on the aliased
biahub-tpu module — the executable form of PARITY.md's import-compatibility
claim. Skips when the reference checkout is absent (end-user environments).
"""

import ast
import importlib
import os
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference/biahub")

# Deliberate deltas: names that resolve but raise informative errors on call
# (no ANTs object model / no viscy parser in this build) are still required
# to EXIST; nothing is exempted from resolution.

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not mounted"
)


def _reference_public_api():
    cases = []
    for dirpath, dirs, files in os.walk(REFERENCE):
        dirs[:] = [d for d in dirs if d not in ("__pycache__", "vendor")]
        for fname in sorted(files):
            if not fname.endswith(".py") or fname.startswith("_"):
                continue
            path = Path(dirpath) / fname
            module = (
                str(path.relative_to(REFERENCE.parent))
                .replace("/", ".")
                .removesuffix(".py")
            )
            try:
                tree = ast.parse(path.read_text())
            except SyntaxError:  # pragma: no cover - reference syntax drift
                continue
            names = [
                node.name
                for node in tree.body
                if isinstance(node, (ast.FunctionDef, ast.ClassDef))
                and not node.name.startswith("_")
            ]
            if names:
                cases.append((module, names))
    return cases


@pytest.mark.parametrize("module,names", _reference_public_api())
def test_reference_module_names_resolve(module, names):
    mod = importlib.import_module(module)
    missing = [name for name in names if not hasattr(mod, name)]
    assert not missing, f"{module} missing reference names: {missing}"


def test_compat_shim_behaviors(tmp_path):
    """The re-exported/aliased helpers behave, not just resolve."""
    from biahub.cli.disk import get_dir_size_du
    from biahub.cli.parsing import sbatch_to_submitit
    from biahub.cli.utils import estimate_resources, settings_fingerprint
    from biahub.settings import DeskewSettings

    (tmp_path / "data.bin").write_bytes(b"x" * 4096)
    assert get_dir_size_du(tmp_path) >= 4096

    sbatch = tmp_path / "params.sbatch"
    sbatch.write_text("#SBATCH --mem-per-cpu=16G\n#LOCAL --timeout-min=5\n")
    overrides = sbatch_to_submitit(sbatch)
    assert overrides == {"slurm_mem_per_cpu": "16G", "timeout_min": 5}

    time_minutes, cpus, ram = estimate_resources((2, 1, 8, 16, 24))
    assert time_minutes >= 30 and cpus >= 1 and ram >= 4

    settings = DeskewSettings(
        pixel_size_um=0.116, ls_angle_deg=36.0, px_to_scan_ratio=0.38
    )
    token = settings_fingerprint(settings)
    assert len(token) == 16 and token == settings_fingerprint(settings)


def test_ants_shims_raise_informatively():
    import pytest as _pytest

    from biahub.register import convert_transform_to_ants

    with _pytest.raises(ImportError, match="4x4"):
        convert_transform_to_ants(None)
