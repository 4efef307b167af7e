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
