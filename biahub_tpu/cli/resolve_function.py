"""Allow-listed string→callable resolution for YAML-configured processing.

Mirrors the reference (reference: biahub/cli/resolve_function.py:16-64): only
functions from the allow list (numpy, optional ultrack.imgproc, registered
custom functions) may be named in configs — arbitrary import strings are
rejected.
"""

from __future__ import annotations

import numpy as np

VALID_MODULES = {"np": np}

try:  # pragma: no cover - optional heavyweight dependency
    import ultrack  # type: ignore

    VALID_MODULES["ultrack.imgproc"] = ultrack.imgproc
except ImportError:
    pass

FUNCTION_MAP = {
    f"{module_name}.{func}": getattr(module, func)
    for module_name, module in VALID_MODULES.items()
    for func in dir(module)
    if callable(getattr(module, func)) and not func.startswith("__")
}


def resolve_function(function_name: str, custom_functions: dict | None = None):
    """Resolve an allow-listed function name to its callable."""
    if custom_functions is not None:
        FUNCTION_MAP.update(custom_functions)
    if function_name not in FUNCTION_MAP:
        raise ValueError(
            f"Invalid function '{function_name}'. Allowed functions: "
            f"{list(FUNCTION_MAP.keys())}"
        )
    return FUNCTION_MAP[function_name]
