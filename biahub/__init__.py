"""Drop-in import compatibility: ``import biahub`` resolves to biahub-tpu.

Scripts written against the reference package keep working unmodified:
``from biahub.deskew import get_deskewed_data_shape`` or
``import biahub.core.transform`` import the corresponding biahub_tpu module
(renamed homes are mapped explicitly below). The CLI entry point is shared,
so ``biahub <verb>`` behaves identically either way.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.util
import sys

__version__ = importlib.import_module("biahub_tpu").__version__

# Reference module path -> biahub-tpu home, for modules that moved
_MODULE_MAP = {
    "core": "biahub_tpu.transforms",
    "core.transform": "biahub_tpu.transforms.transform",
    "core.graph_matching": "biahub_tpu.transforms.graph_matching",
    "registration.ants": "biahub_tpu.registration.intensity",
    "cli.option_eat_all": "biahub_tpu.cli.parsing",
    "vendor": "biahub_tpu.stitching",
    "vendor.stitch": "biahub_tpu.stitching.tile",
    "vendor.napari_psf_analysis": "biahub_tpu.psf.analysis",
}


def _target_name(sub: str) -> str:
    return _MODULE_MAP.get(sub, f"biahub_tpu.{sub}")


class _AliasLoader(importlib.abc.Loader):
    def __init__(self, target: str):
        self._target = target

    def create_module(self, spec):
        return importlib.import_module(self._target)

    def exec_module(self, module):
        pass


class _AliasFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        if not fullname.startswith("biahub."):
            return None
        name = _target_name(fullname[len("biahub."):])
        try:
            if importlib.util.find_spec(name) is None:
                return None
        except ModuleNotFoundError:
            return None
        return importlib.util.spec_from_loader(fullname, _AliasLoader(name))


if not any(isinstance(f, _AliasFinder) for f in sys.meta_path):
    sys.meta_path.append(_AliasFinder())


def __getattr__(name: str):
    # `biahub.deskew` attribute access without an explicit submodule import
    try:
        return importlib.import_module(f"biahub.{name}")
    except ModuleNotFoundError as exc:
        raise AttributeError(name) from exc
