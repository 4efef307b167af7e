"""torch state-dict -> flax params converter for the UNeXt2 family.

Weight-layout rules (torch -> flax):

- Conv3d ``(O, I, kd, kh, kw)`` -> ``(kd, kh, kw, I, O)``
- Conv2d ``(O, I, kh, kw)`` -> ``(kh, kw, I, O)`` (covers depthwise convs:
  torch groups=dim stores ``(dim, 1, 7, 7)``, flax ``feature_group_count``
  expects ``(7, 7, 1, dim)`` — the same transpose)
- Linear ``(O, I)`` -> ``(I, O)``
- LayerNorm ``weight``/``bias`` -> ``scale``/``bias``
- GRN ``gamma``/``beta`` pass through

Key paths are shared verbatim between :class:`TorchUNeXt2` and the flax
:class:`~biahub_tpu.models.unext2.UNeXt2` (e.g.
``stage0_block1.pwconv1.weight`` -> ``stage0_block1/pwconv1/kernel``), so the
translation is purely mechanical. Lightning checkpoints nest the weights
under ``state_dict`` with a ``model.`` prefix; both are stripped.

Scope: ONLY the in-repo twin schema loads here. Production VisCy/cytoland
Lightning checkpoints nest weights under timm-style module paths
(``encoder.stages.N.blocks.M...``) that this converter does NOT translate;
they are detected up front and rejected with a pointer to the TorchScript
fallback (virtual_stain.py loads ``ckpt_path`` via ``torch.jit.load`` when no
``architecture`` is configured), which runs any exported VisCy model without
weight surgery.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

__all__ = [
    "torch_state_dict_to_flax",
    "load_torch_checkpoint",
    "torch_cpnet_to_flax",
    "cpnet_config_from_state_dict",
    "load_cpnet_checkpoint",
]


def _to_numpy(tensor: Any) -> np.ndarray:
    if hasattr(tensor, "detach"):
        tensor = tensor.detach().cpu().numpy()
    return np.asarray(tensor, dtype=np.float32)


def _reject_foreign_schema(keys) -> None:
    """Fail fast with an actionable error on non-twin naming schemes.

    VisCy/cytoland checkpoints wrap timm ConvNeXtV2 modules, so their keys
    look like ``model.encoder.stages.0.blocks.1.conv_dw.weight`` — a schema
    this converter has never been validated against. Loading it structurally
    (generic transpose rules) would produce a silently mismatched param tree,
    which is strictly worse than an error.
    """
    markers = (".stages.", ".blocks.", "conv_dw", "mlp.fc", "downsample_layers")
    hits = sorted(
        {k for k in keys for m in markers if m in k},
    )[:3]
    if hits:
        raise ValueError(
            "checkpoint uses a VisCy/timm module schema (e.g. "
            + ", ".join(repr(h) for h in hits)
            + "); only the in-repo twin schema (models/torch_twin.py) converts "
            "to flax. For production VisCy checkpoints, export the model with "
            "torch.jit.script/trace and point ckpt_path at the TorchScript "
            "file WITHOUT setting `architecture` in the settings YAML — "
            "virtual-stain then runs it via the TorchScript fallback."
        )


def torch_state_dict_to_flax(state_dict: Mapping[str, Any]) -> dict:
    """Convert a TorchUNeXt2-schema state dict to flax variables.

    Returns ``{"params": tree}`` ready for ``UNeXt2().apply``.
    """
    _reject_foreign_schema(state_dict.keys())
    params: dict = {}
    for key, value in state_dict.items():
        for prefix in ("state_dict.", "model."):
            if key.startswith(prefix):
                key = key[len(prefix) :]
        parts = key.split(".")
        leaf = parts[-1]
        w = _to_numpy(value)
        if leaf in ("gamma", "beta") and w.ndim > 1:
            # GRN params are sometimes stored broadcast-shaped (1, 1, 1, C)
            # (ConvNeXtV2 upstream convention); flax wants flat (C,).
            w = w.reshape(-1)
        if leaf == "weight":
            if w.ndim == 5:
                w = w.transpose(2, 3, 4, 1, 0)
                leaf = "kernel"
            elif w.ndim == 4:
                w = w.transpose(2, 3, 1, 0)
                leaf = "kernel"
            elif w.ndim == 2:
                w = w.T
                leaf = "kernel"
            elif w.ndim == 1:  # LayerNorm
                leaf = "scale"
            else:
                raise ValueError(f"unexpected weight rank for {key}: {w.shape}")
        elif leaf not in ("bias", "gamma", "beta"):
            raise ValueError(f"unrecognized parameter {key}")
        node = params
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[leaf] = w
    return {"params": params}


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch ``.pt``/``.ckpt`` file and return flax variables.

    Handles both bare state dicts and Lightning checkpoints (weights under
    the ``state_dict`` key with ``model.``-prefixed names).
    """
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(payload, dict) and "state_dict" in payload:
        payload = payload["state_dict"]
    return torch_state_dict_to_flax(payload)


# ---------------------------------------------------------------------------
# CPnet (cellpose schema) converter
# ---------------------------------------------------------------------------

_CPNET_MARKER = "downsample.down.res_down_0.conv.conv_0.0.weight"


def _is_cpnet_state_dict(keys) -> bool:
    return any(k.endswith(_CPNET_MARKER) for k in keys)


def torch_cpnet_to_flax(state_dict: "Mapping[str, Any]") -> dict:
    """Convert a cellpose-schema CPnet state dict to flax variables.

    The torch tree keeps residual-block convs inside a ``conv`` Sequential
    container and the stage lists inside ``down``/``up`` containers; the flax
    module (models/cpnet.py) flattens those three container levels, so the
    translation drops them: ``downsample.down.res_down_0.conv.conv_1.0.weight``
    -> ``downsample/res_down_0/conv_1/0/scale``. Everything else is the
    mechanical torch->flax layout rules shared with the UNeXt2 converter
    (Conv ``(O,I,kh,kw)`` -> ``(kh,kw,I,O)``, Linear transpose, BatchNorm
    ``weight/bias`` -> ``scale/bias`` in params and ``running_mean/var`` ->
    ``mean/var`` in batch_stats).

    Returns ``{"params": ..., "batch_stats": ...}`` ready for
    ``CPnet().apply``.
    """
    import re

    params: dict = {}
    batch_stats: dict = {}
    for key, value in state_dict.items():
        for prefix in ("state_dict.", "model.", "net."):
            if key.startswith(prefix):
                key = key[len(prefix) :]
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        path = []
        for i, part in enumerate(parts[:-1]):
            nxt = parts[i + 1] if i + 1 < len(parts) - 1 else ""
            if part == "down" and i > 0 and parts[i - 1] == "downsample":
                continue
            if part == "up" and i > 0 and parts[i - 1] == "upsample":
                continue
            if part == "conv" and re.fullmatch(r"conv_\d", nxt):
                continue
            path.append(part)
        w = _to_numpy(value)
        target = params
        if leaf == "running_mean":
            target, leaf = batch_stats, "mean"
        elif leaf == "running_var":
            target, leaf = batch_stats, "var"
        elif leaf == "weight":
            if w.ndim == 4:
                w = w.transpose(2, 3, 1, 0)
                leaf = "kernel"
            elif w.ndim == 2:
                w = w.T
                leaf = "kernel"
            elif w.ndim == 1:  # BatchNorm scale
                leaf = "scale"
            else:
                raise ValueError(f"unexpected weight rank for {key}: {w.shape}")
        elif leaf != "bias":
            raise ValueError(f"unrecognized CPnet parameter {key}")
        node = target
        for part in path:
            node = node.setdefault(part, {})
        node[leaf] = w
    return {"params": params, "batch_stats": batch_stats}


def cpnet_config_from_state_dict(state_dict: "Mapping[str, Any]") -> dict:
    """Infer ``(nbase, nout, sz)`` CPnet hyper-parameters from a state dict."""
    import re

    def shape(key):
        return tuple(_to_numpy(state_dict[key]).shape)

    def find(suffix):
        for k in state_dict:
            if k.endswith(suffix):
                return k
        raise KeyError(suffix)

    n_down = len(
        {
            m.group(1)
            for k in state_dict
            for m in [re.search(r"res_down_(\d+)\.", k)]
            if m
        }
    )
    nbase = []
    for n in range(n_down):
        o, i, sz, _ = shape(find(f"res_down_{n}.conv.conv_0.2.weight"))
        if n == 0:
            nbase.append(i)
        nbase.append(o)
    nout = shape(find("output.2.weight"))[0]
    return {"nbase": tuple(nbase), "nout": int(nout), "sz": int(sz)}


def load_cpnet_checkpoint(path: str) -> tuple[dict, dict]:
    """Load a cellpose-schema CPnet ``.pt`` file -> (flax variables, config).

    Accepts both bare state dicts (what ``cellpose``'s ``CPnet.save_model``
    writes) and dict payloads nesting one under ``state_dict``/``model``.
    """
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(payload, dict) and "state_dict" in payload:
        payload = payload["state_dict"]
    if isinstance(payload, dict) and "model" in payload and not _is_cpnet_state_dict(payload):
        payload = payload["model"]
    if not _is_cpnet_state_dict(payload):
        raise ValueError(
            f"{path} is not a cellpose-schema CPnet state dict (missing "
            f"'{_CPNET_MARKER}'); native TPU segmentation needs a CPnet "
            "checkpoint (e.g. saved by the cellpose package). Built-in "
            "'threshold_otsu' runs without any checkpoint."
        )
    return torch_cpnet_to_flax(payload), cpnet_config_from_state_dict(payload)
