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

__all__ = ["torch_state_dict_to_flax", "load_torch_checkpoint"]


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
