"""CPnet inference engine: CZYX volume -> instance label ZYX volume.

Re-implements the parts of ``cellpose.models.CellposeModel.eval`` the
reference relies on (reference: biahub/segment.py:92-99) on the TPU path:

1. channel assembly (cellpose ``channels=[chan, chan2]`` semantics, 1-based
   into the C axis; 0 = grayscale mean / zero second channel),
2. per-channel 1-99 percentile normalisation,
3. diameter rescaling (``diam_mean / diameter``),
4. padding to a multiple of 16 (4 pooling levels), batched z-slice inference
   through the flax CPnet — one jitted conv stack riding the MXU,
5. flow resize back to native resolution and flow-dynamics mask
   reconstruction (segmentation/flows.py),
6. optional IoU stitching of per-slice 2D labels into 3D objects
   (cellpose ``stitch_threshold`` semantics).

Checkpoints: any cellpose-schema CPnet state dict (``.pt``) converts via
models/convert.py::load_cpnet_checkpoint; the in-repo torch twin
(models/torch_twin.py::TorchCPnet) writes the same schema and is the tested
ground truth. Pretrained built-ins ('cyto', 'nuclei', ...) are download-backed
in cellpose and therefore still require that package — the error message in
segment.py routes users accordingly.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from biahub_tpu.segmentation.flows import compute_masks

__all__ = ["cpnet_segment_czyx", "stitch_labels_3d"]


@lru_cache(maxsize=4)
def _load_engine(checkpoint_path: str):
    from biahub_tpu.models.convert import load_cpnet_checkpoint
    from biahub_tpu.models.cpnet import CPnet

    variables, config = load_cpnet_checkpoint(checkpoint_path)
    net = CPnet(**config)
    apply = jax.jit(lambda x: net.apply(variables, x))
    return apply, config


def _assemble_channels(
    czyx: np.ndarray, channels: tuple[int, int], nchan: int
) -> np.ndarray:
    """(C, Z, Y, X) -> (Z, nchan, Y, X) under cellpose channel semantics."""
    c1, c2 = channels
    chan1 = czyx.mean(axis=0) if c1 == 0 else czyx[c1 - 1]
    planes = [chan1]
    if nchan > 1:
        chan2 = np.zeros_like(chan1) if c2 == 0 else czyx[c2 - 1]
        planes.append(chan2)
    while len(planes) < nchan:
        planes.append(np.zeros_like(chan1))
    return np.stack(planes, axis=1).astype(np.float32)  # (Z, nchan, Y, X)


def _normalize(x: np.ndarray) -> np.ndarray:
    """Per-channel 1-99 percentile normalisation (cellpose default)."""
    out = np.empty_like(x)
    for c in range(x.shape[1]):
        lo, hi = np.percentile(x[:, c], [1.0, 99.0])
        out[:, c] = (x[:, c] - lo) / max(hi - lo, 1e-6)
    return out


def stitch_labels_3d(labels_zyx: np.ndarray, stitch_threshold: float) -> np.ndarray:
    """Chain per-slice 2D labels into 3D objects by IoU >= threshold."""
    out = np.asarray(labels_zyx).astype(np.uint32).copy()
    next_label = int(out[0].max()) + 1
    for z in range(1, out.shape[0]):
        prev, cur = out[z - 1], out[z]
        remap = {}
        for lab in np.unique(cur):
            if lab == 0:
                continue
            region = cur == lab
            overlap = prev[region]
            overlap = overlap[overlap > 0]
            if len(overlap):
                cand, counts = np.unique(overlap, return_counts=True)
                best = cand[np.argmax(counts)]
                inter = counts.max()
                union = region.sum() + (prev == best).sum() - inter
                if union > 0 and inter / union >= stitch_threshold:
                    remap[int(lab)] = int(best)
                    continue
            remap[int(lab)] = next_label
            next_label += 1
        new = np.zeros_like(cur)
        for lab, tgt in remap.items():
            new[cur == lab] = tgt
        out[z] = new
    return out


def cpnet_segment_czyx(
    czyx: np.ndarray,
    checkpoint_path: str,
    channels: tuple[int, int] = (0, 0),
    diameter: float | None = None,
    diam_mean: float = 30.0,
    cellprob_threshold: float = 0.0,
    flow_threshold: float | None = 0.4,
    min_size: int = 15,
    niter: int = 200,
    normalize: bool = True,
    stitch_threshold: float = 0.0,
) -> np.ndarray:
    """Segment a CZYX volume slice-by-slice with a CPnet checkpoint."""
    czyx = np.asarray(czyx, np.float32)
    apply, config = _load_engine(str(checkpoint_path))
    nchan = int(config["nbase"][0])
    x = _assemble_channels(czyx, tuple(channels), nchan)  # (Z, nchan, Y, X)
    if normalize:
        x = _normalize(x)
    Z, _, Y, X = x.shape
    rescale = 1.0 if not diameter else float(diam_mean) / float(diameter)
    ys, xs = max(1, int(round(Y * rescale))), max(1, int(round(X * rescale)))
    if (ys, xs) != (Y, X):
        x = np.asarray(
            jax.image.resize(jnp.asarray(x), (Z, nchan, ys, xs), method="linear")
        )
    pad_y, pad_x = (-ys) % 16, (-xs) % 16
    x = np.pad(x, ((0, 0), (0, 0), (0, pad_y), (0, pad_x)), mode="edge")
    out, _style = apply(jnp.asarray(x))
    out = np.asarray(out)[:, :, :ys, :xs]  # (Z, 3, ys, xs)
    if (ys, xs) != (Y, X):
        out = np.asarray(
            jax.image.resize(jnp.asarray(out), (Z, 3, Y, X), method="linear")
        )
    labels = np.stack(
        [
            compute_masks(
                out[z, :2],
                out[z, 2],
                cellprob_threshold=cellprob_threshold,
                flow_threshold=flow_threshold,
                min_size=min_size,
                niter=niter,
            )
            for z in range(Z)
        ]
    )
    if stitch_threshold > 0 and Z > 1:
        labels = stitch_labels_3d(labels, stitch_threshold)
    return labels.astype(np.uint32)
