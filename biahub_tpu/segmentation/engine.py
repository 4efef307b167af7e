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
    from biahub_tpu.virtual_stain import _jit_model_apply

    variables, config = load_cpnet_checkpoint(checkpoint_path)
    net = CPnet(**config)
    # Honors BIAHUB_TPU_MODEL_PRECISION like every other flax model path.
    jitted = _jit_model_apply(net)
    apply = lambda x: jitted(variables, x)  # noqa: E731
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
    """Per-plane per-channel 1-99 percentile normalisation.

    cellpose's eval path normalises each 2D plane independently (its
    ``normalize_img`` runs per image in the slice loop), so a stack with
    depth attenuation keeps deep planes at full contrast instead of being
    squashed by bright shallow planes' pooled percentiles. The flip side —
    shared with cellpose itself — is that signal-free planes get their
    noise stretched to full contrast; cellprob_threshold is the defense.
    """
    lo = np.percentile(x, 1.0, axis=(2, 3), keepdims=True)
    hi = np.percentile(x, 99.0, axis=(2, 3), keepdims=True)
    return (x - lo) / np.maximum(hi - lo, 1e-6)


def stitch_labels_3d(labels_zyx: np.ndarray, stitch_threshold: float) -> np.ndarray:
    """Chain per-slice 2D labels into 3D objects by IoU >= threshold.

    One pass per slice pair: the (prev, cur) joint histogram comes from a
    single ``bincount`` over combined indices and the remap is a LUT gather,
    so cost is O(H*W + n_labels) per slice instead of per-label image scans.
    """
    out = np.asarray(labels_zyx).astype(np.uint32).copy()
    next_label = int(out[0].max()) + 1
    for z in range(1, out.shape[0]):
        prev, cur = out[z - 1], out[z]
        n_cur = int(cur.max())
        if n_cur == 0:
            continue
        cur_sizes = np.bincount(cur.ravel(), minlength=n_cur + 1)
        prev_sizes = np.bincount(prev.ravel())
        # Joint histogram restricted to overlapping foreground pixels.
        # Densify prev's (global, ever-growing) label ids first so the
        # combined index stays O(n_prev_local * n_cur), not O(max_label).
        both = (cur > 0) & (prev > 0)
        prev_local, prev_dense = np.unique(prev[both], return_inverse=True)
        pair = prev_dense.astype(np.int64) * (n_cur + 1) + cur[both]
        counts = np.bincount(pair, minlength=len(prev_local) * (n_cur + 1))
        inter = np.zeros(n_cur + 1, np.int64)
        best_prev = np.zeros(n_cur + 1, np.int64)
        if counts.size:
            nz = np.nonzero(counts)[0]
            prev_ids = prev_local[nz // (n_cur + 1)]
            cur_ids = nz % (n_cur + 1)
            order = np.argsort(counts[nz], kind="stable")
            # Last write wins -> the argmax-overlap previous label per cur.
            inter[cur_ids[order]] = counts[nz][order]
            best_prev[cur_ids[order]] = prev_ids[order]
        union = cur_sizes + np.where(
            best_prev > 0, prev_sizes[best_prev], 0
        ) - inter
        iou = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = (best_prev > 0) & (iou >= stitch_threshold)
        lut = np.zeros(n_cur + 1, dtype=out.dtype)
        lut[keep] = best_prev[keep]
        fresh = np.nonzero(~keep)[0]
        fresh = fresh[fresh > 0]
        lut[fresh] = np.arange(next_label, next_label + len(fresh), dtype=out.dtype)
        next_label += len(fresh)
        out[z] = lut[cur]
    return out


def _apply_z_chunked(apply, x: np.ndarray, base_channels: int) -> np.ndarray:
    """Run the network over Z in device-budgeted, shape-stable chunks.

    Sizing follows the repo-wide ``BIAHUB_TPU_MAX_BATCH_BYTES`` convention:
    the per-slice footprint is estimated from the level-0 feature maps (the
    dominant activations — ~8 resident ``base_channels`` f32 planes through
    the down/up paths), so huge FOVs run slab-by-slab instead of OOMing one
    giant apply. Every chunk is edge-padded to one fixed size so the network
    compiles exactly once per FOV shape.
    """
    import os

    from biahub_tpu.runtime.executor import DEFAULT_MAX_BATCH_BYTES

    Z = x.shape[0]
    budget = int(os.environ.get("BIAHUB_TPU_MAX_BATCH_BYTES", DEFAULT_MAX_BATCH_BYTES))
    per_slice = x.shape[2] * x.shape[3] * 4 * max(base_channels, 1) * 8
    z_chunk = int(min(Z, max(1, budget // max(per_slice, 1))))
    outs = []
    for z0 in range(0, Z, z_chunk):
        chunk = x[z0 : z0 + z_chunk]
        pad_z = z_chunk - chunk.shape[0]
        if pad_z:
            chunk = np.pad(chunk, ((0, pad_z), (0, 0), (0, 0), (0, 0)), mode="edge")
        y, _style = apply(jnp.asarray(chunk))
        outs.append(np.asarray(y)[: z_chunk - pad_z])
    return np.concatenate(outs, axis=0)


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
    out = _apply_z_chunked(apply, x, int(config["nbase"][1]))
    out = out[:, :, :ys, :xs]  # (Z, 3, ys, xs)
    if (ys, xs) != (Y, X):
        out = np.asarray(
            jax.image.resize(jnp.asarray(out), (Z, 3, Y, X), method="linear")
        )
    # Flows were computed at model resolution and resized back to native
    # pixels without magnitude rescaling, so each Euler step covers ~rescale
    # pixels of native distance; scale the step count to compensate
    # (cellpose's resample path uses niter = 200 / rescale the same way).
    eff_niter = int(np.ceil(niter / rescale)) if rescale < 1.0 else int(niter)
    labels = np.stack(
        [
            compute_masks(
                out[z, :2],
                out[z, 2],
                cellprob_threshold=cellprob_threshold,
                flow_threshold=flow_threshold,
                min_size=min_size,
                niter=eff_niter,
            )
            for z in range(Z)
        ]
    )
    if stitch_threshold > 0 and Z > 1:
        labels = stitch_labels_3d(labels, stitch_threshold)
    return labels.astype(np.uint32)
