"""Light-sheet deskew: shear/rotate scan-frame ZYX stacks into coverslip frame.

The deskew affine has special structure the reference exploits in its fast
path (reference: biahub/deskew.py:102-157,459-545): two of the three input
axes map to output axes via integer permutation/flips, and only the scan axis
needs fractional 1D resampling. Here that becomes a transpose/flip plus ONE
``take_along_axis`` lerp along the minor axis — a layout-friendly XLA gather,
no 3D grid_sample needed. Slice averaging and overhang handling follow
(reference: biahub/deskew.py:46-99,280-371).

Shape math matches the reference exactly (reference: biahub/deskew.py:216-277):
for raw shape (Z, Y, X) the un-averaged deskewed shape is (Y, X, Xp) with
Xp = ceil(Z/px_to_scan_ratio ± Y*cos(theta)).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "get_deskewed_data_shape",
    "deskew_transform_matrix",
    "deskew_zyx",
    "deskew_zyx_batched",
    "average_n_slices",
    "fill_overhang",
]


def _averaged_shape(shape: tuple[int, ...], window: int) -> tuple[int, ...]:
    return (int(np.ceil(shape[0] / window)),) + tuple(shape[1:])


def get_deskewed_data_shape(
    raw_data_shape: tuple[int, int, int],
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool,
    average_n_slices: int = 1,
    pixel_size_um: float = 1,
) -> tuple[tuple[int, int, int], tuple[float, float, float]]:
    """Output (Z, Y, X) shape and voxel size of the deskewed volume.

    With keep_overhang the output X spans the whole tilted parallelepiped;
    without it only the fully-sampled cuboid interior is kept.
    """
    theta = ls_angle_deg * np.pi / 180
    st, ct = np.sin(theta), np.cos(theta)
    Z, Y, X = raw_data_shape

    if keep_overhang:
        Xp = int(np.ceil((Z / px_to_scan_ratio) + (Y * ct)))
    else:
        Xp = int(np.ceil((Z / px_to_scan_ratio) - (Y * ct)))
        if Xp <= 0:
            raise ValueError(
                f"Dataset contains only overhang when keep_overhang=False. "
                f"Computed Xp={Xp} <= 0. Either set keep_overhang=True or use a "
                f"dataset with non-overhang content."
            )

    output_shape = (Y, X, Xp)
    voxel_size = (average_n_slices * st * pixel_size_um, pixel_size_um, pixel_size_um)
    return _averaged_shape(output_shape, average_n_slices), voxel_size


def deskew_transform_matrix(ls_angle_deg: float, px_to_scan_ratio: float) -> np.ndarray:
    """Centered output→input deskew affine (reference: biahub/deskew.py:183-213).

    Maps CENTERED output (z_out, y_out, x_out) coordinates to centered input
    (z_scan, y_tilt, x_coverslip) coordinates. Row 0 mixes z_out and x_out into
    the scan axis; rows 1-2 are pure flips of the remaining axes.
    """
    ct = np.cos(ls_angle_deg * np.pi / 180)
    return np.array(
        [
            [-px_to_scan_ratio * ct, 0, px_to_scan_ratio, 0],
            [-1, 0, 0, 0],
            [0, -1, 0, 0],
            [0, 0, 0, 1],
        ]
    )


def uncentered_deskew_matrix(
    raw_shape: tuple[int, int, int],
    output_shape: tuple[int, int, int],
    ls_angle_deg: float,
    px_to_scan_ratio: float,
) -> np.ndarray:
    """Deskew affine in INDEX coordinates (for affine_warp_zyx / scipy parity).

    Converts the centered matrix to the uncentered convention by folding the
    center offsets of both frames into the translation column.
    """
    m = deskew_transform_matrix(ls_angle_deg, px_to_scan_ratio)
    c_in = (np.asarray(raw_shape, dtype=np.float64) - 1) / 2
    c_out = (np.asarray(output_shape, dtype=np.float64) - 1) / 2
    out = np.eye(4)
    out[:3, :3] = m[:3, :3]
    out[:3, 3] = c_in - m[:3, :3] @ c_out
    return out


@partial(jax.jit, static_argnames=("window",))
def average_n_slices(data: jax.Array, window: int = 1) -> jax.Array:
    """Mean-pool the first axis in groups of ``window``, edge-padding the tail."""
    if window == 1:
        return data
    remainder = data.shape[0] % window
    if remainder > 0:
        pad = jnp.broadcast_to(
            data[-1:], (window - remainder,) + data.shape[1:]
        )
        data = jnp.concatenate([data, pad], axis=0)
    grouped = data.reshape((data.shape[0] // window, window) + data.shape[1:])
    return jnp.mean(grouped, axis=1)


@partial(jax.jit, static_argnames=("dilation_iterations",))
def overhang_mask(data: jax.Array, dilation_iterations: int = 3) -> jax.Array:
    """Dilated zero-mask marking overhang voxels and their blended boundary."""
    mask = (data == 0).astype(jnp.float32)
    for _ in range(dilation_iterations):
        mask = jax.lax.reduce_window(
            mask,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(3, 3, 3),
            window_strides=(1, 1, 1),
            padding="SAME",
        )
    return mask > 0.5


def fill_overhang(
    data: jax.Array,
    fill_value: float | None = None,
    dilation_iterations: int = 3,
) -> jax.Array:
    """Replace zero-padded overhang voxels (and their blended boundary).

    The zero-mask is dilated with 3^3 max-pools to also cover voxels where
    interpolation blended signal toward zero, then filled with ``fill_value``
    or the mean of the remaining valid signal.
    """
    dilated = overhang_mask(data, dilation_iterations)
    if fill_value is None:
        valid = ~dilated
        total = jnp.sum(jnp.where(valid, data, 0.0))
        count = jnp.maximum(jnp.sum(valid.astype(data.dtype)), 1)
        fill = total / count
    else:
        fill = jnp.asarray(fill_value, data.dtype)
    return jnp.where(dilated, fill, data)


@partial(
    jax.jit,
    static_argnames=(
        "ls_angle_deg",
        "px_to_scan_ratio",
        "keep_overhang",
        "average_window",
        "overhang_fill",
        "skip_flip",
    ),
)
def deskew_zyx(
    raw_data: jax.Array,
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool,
    average_window: int = 1,
    overhang_fill: str | float = 0,
    skip_flip: bool = False,
) -> jax.Array:
    """Deskew one ZYX volume from the mantis light-sheet microscope.

    Parameters mirror the reference kernel (reference: biahub/deskew.py:459-545).
    Input axes: 0 = scan, 1 = tilted, 2 = coverslip-plane. Output axes:
    0 = Z (coverslip normal), 1 = Y (input coverslip axis), 2 = X (scan axis).

    ``skip_flip`` returns the Y axis REVERSED, for fused chains that fold
    the flip into the downstream warp's affine (kernels/chain.py).
    """
    Z_in, Y_in, X_in = raw_data.shape
    output_shape, _ = get_deskewed_data_shape(
        (Z_in, Y_in, X_in), ls_angle_deg, px_to_scan_ratio, keep_overhang
    )
    Z_out, Y_out, X_out = Y_in, X_in, output_shape[2]

    raw_data = raw_data.astype(jnp.float32)

    if jax.default_backend() == "tpu":
        # Fused Pallas path: one-hot MXU matmuls with the z slice-averaging
        # folded into the kernel's accumulator, so the unaveraged volume
        # never touches HBM (see kernels/pallas_deskew.py). The fused input
        # block is average_window x larger; when the double-buffered working
        # set would blow VMEM, fall back to the unaveraged kernel plus the
        # post-hoc averaging round trip.
        from biahub_tpu.kernels.pallas_deskew import deskew_zyx_pallas

        in_block = average_window * Z_in * X_in * 4
        out_block = Y_out * X_out * 4
        fused_ok = 2 * (in_block + out_block) < 64 * 1024 * 1024
        result = deskew_zyx_pallas(
            raw_data,
            ls_angle_deg,
            px_to_scan_ratio,
            keep_overhang,
            average_window=average_window if fused_ok else 1,
            skip_flip=skip_flip,
        )
        if not fused_ok:
            result = average_n_slices(result, average_window)
        if keep_overhang and overhang_fill != 0:
            fill_value = None if overhang_fill == "mean" else float(overhang_fill)
            result = fill_overhang(result, fill_value=fill_value)
        return result

    # Integer part of the affine: (Z_scan, Y_tilt, X_cover) -> (Z_out, W, Y_out)
    # where W indexes the scan axis that needs fractional resampling. The
    # layout is deliberate TPU tuning: the gather runs along axis 1 so the
    # minor (lane) axis Y_out stays contiguous — each gathered element is a
    # full Y row. Gathering along the minor axis instead is ~160x slower on
    # TPU (measured: 3.89 s vs 24 ms per 256x256x1024 volume on v5e).
    flip_axes = (0,) if skip_flip else (0, 2)
    data = jnp.flip(jnp.transpose(raw_data, (1, 0, 2)), axis=flip_axes)

    # Fractional scan-axis sample position for each (z_out, x_out):
    #   in_z = px * x_out - px * cos(theta) * z_out + offset
    # (the centered MONAI grid written in index coordinates;
    # reference: biahub/deskew.py:139-151).
    ct = float(np.cos(ls_angle_deg * np.pi / 180))
    px = float(px_to_scan_ratio)
    offset = px * ct * (Z_out - 1) / 2 - px * (X_out - 1) / 2 + (Z_in - 1) / 2

    z_idx = jnp.arange(Z_out, dtype=jnp.float32)[:, None]
    x_idx = jnp.arange(X_out, dtype=jnp.float32)[None, :]
    in_z = px * x_idx - px * ct * z_idx + offset  # (Z_out, X_out)

    i0 = jnp.floor(in_z)
    frac = (in_z - i0)[:, :, None]  # broadcast over Y_out
    i0 = i0.astype(jnp.int32)
    i1 = i0 + 1
    valid0 = ((i0 >= 0) & (i0 < Z_in))[:, :, None]
    valid1 = ((i1 >= 0) & (i1 < Z_in))[:, :, None]
    idx0 = jnp.clip(i0, 0, Z_in - 1)[:, :, None]
    idx1 = jnp.clip(i1, 0, Z_in - 1)[:, :, None]

    v0 = jnp.take_along_axis(data, idx0, axis=1)  # (Z_out, X_out, Y_out)
    v1 = jnp.take_along_axis(data, idx1, axis=1)
    v0 = jnp.where(valid0, v0, 0.0)
    v1 = jnp.where(valid1, v1, 0.0)
    deskewed = jnp.transpose(v0 * (1.0 - frac) + v1 * frac, (0, 2, 1))

    result = average_n_slices(deskewed, average_window)

    if keep_overhang and overhang_fill != 0:
        fill_value = None if overhang_fill == "mean" else float(overhang_fill)
        result = fill_overhang(result, fill_value=fill_value)

    return result


def deskew_zyx_batched(
    volumes: jax.Array,
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool,
    average_window: int = 1,
    overhang_fill: str | float = 0,
    skip_flip: bool = False,
) -> jax.Array:
    """Batched :func:`deskew_zyx` — semantically ``jax.vmap(deskew_zyx)``,
    but on the fused-Pallas route the batch rides the manually
    double-buffered zyx kernel's grid
    (:func:`~biahub_tpu.kernels.pallas_deskew.deskew_zyx_pallas_batched`):
    its explicit DMA chain overlaps the slab fetches with the banded MXU
    dots, which Mosaic's automatic pipeline cannot. The deskew verb's
    BatchRunner batches enter here (``batched_impl``); single-device
    batches only — the batch grid axis cannot be SPMD-partitioned.
    """
    Z_in, Y_in, X_in = (int(s) for s in volumes.shape[1:])
    output_shape, _ = get_deskewed_data_shape(
        (Z_in, Y_in, X_in), ls_angle_deg, px_to_scan_ratio, keep_overhang
    )
    Y_out, X_out = X_in, output_shape[2]

    def per_volume(v):
        return deskew_zyx(
            v, ls_angle_deg=ls_angle_deg,
            px_to_scan_ratio=px_to_scan_ratio,
            keep_overhang=keep_overhang, average_window=average_window,
            overhang_fill=overhang_fill, skip_flip=skip_flip,
        )

    from biahub_tpu.kernels.pallas_deskew import manual_dma_deskew_supported

    use_pallas = (
        jax.default_backend() == "tpu"
        or os.environ.get("BIAHUB_TPU_FORCE_PALLAS") == "1"
    )
    in_block = average_window * Z_in * X_in * 4
    out_block = Y_out * X_out * 4
    fused_ok = 2 * (in_block + out_block) < 64 * 1024 * 1024
    if not (
        use_pallas
        and fused_ok
        and manual_dma_deskew_supported(
            (Z_in, Y_in, X_in), average_window, "zyx"
        )
    ):
        return jax.vmap(per_volume)(volumes)

    from biahub_tpu.kernels.pallas_deskew import deskew_zyx_pallas_batched

    result = deskew_zyx_pallas_batched(
        volumes.astype(jnp.float32), ls_angle_deg, px_to_scan_ratio,
        keep_overhang, average_window=average_window, skip_flip=skip_flip,
    )
    if keep_overhang and overhang_fill != 0:
        fill_value = None if overhang_fill == "mean" else float(overhang_fill)
        result = jax.vmap(partial(fill_overhang, fill_value=fill_value))(
            result
        )
    return result


def deskew_czyx(
    czyx: jax.Array,
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool,
    average_window: int = 1,
    overhang_fill: str | float = 0,
) -> jax.Array:
    """Batch deskew over the leading channel axis via vmap."""
    fn = partial(
        deskew_zyx,
        ls_angle_deg=ls_angle_deg,
        px_to_scan_ratio=px_to_scan_ratio,
        keep_overhang=keep_overhang,
        average_window=average_window,
        overhang_fill=overhang_fill,
    )
    return jax.vmap(fn)(czyx)
