"""Intensity-based similarity registration: the ANTs replacement, in JAX.

The reference shells out to ANTs ``ants.registration`` (C++ ITK gradient
descent, Similarity transform, shrink 6/3/1, smoothing 2/1/0; reference:
biahub/registration/ants.py:54-121). Here the same multi-resolution scheme
runs as a differentiable program on device: a similarity warp (rotation
vector, log-scale, translation about the volume center) is optimized with
Adam against a normalized-cross-correlation loss, with gradients flowing
through the trilinear warp kernel. Preprocessing (initial warp, LIR crop,
mask, clip, sobel, channel sum) and transform postprocessing mirror the
reference (reference: biahub/registration/ants.py:124-407).
"""

from __future__ import annotations

import os
from functools import partial
from pathlib import Path

import click
import jax
import jax.numpy as jnp
import numpy as np

from biahub_tpu.kernels.affine import affine_warp_auto, affine_warp_zyx
from biahub_tpu.settings import AffineTransformSettings, AntsRegistrationSettings

__all__ = [
    "estimate",
    "preprocess_czyx",
    "estimate_czyx",
    "postprocess_transform",
    "estimate_tczyx",
    "sobel_magnitude",
]

DEFAULT_REG_KWARGS = {
    "type_of_transform": "Similarity",
    "aff_shrink_factors": (6, 3, 1),
    "aff_iterations": (2100, 1200, 50),
    "aff_smoothing_sigmas": (2, 1, 0),
}

# Adam steps per level. ANTs' per-level gradient-descent budgets (2100/1200/50)
# are scaled down: Adam on an analytic gradient converges in far fewer steps.
MAX_ITERS_PER_LEVEL = 300
LEARNING_RATE = 0.02


def _rodrigues(rotvec: jax.Array) -> jax.Array:
    """Rotation matrix from a rotation vector (differentiable at zero)."""
    # norm() has a NaN gradient at 0; the epsilon inside the sqrt keeps the
    # derivative finite for the identity rotation the optimizer starts from.
    theta = jnp.sqrt(jnp.sum(rotvec * rotvec) + 1e-12)
    k = rotvec / theta
    K = jnp.array(
        [[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]], [-k[1], k[0], 0.0]]
    )
    return jnp.eye(3) + jnp.sin(theta) * K + (1 - jnp.cos(theta)) * (K @ K)


def _similarity_matrix(params: jax.Array, center: jax.Array) -> jax.Array:
    """Output→input warp: p_in = c + s*R(r) @ (p_out - c) + t."""
    rotvec = params[:3]
    log_scale = params[3]
    translation = params[4:7]
    lin = jnp.exp(log_scale) * _rodrigues(rotvec)
    top = jnp.concatenate(
        [lin, (center - lin @ center + translation)[:, None]], axis=1
    )
    return jnp.concatenate([top, jnp.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)


def _gaussian_blur_zyx(vol: jax.Array, sigma: float) -> jax.Array:
    if sigma <= 0:
        return vol
    radius = int(np.ceil(3 * sigma))
    x = np.arange(-radius, radius + 1)
    kernel = np.exp(-0.5 * (x / sigma) ** 2)
    kernel = (kernel / kernel.sum()).astype(np.float32)
    k = jnp.asarray(kernel)
    v = vol[None, None]  # (N, C, Z, Y, X)
    for axis in range(3):
        shape = [1, 1, 1, 1, 1]
        shape[2 + axis] = len(kernel)
        kern = k.reshape(shape)
        v = jax.lax.conv_general_dilated(
            v, kern, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NCZYX", "OIZYX", "NCZYX"),
        )
    return v[0, 0]


def _downsample(vol: jax.Array, factor: int) -> jax.Array:
    if factor == 1:
        return vol
    Z, Y, X = vol.shape
    z, y, x = Z // factor, Y // factor, X // factor
    trimmed = vol[: z * factor, : y * factor, : x * factor]
    return trimmed.reshape(z, factor, y, factor, x, factor).mean(axis=(1, 3, 5))


def _ncc_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    a = a - jnp.mean(a)
    b = b - jnp.mean(b)
    denom = jnp.sqrt(jnp.sum(a * a) * jnp.sum(b * b)) + 1e-8
    return 1.0 - jnp.sum(a * b) / denom


@partial(jax.jit, static_argnames=("n_iters", "out_shape", "warp_fn"))
def _optimize_level(mov, ref, params0, center, n_iters: int, out_shape,
                    warp_fn=None):
    """Adam over the similarity params at one resolution level.

    ``warp_fn(volume, matrix)`` overrides the warp inside the loss; on TPU the
    caller passes the traced multipass warp (the exact elementwise gather is
    ~30-50x slower per iteration there).
    """
    import optax

    opt = optax.adam(LEARNING_RATE)

    def loss_fn(params):
        matrix = _similarity_matrix(params, center)
        if warp_fn is not None:
            warped = warp_fn(mov, matrix)
        else:
            warped = affine_warp_zyx(mov, matrix, out_shape)
        return _ncc_loss(warped, ref)

    def step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), losses = jax.lax.scan(
        step, (params0, opt.init(params0)), None, length=n_iters
    )
    return params, losses


def estimate(
    ref: np.ndarray,
    mov: np.ndarray,
    verbose: bool = False,
    ants_kwargs: dict | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Estimate a similarity warp aligning ``mov`` to ``ref``.

    Returns (fwd, inv) 4x4 matrices; ``fwd`` is the output→input warp such
    that warping ``mov`` by it matches ``ref`` (the role of ANTs'
    fwdtransforms in the reference).
    """
    kwargs = {**DEFAULT_REG_KWARGS, **(ants_kwargs or {})}
    shrinks = kwargs["aff_shrink_factors"]
    sigmas = kwargs["aff_smoothing_sigmas"]
    iters = kwargs["aff_iterations"]

    ref = np.asarray(ref, dtype=np.float32)
    mov = np.asarray(mov, dtype=np.float32)
    if ref.ndim != 3 or mov.ndim != 3:
        raise ValueError("estimate() expects 3D (Z, Y, X) volumes")

    params = jnp.zeros(7)  # rotvec(3), log_scale(1), translation(3)
    for shrink, sigma, n in zip(shrinks, sigmas, iters):
        ref_l = _downsample(_gaussian_blur_zyx(jnp.asarray(ref), sigma), shrink)
        mov_l = _downsample(_gaussian_blur_zyx(jnp.asarray(mov), sigma), shrink)
        center = (jnp.asarray(ref_l.shape, dtype=jnp.float32) - 1) / 2
        # Translation transfers across levels as t_level = t_full / shrink
        level_params = params.at[4:7].set(params[4:7] / shrink)
        n_iters = int(min(n, MAX_ITERS_PER_LEVEL))
        warp_fn = None
        if (
            jax.default_backend() == "tpu"
            and os.environ.get("BIAHUB_TPU_EXACT_WARP") != "1"
        ):
            from biahub_tpu.kernels.multipass_warp import make_traced_multipass_warp

            # The pairs are pre-aligned by the initial transform, so the
            # optimized residual stays small; a 15% frame margin keeps the
            # static common frame (and per-iteration cost) tight.
            # Linear per-pass interpolation: the NCC loss needs smoothness,
            # not peak preservation, and it halves the per-pass gathers.
            warp_fn = make_traced_multipass_warp(
                mov_l.shape, tuple(ref_l.shape), margin=0.15, order=1
            )
        level_params, losses = _optimize_level(
            mov_l, ref_l, level_params, center, n_iters, tuple(ref_l.shape),
            warp_fn=warp_fn,
        )
        params = level_params.at[4:7].set(level_params[4:7] * shrink)
        if verbose:
            click.echo(
                f"level shrink={shrink} sigma={sigma}: loss "
                f"{float(losses[0]):.4f} -> {float(losses[-1]):.4f}"
            )

    center_full = (jnp.asarray(ref.shape, dtype=jnp.float32) - 1) / 2
    fwd = np.asarray(_similarity_matrix(params, center_full), dtype=np.float64)
    return fwd, np.linalg.inv(fwd)


def sobel_magnitude(zyx: np.ndarray) -> np.ndarray:
    """3D Sobel gradient magnitude (replaces skimage.filters.sobel)."""
    from scipy.ndimage import sobel as nd_sobel

    zyx = np.asarray(zyx, dtype=np.float32)
    total = np.zeros_like(zyx)
    for axis in range(zyx.ndim):
        g = nd_sobel(zyx, axis=axis)
        total += g * g
    # skimage normalizes by the kernel weight sum
    return np.sqrt(total) / np.sqrt(zyx.ndim) / 4.0


def preprocess_czyx(
    mov_czyx: np.ndarray,
    ref_czyx: np.ndarray,
    initial_tform: np.ndarray,
    mov_channel_index: int | list = 0,
    ref_channel_index: int = 0,
    crop: bool = False,
    ref_mask_radius: float | None = None,
    clip: bool = False,
    sobel_filter: bool = False,
    verbose: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Initial warp → optional LIR crop / circular mask / clip / sobel / sum."""
    from biahub_tpu.register import find_lir

    mov_czyx = np.asarray(mov_czyx, dtype=np.float32)
    ref_czyx = np.asarray(ref_czyx, dtype=np.float32)

    if ref_mask_radius is not None and not (0 < ref_mask_radius <= 1):
        raise ValueError(
            "ref_mask_radius must be given as a fraction of image width, i.e. (0, 1]."
        )
    if np.all(mov_czyx == 0) or np.all(ref_czyx == 0):
        raise ValueError("Input data contains NaN or zeros.")

    ref_zyx = ref_czyx[ref_channel_index]
    if not isinstance(mov_channel_index, list):
        mov_channel_index = [mov_channel_index]

    initial = np.asarray(initial_tform, dtype=np.float64)
    mov_channels = []
    for idx in mov_channel_index:
        if verbose:
            click.echo(f"Applying initial transform to moving channel {idx}...")
        # Concrete matrix: the auto dispatch picks the fast multipass /
        # factored kernel on TPU instead of the elementwise gather.
        warped = np.asarray(
            affine_warp_auto(np.nan_to_num(mov_czyx[idx]), initial, ref_zyx.shape)
        )
        mov_channels.append(warped)

    offset = np.zeros(3, dtype=np.float32)
    if crop:
        if verbose:
            click.echo(
                "Estimating crop for moving and reference channels to overlapping region..."
            )
        mask = (ref_zyx != 0) & (mov_channels[0] != 0)
        if ref_mask_radius is not None:
            ref_mask = np.zeros(ref_zyx.shape[-2:], dtype=bool)
            y, x = np.ogrid[: ref_mask.shape[-2], : ref_mask.shape[-1]]
            center = (ref_mask.shape[-2] // 2, ref_mask.shape[-1] // 2)
            radius = int(ref_mask_radius * min(center))
            ref_mask[(x - center[0]) ** 2 + (y - center[1]) ** 2 <= radius**2] = True
            mask = mask * ref_mask
        z_slice, y_slice, x_slice = find_lir(mask.astype(np.uint8))
        click.echo(
            f"Cropping to region z={z_slice.start}:{z_slice.stop}, "
            f"y={y_slice.start}:{y_slice.stop}, x={x_slice.start}:{x_slice.stop}"
        )
        offset = np.asarray(
            [s.start for s in (z_slice, y_slice, x_slice)], dtype=np.float32
        )
        ref_zyx = ref_zyx[z_slice, y_slice, x_slice]
        mov_channels = [c[z_slice, y_slice, x_slice] for c in mov_channels]

    if clip:
        if verbose:
            click.echo("Clipping moving and reference channels to reasonable values...")
        ref_zyx = np.clip(ref_zyx, 0, 0.5)
        mov_channels = [np.clip(c, 110, np.quantile(c, 0.99)) for c in mov_channels]

    if sobel_filter:
        if verbose:
            click.echo("Applying Sobel filter to moving and reference channels...")
        ref_zyx = sobel_magnitude(ref_zyx)
        mov_channels = [sobel_magnitude(c) for c in mov_channels]

    return ref_zyx, np.sum(mov_channels, axis=0), offset


def postprocess_transform(
    initial_transform: np.ndarray,
    fwd_transform: np.ndarray,
    preprocess_offset: np.ndarray,
) -> np.ndarray:
    """composed = initial @ shift_to_roi @ fwd @ shift_back (crop-aware)."""
    shift_to_roi = np.eye(4)
    shift_to_roi[:3, -1] = preprocess_offset
    shift_back = np.eye(4)
    shift_back[:3, -1] = -preprocess_offset
    return (
        np.asarray(initial_transform)
        @ shift_to_roi
        @ np.asarray(fwd_transform)
        @ shift_back
    )


def estimate_czyx(
    mov_czyx: np.ndarray,
    ref_czyx: np.ndarray,
    initial_tform: np.ndarray,
    mov_channel_index: int | list = 0,
    ref_channel_index: int = 0,
    crop: bool = False,
    ref_mask_radius: float | None = None,
    clip: bool = False,
    sobel_filter: bool = False,
    verbose: bool = False,
    t_idx: int = 0,
    output_folder_path: Path | None = None,
) -> np.ndarray:
    """Preprocess, optimize, and compose the full registration for one CZYX pair."""
    ref_zyx, mov_zyx, offset = preprocess_czyx(
        mov_czyx=mov_czyx,
        ref_czyx=ref_czyx,
        initial_tform=initial_tform,
        mov_channel_index=mov_channel_index,
        ref_channel_index=ref_channel_index,
        crop=crop,
        clip=clip,
        ref_mask_radius=ref_mask_radius,
        sobel_filter=sobel_filter,
        verbose=verbose,
    )
    fwd, _ = estimate(ref=ref_zyx, mov=mov_zyx, verbose=verbose)
    composed = postprocess_transform(np.asarray(initial_tform), fwd, offset)
    if verbose:
        click.echo(f"Composed transform:\n{composed}")
    if output_folder_path:
        output_folder_path = Path(output_folder_path)
        output_folder_path.mkdir(parents=True, exist_ok=True)
        np.save(output_folder_path / f"{t_idx}.npy", composed)
    return composed


def estimate_tczyx(
    mov_tczyx,
    ref_tczyx,
    mov_channel_index: int | list,
    ref_channel_index: int,
    ants_registration_settings: AntsRegistrationSettings,
    affine_transform_settings: AffineTransformSettings,
    verbose: bool = False,
    output_folder_path: Path | None = None,
    cluster: str = "local",
    sbatch_filepath: Path | None = None,
) -> list:
    """Per-timepoint intensity registration over a (T, C, Z, Y, X) stack."""
    T = mov_tczyx.shape[0]
    initial = np.asarray(affine_transform_settings.approx_transform)
    transforms = []
    for t in range(T):
        click.echo(f"Registering timepoint {t}")
        composed = estimate_czyx(
            mov_czyx=np.asarray(mov_tczyx[t]),
            ref_czyx=np.asarray(ref_tczyx[t]),
            initial_tform=initial,
            mov_channel_index=mov_channel_index,
            ref_channel_index=ref_channel_index,
            sobel_filter=ants_registration_settings.sobel_filter,
            verbose=verbose,
            t_idx=t,
            output_folder_path=(
                Path(output_folder_path) / "xyz_transforms" if output_folder_path else None
            ),
        )
        transforms.append(composed.tolist())
        if affine_transform_settings.use_prev_t_transform:
            initial = composed
    return transforms
