"""``biahub fuse``: run flat-field -> deconvolve -> deskew ->
register/stabilize as ONE device program per volume.

Beyond-reference verb. The reference pipeline materializes a full OME-Zarr
plate after every step (reference: nextflow/mantis-v2.nf:56-67 runs deskew,
reconstruct, ... as separate per-position Slurm fan-outs with a store between
each); on TPU the same chain compiles into a single XLA program per (t, c)
batch (kernels/chain.py), so the intermediate volumes never leave HBM and the
cross-verb layout contracts apply (deconvolve's pass C emits deskew's input
layout, the deskew Y-flip rides the warp's affine). Per-volume cost is the
benched fused-chain time (~7 ms vs ~2 min for the reference's 4-step chain on
a 16-CPU node) and the only I/O is one read of the raw volume and one write
of the final result.

Stage semantics match the individual verbs exactly (each stage's config block
reuses that verb's schema where it transfers):

- ``flat_field``: per-channel median-pattern illumination correction on the
  raw frame, reference: biahub/flat_field.py:37-54. Non-selected channels
  skip the correction but still run the rest of the chain (the standalone
  verb copies them; with downstream stages configured a copy would drop
  those stages).
- ``deconvolve``: Tikhonov inverse filter from a PSF (``-p psf.zarr``),
  reference: biahub/deconvolve.py:34-70.
- ``deskew``: oblique-plane light-sheet deskew, reference:
  biahub/deskew.py:459-545.
- ``registration``: one 4x4 affine applied to every channel in the deskewed
  frame, reference apply path: biahub/register.py:205-284.
- ``stabilization``: per-timepoint 4x4 affines composed AFTER registration,
  reference: biahub/stabilize.py:35-93.
"""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np

from biahub_tpu.cli.parsing import (
    cluster,
    config_filepath,
    init_only,
    input_position_dirpaths,
    monitor,
    num_processes,
    output_dirpath,
    resume,
    sbatch_filepath,
)
from biahub_tpu.cli.utils import (
    PROVENANCE_METADATA_KEYS,
    get_output_paths,
    yaml_to_model,
)
from biahub_tpu.io.ngff import (
    TransformationMeta,
    create_empty_plate,
    get_ome_zarr_version,
    open_ome_zarr,
)
from biahub_tpu.runtime import (
    BatchRunner,
    echo_resources,
    estimate_resources,
    resolve_cluster,
    sbatch_to_overrides,
    settings_fingerprint,
)
from biahub_tpu.runtime.executor import WorkUnit
from biahub_tpu.settings import FusePipelineSettings

__all__ = ["fuse", "fuse_cli"]


def _resolve_time_indices(settings: FusePipelineSettings, T: int) -> list[int]:
    if settings.time_indices == "all":
        return list(range(T))
    if isinstance(settings.time_indices, list):
        return [int(t) for t in settings.time_indices]
    return [int(settings.time_indices)]


def _warp_matrices(
    settings: FusePipelineSettings, time_indices: list[int]
) -> tuple[np.ndarray | None, list[np.ndarray] | None]:
    """(single_matrix, per_raw_t_matrices) for the warp stage.

    Warps are OUTPUT->INPUT index maps, so "register then stabilize"
    composes as ``M_reg @ M_stab[t]`` (the stabilize map runs first on an
    output coordinate). Exactly one of the returns is non-None when a warp
    stage is configured; both are None otherwise.
    """
    m_reg = (
        np.asarray(settings.registration.affine_transform_zyx, dtype=np.float64)
        if settings.registration is not None
        else None
    )
    if settings.stabilization is None:
        return m_reg, None
    mats = [
        np.asarray(m, dtype=np.float64)
        for m in settings.stabilization.affine_transform_zyx_list
    ]
    needed = max(time_indices) + 1
    if len(mats) < needed:
        raise click.ClickException(
            f"stabilization.affine_transform_zyx_list has {len(mats)} matrices "
            f"but timepoint {needed - 1} is processed (one matrix per raw "
            "timepoint, like StabilizationSettings)"
        )
    if m_reg is not None:
        mats = [m_reg @ m for m in mats]
    return None, mats


def _make_warp_stage(all_mats, in_shape, out_shape):
    """Batched warp stage for traced per-timepoint matrices.

    Mirrors the kernel-family selection of the stabilize verb
    (biahub_tpu/stabilize.py): one compiled program serves every matrix, the
    coefficients ride as traced per-unit parameters. Returns
    ``(stage_fn(d, matrix, **extras), extras_fn(flat_idx), workspace_bytes)``.
    """
    from biahub_tpu.kernels.affine import (
        affine_warp_zyx,
        is_inplane_matrix,
        is_translation_matrix,
        make_batched_inplane_kernel,
        translation_warp_zyx,
    )
    from biahub_tpu.kernels.multipass_warp import (
        common_frame_bytes,
        make_batched_multipass_kernel,
    )

    in_shape = tuple(int(s) for s in in_shape)
    out_shape = tuple(int(s) for s in out_shape)
    if all(is_translation_matrix(m) for m in all_mats):
        shift_bounds = tuple(
            (
                float(min(m[ax, 3] for m in all_mats)),
                float(max(m[ax, 3] for m in all_mats)),
            )
            for ax in range(3)
        )

        def stage(d, matrix):
            return translation_warp_zyx(
                d, matrix[:3, 3], out_shape, shift_bounds=shift_bounds
            )

        return stage, (lambda i: {}), 0
    if all(is_inplane_matrix(m) for m in all_mats):
        kernel, ip_params = make_batched_inplane_kernel(all_mats, in_shape, out_shape)

        def stage(d, matrix, ip):
            return kernel(d, matrix, ip)

        return stage, (lambda i: {"ip": ip_params[i]}), 0
    workspace = common_frame_bytes(list(all_mats), in_shape, out_shape)
    try:
        kernel, mp_params = make_batched_multipass_kernel(
            all_mats, in_shape, out_shape
        )

        def stage(d, matrix, mp):
            return kernel(d, matrix, mp)

        return stage, (lambda i: {"mp": mp_params[i]}), workspace
    except ValueError:  # vanishing pivot (e.g. 90-degree permutation)

        def stage(d, matrix):
            return affine_warp_zyx(d, matrix, out_shape)

        return stage, (lambda i: {}), workspace


def _flat_field_slabbed(vol: np.ndarray, budget: int) -> np.ndarray:
    """flat_field_zyx semantics in Y slabs when the whole volume cannot ride
    the device: the per-(y, x) median over Z is slab-exact and the global
    pattern mean accumulates across slabs (two passes)."""
    import jax.numpy as jnp

    from biahub_tpu.kernels.flat_field import flat_field_zyx

    if 2 * vol.nbytes <= budget:
        return np.asarray(flat_field_zyx(jnp.asarray(vol)))
    y_chunk = max(1, int(budget // (2 * 4 * vol.shape[0] * vol.shape[2])))
    patterns = []
    for y0 in range(0, vol.shape[1], y_chunk):
        slab = jnp.asarray(vol[:, y0 : y0 + y_chunk])
        patterns.append(np.asarray(jnp.median(slab, axis=0)))
    pattern = np.concatenate(patterns, axis=0)  # (Y, X)
    mean = np.float32(pattern.mean())
    out = np.empty_like(vol)
    for y0 in range(0, vol.shape[1], y_chunk):
        y1 = min(y0 + y_chunk, vol.shape[1])
        out[:, y0:y1] = vol[:, y0:y1] / pattern[y0:y1] * mean
    return out


def _deskew_slabbed(vol: np.ndarray, dk, budget: int) -> np.ndarray:
    """deskew_zyx in input-X slabs (= output-Y slabs; exact split, the scan
    resample involves only the scan and tilt axes) — the standalone verb's
    over-budget path (biahub_tpu/deskew.py, mirroring reference
    biahub/deskew.py:554-582) applied to an in-memory volume."""
    import jax.numpy as jnp
    from functools import partial

    from biahub_tpu.kernels.deskew import (
        deskew_zyx,
        fill_overhang,
        get_deskewed_data_shape,
    )

    Z, Y, X = vol.shape
    out_shape, _ = get_deskewed_data_shape(
        (Z, Y, X), dk.ls_angle_deg, dk.px_to_scan_ratio, dk.keep_overhang,
        dk.average_n_slices,
    )
    kernel = partial(
        deskew_zyx,
        ls_angle_deg=dk.ls_angle_deg,
        px_to_scan_ratio=dk.px_to_scan_ratio,
        keep_overhang=dk.keep_overhang,
        average_window=dk.average_n_slices,
        overhang_fill=0,
    )
    volume_bytes = 4 * (int(np.prod((Z, Y, X))) + int(np.prod(out_shape)))
    if volume_bytes <= budget:
        out = np.asarray(kernel(jnp.asarray(vol)))
    else:
        n_splits = -(-volume_bytes // budget)
        x_chunk = max(1, -(-X // int(n_splits)))
        out = np.empty(tuple(out_shape), np.float32)
        for x0 in range(0, X, x_chunk):
            x1 = min(x0 + x_chunk, X)
            out[:, X - x1 : X - x0, :] = np.asarray(
                kernel(jnp.asarray(vol[:, :, x0:x1]))
            )
    if dk.keep_overhang and dk.overhang_fill != 0:
        fill = None if dk.overhang_fill == "mean" else float(dk.overhang_fill)
        if 2 * out.nbytes <= budget:
            out = np.asarray(fill_overhang(jnp.asarray(out), fill_value=fill))
        else:
            from biahub_tpu.kernels.deskew import overhang_mask

            # Slab fill with a 4-voxel halo (dilation reaches 3); the mean
            # fill needs a first pass for the whole-volume valid mean.
            y_chunk = max(8, int(budget // (4 * 4 * out.shape[0] * out.shape[2])))
            if fill is None:
                total, count = 0.0, 0
                for y0 in range(0, out.shape[1], y_chunk):
                    y1 = min(y0 + y_chunk, out.shape[1])
                    lo, hi = max(0, y0 - 4), min(out.shape[1], y1 + 4)
                    slab = out[:, lo:hi, :]
                    mask = np.asarray(overhang_mask(jnp.asarray(slab)))
                    valid = ~mask[:, y0 - lo : y0 - lo + (y1 - y0), :]
                    center = slab[:, y0 - lo : y0 - lo + (y1 - y0), :]
                    total += float(center[valid].sum())
                    count += int(valid.sum())
                fill = np.float32(total / max(count, 1))
            for y0 in range(0, out.shape[1], y_chunk):
                y1 = min(y0 + y_chunk, out.shape[1])
                lo, hi = max(0, y0 - 4), min(out.shape[1], y1 + 4)
                slab = out[:, lo:hi, :]
                mask = np.asarray(overhang_mask(jnp.asarray(slab)))
                center_mask = mask[:, y0 - lo : y0 - lo + (y1 - y0), :]
                center = out[:, y0:y1, :]
                out[:, y0:y1, :] = np.where(center_mask, np.float32(fill), center)
    return out


def _fuse_over_budget(
    settings,
    input_positions,
    output_positions,
    time_indices,
    n_channels,
    ff_targets,
    tf_half,
    prepared,
    reg_strength,
    dk,
    m_single,
    mats_per_t,
    frame_zyx,
    out_zyx,
    budget,
    resume,
    token,
) -> int:
    """Sequential per-unit composition of the standalone verbs' chunked
    kernels — the fuse verb's over-budget fallback. Same output store, same
    stage semantics (standard deskew frame, warp matrices uncomposed with
    the flip), bit-parity with running the verbs one after another."""
    import jax.numpy as jnp

    from biahub_tpu.io.progress import ProgressStore
    from biahub_tpu.runtime.executor import stripe_units

    units = [
        (p_idx, int(t), c, int(t_out))
        for p_idx in range(len(input_positions))
        for t_out, t in enumerate(time_indices)
        for c in range(n_channels)
    ]
    progress_stores: dict[int, ProgressStore] = {}
    n = 0
    for p_idx, t, c, t_out in stripe_units(units):
        in_pos = input_positions[p_idx]
        out_pos = output_positions[p_idx]
        if resume and p_idx not in progress_stores:
            progress_stores[p_idx] = ProgressStore(out_pos.path, token)
        progress = progress_stores.get(p_idx)
        if progress is not None and progress.is_done(t_out, c):
            n += 1
            continue
        vol = np.asarray(in_pos.data[t, c], np.float32)
        if settings.flat_field is not None and c in ff_targets:
            vol = _flat_field_slabbed(vol, budget)
        if settings.deconvolve is not None:
            from biahub_tpu.kernels.deconvolve import deconvolve_zyx

            vol = np.asarray(
                deconvolve_zyx(
                    jnp.asarray(vol), tf_half,
                    regularization_strength=reg_strength, prepared=prepared,
                )
            )
        if dk is not None:
            vol = _deskew_slabbed(vol, dk, budget)
        m = m_single if m_single is not None else (
            mats_per_t[t] if mats_per_t is not None else None
        )
        if m is not None:
            from biahub_tpu.kernels.affine import affine_warp_auto
            from biahub_tpu.kernels.multipass_warp import (
                chunked_affine_warp_zyx,
                common_frame_bytes,
            )

            warp_bytes = (
                4 * (int(np.prod(vol.shape)) + int(np.prod(out_zyx)))
                + common_frame_bytes(m, tuple(vol.shape), out_zyx)
            )
            if warp_bytes <= budget:
                out_pos["0"][t_out, c] = np.asarray(
                    affine_warp_auto(jnp.asarray(vol), m, out_zyx)
                )
            else:
                chunk = tuple(
                    max(32, s // max(1, int(np.ceil(warp_bytes / budget))))
                    for s in out_zyx
                )

                def read_fn(zs, ys, xs, _v=vol):
                    return _v[zs, ys, xs]

                def write_fn(zs, ys, xs, d, _t=t_out, _c=c, _p=out_pos):
                    _p["0"][_t, _c, zs, ys, xs] = d

                chunked_affine_warp_zyx(
                    read_fn, m, tuple(vol.shape), out_zyx, chunk,
                    write_fn=write_fn, order=1,
                )
        else:
            out_pos["0"][t_out, c] = vol
        if progress is not None:
            progress.mark_done(t_out, c)
        n += 1
    return n


def fuse(
    input_position_dirpaths: list[Path],
    config_filepath: Path,
    output_dirpath: Path,
    psf_dirpath: Path | None = None,
    sbatch_filepath: str | None = None,
    cluster: str = "slurm",
    monitor: bool = True,
    init_only: bool = False,
    resume: bool = False,
):
    """Run the configured stage chain over a plate, fused on device."""
    output_dirpath = Path(output_dirpath)
    settings = yaml_to_model(config_filepath, FusePipelineSettings)
    if settings.deconvolve is not None and psf_dirpath is None:
        raise click.ClickException(
            "the deconvolve stage needs a PSF: pass -p/--psf-dirpath psf.zarr"
        )

    input_dataset = open_ome_zarr(str(input_position_dirpaths[0]), mode="r")
    channel_names = input_dataset.channel_names
    T, C, Z, Y, X = input_dataset.data.shape
    in_scale = input_dataset.scale
    time_indices = _resolve_time_indices(settings, T)

    # -- geometry ------------------------------------------------------------
    dk = settings.deskew
    if dk is not None:
        from biahub_tpu.kernels.deskew import get_deskewed_data_shape

        frame_zyx, voxel_size = get_deskewed_data_shape(
            (Z, Y, X),
            dk.ls_angle_deg,
            dk.px_to_scan_ratio,
            dk.keep_overhang,
            dk.average_n_slices,
            dk.pixel_size_um,
        )
        out_scale = (1, 1) + tuple(voxel_size)
    else:
        frame_zyx = (Z, Y, X)
        out_scale = tuple(in_scale)
    m_single, mats_per_t = _warp_matrices(settings, time_indices)
    out_zyx = (
        tuple(int(s) for s in settings.output_shape_zyx)
        if settings.output_shape_zyx is not None
        else tuple(frame_zyx)
    )

    version = settings.output_ome_zarr_version or get_ome_zarr_version(
        Path(input_position_dirpaths[0]).parents[2]
    )
    create_empty_plate(
        store_path=output_dirpath,
        position_keys=[Path(p).parts[-3:] for p in input_position_dirpaths],
        channel_names=channel_names,
        shape=(len(time_indices), C) + out_zyx,
        scale=out_scale,
        version=version,
        metadata_sources=Path(input_position_dirpaths[0]).parents[2],
        metadata_keys=PROVENANCE_METADATA_KEYS,
    )

    n_stages = sum(
        s is not None
        for s in (settings.flat_field, settings.deconvolve, settings.deskew,
                  settings.registration, settings.stabilization)
    )
    time_minutes, num_cpus, gb_ram_per_cpu = estimate_resources(
        shape=(T, C, Z, Y, X), ram_multiplier=8 + 4 * n_stages, time_multiplier=0.5,
        max_num_cpus=16,
    )
    echo_resources(num_cpus, num_cpus * gb_ram_per_cpu, time_minutes)
    if init_only:
        click.echo(
            f"Initialized {output_dirpath} ({len(input_position_dirpaths)} positions)"
        )
        return
    if sbatch_filepath:
        click.echo(
            f"Resource overrides (compatibility): {sbatch_to_overrides(sbatch_filepath)}"
        )
    resolved = resolve_cluster(cluster=cluster)
    click.echo(f"Running on-device batches (mode='{resolved}')")

    # -- deconvolve stage setup (transfer function + prepared filter) --------
    tf_half = None
    prepared = None
    if settings.deconvolve is not None:
        from biahub_tpu.kernels.deconvolve import compute_transfer_function
        from biahub_tpu.kernels.pallas_fft import (
            deconvolve_pallas_supported,
            prepare_fourier_filter,
        )

        psf_dataset = open_ome_zarr(Path(psf_dirpath, "0/0/0"), mode="r")
        if list(in_scale[-3:]) != list(psf_dataset.scale[-3:]):
            click.echo(
                f"Warning: PSF scale: {psf_dataset.scale[-3:]} does not match "
                f"data scale: {in_scale[-3:]}. Consider resampling the PSF."
            )
        transfer_function = compute_transfer_function(
            psf_dataset.data[0, 0], output_zyx_shape=(Z, Y, X)
        )
        tf_store = open_ome_zarr(
            output_dirpath.parent / "transfer_function.zarr",
            layout="fov", mode="w", channel_names=["PSF"],
        )
        tf_store.create_image(
            "0",
            transfer_function[None, None],
            chunks=(1, 1, min(Z, 256), Y, X),
            transform=[TransformationMeta(type="scale", scale=psf_dataset.scale)],
        )
        tf_half = transfer_function[..., : X // 2 + 1]
        if deconvolve_pallas_supported((Z, Y, X)):
            prepared = prepare_fourier_filter(
                (Z, Y, X), (tf_half,),
                float(settings.deconvolve.regularization_strength),
            )

    # -- kernel composition ---------------------------------------------------
    # Everything below runs inside ONE jitted program per batch (the runner
    # vmaps + jits the kernel): stage handoffs never leave HBM.
    reg_strength = (
        float(settings.deconvolve.regularization_strength)
        if settings.deconvolve is not None
        else None
    )
    post_fetch = None
    per_unit_params = None
    workspace_bytes = 0
    # Whole-volume overhang fill is not part of the chain helpers' contract;
    # when requested, the stages compose explicitly (still one jit program,
    # just without the pass-C layout handoff).
    fill_needed = dk is not None and dk.keep_overhang and dk.overhang_fill != 0

    # Per-acquisition device arrays thread through the runner's
    # broadcast_params (traced jit ARGUMENTS, device-put once) — closing
    # over them would embed multi-hundred-MB HLO constants
    # (runtime/executor.py::_put_broadcast).
    broadcast: dict = {}
    if settings.deconvolve is not None:
        broadcast = {"tf_half": tf_half, "prepared": prepared}
    deskew_table = None
    if settings.deconvolve is not None and dk is not None and not fill_needed:
        from biahub_tpu.kernels.pallas_spectral import (
            prepare_spectral_deskew,
            spectral_deskew_supported,
        )

        if spectral_deskew_supported(
            (Z, Y, X), dk.ls_angle_deg, dk.px_to_scan_ratio,
            dk.keep_overhang, dk.average_n_slices,
        ):
            deskew_table = prepare_spectral_deskew(
                (Z, Y, X), dk.ls_angle_deg, dk.px_to_scan_ratio,
                dk.keep_overhang, dk.average_n_slices,
            )

    def pre_stage(zyx, tf_half=None, prepared=None, deskew_table=None):
        """The (deconvolve?, deskew?) prefix, in deskew's UNFLIPPED zyx
        output frame (the flip is a free host view or rides the warp)."""
        if settings.deconvolve is not None and dk is not None and not fill_needed:
            from biahub_tpu.kernels.chain import deconvolve_then_deskew

            return deconvolve_then_deskew(
                zyx, tf_half, reg_strength,
                dk.ls_angle_deg, dk.px_to_scan_ratio,
                keep_overhang=dk.keep_overhang,
                average_window=dk.average_n_slices,
                prepared=prepared, skip_flip=True,
                deskew_table=deskew_table,
            )
        if settings.deconvolve is not None:
            from biahub_tpu.kernels.deconvolve import deconvolve_zyx

            zyx = deconvolve_zyx(
                zyx, tf_half, regularization_strength=reg_strength,
                prepared=prepared,
            )
        if dk is not None:
            from biahub_tpu.kernels.deskew import deskew_zyx

            zyx = deskew_zyx(
                zyx, ls_angle_deg=dk.ls_angle_deg,
                px_to_scan_ratio=dk.px_to_scan_ratio,
                keep_overhang=dk.keep_overhang,
                average_window=dk.average_n_slices,
                overhang_fill=dk.overhang_fill,
                skip_flip=True,
            )
        return zyx

    if deskew_table is not None:
        broadcast["deskew_table"] = deskew_table
    if m_single is None and mats_per_t is None:
        # No warp stage: the deskew flip (if any) is a free host view.
        def kernel(zyx, **bc):
            return pre_stage(zyx, **bc)

        if (
            settings.deconvolve is not None
            and dk is not None
            and not fill_needed
        ):
            # Single-device batches run the manual-DMA zyx deskew stage
            # (kernels/chain.py deconvolve_then_deskew_batched; same
            # contract notes as the warp-chain batched_impl below).
            from biahub_tpu.kernels.chain import (
                deconvolve_then_deskew_batched,
            )

            def _batched_pre(volumes, tf_half=None, prepared=None,
                             deskew_table=None):
                return deconvolve_then_deskew_batched(
                    volumes, tf_half, reg_strength,
                    dk.ls_angle_deg, dk.px_to_scan_ratio,
                    keep_overhang=dk.keep_overhang,
                    average_window=dk.average_n_slices,
                    prepared=prepared, skip_flip=True,
                    deskew_table=deskew_table,
                )

            kernel.batched_impl = _batched_pre

        if dk is not None:
            post_fetch = lambda a: a[:, ::-1]  # noqa: E731
    elif m_single is not None:
        # One concrete matrix: the fully-fused chain path (the deskew flip
        # rides the warp's affine inside deconvolve_deskew_warp /
        # deskew_then_warp; static Pallas window plans apply).
        if settings.deconvolve is not None and dk is not None and not fill_needed:
            from biahub_tpu.kernels.chain import (
                chain_warp_spectral_route,
                deconvolve_deskew_warp,
            )
            from biahub_tpu.kernels.pallas_spectral import (
                prepare_spectral_deskew,
            )

            # The chain rides the spectral xzy engine when the warp is
            # in-plane (the table layout differs from the no-warp zyx one);
            # otherwise the pass-C xzy handoff and no table is needed.
            broadcast.pop("deskew_table", None)
            if chain_warp_spectral_route(
                (Z, Y, X), dk.ls_angle_deg, dk.px_to_scan_ratio,
                dk.keep_overhang, dk.average_n_slices, m_single,
            ):
                broadcast["deskew_table"] = prepare_spectral_deskew(
                    (Z, Y, X), dk.ls_angle_deg, dk.px_to_scan_ratio,
                    dk.keep_overhang, dk.average_n_slices, out_layout="xzy",
                )

            def kernel(zyx, tf_half=None, prepared=None, deskew_table=None):
                return deconvolve_deskew_warp(
                    zyx, tf_half, reg_strength,
                    dk.ls_angle_deg, dk.px_to_scan_ratio, m_single,
                    output_shape=out_zyx, keep_overhang=dk.keep_overhang,
                    average_window=dk.average_n_slices, prepared=prepared,
                    deskew_table=deskew_table,
                )

            # Single-device batches enter the chain through the batched
            # helper instead of vmap: its handoff route runs the deskew and
            # first warp pass through the manually double-buffered
            # manual-DMA kernels (DMA/MXU overlap the automatic kernels
            # cannot express under vmap; kernels/chain.py). The runner uses
            # this only when n_devices == 1 — the batch grid axis cannot be
            # SPMD-partitioned.
            from biahub_tpu.kernels.chain import (
                deconvolve_deskew_warp_batched,
            )

            def _batched_impl(volumes, tf_half=None, prepared=None,
                              deskew_table=None):
                return deconvolve_deskew_warp_batched(
                    volumes, tf_half, reg_strength,
                    dk.ls_angle_deg, dk.px_to_scan_ratio, m_single,
                    output_shape=out_zyx, keep_overhang=dk.keep_overhang,
                    average_window=dk.average_n_slices, prepared=prepared,
                    deskew_table=deskew_table,
                )

            kernel.batched_impl = _batched_impl
        elif dk is not None and settings.deconvolve is None and not fill_needed:
            from biahub_tpu.kernels.chain import deskew_then_warp

            def kernel(zyx):
                return deskew_then_warp(
                    zyx, dk.ls_angle_deg, dk.px_to_scan_ratio, m_single,
                    output_shape=out_zyx, keep_overhang=dk.keep_overhang,
                    average_window=dk.average_n_slices,
                )
        else:
            from biahub_tpu.kernels.affine import affine_warp_auto

            if dk is not None:
                from biahub_tpu.kernels.chain import flip_y_matrix

                m_total = flip_y_matrix(int(frame_zyx[1])) @ m_single
            else:
                m_total = m_single

            def kernel(zyx, **bc):
                return affine_warp_auto(pre_stage(zyx, **bc), m_total, out_zyx)
    else:
        # Per-timepoint matrices: traced through one compiled batched warp.
        # The deskew flip composes into every matrix (kernels/chain.py).
        if dk is not None:
            from biahub_tpu.kernels.chain import flip_y_matrix

            flip = flip_y_matrix(int(frame_zyx[1]))
            all_mats = [flip @ m for m in mats_per_t]
        else:
            all_mats = list(mats_per_t)
        stage, extras_fn, workspace_bytes = _make_warp_stage(
            all_mats, frame_zyx, out_zyx
        )

        def kernel(zyx, matrix, tf_half=None, prepared=None,
                   deskew_table=None, **extras):
            bc = dict(tf_half=tf_half, prepared=prepared,
                      deskew_table=deskew_table)
            return stage(pre_stage(zyx, **bc), matrix, **extras)

        def per_unit_params(u):
            return {
                "matrix": np.asarray(all_mats[u.t], dtype=np.float32),
                **extras_fn(u.t),
            }

    # -- flat-field stage: a per-channel prefix on the raw volume -------------
    # The correction is per-(t, c) self-contained (median-over-Z pattern,
    # reference: biahub/flat_field.py:37-54), so it prepends to every kernel
    # variant; non-selected channels run the rest of the chain unchanged
    # (the standalone verb would copy them — here the chain still applies).
    ff = settings.flat_field
    ff_targets: set[int] = set()
    other_stages = any(
        (settings.deconvolve, dk, settings.registration, settings.stabilization)
    )
    if ff is not None:
        from biahub_tpu.flat_field import _resolve_target_indices

        ff_targets = set(
            _resolve_target_indices(
                ff, channel_names,
                others_note=(
                    "Other channels skip the correction but run the rest of "
                    "the chain" if other_stages
                    else "Other channels will be copied as-is"
                ),
            )
        )

        from biahub_tpu.kernels.flat_field import flat_field_zyx

        base_kernel = kernel

        def kernel_ff(zyx, *args, **kwargs):
            return base_kernel(flat_field_zyx(zyx), *args, **kwargs)
    else:
        kernel_ff = kernel

    # Camera-dtype plates skip the device-side f32 cast when the chain's
    # FIRST stage is the deconvolve engine (its pass A converts uint16 in
    # VMEM — half the read bytes, no cast pass; every deconvolve route
    # casts itself where it needs f32). Flat-field and deskew-first chains
    # keep the runner's cast.
    if settings.deconvolve is not None and ff is None:
        kernel_ff.native_ingest_dtypes = ("uint16",)

    # -- run -------------------------------------------------------------------
    output_position_paths = get_output_paths(input_position_dirpaths, output_dirpath)
    input_positions = [open_ome_zarr(p, mode="r") for p in input_position_dirpaths]
    output_positions = [open_ome_zarr(p, mode="r+") for p in output_position_paths]
    for out_pos in output_positions:
        out_pos.update_zattrs({"biahub-fuse": settings.model_dump()})

    runner = BatchRunner(cluster=resolved)
    # The fused chain's internal spectra/handoff buffers are invisible to
    # shape tracing; budget roughly one extra input-volume footprint for the
    # deconvolution stage (XLA reuses the dead forward spectrum) on top of
    # any multipass common frame.
    if settings.deconvolve is not None:
        workspace_bytes += 4 * int(np.prod((Z, Y, X)))
    unit_bytes = 4 * (int(np.prod((Z, Y, X))) + int(np.prod(out_zyx))) + workspace_bytes
    if unit_bytes > runner.max_batch_bytes:
        # Degrade gracefully: the same invocation auto-composes the
        # standalone verbs' chunked kernels per (t, c) unit (bit-parity with
        # running the verbs sequentially; each stage self-splits the way the
        # reference's GPU X-split does, reference: biahub/deskew.py:554-582).
        # Only a deconvolve stage whose own minimal footprint cannot fit
        # keeps the fail-fast (an FFT has no exact spatial split — that
        # needs the multi-chip sharded FFT, BIAHUB_TPU_SHARDED_FFT).
        decon_bytes = 4 * 4 * int(np.prod((Z, Y, X)))
        if settings.deconvolve is not None and decon_bytes > runner.max_batch_bytes:
            raise click.ClickException(
                f"One deconvolution volume needs ~{decon_bytes / 2**30:.1f} "
                f"GiB on device, over the batch budget "
                f"({runner.max_batch_bytes / 2**30:.1f} GiB; "
                "BIAHUB_TPU_MAX_BATCH_BYTES). An FFT has no exact spatial "
                "split on one chip — raise the budget or shard the FFT "
                "across chips (BIAHUB_TPU_SHARDED_FFT=1)."
            )
        click.echo(
            f"One fused (t, c) volume needs ~{unit_bytes / 2**30:.1f} GiB, "
            f"over the device batch budget "
            f"({runner.max_batch_bytes / 2**30:.1f} GiB); composing the "
            "standalone verbs' chunked kernels per unit instead."
        )
        n = _fuse_over_budget(
            settings=settings,
            input_positions=input_positions,
            output_positions=output_positions,
            time_indices=time_indices,
            n_channels=C,
            ff_targets=ff_targets,
            tf_half=tf_half,
            prepared=prepared,
            reg_strength=reg_strength,
            dk=dk,
            m_single=m_single,
            mats_per_t=mats_per_t,
            frame_zyx=tuple(int(s) for s in frame_zyx),
            out_zyx=tuple(int(s) for s in out_zyx),
            budget=runner.max_batch_bytes,
            resume=resume,
            token=settings_fingerprint(settings),
        )
        click.echo(
            f"Fused (chunked fallback): {n} (t, c) volumes across "
            f"{len(input_position_dirpaths)} positions"
        )
        return

    units = [
        WorkUnit(p_idx, int(t), c, c, int(t_out))
        for p_idx in range(len(input_positions))
        for t_out, t in enumerate(time_indices)
        for c in range(C)
    ]
    run_kwargs = dict(
        resume=resume,
        resume_token=settings_fingerprint(settings),
        per_unit_params=per_unit_params,
        monitor=monitor and resolved != "debug",
        unit_workspace_bytes=workspace_bytes,
        post_fetch=post_fetch,
        broadcast_params=broadcast,
    )
    if ff is None:
        n = runner.run_units(
            kernel, units, input_positions, output_positions, **run_kwargs
        )
    else:
        ff_units = [u for u in units if u.c_in in ff_targets]
        plain_units = [u for u in units if u.c_in not in ff_targets]
        n = runner.run_units(
            kernel_ff, ff_units, input_positions, output_positions, **run_kwargs
        )
        if plain_units and not other_stages:
            # flat-field is the ONLY stage: the rest of the chain is the
            # identity, so non-selected channels are a host-side copy (same
            # as the standalone verb; reference: biahub/flat_field.py:84-97).
            runner.copy_channels(
                input_positions,
                output_positions,
                sorted({(u.c_in, u.c_out) for u in plain_units}),
                time_indices=time_indices,
            )
            n += len(plain_units)
        elif plain_units:
            n += runner.run_units(
                kernel, plain_units, input_positions, output_positions,
                **run_kwargs,
            )
    stages = [
        name
        for name, s in (
            ("flat-field", settings.flat_field),
            ("deconvolve", settings.deconvolve),
            ("deskew", settings.deskew),
            ("register", settings.registration),
            ("stabilize", settings.stabilization),
        )
        if s is not None
    ]
    click.echo(
        f"Fused {'+'.join(stages)}: {n} (t, c) volumes across "
        f"{len(input_positions)} positions"
    )


@click.command("fuse")
@input_position_dirpaths()
@config_filepath()
@output_dirpath()
@click.option(
    "--psf-dirpath",
    "-p",
    required=False,
    type=click.Path(exists=True, file_okay=False, dir_okay=True),
    callback=lambda ctx, opt, value: None if value is None else Path(value),
    help="Path to psf.zarr (required when the config has a deconvolve stage)",
)
@sbatch_filepath()
@cluster()
@monitor()
@init_only()
@resume()
@num_processes()
def fuse_cli(
    input_position_dirpaths: list[Path],
    config_filepath: Path,
    output_dirpath: Path,
    psf_dirpath: Path | None = None,
    sbatch_filepath: str | None = None,
    cluster: str = "slurm",
    monitor: bool = False,
    init_only: bool = False,
    resume: bool = False,
    num_processes: int = 1,
):
    """Run deconvolve -> deskew -> register/stabilize fused on device.

    Each configured stage matches its standalone verb exactly, but the chain
    compiles into ONE device program per (t, c) volume — no intermediate
    zarr stores, no HBM round trips between verbs.

    \b
    Fuse the full reconstruction chain over a plate:
    >>> biahub fuse -i ./raw.zarr/*/*/* -p ./psf.zarr -c ./fuse_params.yml -o ./out.zarr
    """  # noqa: D301
    fuse(
        input_position_dirpaths=input_position_dirpaths,
        config_filepath=config_filepath,
        output_dirpath=output_dirpath,
        psf_dirpath=psf_dirpath,
        sbatch_filepath=sbatch_filepath,
        cluster=cluster,
        monitor=monitor,
        init_only=init_only,
        resume=resume,
    )


if __name__ == "__main__":
    fuse_cli()
