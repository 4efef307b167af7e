"""Spatially-sharded deconvolution: one volume split across a device mesh.

The single-chip engine (kernels/pallas_fft.py) holds the whole volume and its
spectrum in one chip's HBM. Volumes beyond that fall back to host-streamed
X-slabs on one chip — correct, but serial. On a pod, this module instead
shards ONE volume's FFT across a mesh axis with ICI collectives (the
distributed-transpose FFT decomposition):

- **Pass A** is z-slice-local: each device runs the rfft_X + DFT_Y Pallas
  pass on its own z-slab.
- **all_to_all #1** reshards the spectrum from z-slabs to ky-row shards
  (the classic FFT "transpose" step, riding ICI).
- **Pass B** is ky-row-local: each device filters its ky rows with the full
  global-Z DFT chain.
- **all_to_all #2** reshards back to z-slabs for the local inverse pass C.
- The peeled Nyquist plane (Z, Y) is tiny; it is all_gathered, transformed
  replicated in XLA, and re-sliced.

Per-shard compute reuses the exact single-chip Pallas kernels (radix-2 y and
the Nyquist peel included); radix-2 z is disabled because the global-z
even/odd split does not commute with z-slab sharding. Numerics therefore
match the single-chip engine to the same ~1e-5 ('high') tolerance.

Requirements: Z, Y (and Y/2 when the y-radix engages) divisible by the mesh
axis size. No reference analog — the reference tops out at one GPU per
volume (biahub/deconvolve.py:121-131); this is the TPU-native scale-out for
FOVs beyond one chip's HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from biahub_tpu.kernels.pallas_fft import (
    _VMEM_BUDGET_BYTES,
    _build_filt_main,
    _dft_mats,
    _fwd_yx_kernel,
    _idft_mats,
    _inv_yx_kernel,
    _irfft_mats,
    _nyq_filter_chain,
    _pass_b_kernel,
    _pipeline_flags,
    _precision,
    _radix_x_fwd_mats,
    _radix_x_inv_mats,
    _rfft_mats,
    _twiddles,
)

__all__ = [
    "deconvolve_zyx_sharded",
    "fourier_filter_zyx_sharded",
    "sharded_fft_supported",
]


def sharded_fft_supported(shape, n_devices: int) -> bool:
    """True when (Z, Y, X) cleanly shards across ``n_devices`` AND the
    per-shard working sets fit VMEM.

    Pass B carries four dense (Z, Z) DFT matrices plus full-global-Z row
    tiles (radix-2 z is off in sharded mode), so very deep volumes can blow
    the scoped-VMEM budget even though they shard cleanly — those must fall
    back to the single-chip X-slab path.
    """
    z, y, x = shape
    if z % n_devices or y % n_devices:
        return False
    if min(z, y, x) < 2:
        return False
    xh = x // 2 + 1
    f32 = 4
    # Pass B per-program working set at GLOBAL z: up to four (complex
    # filter) inputs + two outputs double-buffered, four (Z, Z) matrices,
    # and whole-row temporaries (hr/hi + bf16 split halves).
    pass_b = (6 * 2 * z * xh + 4 * z * xh + 4 * z * z) * f32
    # Pass A/C per-program: (zb<=2, Y, X) blocks + spectra slices + mats.
    pass_ac = (2 * y * x + 2 * x * xh + 2 * y * y + 12 * y * xh) * f32 * 2
    return max(pass_b, pass_ac) < _VMEM_BUDGET_BYTES


def _t01(a):
    return jnp.transpose(a, (1, 0, 2))


def deconvolve_zyx_sharded(
    volume: jax.Array,
    transfer_function_half: jax.Array,
    mesh,
    axis_name: str = "space",
    regularization_strength: float = 1e-3,
) -> jax.Array:
    """Tikhonov-deconvolve one ZYX volume sharded over ``mesh[axis_name]``.

    ``volume`` may be a global array (jit + shard_map partition it) and the
    result comes back sharded the same way; the transfer function is
    replicated. See the module docstring for the decomposition.
    """
    return _run_sharded(
        volume,
        (transfer_function_half.astype(jnp.float32),),
        mesh,
        axis_name,
        reg=float(regularization_strength),
    )


def fourier_filter_zyx_sharded(
    volume: jax.Array,
    filter_half_real: jax.Array,
    filter_half_imag: jax.Array,
    mesh,
    axis_name: str = "space",
) -> jax.Array:
    """Sharded complex-Hermitian frequency filter (the phase-reconstruction
    inverse); the sharded analog of
    kernels.pallas_fft.fourier_filter_zyx_pallas."""
    return _run_sharded(
        volume,
        (
            filter_half_real.astype(jnp.float32),
            filter_half_imag.astype(jnp.float32),
        ),
        mesh,
        axis_name,
        reg=None,
    )


# Compiled programs keyed on everything that shapes the computation — the
# deconvolve verb calls _run_sharded once per (t, c) volume, and without
# this cache every call would rebuild and recompile the whole 3-kernel
# shard_map program (20-300 s per compile over the axon tunnel).
_PROGRAM_CACHE: dict = {}


def _run_sharded(volume, filter_arrays, mesh, axis_name, reg):
    n = int(mesh.shape[axis_name])
    z, y, x = (int(s) for s in volume.shape)
    if not sharded_fft_supported((z, y, x), n):
        raise ValueError(
            f"volume {volume.shape} does not shard over {n} devices: Z and Y "
            "must be divisible by the mesh axis size and the per-shard "
            "working sets must fit VMEM"
        )
    import os

    key = (
        mesh,
        axis_name,
        (z, y, x),
        len(filter_arrays),
        None if reg is None else float(reg),
        _precision(),
        os.environ.get("BIAHUB_TPU_FFT_RADIX_MIN", "256"),
        jax.default_backend(),
    )
    fn = _PROGRAM_CACHE.get(key)
    if fn is None:
        fn = _build_sharded_program(z, y, x, n, mesh, axis_name, reg,
                                    len(filter_arrays))
        _PROGRAM_CACHE[key] = fn
    return fn(volume, *filter_arrays)


def _build_sharded_program(z, y, x, n, mesh, axis_name, reg, n_filt_arg):
    """Build and jit the sharded 3-pass program (cached by _run_sharded)."""
    # X flags shared with the single-chip driver (the X transforms are
    # shard-local per z-slice, so the radix-2/4 X path applies unchanged).
    peel, xw, radix_x, _, _, interpret = _pipeline_flags(z, y, x)
    import os

    radix_min = int(os.environ.get("BIAHUB_TPU_FFT_RADIX_MIN", "256"))
    y2 = y // 2
    radix_y = y % 16 == 0 and y >= radix_min and y2 % n == 0
    ny = 2 if radix_y else 1
    yw = y2 if radix_y else y  # per-parity ky rows (global)
    yw_l = yw // n
    z_l = z // n
    zb = 2 if z_l % 2 == 0 else 1
    prec = _precision()

    if radix_x:
        cx, sx, *x_fwd_extra = (
            jnp.asarray(m) for m in _radix_x_fwd_mats(x, radix_x)
        )
        x_fwd_extra = tuple(x_fwd_extra)
        ax, bx, *x_inv_extra = (
            jnp.asarray(m) for m in _radix_x_inv_mats(x, radix_x)
        )
        x_inv_extra = tuple(x_inv_extra)
    else:
        cx, sx = (jnp.asarray(m[:, :xw]) for m in _rfft_mats(x))
        ax, bx = (jnp.asarray(m[:xw]) for m in _irfft_mats(x))
        x_fwd_extra = ()
        x_inv_extra = ()
    if radix_y:
        wyr, wyi = (jnp.asarray(m) for m in _dft_mats(y2))
        iyr, iyi = (jnp.asarray(m / 2.0) for m in _idft_mats(y2))
        twy = tuple(jnp.asarray(m) for m in _twiddles(y2, y, -1.0))
        ctw = tuple(jnp.asarray(m) for m in _twiddles(y2, y, +1.0))
    else:
        wyr, wyi = (jnp.asarray(m) for m in _dft_mats(y))
        iyr, iyi = (jnp.asarray(m) for m in _idft_mats(y))
        twy = ()
        ctw = ()
    wzr, wzi = (jnp.asarray(m) for m in _dft_mats(z))
    izr, izi = (jnp.asarray(m) for m in _idft_mats(z))

    n_filt = n_filt_arg

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    vmem_params = (
        {}
        if interpret
        else {
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_BUDGET_BYTES
            )
        }
    )
    nspec = ny * 2

    def shard_step(v_shard, nyq_planes, *filt_shards):
        # ---- pass A on this device's z-slab --------------------------------
        spec_zslice = pl.BlockSpec(
            (zb, yw, xw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        a_out_specs = [spec_zslice] * nspec
        a_out_shapes = [jax.ShapeDtypeStruct((z_l, yw, xw), jnp.float32)] * nspec
        if peel:
            a_out_specs.append(
                pl.BlockSpec((zb, y, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            )
            a_out_shapes.append(jax.ShapeDtypeStruct((z_l, y, 128), jnp.float32))
        a_out = pl.pallas_call(
            partial(
                _fwd_yx_kernel,
                prec=prec, zb=zb, peel=peel, radix_z=False, radix_y=radix_y,
                radix_x=radix_x,
            ),
            grid=(z_l // zb,),
            in_specs=[
                pl.BlockSpec((zb, y, x), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                full(tuple(cx.shape)),
                full(tuple(cx.shape)),
                full((yw, yw)),
                full((yw, yw)),
            ]
            + [full(tuple(m.shape)) for m in x_fwd_extra]
            + ([full((y2, 1))] * 2 if radix_y else []),
            out_specs=tuple(a_out_specs),
            out_shape=tuple(a_out_shapes),
            interpret=interpret,
            **vmem_params,
        )(v_shard.astype(jnp.float32), cx, sx, wyr, wyi, *x_fwd_extra, *twy)
        spectra = list(a_out[:nspec])

        nyq_local = None
        if peel:
            # Tiny (Z, Y) plane: gather it whole, transform replicated, keep
            # this device's z rows for pass C.
            nyq_full = jax.lax.all_gather(
                a_out[-1][..., 0], axis_name, axis=0, tiled=True
            )
            plane = _nyq_filter_chain(nyq_full, nyq_planes, reg, x)
            idx = jax.lax.axis_index(axis_name)
            local = jax.lax.dynamic_slice_in_dim(plane, idx * z_l, z_l, axis=0)
            nyq_local = jnp.pad(local[:, :, None], ((0, 0), (0, 0), (0, 127)))

        # ---- resharding #1: z-slabs -> ky-row shards (ICI all_to_all) ------
        # (z_l, yw, xw) split along ky, concat along z -> (z, yw_l, xw).
        spectra = [
            _t01(jax.lax.all_to_all(s, axis_name, 1, 0, tiled=True))
            for s in spectra
        ]  # each (yw_l, z, xw)

        # ---- pass B on this device's ky rows (full global Z) ---------------
        spec_row = pl.BlockSpec((1, z, xw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        filtered = pl.pallas_call(
            partial(
                _pass_b_kernel,
                reg=reg, prec=prec, radix_z=False, ny=ny, n_filt=n_filt,
            ),
            grid=(yw_l,),
            in_specs=[spec_row] * nspec
            + [spec_row] * len(filt_shards)
            + [full((z, z))] * 4,
            out_specs=(spec_row,) * nspec,
            out_shape=tuple(
                jax.ShapeDtypeStruct((yw_l, z, xw), jnp.float32)
                for _ in range(nspec)
            ),
            input_output_aliases={i: i for i in range(nspec)},
            interpret=interpret,
            **vmem_params,
        )(*spectra, *filt_shards, wzr, wzi, izr, izi)

        # ---- resharding #2: ky-row shards -> z-slabs -----------------------
        # (yw_l, z, xw) split along z, concat along ky -> (yw, z_l, xw).
        filtered = [
            _t01(jax.lax.all_to_all(h, axis_name, 1, 0, tiled=True))
            for h in filtered
        ]  # each (z_l, yw, xw)

        # ---- pass C on this device's z-slab --------------------------------
        c_in_specs = [spec_zslice] * nspec + [full((yw, yw))] * 2
        c_args = list(filtered) + [iyr, iyi]
        if radix_y:
            c_in_specs += [full((y2, 1))] * 2
            c_args += list(ctw)
        c_in_specs += [full(tuple(ax.shape))] * 2
        c_in_specs += [full(tuple(m.shape)) for m in x_inv_extra]
        c_args += [ax, bx, *x_inv_extra]
        if peel:
            c_in_specs.append(
                pl.BlockSpec((zb, y, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            )
            c_args.append(nyq_local)
        out = pl.pallas_call(
            partial(
                _inv_yx_kernel,
                prec=prec, zb=zb, peel=peel, radix_z=False, radix_y=radix_y,
                radix_x=radix_x,
            ),
            grid=(z_l // zb,),
            in_specs=c_in_specs,
            out_specs=pl.BlockSpec(
                (zb, y, x), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((z_l, y, x), jnp.float32),
            interpret=interpret,
            **vmem_params,
        )(*c_args)
        return out

    mapped = jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(axis_name), P()) + (P(axis_name),) * (n_filt * ny),
        out_specs=P(axis_name),
        # The Pallas out_shapes carry no mesh-varying annotation; every op in
        # the body is shard-local or an explicit collective.
        check_vma=False,
    )

    def run(vol_arr, *f_arrays):
        # ky-major, parity-split filter rows, sharded over the mesh axis so
        # each device receives exactly its pass-B rows (order matches
        # _pass_b_kernel: per ky parity, all filter components). Only the
        # tiny (Z, Y) Nyquist planes are replicated — never whole filter
        # volumes, which would defeat the per-device memory scaling this
        # module exists for.
        filt_sharded = _build_filt_main(
            f_arrays, xw, radix_x, radix_y, n_filt
        )
        planes = tuple(f[..., -1] for f in f_arrays) if peel else ()
        return mapped(vol_arr, planes, *filt_sharded)

    return jax.jit(run)
