"""Fused multi-verb device chains.

The production pipeline runs deconvolve -> deskew -> register -> stabilize
as separate verbs with a zarr store between each (reference:
nextflow/mantis-v2.nf step order); on TPU the whole chain also compiles as
ONE XLA program per volume batch — no intermediate HBM round trips beyond
the kernels' own, no host transfers. This module holds the chain
compositions that exploit cross-verb layout algebra which the individual
kernels cannot see:

- deskew's coverslip-axis flip is a pure affine (y -> Y-1-y). A standalone
  deskew must materialize it, and once the downstream warp moves X to the
  major axis the flip lands on the LANE axis where XLA's rev costs ~1.3 ms
  per flagship volume. Composing the flip matrix into the warp's affine
  makes it free: deskew emits the unflipped (Y-reversed) volume
  (``skip_flip=True``) and the warp samples through F @ M.

Used by bench.py's end-to-end chain and available to fused pipeline
executors.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "flip_y_matrix",
    "deskew_then_warp",
    "deconvolve_then_deskew",
    "deconvolve_then_deskew_batched",
    "deconvolve_deskew_warp",
    "deconvolve_deskew_warp_batched",
    "chain_warp_spectral_route",
]


def chain_warp_spectral_route(
    zyx_shape: tuple[int, int, int],
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool,
    average_window: int,
    matrix,
) -> bool:
    """True when :func:`deconvolve_deskew_warp` will ride the spectral
    ``out_layout='xzy'`` engine for this geometry + warp matrix.

    Callers that jit the chain use this to hoist the per-acquisition lerp
    table (``prepare_spectral_deskew(..., out_layout='xzy')``) and thread it
    through as a traced argument — a lazily-built table becomes a
    multi-hundred-MB HLO constant that remote compile relays reject.
    """
    from biahub_tpu.kernels.affine import is_inplane_matrix
    from biahub_tpu.kernels.deskew import get_deskewed_data_shape
    from biahub_tpu.kernels.pallas_spectral import spectral_deskew_supported

    Z, Y, X = (int(s) for s in zyx_shape)
    use_pallas = (
        jax.default_backend() == "tpu"
        or os.environ.get("BIAHUB_TPU_FORCE_PALLAS") == "1"
    ) and os.environ.get("BIAHUB_TPU_NO_PALLAS") != "1"
    if not (
        use_pallas
        and spectral_deskew_supported(
            (Z, Y, X), ls_angle_deg, px_to_scan_ratio, keep_overhang,
            int(average_window), out_layout="xzy",
        )
    ):
        return False
    dshape_full, _ = get_deskewed_data_shape(
        (Z, Y, X), ls_angle_deg, px_to_scan_ratio, keep_overhang
    )
    m = flip_y_matrix(int(dshape_full[1])) @ np.asarray(
        matrix, dtype=np.float64
    )
    return bool(is_inplane_matrix(m))


def _route_echo(helper: str, engine: str, why: str = "") -> None:
    """One-line route note under BIAHUB_TPU_PROFILE (trace-time, once per
    compiled program) — prevents silent perf cliffs when a production shape
    slips past a fusion gate (e.g. the 64 MiB fused-handoff bound)."""
    if os.environ.get("BIAHUB_TPU_PROFILE"):
        import sys

        note = f" ({why})" if why else ""
        print(f"[biahub-tpu] {helper}: {engine}{note}", file=sys.stderr)


def _handoff_gate(zyx_shape, avg, ls_angle_deg, px_to_scan_ratio,
                  keep_overhang):
    """(fused_ok, deskewed_unaveraged_shape) for the pass-C layout handoff.

    One shared gate for every chain helper: the Pallas deconvolve must
    support the shape, pass C's 8-z blocks need Z % 8 == 0, and the
    pre-transposed input only suits deskew's fused-averaging kernel (the
    same 64 MiB double-buffered working-set bound deskew_zyx applies).
    """
    import os

    from biahub_tpu.kernels.deskew import get_deskewed_data_shape
    from biahub_tpu.kernels.pallas_fft import deconvolve_pallas_supported

    Z, Y, X = zyx_shape
    dshape, _ = get_deskewed_data_shape(
        (Z, Y, X), ls_angle_deg, px_to_scan_ratio, keep_overhang
    )
    use_pallas = (
        jax.default_backend() == "tpu"
        or os.environ.get("BIAHUB_TPU_FORCE_PALLAS") == "1"
    ) and os.environ.get("BIAHUB_TPU_NO_PALLAS") != "1"
    fused_ok = 2 * (avg * Z * X * 4 + X * dshape[2] * 4) < 64 * 1024 * 1024
    ok = (use_pallas and deconvolve_pallas_supported((Z, Y, X))
          and Z % 8 == 0 and fused_ok)
    return ok, dshape


def deconvolve_then_deskew(
    volume: jax.Array,
    transfer_function_half: jax.Array,
    regularization_strength: float,
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool = False,
    average_window: int = 1,
    prepared=None,
    skip_flip: bool = False,
    deskew_table=None,
) -> jax.Array:
    """Deconvolve then deskew, fused as deep as the geometry allows.

    Output is identical to ``deskew_zyx(deconvolve_zyx(v))`` (standard
    flipped zyx frame). Preferred engine: the SPECTRAL fusion
    (kernels/pallas_spectral.py) — the scan-axis lerp evaluates straight
    from the z-spectrum, so the deconvolved volume never touches HBM and
    the whole deskew pass disappears. Where its gates fail, the pass-C
    layout handoff engages instead (deconvolve's pass C emits deskew's
    tilt-major padded input, ~1.6 ms saved per flagship volume); where
    THOSE gates fail, the standard composition runs.

    ``skip_flip`` returns the Y (coverslip) axis REVERSED — an XLA rev of
    the deskewed volume costs ~1 ms; consumers that write to storage apply
    the flip as a free host view instead (the deskew verb's post_fetch),
    and fused pipelines fold it into the next warp's affine.
    ``deskew_table``: a prepare_spectral_deskew result to hoist the
    per-acquisition lerp table out of the hot loop (built lazily, cached by
    geometry, when omitted).
    """
    from biahub_tpu.kernels.deconvolve import deconvolve_zyx
    from biahub_tpu.kernels.deskew import deskew_zyx

    Z, Y, X = (int(s) for s in volume.shape)
    avg = int(average_window)

    from biahub_tpu.kernels.pallas_spectral import (
        deconvolve_deskew_zyx_spectral,
        spectral_deskew_supported,
    )

    use_pallas = (
        jax.default_backend() == "tpu"
        or os.environ.get("BIAHUB_TPU_FORCE_PALLAS") == "1"
    ) and os.environ.get("BIAHUB_TPU_NO_PALLAS") != "1"
    if use_pallas and spectral_deskew_supported(
        (Z, Y, X), ls_angle_deg, px_to_scan_ratio, keep_overhang, avg
    ):
        _route_echo("deconvolve_then_deskew", "spectral engine")
        out = deconvolve_deskew_zyx_spectral(
            volume, transfer_function_half, regularization_strength,
            ls_angle_deg=ls_angle_deg, px_to_scan_ratio=px_to_scan_ratio,
            keep_overhang=keep_overhang, average_window=avg,
            prepared=prepared, deskew_table=deskew_table,
        )
        return out if skip_flip else jnp.flip(out, axis=1)

    ok, _ = _handoff_gate((Z, Y, X), avg, ls_angle_deg, px_to_scan_ratio,
                          keep_overhang)
    if not ok:
        _route_echo(
            "deconvolve_then_deskew", "standard composition",
            "spectral + pass-C handoff gates failed for "
            f"shape={(Z, Y, X)} avg={avg}",
        )
        decon = deconvolve_zyx(
            volume, transfer_function_half,
            regularization_strength=regularization_strength,
            prepared=prepared,
        )
        return deskew_zyx(
            decon, ls_angle_deg=ls_angle_deg,
            px_to_scan_ratio=px_to_scan_ratio,
            keep_overhang=keep_overhang, average_window=average_window,
            skip_flip=skip_flip,
        )

    from biahub_tpu.kernels.pallas_deskew import deskew_zyx_pallas
    from biahub_tpu.kernels.pallas_fft import deconvolve_zyx_pallas

    _route_echo("deconvolve_then_deskew", "pass-C layout handoff")
    groups = -(-Y // avg)
    pad_front = groups * avg - Y
    decon_yzx = deconvolve_zyx_pallas(
        volume, transfer_function_half,
        regularization_strength=regularization_strength,
        yzx_pad=pad_front, prepared=prepared,
    )
    return deskew_zyx_pallas(
        decon_yzx, ls_angle_deg, px_to_scan_ratio, keep_overhang,
        average_window=avg, pre_transposed_zyx_shape=(Z, Y, X),
        skip_flip=skip_flip,
    )


def deconvolve_then_deskew_batched(
    volumes: jax.Array,
    transfer_function_half: jax.Array,
    regularization_strength: float,
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool = False,
    average_window: int = 1,
    prepared=None,
    skip_flip: bool = False,
    deskew_table=None,
) -> jax.Array:
    """Batched :func:`deconvolve_then_deskew` — bit-identical to vmapping
    it, but the pass-C handoff route runs the deskew stage through the
    manually double-buffered zyx kernel
    (:func:`~biahub_tpu.kernels.pallas_deskew.deskew_zyx_pallas_batched`
    with ``out_layout="zyx"``): its explicit DMA chain overlaps the slab
    fetches with the banded MXU dots, which Mosaic's automatic pipeline
    cannot (0.99 -> 0.67 ms/vol measured for the xzy twin). Pallas forbids
    the non-trivial ANY-space indexing a vmapped manual kernel would need,
    so batched callers (bench's headline step, the deconvolve+deskew fuse
    config, the BatchRunner via ``batched_impl``) enter here.

    Single-device batches only: the batch grid axis cannot be
    SPMD-partitioned — multi-device executors keep the vmapped form.
    """
    from biahub_tpu.kernels.pallas_deskew import manual_dma_deskew_supported
    from biahub_tpu.kernels.pallas_spectral import spectral_deskew_supported

    Z, Y, X = (int(s) for s in volumes.shape[1:])
    avg = int(average_window)

    def per_volume(v):
        return deconvolve_then_deskew(
            v, transfer_function_half, regularization_strength,
            ls_angle_deg, px_to_scan_ratio, keep_overhang=keep_overhang,
            average_window=avg, prepared=prepared, skip_flip=skip_flip,
            deskew_table=deskew_table,
        )

    use_pallas = (
        jax.default_backend() == "tpu"
        or os.environ.get("BIAHUB_TPU_FORCE_PALLAS") == "1"
    ) and os.environ.get("BIAHUB_TPU_NO_PALLAS") != "1"
    spectral = use_pallas and spectral_deskew_supported(
        (Z, Y, X), ls_angle_deg, px_to_scan_ratio, keep_overhang, avg
    )
    ok, _ = _handoff_gate((Z, Y, X), avg, ls_angle_deg, px_to_scan_ratio,
                          keep_overhang)
    if (
        spectral
        or not ok
        or not manual_dma_deskew_supported((Z, Y, X), avg, "zyx")
    ):
        return jax.vmap(per_volume)(volumes)

    from biahub_tpu.kernels.pallas_deskew import deskew_zyx_pallas_batched
    from biahub_tpu.kernels.pallas_fft import deconvolve_zyx_pallas

    _route_echo(
        "deconvolve_then_deskew_batched",
        "pass-C layout handoff (manual-DMA zyx deskew)",
    )
    # Pass C pads the tilt axis for the manual kernel's 8-aligned group
    # blocks (groups8 contract — deskew_zyx_pallas_batched docstring).
    groups = -(-Y // avg)
    pad_total = (-(-groups // 8) * 8) * avg - Y
    decon_yzx = jax.vmap(
        lambda v: deconvolve_zyx_pallas(
            v, transfer_function_half,
            regularization_strength=regularization_strength,
            yzx_pad=pad_total, prepared=prepared,
        )
    )(volumes)
    return deskew_zyx_pallas_batched(
        decon_yzx, ls_angle_deg, px_to_scan_ratio, keep_overhang,
        average_window=avg, skip_flip=skip_flip,
        pre_transposed_zyx_shape=(Z, Y, X), out_layout="zyx",
    )


def flip_y_matrix(y_size: int) -> np.ndarray:
    """OUTPUT->INPUT affine flipping the Y axis of a ``y_size`` volume."""
    f = np.eye(4)
    f[1, 1] = -1.0
    f[1, 3] = float(y_size - 1)
    return f


def deskew_then_warp(
    volume: jax.Array,
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    matrix,
    output_shape: tuple[int, int, int] | None = None,
    keep_overhang: bool = False,
    average_window: int = 1,
    fill: float = 0.0,
) -> jax.Array:
    """Deskew, then apply an affine warp, with the deskew flip folded in.

    Bit-equivalent in structure to ``affine_warp_auto(deskew_zyx(v), M)``
    (to warp-precision tolerance: the composed y coefficients are the
    negated originals, which reorders float rounding), but the deskew
    Y-flip never materializes — it rides the warp's y-pass coordinates via
    ``F @ M``: the warp's matrix maps output coords to coords in the
    CORRECT (flipped) deskew frame, and the stored unflipped array index is
    F of that (F is an involution).
    """
    from biahub_tpu.kernels.affine import affine_warp_auto
    from biahub_tpu.kernels.deskew import deskew_zyx

    deskewed = deskew_zyx(
        volume,
        ls_angle_deg=ls_angle_deg,
        px_to_scan_ratio=px_to_scan_ratio,
        keep_overhang=keep_overhang,
        average_window=average_window,
        skip_flip=True,
    )
    out_shape = tuple(
        int(s) for s in (output_shape if output_shape is not None else deskewed.shape)
    )
    m = flip_y_matrix(int(deskewed.shape[1])) @ np.asarray(matrix, dtype=np.float64)
    return affine_warp_auto(deskewed, m, out_shape, fill=fill)


def deconvolve_deskew_warp(
    volume: jax.Array,
    transfer_function_half: jax.Array,
    regularization_strength: float,
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    matrix,
    output_shape: tuple[int, int, int] | None = None,
    keep_overhang: bool = False,
    average_window: int = 1,
    fill: float = 0.0,
    prepared=None,
    deskew_table=None,
) -> jax.Array:
    """The full fused reconstruction chain with every cross-verb layout
    optimization engaged.

    Preferred engine (in-plane warp, spectral-supported geometry): the
    SPECTRAL fusion emits the deskewed volume straight out of the frequency
    domain in the warp's (X', Z', Y') input layout
    (kernels/pallas_spectral.py ``out_layout='xzy'``) — the deconvolved
    volume never touches HBM, the whole deskew pass disappears, and zero
    transposes sit between the engine and the warp. ``deskew_table``: a
    ``prepare_spectral_deskew(..., out_layout='xzy')`` result to hoist the
    per-acquisition lerp table (built lazily when omitted).

    Otherwise, on the Pallas path with an 8-divisible Z, deconvolve's pass C
    emits the (Y + pad, Z, X) tilt-major edge-padded layout deskew consumes
    natively (pallas_fft.py ``yzx_pad``) — the deskew-prep transpose + pad
    copies (~1.6 ms per flagship volume) never materialize — and the deskew
    Y-flip rides the warp's affine (:func:`deskew_then_warp`). Anywhere the
    gates fail, the same composition runs through the verbs' standard
    contracts.
    """
    from biahub_tpu.kernels.deconvolve import deconvolve_zyx

    Z, Y, X = (int(s) for s in volume.shape)
    avg = int(average_window)

    from biahub_tpu.kernels.affine import inplane_affine_warp_zyx_pallas
    from biahub_tpu.kernels.deskew import get_deskewed_data_shape
    from biahub_tpu.kernels.pallas_spectral import (
        deconvolve_deskew_zyx_spectral,
    )

    if chain_warp_spectral_route(
        (Z, Y, X), ls_angle_deg, px_to_scan_ratio, keep_overhang, avg,
        matrix,
    ):
        _route_echo("deconvolve_deskew_warp", "spectral engine (xzy)")
        dshape_full, _ = get_deskewed_data_shape(
            (Z, Y, X), ls_angle_deg, px_to_scan_ratio, keep_overhang
        )
        groups = -(-Y // avg)
        d_zyx_shape = (groups, dshape_full[1], dshape_full[2])
        m = flip_y_matrix(int(dshape_full[1])) @ np.asarray(
            matrix, dtype=np.float64
        )
        xzy = deconvolve_deskew_zyx_spectral(
            volume, transfer_function_half, regularization_strength,
            ls_angle_deg=ls_angle_deg,
            px_to_scan_ratio=px_to_scan_ratio,
            keep_overhang=keep_overhang, average_window=avg,
            prepared=prepared, deskew_table=deskew_table,
            out_layout="xzy",
        )  # (X', Z'_pad, Y') — zero slices beyond `groups`
        out_shape = tuple(
            int(s) for s in
            (output_shape if output_shape is not None else d_zyx_shape)
        )
        return inplane_affine_warp_zyx_pallas(
            xzy, m, out_shape, fill=fill, input_xzy=True,
            logical_zyx_shape=d_zyx_shape,
        )

    ok, dshape = _handoff_gate((Z, Y, X), avg, ls_angle_deg,
                               px_to_scan_ratio, keep_overhang)
    if not ok:
        _route_echo(
            "deconvolve_deskew_warp", "standard composition",
            "spectral + pass-C handoff gates failed for "
            f"shape={(Z, Y, X)} avg={avg}",
        )
        decon = deconvolve_zyx(
            volume, transfer_function_half,
            regularization_strength=regularization_strength,
            prepared=prepared,
        )
        return deskew_then_warp(
            decon, ls_angle_deg, px_to_scan_ratio, matrix,
            output_shape=output_shape, keep_overhang=keep_overhang,
            average_window=average_window, fill=fill,
        )

    from biahub_tpu.kernels.affine import affine_warp_auto, is_inplane_matrix
    from biahub_tpu.kernels.pallas_deskew import deskew_zyx_pallas
    from biahub_tpu.kernels.pallas_fft import deconvolve_zyx_pallas

    # Deskew emits the warp's (X', Z', Y') input layout when the warp can
    # consume it (in-plane matrix, order-1) — zero transposes between the
    # verbs. The flip matrix composes before the in-plane check (it only
    # negates in-plane entries).
    m = flip_y_matrix(int(dshape[1])) @ np.asarray(matrix, dtype=np.float64)
    xzy = is_inplane_matrix(m)
    _route_echo(
        "deconvolve_deskew_warp",
        "pass-C layout handoff" + (" (xzy)" if xzy else ""),
    )
    groups = -(-Y // avg)
    pad_total = ((-(-groups // 8) * 8) if xzy else groups) * avg - Y

    decon_yzx = deconvolve_zyx_pallas(
        volume, transfer_function_half,
        regularization_strength=regularization_strength,
        yzx_pad=pad_total, prepared=prepared,
    )
    deskewed = deskew_zyx_pallas(
        decon_yzx, ls_angle_deg, px_to_scan_ratio, keep_overhang,
        average_window=avg, skip_flip=True,
        pre_transposed_zyx_shape=(Z, Y, X),
        out_layout="xzy" if xzy else "zyx",
    )
    d_zyx_shape = (groups, dshape[1], dshape[2])
    out_shape = tuple(
        int(s)
        for s in (output_shape if output_shape is not None else d_zyx_shape)
    )
    return affine_warp_auto(deskewed, m, out_shape, fill=fill, input_xzy=xzy)


def deconvolve_deskew_warp_batched(
    volumes: jax.Array,
    transfer_function_half: jax.Array,
    regularization_strength: float,
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    matrix,
    output_shape: tuple[int, int, int] | None = None,
    keep_overhang: bool = False,
    average_window: int = 1,
    fill: float = 0.0,
    prepared=None,
    deskew_table=None,
) -> jax.Array:
    """Batched :func:`deconvolve_deskew_warp` — bit-identical to vmapping
    it, but the pass-C handoff route runs the deskew stage through the
    manually double-buffered batched kernel
    (:func:`~biahub_tpu.kernels.pallas_deskew.deskew_zyx_pallas_batched`,
    0.99 -> 0.67 ms/vol on v5e). Pallas forbids the non-trivial ANY-space
    block indexing a vmapped manual-DMA kernel would need, so batched
    callers (bench, BatchRunner) enter here instead of vmapping.

    Single-device batches only: the manual kernel's batch grid axis cannot
    be SPMD-partitioned — multi-device executors keep the vmapped form.
    """
    from biahub_tpu.kernels.pallas_deskew import manual_dma_deskew_supported

    Z, Y, X = (int(s) for s in volumes.shape[1:])
    avg = int(average_window)

    def per_volume(v):
        return deconvolve_deskew_warp(
            v, transfer_function_half, regularization_strength,
            ls_angle_deg, px_to_scan_ratio, matrix,
            output_shape=output_shape, keep_overhang=keep_overhang,
            average_window=avg, fill=fill, prepared=prepared,
            deskew_table=deskew_table,
        )

    ok, dshape = _handoff_gate((Z, Y, X), avg, ls_angle_deg,
                               px_to_scan_ratio, keep_overhang)
    m = None
    xzy = False
    if ok:
        from biahub_tpu.kernels.affine import is_inplane_matrix

        m = flip_y_matrix(int(dshape[1])) @ np.asarray(
            matrix, dtype=np.float64
        )
        xzy = is_inplane_matrix(m)
    spectral = chain_warp_spectral_route(
        (Z, Y, X), ls_angle_deg, px_to_scan_ratio, keep_overhang, avg,
        matrix,
    )
    if (
        spectral
        or not ok
        or not xzy
        or not manual_dma_deskew_supported((Z, Y, X), avg, "xzy")
    ):
        return jax.vmap(per_volume)(volumes)

    from biahub_tpu.kernels.affine import (
        inplane_affine_warp_zyx_pallas_batched,
    )
    from biahub_tpu.kernels.pallas_deskew import deskew_zyx_pallas_batched
    from biahub_tpu.kernels.pallas_fft import deconvolve_zyx_pallas

    _route_echo(
        "deconvolve_deskew_warp_batched",
        "pass-C layout handoff (xzy, manual-DMA deskew + warps)",
    )
    groups = -(-Y // avg)
    pad_total = (-(-groups // 8) * 8) * avg - Y

    decon_yzx = jax.vmap(
        lambda v: deconvolve_zyx_pallas(
            v, transfer_function_half,
            regularization_strength=regularization_strength,
            yzx_pad=pad_total, prepared=prepared,
        )
    )(volumes)
    # pad_groups8: the warp's manual-DMA slab slices need an 8-aligned
    # sublane extent (Zi = the deskew groups axis); the pad slices are
    # finite and the warp's logical-domain mask (logical_zyx_shape) keeps
    # them out of the output — the spectral xzy handoff's contract.
    deskewed = deskew_zyx_pallas_batched(
        decon_yzx, ls_angle_deg, px_to_scan_ratio, keep_overhang,
        average_window=avg, skip_flip=True,
        pre_transposed_zyx_shape=(Z, Y, X), out_layout="xzy",
        pad_groups8=True,
    )
    d_zyx_shape = (groups, dshape[1], dshape[2])
    out_shape = tuple(
        int(s)
        for s in (output_shape if output_shape is not None else d_zyx_shape)
    )
    use_pallas_warp = (
        jax.default_backend() == "tpu"
        or os.environ.get("BIAHUB_TPU_FORCE_PALLAS") == "1"
    ) and os.environ.get("BIAHUB_TPU_NO_PALLAS") != "1"
    if use_pallas_warp:
        return inplane_affine_warp_zyx_pallas_batched(
            deskewed, m, out_shape, fill=fill, input_xzy=True,
            logical_zyx_shape=d_zyx_shape,
        )
    from biahub_tpu.kernels.affine import affine_warp_auto

    return jax.vmap(
        lambda d: affine_warp_auto(d[:, :groups, :], m, out_shape,
                                   fill=fill, input_xzy=True)
    )(deskewed)
