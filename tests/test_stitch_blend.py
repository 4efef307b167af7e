"""Device-vs-host parity for the stitch blend (kernels/stitch_blend.py).

write_output_chunk's device branch must reproduce the NumPy scatter blend
(reference semantics: biahub/stitch.py:199-314) exactly — including
fractional FOV corners (int-truncation placement), ragged edge chunks
reusing a nominally-padded distance map, and non-unit blending exponents.
"""

import numpy as np
import pytest

from biahub_tpu.stitch import fov_edge_distance, overlap_slices


def _host_blend(chunk_corner, chunk_extent, corners, fovs, dist, exponent):
    pairs = []
    for corner, fov in zip(corners, fovs):
        fixed, moving = overlap_slices(
            chunk_corner, chunk_extent, corner, np.asarray(fov.shape)
        )
        if fixed is not None:
            pairs.append((fixed, moving, fov))
    maps = np.zeros((len(pairs),) + tuple(chunk_extent), np.float32)
    for i, (fixed, moving, _) in enumerate(pairs):
        maps[(i, *fixed)] = dist[moving]
    w = np.zeros_like(maps)
    np.power(maps, exponent, out=w, where=(maps > 0))
    w = w / (np.sum(w, axis=0, keepdims=True) + 1e-8)
    out = np.zeros(tuple(chunk_extent), np.float32)
    for i, (fixed, moving, fov) in enumerate(pairs):
        out[fixed] += w[(i, *fixed)] * fov[moving]
    return out, pairs


def _device_blend(chunk_corner, chunk_extent, pairs, dist, exponent, pad=None):
    from biahub_tpu.kernels.stitch_blend import blend_chunk, pad_distance_map

    pad_extent = tuple(pad if pad is not None else chunk_extent)
    padded = pad_distance_map(dist, pad_extent)
    offsets = np.array(
        [
            [m.start - f.start for m, f in zip(moving, fixed)]
            for fixed, moving, _ in pairs
        ]
    )
    stack = np.zeros((len(pairs), 1, 1) + tuple(chunk_extent), np.float32)
    for i, (fixed, moving, fov) in enumerate(pairs):
        stack[(i, 0, 0, *fixed)] = fov[moving]
    return blend_chunk(padded, offsets, stack, exponent, pad_extent=pad_extent)[
        0, 0
    ]


@pytest.mark.parametrize("exponent", [0.0, 1.0, 2.0])
@pytest.mark.parametrize(
    "chunk_corner,chunk_extent",
    [
        (np.array([0, 0, 10]), np.array([8, 24, 24])),
        (np.array([0, 16, 0]), np.array([8, 13, 17])),  # ragged edge chunk
    ],
)
def test_device_blend_matches_host(exponent, chunk_corner, chunk_extent):
    rng = np.random.default_rng(7)
    fov_extent = np.array([8, 24, 24])
    corners = [
        np.array([0.0, 0.0, 0.0]),
        np.array([0.0, 0.0, 18.6]),  # fractional corner: truncation placement
        np.array([0.0, 17.4, 0.0]),
        np.array([0.0, 17.4, 18.6]),
    ]
    fovs = [rng.random(tuple(fov_extent), np.float32) for _ in corners]
    dist = np.ascontiguousarray(fov_edge_distance(fov_extent), np.float32)

    want, pairs = _host_blend(
        chunk_corner, chunk_extent, corners, fovs, dist, exponent
    )
    got = _device_blend(chunk_corner, chunk_extent, pairs, dist, exponent)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # Ragged chunks reuse a map padded by the NOMINAL chunk shape.
    got_nominal = _device_blend(
        chunk_corner, chunk_extent, pairs, dist, exponent, pad=(8, 24, 24)
    )
    np.testing.assert_allclose(got_nominal, want, atol=1e-5)


def test_write_output_chunk_device_equals_host(tmp_path, monkeypatch):
    """End-to-end write_output_chunk: the device branch and the
    BIAHUB_TPU_HOST_BLEND=1 branch write identical chunks."""
    from biahub_tpu.io.ngff import open_ome_zarr
    from biahub_tpu.stitch import write_output_chunk

    rng = np.random.default_rng(11)
    fov = (2, 2, 4, 16, 16)
    plate = open_ome_zarr(
        tmp_path / "in.zarr", layout="hcs", mode="w", channel_names=["a", "b"]
    )
    shifts = {}
    for i, (r, c) in enumerate([("A", "1"), ("A", "2")]):
        pos = plate.create_position(r, c, "0")
        pos.create_image("0", rng.random(fov, np.float32))
        shifts[f"{r}/{c}/0"] = np.array([0.0, 0.0, 10.3 * i])
    outs = {}
    for tag in ("dev", "host"):
        out = open_ome_zarr(
            tmp_path / f"out_{tag}.zarr", layout="hcs", mode="w",
            channel_names=["a", "b"],
        )
        out_pos = out.create_position("A", "0", "0")
        out_pos.create_image("0", np.zeros((2, 2, 4, 16, 27), np.float32))
        outs[tag] = out_pos
    chunk = (slice(0, 4), slice(0, 16), slice(4, 24))

    write_output_chunk(chunk, shifts, [0, 1], plate, fov, outs["dev"],
                       verbose=False, blending_exponent=1.0)
    monkeypatch.setenv("BIAHUB_TPU_HOST_BLEND", "1")
    write_output_chunk(chunk, shifts, [0, 1], plate, fov, outs["host"],
                       verbose=False, blending_exponent=1.0)
    np.testing.assert_allclose(
        outs["dev"].data[:], outs["host"].data[:], atol=1e-5
    )
