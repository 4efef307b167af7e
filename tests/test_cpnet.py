"""CPnet flax model vs its torch twin, plus flow-dynamics reconstruction.

The native segmentation engine replaces the reference's cellpose dependency
(reference: biahub/segment.py:36,92-99): the flax CPnet must match the torch
twin (which carries the real cellpose state-dict schema) to f32 tolerance,
and the flow-following postprocess must reconstruct instances from
consistent flow fields.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from biahub_tpu.models.convert import (  # noqa: E402
    cpnet_config_from_state_dict,
    torch_cpnet_to_flax,
)
from biahub_tpu.models.cpnet import CPnet  # noqa: E402
from biahub_tpu.models.torch_twin import TorchCPnet  # noqa: E402
from biahub_tpu.segmentation.flows import (  # noqa: E402
    compute_masks,
    follow_flows,
    get_masks,
    masks_to_flows,
)

NBASE = (2, 8, 16, 32, 64)


def _twin_with_random_stats(seed=0, **kwargs):
    torch.manual_seed(seed)
    twin = TorchCPnet(nbase=NBASE, **kwargs).eval()
    # Randomise BatchNorm running stats so eval-mode parity exercises them
    # (fresh modules have mean 0 / var 1, which would hide conversion bugs).
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    return twin


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_tree_shapes(v, path))
        else:
            out[path] = tuple(v.shape)
    return out


def test_config_inferred_from_state_dict():
    twin = _twin_with_random_stats()
    cfg = cpnet_config_from_state_dict(twin.state_dict())
    assert cfg == {"nbase": NBASE, "nout": 3, "sz": 3}


def test_converter_matches_flax_tree_layer_by_layer():
    twin = _twin_with_random_stats()
    converted = torch_cpnet_to_flax(twin.state_dict())
    model = CPnet(nbase=NBASE)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 32, 32)))
    for collection in ("params", "batch_stats"):
        assert _tree_shapes(ref[collection]) == _tree_shapes(converted[collection])


def test_flax_output_matches_torch_twin():
    twin = _twin_with_random_stats(seed=1)
    variables = jax.tree.map(jnp.asarray, torch_cpnet_to_flax(twin.state_dict()))
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 2, 64, 64), dtype=np.float32)
    with torch.no_grad():
        want_y, want_style = twin(torch.from_numpy(x))
    got_y, got_style = CPnet(nbase=NBASE).apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got_y), want_y.numpy(), rtol=0, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_style), want_style.numpy(), rtol=0, atol=1e-5
    )


def test_flax_output_matches_twin_odd_image_and_style_off():
    # 48x80 exercises non-square shapes through the 4-level pool/upsample.
    twin = _twin_with_random_stats(seed=3, style_on=False)
    variables = jax.tree.map(jnp.asarray, torch_cpnet_to_flax(twin.state_dict()))
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 2, 48, 80), dtype=np.float32)
    with torch.no_grad():
        want_y, _ = twin(torch.from_numpy(x))
    got_y, _ = CPnet(nbase=NBASE, style_on=False).apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_y), want_y.numpy(), rtol=0, atol=2e-4)


def _blob_masks(H=128, W=128):
    rng = np.random.RandomState(0)
    masks = np.zeros((H, W), np.uint32)
    yy, xx = np.mgrid[:H, :W]
    for i, (cy, cx) in enumerate([(30, 30), (30, 80), (80, 40), (90, 95), (60, 64)], 1):
        ry, rx = rng.randint(10, 16), rng.randint(10, 16)
        blob = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1
        masks[blob & (masks == 0)] = i
    return masks


def _mean_best_iou(gt, rec):
    ious = []
    for lab in range(1, int(gt.max()) + 1):
        g = gt == lab
        best = 0.0
        for r in range(1, int(rec.max()) + 1):
            m = rec == r
            union = (g | m).sum()
            if union:
                best = max(best, (g & m).sum() / union)
        ious.append(best)
    return float(np.mean(ious))


def test_masks_to_flows_unit_norm_inside_cells():
    masks = _blob_masks()
    flows = masks_to_flows(masks)
    mag = np.sqrt((flows**2).sum(axis=0))
    inside = masks > 0
    # Unit magnitude everywhere except the convergence fixed point of each
    # cell (the diffusion seed, where the gradient vanishes by symmetry).
    frac_unit = np.mean(np.abs(mag[inside] - 1.0) < 1e-3)
    assert frac_unit > 0.98
    assert np.all(mag[~inside] == 0.0)


def test_flow_roundtrip_recovers_instances():
    masks = _blob_masks()
    dP_net = masks_to_flows(masks) * 5.0  # network 5x scaling convention
    cellprob = np.where(masks > 0, 4.0, -4.0)
    rec = compute_masks(dP_net, cellprob, flow_threshold=0.4, min_size=15)
    assert int(rec.max()) == int(masks.max())
    assert _mean_best_iou(masks, rec) > 0.95


def test_flow_threshold_drops_inconsistent_masks():
    masks = _blob_masks()
    rng = np.random.RandomState(1)
    # Garbage flows: pixels scatter instead of converging per cell.
    dP_net = rng.standard_normal((2,) + masks.shape).astype(np.float32) * 5.0
    cellprob = np.where(masks > 0, 4.0, -4.0)
    rec_loose = compute_masks(dP_net, cellprob, flow_threshold=None, min_size=15)
    rec_qc = compute_masks(dP_net, cellprob, flow_threshold=0.4, min_size=15)
    assert int(rec_qc.max()) <= int(rec_loose.max())


def test_follow_flows_moves_only_foreground():
    H = W = 32
    dP = np.zeros((2, H, W), np.float32)
    dP[1] = 1.0  # everything flows +x
    fg = np.zeros((H, W), bool)
    fg[10, 10] = True
    p = np.asarray(follow_flows(jnp.asarray(dP), jnp.asarray(fg), niter=5))
    assert p[1, 10, 10] == pytest.approx(15.0)
    assert p[1, 0, 0] == pytest.approx(0.0)  # background pixel never moved


def test_get_masks_empty_foreground():
    p = np.stack(np.mgrid[:16, :16]).astype(np.float32)
    out = get_masks(p, np.zeros((16, 16), bool))
    assert out.shape == (16, 16) and out.max() == 0


def test_engine_segments_synthetic_volume(tmp_path):
    """End-to-end: twin checkpoint on disk -> engine -> instance labels."""
    from biahub_tpu.segmentation import cpnet_segment_czyx

    twin = _twin_with_random_stats(seed=5)
    ckpt = tmp_path / "cpnet_random.pt"
    torch.save(twin.state_dict(), ckpt)

    rng = np.random.default_rng(6)
    czyx = rng.standard_normal((2, 1, 64, 64)).astype(np.float32)
    labels = cpnet_segment_czyx(
        czyx, str(ckpt), channels=(1, 2), diameter=30.0, niter=20
    )
    assert labels.shape == (1, 64, 64)
    assert labels.dtype == np.uint32


def test_engine_stitches_3d(tmp_path):
    from biahub_tpu.segmentation.engine import stitch_labels_3d

    z0 = np.zeros((16, 16), np.uint32)
    z0[2:8, 2:8] = 1
    z1 = np.zeros((16, 16), np.uint32)
    z1[3:9, 3:9] = 1  # overlaps z0's object
    z1[10:14, 10:14] = 2  # new object
    stitched = stitch_labels_3d(np.stack([z0, z1]), stitch_threshold=0.25)
    assert stitched[1, 4, 4] == stitched[0, 4, 4] == 1
    assert stitched[1, 12, 12] not in (0, 1)


def test_loader_rejects_non_cpnet_checkpoint(tmp_path):
    from biahub_tpu.models.convert import load_cpnet_checkpoint

    path = tmp_path / "not_cpnet.pt"
    torch.save({"some.layer.weight": torch.zeros(3, 3)}, path)
    with pytest.raises(ValueError, match="cellpose-schema"):
        load_cpnet_checkpoint(str(path))
