"""UNeXt2 flax model vs its torch twin: converter + numerical parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from biahub_tpu.models.convert import torch_state_dict_to_flax
from biahub_tpu.models.torch_twin import TorchUNeXt2
from biahub_tpu.models.unext2 import UNeXt2

CFG = dict(
    in_channels=1,
    out_channels=2,
    in_stack_depth=5,
    encoder_blocks=(1, 1, 2, 1),
    dims=(8, 16, 32, 64),
    decoder_conv_blocks=2,
    stem_kernel_size=(5, 4, 4),
)


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_tree_shapes(v, path))
        else:
            out[path] = tuple(v.shape)
    return out


def test_converter_matches_flax_param_tree_layer_by_layer():
    torch.manual_seed(0)
    twin = TorchUNeXt2(**CFG)
    converted = torch_state_dict_to_flax(twin.state_dict())

    model = UNeXt2(**CFG)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 5, 64, 64)))
    ref_shapes = _tree_shapes(ref["params"])
    got_shapes = _tree_shapes(converted["params"])
    assert ref_shapes == got_shapes  # every layer present, every shape right


def test_flax_output_matches_torch_twin():
    torch.manual_seed(1)
    twin = TorchUNeXt2(**CFG).eval()
    variables = jax.tree.map(jnp.asarray, torch_state_dict_to_flax(twin.state_dict()))

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 1, 5, 64, 64), dtype=np.float32)
    with torch.no_grad():
        want = twin(torch.from_numpy(x)).numpy()

    model = UNeXt2(**CFG)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 2, 5, 64, 64)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * scale, rtol=0)


def test_flax_output_matches_torch_twin_nondefault_depths():
    cfg = dict(CFG, out_stack_depth=3, in_stack_depth=10, stem_kernel_size=(5, 4, 4))
    torch.manual_seed(3)
    twin = TorchUNeXt2(**cfg).eval()
    variables = jax.tree.map(jnp.asarray, torch_state_dict_to_flax(twin.state_dict()))
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 1, 10, 32, 32), dtype=np.float32)
    with torch.no_grad():
        want = twin(torch.from_numpy(x)).numpy()
    got = np.asarray(UNeXt2(**cfg).apply(variables, jnp.asarray(x)))
    assert got.shape == (1, 2, 3, 32, 32)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * scale, rtol=0)


def test_lightning_checkpoint_roundtrip(tmp_path):
    from biahub_tpu.models.convert import load_torch_checkpoint

    torch.manual_seed(5)
    twin = TorchUNeXt2(**CFG)
    ckpt = {
        "state_dict": {f"model.{k}": v for k, v in twin.state_dict().items()},
        "epoch": 83,
    }
    path = tmp_path / "epoch=83.ckpt"
    torch.save(ckpt, path)
    variables = load_torch_checkpoint(str(path))
    ref = UNeXt2(**CFG).init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 5, 64, 64)))
    assert _tree_shapes(variables["params"]) == _tree_shapes(ref["params"])


def test_sliding_window_with_narrow_output_depth():
    """out_stack_depth < in_stack_depth: outputs are spread across the
    volume with every z slice covered (code-review regression)."""
    from biahub_tpu.virtual_stain import sliding_window_predict

    calls = []

    def predict_fn(window):
        calls.append(window.shape)
        assert window.shape[1] == 5
        return np.ones((2, 3) + window.shape[2:], np.float32)

    czyx = np.random.default_rng(0).random((1, 8, 16, 16)).astype(np.float32)
    out = sliding_window_predict(predict_fn, czyx, window_z=5, step=1)
    assert out.shape == (2, 8, 16, 16)
    # Every slice covered: blended constants stay 1 everywhere
    np.testing.assert_allclose(out, 1.0, atol=1e-5)


def test_flax_loader_handles_shallow_stack(tmp_path):
    """Volume shallower than in_stack_depth: z edge-pad in, crop out."""
    from biahub_tpu.virtual_stain import _load_flax_unext2

    cfg_m = dict(CFG)
    torch.manual_seed(7)
    twin = TorchUNeXt2(**cfg_m)
    ckpt = tmp_path / "m.pth"
    torch.save(twin.state_dict(), ckpt)
    predict_fn, window_z, n_out = _load_flax_unext2(
        {"ckpt_path": str(ckpt)}, {k: list(v) if isinstance(v, tuple) else v
                                   for k, v in cfg_m.items()}
    )
    assert (window_z, n_out) == (5, 2)
    window = np.random.default_rng(1).random((1, 3, 20, 24)).astype(np.float32)
    out = predict_fn(window)
    assert out.shape == (2, 3, 20, 24)
    assert np.isfinite(out).all()


def test_flax_loader_narrow_output_depth_end_to_end(tmp_path):
    """out_stack_depth != in_stack_depth through the full harness
    (the exact crash from the code review)."""
    from biahub_tpu.virtual_stain import _load_flax_unext2, sliding_window_predict

    cfg_m = dict(CFG, in_stack_depth=10, out_stack_depth=5)
    torch.manual_seed(8)
    twin = TorchUNeXt2(**cfg_m)
    ckpt = tmp_path / "m.pth"
    torch.save(twin.state_dict(), ckpt)
    predict_fn, window_z, _ = _load_flax_unext2(
        {"ckpt_path": str(ckpt)}, {k: list(v) if isinstance(v, tuple) else v
                                   for k, v in cfg_m.items()}
    )
    assert window_z == 10
    czyx = np.random.default_rng(2).random((1, 15, 16, 16)).astype(np.float32)
    out = sliding_window_predict(predict_fn, czyx, window_z, step=2)
    assert out.shape == (2, 15, 16, 16)
    assert np.isfinite(out).all()
    assert (np.abs(out) > 0).any(axis=(0, 2, 3)).all()  # every slice covered


def test_unet25d_flax_matches_torch_twin():
    """The 2.5D family: converter + numerical parity, including the depth
    squeeze to out_stack_depth=1."""
    from biahub_tpu.models.torch_twin import TorchUNet25D
    from biahub_tpu.models.unet25d import UNet25D

    cfg = dict(
        in_channels=1, out_channels=2, in_stack_depth=5,
        out_stack_depth=1, num_filters=(4, 8, 16),
    )
    torch.manual_seed(10)
    twin = TorchUNet25D(**cfg).eval()
    variables = jax.tree.map(jnp.asarray, torch_state_dict_to_flax(twin.state_dict()))

    model = UNet25D(**cfg)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 5, 16, 16)))
    assert _tree_shapes(variables["params"]) == _tree_shapes(ref["params"])

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 1, 5, 16, 24), dtype=np.float32)
    with torch.no_grad():
        want = twin(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 2, 1, 16, 24)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * scale, rtol=0)


def test_unet25d_through_harness(tmp_path):
    """architecture '2.5D' end-to-end: loader + sliding-window blending of
    single-slice outputs covers every z slice."""
    from biahub_tpu.models.torch_twin import TorchUNet25D
    from biahub_tpu.virtual_stain import _load_model, sliding_window_predict

    cfg = dict(
        in_channels=1, out_channels=1, in_stack_depth=5,
        out_stack_depth=1, num_filters=(4, 8),
    )
    torch.manual_seed(12)
    twin = TorchUNet25D(**cfg)
    ckpt = tmp_path / "m25.pth"
    torch.save(twin.state_dict(), ckpt)
    predict_fn, window_z, n_out = _load_model(
        {
            "architecture": "2.5D",
            "model_config": {k: list(v) if isinstance(v, tuple) else v
                             for k, v in cfg.items()},
            "ckpt_path": str(ckpt),
        }
    )
    assert (window_z, n_out) == (5, 1)
    czyx = np.random.default_rng(13).random((1, 9, 12, 20)).astype(np.float32)
    out = sliding_window_predict(predict_fn, czyx, window_z, step=1)
    assert out.shape == (1, 9, 12, 20)
    assert np.isfinite(out).all()
    assert (np.abs(out) > 0).any(axis=(0, 2, 3)).all()  # every slice covered
