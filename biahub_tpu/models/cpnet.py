"""Cellpose-architecture segmentation network (CPnet) in flax, TPU-native.

The reference's ``segment`` verb delegates every non-trivial model to the
cellpose package's ``CellposeModel.eval`` on GPU torch (reference:
biahub/segment.py:36,92-99). This module re-implements the cellpose v2 CPnet
architecture natively in flax so the network runs on the MXU, with a
state-dict converter (:func:`biahub_tpu.models.convert.torch_cpnet_to_flax`)
that understands the *real cellpose key schema* — a cellpose ``.pt``
checkpoint (``cyto2``/``nuclei``/custom) converts mechanically. The torch
twin (:class:`biahub_tpu.models.torch_twin.TorchCPnet`) implements the same
spec with the same state-dict names and is the numerical ground truth for the
converter tests; compatibility with checkpoints produced by the cellpose
package itself follows from the shared schema but is unverified in this
environment (cellpose is not installed — see docs/models.md).

Architecture spec (single source of truth for flax + twin)
----------------------------------------------------------
``nbase = (nchan, 32, 64, 128, 256)``, ``nout = 3`` (dY, dX, cellprob),
``sz = 3``. All convs are 2D, NHWC internally; the public API takes NCHW.

- ``batchconv(in, out, sz)``  = BatchNorm(eps 1e-5) -> ReLU -> Conv(sz, pad sz//2)
  (sequential indices 0/1/2; params at "0" and "2")
- ``batchconv0(in, out, sz)`` = BatchNorm -> Conv (indices 0/1)
- **resdown**: ``x = proj(x) + conv_1(conv_0(x)); x = x + conv_3(conv_2(x))``
  where proj is a 1x1 batchconv0 and conv_t are batchconv.
- **downsample**: 4 resdown stages with 2x2/stride-2 max-pool between them;
  returns every stage's feature map.
- **style**: global average pool of the deepest feature, L2-normalised.
- **batchconvstyle**: ``conv(x [+ y] + full(style))`` with ``full`` a Linear
  from style (256) to the block width.
- **resup**: ``x = proj(x) + conv_1(style, conv_0(x), y=skip);
  x = x + conv_3(style, conv_2(style, x))``.
- **upsample**: deepest resup consumes the deepest feature twice (its own
  skip), then nearest-neighbour 2x upsampling before each shallower resup.
- **output**: 1x1 batchconv from 32 to nout.

State-dict/param-tree naming matches cellpose: ``downsample.down.res_down_N``,
``upsample.up.res_up_N``, ``output``; inside a residual block the torch
``conv`` Sequential container is flattened away (``res_down_0.conv.conv_1`` ->
``res_down_0/conv_1``) — the only non-identity renaming the converter does.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["CPnet", "CPNET_NBASE_DEFAULT"]

CPNET_NBASE_DEFAULT = (2, 32, 64, 128, 256)


class _BatchConv(nn.Module):
    """torch ``batchconv``: BatchNorm -> ReLU -> Conv, params at "0"/"2"."""

    out: int
    sz: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="0")(x)
        x = nn.relu(x)
        pad = self.sz // 2
        return nn.Conv(self.out, (self.sz, self.sz), padding=pad, name="2")(x)


class _BatchConv0(nn.Module):
    """torch ``batchconv0``: BatchNorm -> Conv, params at "0"/"1"."""

    out: int
    sz: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="0")(x)
        pad = self.sz // 2
        return nn.Conv(self.out, (self.sz, self.sz), padding=pad, name="1")(x)


class _ResDown(nn.Module):
    out: int
    sz: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        proj = _BatchConv0(self.out, 1, name="proj")
        conv = [_BatchConv(self.out, self.sz, name=f"conv_{t}") for t in range(4)]
        x = proj(x) + conv[1](conv[0](x))
        return x + conv[3](conv[2](x))


class _BatchConvStyle(nn.Module):
    """torch ``batchconvstyle``: conv(x [+ skip] + Linear(style))."""

    out: int
    sz: int

    @nn.compact
    def __call__(
        self, style: jax.Array, x: jax.Array, y: jax.Array | None = None
    ) -> jax.Array:
        if y is not None:
            x = x + y
        feat = nn.Dense(self.out, name="full")(style)
        x = x + feat[:, None, None, :]
        return _BatchConv(self.out, self.sz, name="conv")(x)


class _ResUp(nn.Module):
    out: int
    sz: int

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array, style: jax.Array) -> jax.Array:
        proj = _BatchConv0(self.out, 1, name="proj")
        conv0 = _BatchConv(self.out, self.sz, name="conv_0")
        conv1 = _BatchConvStyle(self.out, self.sz, name="conv_1")
        conv2 = _BatchConvStyle(self.out, self.sz, name="conv_2")
        conv3 = _BatchConvStyle(self.out, self.sz, name="conv_3")
        x = proj(x) + conv1(style, conv0(x), y=y)
        return x + conv3(style, conv2(style, x))


class _Downsample(nn.Module):
    nbase: Sequence[int]
    sz: int

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        feats: list[jax.Array] = []
        for n in range(len(self.nbase) - 1):
            y = (
                nn.max_pool(feats[-1], (2, 2), strides=(2, 2))
                if n > 0
                else x
            )
            down = _ResDown(self.nbase[n + 1], self.sz, name=f"res_down_{n}")
            feats.append(down(y))
        return feats


class _Upsample(nn.Module):
    nbaseup: Sequence[int]
    sz: int

    @nn.compact
    def __call__(self, style: jax.Array, xd: list[jax.Array]) -> jax.Array:
        ups = [
            _ResUp(self.nbaseup[n - 1], self.sz, name=f"res_up_{n - 1}")
            for n in range(1, len(self.nbaseup))
        ]
        x = ups[-1](xd[-1], xd[-1], style)
        for n in range(len(ups) - 2, -1, -1):
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = ups[n](x, xd[n], style)
        return x


class CPnet(nn.Module):
    """Cellpose v2 CPnet; ``__call__`` takes NCHW, returns (NCHW out, style).

    Output channels: ``(dY, dX, cellprob)`` for ``nout=3``.
    """

    nbase: Sequence[int] = CPNET_NBASE_DEFAULT
    nout: int = 3
    sz: int = 3
    style_on: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        nbaseup = tuple(self.nbase[1:]) + (self.nbase[-1],)
        feats = _Downsample(self.nbase, self.sz, name="downsample")(x)
        deepest = feats[-1]
        style = jnp.mean(deepest, axis=(1, 2))
        style = style / jnp.sqrt(jnp.sum(style**2, axis=1, keepdims=True))
        style_up = style if self.style_on else style * 0.0
        y = _Upsample(nbaseup, self.sz, name="upsample")(style_up, feats)
        y = _BatchConv(self.nout, 1, name="output")(y)
        return jnp.transpose(y, (0, 3, 1, 2)), style
