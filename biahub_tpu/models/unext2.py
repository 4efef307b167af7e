"""UNeXt2-family virtual-staining network in flax (TPU-native inference).

The reference's virtual staining runs VisCy/cytoland's ``VSUNet`` with the
``fcmae`` (UNeXt2 / ConvNeXtV2) architecture on GPU torch (reference:
biahub/virtual_stain.py:52-57 and settings/example_virtual_stain_settings.yml:
``architecture: fcmae``, ``dims: [96, 192, 384, 768]``,
``stem_kernel_size: [5, 4, 4]``). This module re-implements that architecture
family natively in flax so inference runs on the MXU; the torch twin in
:mod:`biahub_tpu.models.torch_twin` implements the SAME spec below and
validates the state-dict converter layer by layer.

Architecture spec (single source of truth for both implementations)
-------------------------------------------------------------------
Input: (N, C_in, D, H, W); D == ``in_stack_depth``.

1. **Stem (depth-to-channels)**: Conv3d(C_in -> dims[0] // (D / kd),
   kernel = stride = ``stem_kernel_size`` (kd, kh, kw)), then fold the
   remaining depth into channels -> 2D features (N, dims[0], H/kh, W/kw).
2. **Encoder**: 4 stages; stage i runs ``encoder_blocks[i]`` ConvNeXtV2
   blocks at width dims[i]. Between stages: LayerNorm + 2x2/stride-2 conv.
   ConvNeXtV2 block: x + pw2(GRN(GELU(pw1(LN(dwconv7x7(x)))))) with
   pw1: dim -> 4*dim, pw2: 4*dim -> dim, GRN = global response norm.
3. **Decoder**: 3 up-stages (deepest first). Up-stage j: 3x3 conv to
   4*dims[2-j] channels + PixelShuffle(2), concat the stage-(2-j) encoder
   feature, then ``decoder_conv_blocks`` blocks of [3x3 conv -> LayerNorm ->
   GELU] at width dims[2-j].
4. **Head (pixel-to-voxel)**: 1x1 conv from dims[0] to
   C_out * out_stack_depth * kh * kw, PixelShuffle(kh) back to full
   resolution, reshape to (N, C_out, out_stack_depth, H, W).

LayerNorm is always channelwise (over the feature axis only), eps 1e-6,
matching ConvNeXt convention.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["UNeXt2"]


def _pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """torch.nn.PixelShuffle semantics on NHWC input.

    torch: out[n, c, h*r+i, w*r+j] = in[n, c*r*r + i*r + j, h, w].
    """
    n, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(n, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (n, h, i, w, j, c_out)
    return x.reshape(n, h * r, w * r, c_out)


class GRN(nn.Module):
    """ConvNeXtV2 global response normalization (NHWC)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        gx = jnp.sqrt(jnp.sum(jnp.square(x), axis=(1, 2), keepdims=True))  # (N,1,1,C)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


class ConvNeXtV2Block(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        x = nn.Conv(
            self.dim, (7, 7), padding=3, feature_group_count=self.dim, name="dwconv"
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = GRN(4 * self.dim, name="grn")(x)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        return residual + x


class DecoderBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.dim, (3, 3), padding=1, name="conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return nn.gelu(x, approximate=False)


class UNeXt2(nn.Module):
    """See the module docstring for the full architecture spec."""

    in_channels: int = 1
    out_channels: int = 2
    in_stack_depth: int = 15
    out_stack_depth: int | None = None
    encoder_blocks: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    decoder_conv_blocks: int = 2
    stem_kernel_size: Sequence[int] = (5, 4, 4)

    @property
    def z_out(self) -> int:
        return self.out_stack_depth or self.in_stack_depth

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """(N, C_in, D, H, W) float32 -> (N, C_out, z_out, H, W)."""
        kd, kh, kw = self.stem_kernel_size
        n, c_in, d, h, w = x.shape
        if d % kd or h % kh or w % kw:
            raise ValueError(
                f"input {x.shape} not divisible by stem kernel {self.stem_kernel_size}"
            )
        stem_out = self.dims[0] // (d // kd)

        # Stem: NCDHW -> NDHWC conv3d -> fold depth into channels (2D NHWC).
        x = x.transpose(0, 2, 3, 4, 1)
        x = nn.Conv(
            stem_out,
            (kd, kh, kw),
            strides=(kd, kh, kw),
            padding="VALID",
            name="stem",
        )(x)
        n_, d_, h_, w_, c_ = x.shape
        # torch reference folds as (c, d) channel-major: channel = c * D' + d.
        x = x.transpose(0, 2, 3, 4, 1).reshape(n_, h_, w_, c_ * d_)

        skips = []
        for i, (depth, dim) in enumerate(zip(self.encoder_blocks, self.dims)):
            if i > 0:
                x = nn.LayerNorm(epsilon=1e-6, name=f"down{i}_norm")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), name=f"down{i}_conv")(x)
            for b in range(depth):
                x = ConvNeXtV2Block(dim, name=f"stage{i}_block{b}")(x)
            skips.append(x)

        for j in range(3):
            dim = self.dims[2 - j]
            x = nn.Conv(4 * dim, (3, 3), padding=1, name=f"up{j}_conv")(x)
            x = _pixel_shuffle(x, 2)
            x = jnp.concatenate([x, skips[2 - j]], axis=-1)
            for b in range(self.decoder_conv_blocks):
                x = DecoderBlock(dim, name=f"dec{j}_block{b}")(x)

        head_ch = self.out_channels * self.z_out * kh * kw
        x = nn.Conv(head_ch, (1, 1), name="head")(x)
        x = _pixel_shuffle(x, kh)
        n_, hh, ww, cc = x.shape
        # Channel layout after shuffle: (C_out, z_out) channel-major.
        x = x.reshape(n_, hh, ww, self.out_channels, self.z_out)
        return x.transpose(0, 3, 4, 1, 2)
