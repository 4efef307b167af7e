"""2.5D UNet virtual-staining network in flax (TPU-native inference).

The second architecture family VisCy's ``VSUNet`` registry offers alongside
fcmae/UNeXt2 (reference: biahub/virtual_stain.py:52-57 instantiates VSUNet by
``architecture``; the 2.5D family powers the fluor→phase models). VisCy is
not vendored, so this is a self-contained spec shared verbatim with the
torch twin (:class:`biahub_tpu.models.torch_twin.TorchUNet25D`) that
validates the state-dict converter:

1. **Encoder**: for each level i with width ``num_filters[i]`` (all but the
   last), two blocks of [Conv3d 3x3x3 'same' -> channelwise LayerNorm ->
   ReLU], then (1, 2, 2) max-pool — depth is preserved, XY halves.
2. **Bottleneck**: two blocks at ``num_filters[-1]``.
3. **Decoder**: nearest-neighbor (1, 2, 2) upsample, concat the level's
   skip, two blocks at the level width.
4. **Depth squeeze**: a VALID Conv3d with kernel
   ``(in_stack_depth - out_stack_depth + 1, 1, 1)`` collapses the z stack
   to ``out_stack_depth`` (the classic 2.5D projection), ReLU, then a 1x1x1
   conv to ``out_channels``.

Input (N, C_in, D=in_stack_depth, H, W) with H, W divisible by
``2**(len(num_filters) - 1)``; output (N, C_out, out_stack_depth, H, W).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["UNet25D"]


class ConvBlock25D(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.dim, (3, 3, 3), padding=1, name="conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return nn.relu(x)


class UNet25D(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    in_stack_depth: int = 5
    out_stack_depth: int = 1
    num_filters: Sequence[int] = (24, 48, 96, 192)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """(N, C_in, D, H, W) float32 -> (N, C_out, out_stack_depth, H, W)."""
        n, c, d, h, w = x.shape
        if d != self.in_stack_depth:
            raise ValueError(f"depth {d} != in_stack_depth {self.in_stack_depth}")
        down = 2 ** (len(self.num_filters) - 1)
        if h % down or w % down:
            raise ValueError(f"H/W of {x.shape} not divisible by {down}")

        x = x.transpose(0, 2, 3, 4, 1)  # NDHWC
        skips = []
        for i, nf in enumerate(self.num_filters[:-1]):
            x = ConvBlock25D(nf, name=f"enc{i}_block0")(x)
            x = ConvBlock25D(nf, name=f"enc{i}_block1")(x)
            skips.append(x)
            x = nn.max_pool(x, (1, 2, 2), strides=(1, 2, 2))

        x = ConvBlock25D(self.num_filters[-1], name="bottleneck_block0")(x)
        x = ConvBlock25D(self.num_filters[-1], name="bottleneck_block1")(x)

        for i in reversed(range(len(self.num_filters) - 1)):
            nb, db, hb, wb, cb = x.shape
            x = jax.image.resize(x, (nb, db, hb * 2, wb * 2, cb), "nearest")
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = ConvBlock25D(self.num_filters[i], name=f"dec{i}_block0")(x)
            x = ConvBlock25D(self.num_filters[i], name=f"dec{i}_block1")(x)

        kd = self.in_stack_depth - self.out_stack_depth + 1
        x = nn.Conv(
            self.num_filters[0], (kd, 1, 1), padding="VALID", name="squeeze"
        )(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1, 1), name="head")(x)
        return x.transpose(0, 4, 1, 2, 3)
