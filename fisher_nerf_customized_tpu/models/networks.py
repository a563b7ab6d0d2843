"""Occupancy-prediction networks (flax).

Reference: models/networks/resnetUnet.py:13-76 ResNetUNet — a ResNet18
encoder (torchvision pretrained) + UNet decoder predicting 3-class
occupancy from ego-centric grids.  Pretrained torchvision weights are not
available offline, so the encoder is a compact conv backbone trained from
scratch (same input/output contract: (B, 3, H, W) ego grid probabilities ->
(B, 3, H, W) class logits).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        return nn.relu(x)


class ResNetUNet(nn.Module):
    """UNet over NHWC ego grids; `n_channel_out` classes."""
    n_channel_out: int = 3
    base: int = 32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        e1 = ConvBlock(self.base)(x)                       # H
        d1 = nn.max_pool(e1, (2, 2), strides=(2, 2))
        e2 = ConvBlock(self.base * 2)(d1)                  # H/2
        d2 = nn.max_pool(e2, (2, 2), strides=(2, 2))
        e3 = ConvBlock(self.base * 4)(d2)                  # H/4
        d3 = nn.max_pool(e3, (2, 2), strides=(2, 2))
        b = ConvBlock(self.base * 8)(d3)                   # H/8

        def up(z, skip, feats):
            bsz, h, w, c = z.shape
            z = jnp.repeat(jnp.repeat(z, 2, axis=1), 2, axis=2)
            z = jnp.concatenate([z, skip], axis=-1)
            return ConvBlock(feats)(z)

        u3 = up(b, e3, self.base * 4)
        u2 = up(u3, e2, self.base * 2)
        u1 = up(u2, e1, self.base)
        return nn.Conv(self.n_channel_out, (1, 1))(u1)     # logits
