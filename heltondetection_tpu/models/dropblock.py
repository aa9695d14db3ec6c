"""DropBlock2D regularization — rebuild target C16 (README.md:97,131-132:
dropBlock0.5 ablations on head/backbone). Structured spatial dropout: drop
contiguous block_size² regions, normalized to keep activation scale.

Pure-function formulation: seeds Bernoulli at valid block centers, expands
to blocks with a max-pool, applies the inverse-keep-ratio rescale
(DropBlock paper, Ghiasi et al. 2018).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def drop_block(x: jnp.ndarray, rng: jax.Array, drop_prob: float,
               block_size: int = 7) -> jnp.ndarray:
    """x (B,H,W,C); returns x with contiguous blocks zeroed + rescaled."""
    if drop_prob <= 0.0:
        return x
    b, h, w, c = x.shape
    bs = min(block_size, h, w)
    # gamma: seed rate s.t. expected dropped fraction ≈ drop_prob
    gamma = (drop_prob / (bs ** 2)) * (h * w) / \
        max((h - bs + 1) * (w - bs + 1), 1)
    valid_h = h - bs + 1
    valid_w = w - bs + 1
    seeds = jax.random.bernoulli(rng, gamma, (b, valid_h, valid_w, c))
    pad_t = bs // 2
    pad_b = h - valid_h - pad_t
    pad_l = bs // 2
    pad_r = w - valid_w - pad_l
    seeds = jnp.pad(seeds.astype(jnp.float32),
                    ((0, 0), (pad_t, pad_b), (pad_l, pad_r), (0, 0)))
    # expand each seed to a bs×bs block
    block_mask = nn.max_pool(seeds, (bs, bs), strides=(1, 1),
                             padding=((bs // 2, (bs - 1) // 2),
                                      (bs // 2, (bs - 1) // 2)))
    keep = 1.0 - block_mask
    keep_frac = jnp.clip(keep.mean(axis=(1, 2), keepdims=True), 1e-6, 1.0)
    return x * keep / keep_frac


class DropBlock(nn.Module):
    """Module wrapper; active only when ``deterministic=False``."""
    drop_prob: float = 0.1
    block_size: int = 7

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.drop_prob <= 0.0:
            return x
        rng = self.make_rng("dropout")
        return drop_block(x, rng, self.drop_prob, self.block_size)
