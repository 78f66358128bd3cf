"""Image towers for scene→product retrieval (Shop the Look).

Capability parity with reference pinterest/models.py:23-74: per stage a
stride-2 3×3 conv (plus stride-2 residual conv), three BatchNorm+swish
sub-blocks with 1×1 convs, then a stride-2 3×3 average pool — 4× spatial
downsample per stage; global spatial mean → Dense projection. Two separate
towers (scene, product) scored by dot product.

Fixes vs the reference (SURVEY.md §2.4): the reference computes BatchNorm
batch statistics mutably every step but *discards* them
(train_shop_the_look.py:95-98 ignores new_model_state) and runs eval with
train=True stats (:113-116) — so its "running averages" are never trained.
Here batch_stats is a first-class TrainState field, updated each step, and
eval/serving uses running averages (``train=False``).

TPU notes: NHWC layout (TPU-native), swish/BN fused by XLA; compute dtype
configurable (bfloat16 for the conv stack keeps the MXU fed; params and BN
statistics stay float32).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

DEFAULT_FILTERS = (16, 32, 64, 128)


class ResidualStage(nn.Module):
    """One 4×-downsampling stage of the tower."""

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        conv = lambda f, k, s: nn.Conv(f, k, s, dtype=self.dtype)
        bn = lambda: nn.BatchNorm(use_running_average=not train, use_bias=False,
                                  dtype=self.dtype)
        residual = conv(self.filters, (3, 3), (2, 2))(x)
        x = conv(self.filters, (3, 3), (2, 2))(x)
        x = nn.swish(bn()(x))
        x = conv(self.filters, (1, 1), (1, 1))(x)
        x = nn.swish(bn()(x))
        x = conv(self.filters, (1, 1), (1, 1))(x)
        x = bn()(x)
        x = x + residual
        return nn.avg_pool(x, (3, 3), strides=(2, 2), padding="SAME")


class ImageTower(nn.Module):
    """Conv stages → global mean pool → Dense embedding."""

    output_size: int
    filters: Sequence[int] = DEFAULT_FILTERS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x = x.astype(self.dtype)
        for f in self.filters:
            x = ResidualStage(filters=f, dtype=self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        # Final projection always in float32 (parity: models.py:45 pins f32).
        return nn.Dense(self.output_size, dtype=jnp.float32)(x.astype(jnp.float32))


class STLModel(nn.Module):
    """Two-tower scene→product scorer (pinterest/models.py:48-74 parity)."""

    output_size: int
    filters: Sequence[int] = DEFAULT_FILTERS
    dtype: Any = jnp.float32

    def setup(self):
        self.scene_tower = ImageTower(
            output_size=self.output_size, filters=self.filters, dtype=self.dtype)
        self.product_tower = ImageTower(
            output_size=self.output_size, filters=self.filters, dtype=self.dtype)

    def get_scene_embed(self, scene: jax.Array) -> jax.Array:
        return self.scene_tower(scene, train=False)

    def get_product_embed(self, product: jax.Array) -> jax.Array:
        return self.product_tower(product, train=False)

    def __call__(
        self, scene: jax.Array, pos_product: jax.Array, neg_product: jax.Array,
        train: bool = True,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
        scene_embed = self.scene_tower(scene, train)
        pos_embed = self.product_tower(pos_product, train)
        neg_embed = self.product_tower(neg_product, train)
        pos_score = jnp.sum(scene_embed * pos_embed, axis=-1)
        neg_score = jnp.sum(scene_embed * neg_embed, axis=-1)
        return pos_score, neg_score, scene_embed, pos_embed, neg_embed
