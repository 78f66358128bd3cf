"""Text→URL two-tower: sequence encoder vs URL embedding table.

Capability parity with reference wikipedia/train_txt2url.py:204-292 (Keras):
  * word embedding table (mask id 0, max-norm 3.0 constraint);
  * LSTM sentence encoder → Dense projection into URL-embedding space
    (:226-232);
  * URL embedding table (max-norm constraint) shared by the text head and a
    url2url head trained to regress sqrt(dice) co-occurrence (:199-200);
  * margin loss square(relu(margin - dot)) on the text→URL match (:252-257).

Deliberate divergences (documented, same spirit as the Glove fix):
  * the reference scores text vs url as a (B,B) ``K.dot`` matrix and trains
    ALL entries toward the margin with an MAE-vs-zeros head
    (train_txt2url.py:164-167,252) — mismatched pairs included, a
    broadcasting accident. Here the margin loss is on matching (diagonal)
    pairs, with in-batch softmax available as the discriminative objective.
  * max-norm weight constraints are applied as explicit row-norm projections
    after the optimizer step (:mod:`esrecsys_tpu.ops.losses` + train step),
    matching Keras ``max_norm`` semantics.

TPU notes: the LSTM runs as a fused ``nn.RNN`` scan over time with sequence
lengths derived from the 0-mask; encoder_type="mean" swaps in a masked
mean-pool encoder (no recurrence — fully parallel, usually the better TPU
choice at these sequence lengths).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from esrecsys_tpu.models.layers import TableEmbed


def he_normal_embed_init(key, shape, dtype=jnp.float32):
    """he_normal to match the reference tables (train_txt2url.py:216,236)."""
    return nn.initializers.he_normal()(key, shape, dtype)


class SentenceEncoder(nn.Module):
    """Tokens (B, L) → URL-space embedding (B, D)."""

    vocab_size: int
    word_dim: int = 64
    rnn_size: int = 64
    url_dim: int = 64
    encoder_type: str = "lstm"  # "lstm" (reference parity) | "mean"
    mesh: Optional[Mesh] = None

    def setup(self):
        self.word_embedding = TableEmbed(
            num_embeddings=self.vocab_size,
            features=self.word_dim,
            mesh=self.mesh,
            embedding_init=he_normal_embed_init,
        )
        if self.encoder_type == "lstm":
            self.rnn = nn.RNN(nn.OptimizedLSTMCell(self.rnn_size))
        elif self.encoder_type != "mean":
            raise ValueError(f"unknown encoder_type {self.encoder_type!r}")
        self.to_url = nn.Dense(self.url_dim)

    def __call__(self, tokens: jax.Array) -> jax.Array:
        emb = self.word_embedding(tokens)  # (B, L, W)
        mask = (tokens != 0)
        if self.encoder_type == "lstm":
            # Padding is always trailing (txt2url_generator pads at the end,
            # train_txt2url.py:135-140), so mask ≡ sequence lengths.
            lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)
            carry = self.rnn(emb, seq_lengths=lengths, return_carry=True)[0]
            hidden = carry[1]  # LSTM h state at each sequence's true end
        else:
            m = mask.astype(emb.dtype)[..., None]
            denom = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
            hidden = jnp.sum(emb * m, axis=-2) / denom
        return self.to_url(hidden)


class Txt2UrlModel(nn.Module):
    word_vocab_size: int
    url_vocab_size: int
    word_dim: int = 64
    rnn_size: int = 64
    url_dim: int = 64
    encoder_type: str = "lstm"
    mesh: Optional[Mesh] = None

    def setup(self):
        self.encoder = SentenceEncoder(
            vocab_size=self.word_vocab_size,
            word_dim=self.word_dim,
            rnn_size=self.rnn_size,
            url_dim=self.url_dim,
            encoder_type=self.encoder_type,
            mesh=self.mesh,
        )
        self.url_embedding = TableEmbed(
            num_embeddings=self.url_vocab_size,
            features=self.url_dim,
            mesh=self.mesh,
            embedding_init=he_normal_embed_init,
        )

    def encode_text(self, tokens: jax.Array) -> jax.Array:
        return self.encoder(tokens)

    def encode_url(self, url_ids: jax.Array) -> jax.Array:
        return self.url_embedding(url_ids)

    def score_text_vs_all(self, tokens: jax.Array) -> jax.Array:
        """Text embedding vs every URL row (SentenceNN debug parity,
        debug_callbacks.py:81-104)."""
        return self.url_embedding.attend(self.encoder(tokens))

    def all_pairs_scores(
        self,
        url_near_text: jax.Array,  # (B,)
        tokens: jax.Array,         # (B, L)
        url1: jax.Array,           # (B,)
        url2: jax.Array,           # (B,)
    ) -> Tuple[jax.Array, jax.Array]:
        """Reference-EXACT (B, B) similarity matrices for both heads.

        The reference's ``similarity`` Lambda is a full ``K.dot(a, b.T)``
        over the batch (train_txt2url.py:165-167), so its text head trains
        every text_i × url_j pair toward the margin and its url2url head
        regresses every url1_i · url2_j against row i's sqrt(dice)
        (:252-257 with Keras's broadcast-target MAE/MSE). Returns
        (text_sim, url_sim), each (B, B) with rows = first argument."""
        text_sim = self.encoder(tokens) @ self.url_embedding(url_near_text).T
        url_sim = self.url_embedding(url1) @ self.url_embedding(url2).T
        return text_sim, url_sim

    def __call__(
        self,
        url_near_text: jax.Array,  # (B,) url id whose page the text came from
        tokens: jax.Array,         # (B, L)
        url1: jax.Array,           # (B,) url2url pair
        url2: jax.Array,           # (B,)
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """Returns (text_score (B,), url_score (B,), text_embed, url_embed)."""
        text_embed = self.encoder(tokens)
        url_text_embed = self.url_embedding(url_near_text)
        text_score = jnp.sum(text_embed * url_text_embed, axis=-1)
        url_score = jnp.sum(
            self.url_embedding(url1) * self.url_embedding(url2), axis=-1
        )
        return text_score, url_score, text_embed, url_text_embed


def max_norm_project(table: jax.Array, max_norm: float) -> jax.Array:
    """Scale rows with L2 norm > max_norm down to the ball (Keras
    ``max_norm`` constraint semantics, train_txt2url.py:217,237)."""
    norms = jnp.sqrt(jnp.sum(jnp.square(table), axis=-1, keepdims=True))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norms, 1e-12))
    return table * scale
