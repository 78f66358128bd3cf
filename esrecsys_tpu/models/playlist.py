"""Playlist next-track model (two-table affinity tower).

Capability parity with reference ``SpotifyModel`` (spotify/models.py:23-91):
a track is represented as concat(album_embed, artist_embed); albums are
mod-hashed into a bounded table; affinity of an item to a playlist context is
the max dot product against the context's track embeddings plus 0.1 boosts
when the item's album/artist appears in the context.

TPU-first differences:
  * vocab sizes are config, not hardcoded constants (reference bakes
    100000/295861 into the module, spotify/models.py:29-31);
  * everything is batched: the reference trains ONE playlist per step
    (train_spotify.py:255-258) and retraces jit per ragged next-length; here
    shapes are (B, C)/(B, M)+mask and compile once;
  * tables are row-shardable over the ``model`` mesh axis;
  * ragged next-track groups carry an explicit mask that scoring and losses
    respect.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from esrecsys_tpu.models.layers import TableEmbed

NEG_INF = -1e9


def batched_isin(element: jax.Array, test_set: jax.Array) -> jax.Array:
    """Per-batch membership: element (B, M), test_set (B, C) → bool (B, M).

    The batched generalization of the reference's ``jnp.isin`` boosts
    (spotify/models.py:75-80), which only handles one playlist at a time.
    """
    return jnp.any(element[..., :, None] == test_set[..., None, :], axis=-1)


def affinity_scores(
    context_embed: jax.Array,   # (B, C, D)
    item_embed: jax.Array,      # (B, M, D), or shared (M, D)
    item_album: jax.Array,      # (B, M), or shared (M,)
    item_artist: jax.Array,     # (B, M), or shared (M,)
    album_context: jax.Array,   # (B, C)
    artist_context: jax.Array,  # (B, C)
    compute_dtype=None,
    precision=None,
) -> jax.Array:
    """max-dot over context slots + 0.1 album/artist membership boosts
    (spotify/models.py:74-80), batched: → (B, M). The single definition used
    by training (``score_embeddings``) and both eval paths.

    A 2-D ``item_embed`` is a *shared* item set (one pool or corpus block
    scored against every query): the dot becomes a single (M, D) × (B, C, D)
    MXU contraction instead of a per-query batched one.

    ``compute_dtype=bfloat16`` runs the dot contractions on the bf16 MXU
    path with f32 accumulation (outputs stay f32) — ~20% faster training
    steps; scores round at bf16 granularity (opt-in; f32 is the parity
    default).
    """
    if compute_dtype is not None:
        context_embed = context_embed.astype(compute_dtype)
        item_embed = item_embed.astype(compute_dtype)
    if item_embed.ndim == 2:
        dots = jnp.einsum("md,bcd->bmc", item_embed, context_embed,
                          preferred_element_type=jnp.float32,
                          precision=precision)
        bsz = context_embed.shape[0]
        item_album = jnp.broadcast_to(item_album, (bsz,) + item_album.shape)
        item_artist = jnp.broadcast_to(item_artist, (bsz,) + item_artist.shape)
    else:
        dots = jnp.einsum("bmd,bcd->bmc", item_embed, context_embed,
                          preferred_element_type=jnp.float32,
                          precision=precision)
    aff = jnp.max(dots, axis=-1)
    aff = aff + 0.1 * batched_isin(item_album, album_context)
    aff = aff + 0.1 * batched_isin(item_artist, artist_context)
    return aff


def score_embeddings(
    context_embed: jax.Array,   # (B, C, D)
    next_embed: jax.Array,      # (B, M, D)
    neg_embed: jax.Array,       # (B, N, D) or shared (N, D)
    next_album: jax.Array,
    next_artist: jax.Array,
    neg_album: jax.Array,
    neg_artist: jax.Array,
    album_context: jax.Array,
    artist_context: jax.Array,
    compute_dtype=None,
) -> Tuple[jax.Array, ...]:
    """Post-gather scoring math shared by :meth:`PlaylistModel.__call__` and
    the sparse-update train step (which gathers table rows itself so its
    gradients stay row-shaped instead of densifying to table shape).

    Returns the reference's six outputs (spotify/models.py:82-91), batched:
    (pos_affinity, neg_affinity, ctx/next/neg self-affinity, L2 norms —
    a ((B, C+M), (N,)) pair in shared-negative mode). L2 norms are always
    f32 regardless of ``compute_dtype`` (they feed the norm-cap regularizer).
    """
    shared = neg_embed.ndim == 2
    pos_affinity = affinity_scores(
        context_embed, next_embed, next_album, next_artist,
        album_context, artist_context, compute_dtype)
    neg_affinity = affinity_scores(
        context_embed, neg_embed, neg_album, neg_artist,
        album_context, artist_context, compute_dtype)

    l2 = lambda e: jnp.sqrt(jnp.sum(jnp.square(e), axis=-1))
    if shared:
        all_embeddings_l2 = (
            l2(jnp.concatenate([context_embed, next_embed], axis=-2)),
            l2(neg_embed),
        )
    else:
        all_embeddings_l2 = l2(
            jnp.concatenate([context_embed, next_embed, neg_embed], axis=-2))

    # Flip-paired self-affinities (spotify/models.py:85-87): row i vs
    # row C-1-i of the same group, so each group's embeddings spread out.
    def self_aff(e):
        if compute_dtype is not None:
            e = e.astype(compute_dtype)
        if e.ndim == 2:
            return jnp.einsum("md,nd->mn", jnp.flip(e, axis=-2), e,
                              preferred_element_type=jnp.float32)
        return jnp.einsum("bmd,bnd->bmn", jnp.flip(e, axis=-2), e,
                          preferred_element_type=jnp.float32)

    return (
        pos_affinity,
        neg_affinity,
        self_aff(context_embed),
        self_aff(next_embed),
        self_aff(neg_embed),
        all_embeddings_l2,
    )


class PlaylistModel(nn.Module):
    feature_size: int
    album_hash_buckets: int = 100_000
    num_artists: int = 295_861
    mesh: Optional[Mesh] = None
    compute_dtype: Optional[jnp.dtype] = None  # bf16 scoring einsums (opt-in)
    table_rows_multiple: int = 1  # row alignment for the 128-lane packed
    # physical layout (workloads/playlist.use_packed_tables)

    def setup(self):
        self.album_embed = TableEmbed(
            num_embeddings=self.album_hash_buckets,
            features=self.feature_size,
            mesh=self.mesh,
            rows_multiple=self.table_rows_multiple,
        )
        self.artist_embed = TableEmbed(
            num_embeddings=self.num_artists,
            features=self.feature_size,
            mesh=self.mesh,
            rows_multiple=self.table_rows_multiple,
        )

    def get_embeddings(self, album: jax.Array, artist: jax.Array) -> jax.Array:
        """(..., ) int ids → (..., 2*feature_size) track embedding.

        Album ids are mod-hashed into the bounded table
        (spotify/models.py:42 parity)."""
        album_e = self.album_embed(jnp.mod(album, self.album_hash_buckets))
        artist_e = self.artist_embed(artist)
        return jnp.concatenate([album_e, artist_e], axis=-1)

    def __call__(
        self,
        track_context: jax.Array,   # (B, C) — unused for embeddings (parity:
        album_context: jax.Array,   # the reference has no track-id table)
        artist_context: jax.Array,
        next_track: jax.Array,      # (B, M)
        next_album: jax.Array,
        next_artist: jax.Array,
        neg_track: jax.Array,       # (B, N), or (N,) for a shared pool
        neg_album: jax.Array,
        neg_artist: jax.Array,
    ) -> Tuple[jax.Array, ...]:
        """Returns (pos_affinity (B,M), neg_affinity (B,N), context/next/neg
        self-affinity matrices, all embedding L2 norms) — the same six outputs
        as the reference (spotify/models.py:82-91), with a batch dim.

        Shared-negative mode: 1-D ``neg_*`` ids are one pool scored against
        every playlist (neg_affinity still (B, N); neg self-affinity is the
        pool's (N, N); the L2 output becomes a ((B, C+M), (N,)) pair). One
        pool per step costs N gather/scatter rows instead of B·N and every
        playlist sees N negatives instead of the reference's 64
        (train_spotify.py:60)."""
        del track_context, neg_track
        context_embed = self.get_embeddings(album_context, artist_context)
        next_embed = self.get_embeddings(next_album, next_artist)
        neg_embed = self.get_embeddings(neg_album, neg_artist)
        return score_embeddings(
            context_embed, next_embed, neg_embed,
            next_album, next_artist, neg_album, neg_artist,
            album_context, artist_context,
            compute_dtype=self.compute_dtype,
        )
