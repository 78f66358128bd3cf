"""Loss library — every objective in the reference, as shared pure functions.

Exact-parity sources:
  * GloVe weighted MSE        — reference wikipedia/train_cooccurence.py:75-84
  * triplet hinge (sum)       — pinterest/train_shop_the_look.py:93-109
  * mean / extremal triplet   — spotify/train_spotify.py:89-97
  * self-affinity hinges      — spotify/train_spotify.py:99-101
  * norm-cap regularizers     — spotify/train_spotify.py:103 (cap>c),
                                pinterest/train_shop_the_look.py:100-103 (cap>1)
  * margin + MAE (txt2url)    — wikipedia/train_txt2url.py:149-167
Framework additions (TPU-friendly objectives the reference lacks):
  * in-batch sampled softmax with optional log-Q correction.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def relu(x):
    return jnp.maximum(x, 0)


# ---------------------------------------------------------------- GloVe

def glove_weight(count: jax.Array, x_max: float = 100.0, alpha: float = 0.75):
    """min(1, count/x_max)^alpha (train_cooccurence.py:79-81)."""
    return jnp.power(jnp.minimum(jnp.ones_like(count), count / x_max), alpha)


def glove_target(count: jax.Array):
    """log10(1 + count) (train_cooccurence.py:82) — note log10, not ln."""
    return jnp.log10(1.0 + count)


def glove_loss(predicted: jax.Array, count: jax.Array, x_max: float = 100.0,
               alpha: float = 0.75) -> jax.Array:
    """Weighted MSE against log co-occurrence; mean over the batch."""
    w = glove_weight(count, x_max, alpha)
    err = glove_target(count) - predicted
    return jnp.mean(jnp.square(err) * w)


# ---------------------------------------------------------------- triplets

def triplet_hinge_sum(pos_score, neg_score, margin: float = 1.0):
    """sum(relu(margin + neg - pos)) (train_shop_the_look.py:99)."""
    return jnp.sum(relu(margin + neg_score - pos_score))


def mean_triplet(pos_affinity, neg_affinity, margin: float = 1.0):
    """relu(margin + mean(neg) - mean(pos)) (train_spotify.py:89-92)."""
    return relu(margin + jnp.mean(neg_affinity) - jnp.mean(pos_affinity))


def extremal_triplet(pos_affinity, neg_affinity, margin: float = 1.0):
    """relu(margin + max(neg) - min(pos)) (train_spotify.py:94-97)."""
    return relu(margin + jnp.max(neg_affinity) - jnp.min(pos_affinity))


def self_affinity_floor(affinity, floor: float = 0.5):
    """mean(relu(floor - affinity)): pull self-affinity above `floor`
    (train_spotify.py:99-100)."""
    return jnp.mean(relu(floor - affinity))


def self_affinity_ceiling(affinity):
    """mean(relu(affinity)): push (negative-group) self-affinity below 0
    (train_spotify.py:101)."""
    return jnp.mean(relu(affinity))


# ---------------------------------------------------------------- norm caps

def norm_cap(l2_norms, cap: float):
    """sum(relu(||e|| - cap)) over precomputed L2 norms (train_spotify.py:103)."""
    return jnp.sum(relu(l2_norms - cap))


def embedding_norm_cap(embeddings, cap: float = 1.0):
    """sum over rows of relu(||row||_2 - cap) (train_shop_the_look.py:100-103)."""
    norms = jnp.sqrt(jnp.sum(jnp.square(embeddings), axis=-1))
    return jnp.sum(relu(norms - cap))


# ---------------------------------------------------------------- txt2url

def margin_square_loss(score, margin: float = 1.0):
    """square(relu(margin - score)): push matching dot above margin
    (train_txt2url.py:156-160 'Margin loss')."""
    return jnp.mean(jnp.square(relu(margin - score)))


# ------------------------------------------------- sampled softmax (new)

def in_batch_softmax(
    query: jax.Array,
    item: jax.Array,
    log_q: Optional[jax.Array] = None,
    temperature: float = 1.0,
) -> jax.Array:
    """In-batch sampled-softmax retrieval loss (framework addition).

    Each row i of ``query`` (B, D) is a positive for row i of ``item`` (B, D);
    all other rows act as negatives. ``log_q`` (B,) optionally applies the
    sampled-softmax popularity correction ``logits_ij -= log_q[j]``.

    This is the TPU-friendly replacement for host-side uniform negative
    sampling (train_spotify.py:139-150): one B×B matmul on the MXU serves
    B-1 negatives per example with zero extra lookups.
    """
    logits = jnp.dot(query, item.T) / temperature  # (B, B)
    if log_q is not None:
        logits = logits - log_q[None, :]
    labels = jnp.arange(query.shape[0])
    logz = jax.nn.logsumexp(logits, axis=-1)
    return jnp.mean(logz - logits[labels, labels])
