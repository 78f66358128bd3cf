"""Ranking metrics over rank-ordered retrieval hit masks.

Shared by the playlist full-corpus eval and the txt2url URL-table eval
(net-new vs the reference, which reports recall only —
spotify/train_spotify.py:113-131, wikipedia/train_txt2url.py trains with
no eval at all).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def ranking_metrics(hit: jax.Array, denom: jax.Array, k: int,
                    prefix: str, ndcg: bool = True) -> Dict[str, jax.Array]:
    """Recall@k, MRR@k and (optionally) NDCG@k from a rank-ordered (B, k)
    hit mask.

    ``hit[b, i]`` says whether the rank-i retrieved item is relevant;
    ``denom`` is the relevant-set size (clamped >= 1 by callers). Padded /
    invalid ranks must already be masked False by the caller. ``ndcg=False``
    skips the NDCG computation (e.g. artist hits, where one artist
    satisfies many slots and NDCG is ill-posed).
    """
    hit = hit.astype(jnp.float32)
    any_hit = jnp.max(hit, axis=-1)
    first = jnp.argmax(hit, axis=-1).astype(jnp.float32)  # 0 when no hit
    out = {
        f"{prefix}_recall": jnp.mean(jnp.sum(hit, axis=-1) / denom),
        f"{prefix}_mrr": jnp.mean(any_hit / (first + 1.0)),
    }
    if ndcg:
        ranks = jnp.arange(k, dtype=jnp.float32)
        discounts = 1.0 / jnp.log2(ranks + 2.0)
        dcg = jnp.sum(hit * discounts, axis=-1)
        # ideal DCG: the first min(|relevant|, k) slots all hit
        ideal_cum = jnp.concatenate(
            [jnp.zeros((1,), jnp.float32), jnp.cumsum(discounts)])
        n_rel = jnp.clip(denom, 1.0, float(k)).astype(jnp.int32)
        out[f"{prefix}_ndcg"] = jnp.mean(dcg / ideal_cum[n_rel])
    return out
