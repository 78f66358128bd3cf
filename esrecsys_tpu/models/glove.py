"""GloVe-style co-occurrence embedding model.

Capability parity with the reference ``Glove`` (wikipedia/models.py:8-55):
shared token embedding + scalar bias table; a (token1, token2) batch scores
dot(e1, e2) + b1 + b2 approximating log10(1 + co-occurrence count).

TPU-first differences:
  * batched dot is a fused multiply-reduce, not a vmapped scalar dot;
  * ``score_all`` is a matmul against the (row-sharded) table via
    ``TableEmbed.attend`` — no arange-gather materialization
    (reference models.py:50-54);
  * the table can be row-sharded over the ``model`` mesh axis.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from esrecsys_tpu.models.layers import TableEmbed


def zeros_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class Glove(nn.Module):
    num_embeddings: int = 1024
    features: int = 64
    mesh: Optional[Mesh] = None
    # rows >= valid_rows are padding (tables padded to 128-multiples for the
    # packed physical layout, workloads/glove.py init_state); score_all masks
    # them so untrained init noise never surfaces as a nearest neighbor
    valid_rows: Optional[int] = None

    def setup(self):
        self.token_embedding = TableEmbed(
            num_embeddings=self.num_embeddings, features=self.features, mesh=self.mesh
        )
        # Bias rows are zero-initialized like the reference (models.py:18-19).
        self.bias = TableEmbed(
            num_embeddings=self.num_embeddings,
            features=1,
            mesh=self.mesh,
            embedding_init=zeros_init,
        )

    def __call__(self, inputs: Tuple[jax.Array, jax.Array]) -> jax.Array:
        """Predicted log co-occurrence for a batch of (token1, token2): (B,).

        Deliberate divergence: the reference adds a (B,) dot to (B,1) biases,
        broadcasting predictions to a (B,B) matrix whose off-diagonal entries
        are noise that its loss then averages over (wikipedia/models.py:31-38
        with train_cooccurence.py:78-84). We return the correct (B,) vector.
        """
        token1, token2 = inputs
        e1 = self.token_embedding(token1)
        e2 = self.token_embedding(token2)
        b1 = jnp.squeeze(self.bias(token1), axis=-1)
        b2 = jnp.squeeze(self.bias(token2), axis=-1)
        dot = jnp.sum(e1 * e2, axis=-1)
        return dot + b1 + b2

    def score_all(self, tokens: jax.Array) -> jax.Array:
        """Dot of each query token's embedding vs every row: (B, rows);
        padding rows (>= ``valid_rows``) score -inf.

        Bias is excluded, matching reference ``score_all``
        (wikipedia/models.py:40-55) — KNN there is by raw dot product.
        """
        query = self.token_embedding(tokens)
        scores = self.token_embedding.attend(query)
        if self.valid_rows is not None and self.valid_rows < scores.shape[-1]:
            col = jnp.arange(scores.shape[-1])
            scores = jnp.where(col < self.valid_rows, scores, -jnp.inf)
        return scores
