"""Train state: params + optimizer + (optional) batch stats, one struct.

Replaces the reference's three ad-hoc arrangements (flax TrainState without
batch_stats at train_shop_the_look.py:175-177 — which *discards* BatchNorm
statistics every step, a bug SURVEY.md §2.4 documents; plain TrainState at
train_spotify.py:238-243; and a TrainState treated as a byte blob at
train_cooccurence.py:129-134). ``batch_stats`` is a first-class field here so
BatchNorm models persist running statistics and eval can use them.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    batch_stats: Any = None

    def apply_gradients(self, *, grads: Any, batch_stats: Any = None, **kwargs) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=self.batch_stats if batch_stats is None else batch_stats,
            **kwargs,
        )

    @classmethod
    def create(
        cls,
        *,
        apply_fn: Callable,
        params: Any,
        tx: optax.GradientTransformation,
        batch_stats: Any = None,
        step: int = 0,
    ) -> "TrainState":
        import jax.numpy as jnp

        return cls(
            step=jnp.asarray(step, jnp.int32),
            params=params,
            opt_state=tx.init(params),
            batch_stats=batch_stats,
            apply_fn=apply_fn,
            tx=tx,
        )

    def variables(self) -> dict:
        """Flax variables dict for apply()."""
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v
