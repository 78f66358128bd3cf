"""GloVe co-occurrence embedding workload.

Replaces reference wikipedia/train_cooccurence.py:137-192: same data format
(CooccurrenceRow shards), same loss (weighted MSE on log10(1+count),
train_cooccurence.py:75-84), same qualitative probe-KNN dumps — on the shared
harness, with the token table row-shardable over ``model`` and the epoch
structure expressed as eval/hook cadences of one step loop.

Run:  python -m esrecsys_tpu.workloads.glove --train_pattern 'shards/*.bz2' \
          --token_dictionary dict.bz2 --work_dir /tmp/glove
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial
from typing import Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from esrecsys_tpu.core import config as config_lib
from esrecsys_tpu.core import mesh as mesh_lib
from esrecsys_tpu.core import prng
from esrecsys_tpu.core.tracking import make_tracker
from esrecsys_tpu.data import pipelines
from esrecsys_tpu.data.vocab import Vocabulary
from esrecsys_tpu.models.glove import Glove
from esrecsys_tpu.ops import losses
from esrecsys_tpu.parallel.sharding import apply_partition_rules
from esrecsys_tpu.train import Checkpointer, TrainState, fit

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class GloveConfig:
    """Defaults follow the reference run (wikipedia/README.md:127-139)."""

    train_pattern: str = ""
    eval_pattern: str = ""  # held-out co-occurrence shards; defaults to
    # train_pattern (the reference has no GloVe eval split at all — its only
    # quality signal is the probe-KNN dump, train_cooccurence.py:114-126;
    # eval_loss on the training distribution is what sweeps minimize)
    token_dictionary: str = ""
    work_dir: str = "/tmp/glove"
    feature_size: int = 64
    batch_size: int = 2048
    learning_rate: float = 5e-4
    steps_per_epoch: int = 10000
    num_epochs: int = 100
    shuffle_buffer_size: int = 5_000_000
    seed: int = 12345
    terms: str = "news,apple,computer,physics,math,biology"
    optimizer: str = "adam"  # adam (dense, reference parity,
    # train_cooccurence.py:96-101) | lazy_adam (row-lazy: moments and params
    # update only for the step's touched rows — TF-LazyAdam semantics,
    # ops/optim.py; the win grows with vocab/batch ratio)
    eval_every_epochs: int = 1
    eval_steps: int = 50
    checkpoint_every_epochs: int = 5
    n_model_shards: int = 1
    steps_per_call: int = 8  # multi-step device loop (amortizes dispatch;
    # also enables the packed lazy-adam layout, see use_packed_tables)
    resume: bool = False
    # SIGTERM => coordinated stop + checkpoint + clean exit (train/preemption.py)
    graceful_shutdown: bool = True


def make_train_step(model: Glove):
    def train_step(state: TrainState, batch):
        (t1, t2), count = batch

        def loss_fn(params):
            pred = state.apply_fn({"params": params}, (t1, t2))
            return losses.glove_loss(pred, count)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), {"loss": loss}

    return train_step


def make_lazy_adam_train_step(model: Glove, cfg: GloveConfig, packed: bool = False):
    """Row-sparse GloVe step: grads w.r.t. the gathered embedding/bias rows,
    LazyAdam updates touching only those rows.

    The dense step pays a full Adam pass over the 565k-row token table every
    step (~4 ms at the reference batch 2048 — BENCHMARKS.md); here the
    update cost scales with 2·batch rows instead. Divergence: LazyAdam is
    the standard approximation of Adam (idle rows don't move while their
    momentum decays); the dense step stays the parity default.

    ``packed=True`` expects params/opt_state tables in the 128-lane physical
    layout (``optim.pack_rows``; installed around the step scan by ``fit``'s
    ``state_pack`` hook, see :func:`packed_state_transforms`): scatters then
    target ``128/D`` fewer rows, which moves the 565k-row table out of XLA's
    slow per-row regime — 3.9x the logical-layout step at the reference
    batch (BENCHMARKS.md). Same math to f32 rounding; embedding gathers go
    through :func:`optim.packed_gather_rows` (physical-row fetch + exact
    masked slot select — NOT an einsum, which TPU would run as a bf16 MXU
    pass and round the f32 rows; ADVICE r3 high), bias stays a
    logical-view take (at dim=1 the physical fetch would be 128× the bytes).
    """
    from esrecsys_tpu.ops import optim

    if packed:
        D = cfg.feature_size

        def train_step_packed(state: TrainState, batch):
            (t1, t2), count = batch
            b = t1.shape[0]
            ids = jnp.concatenate([t1, t2])
            from esrecsys_tpu.ops import guards

            ids = guards.check_ids(ids, model.num_embeddings, "token_embedding")
            tp_emb = state.params["token_embedding"]["embedding"]
            tp_bias = state.params["bias"]["embedding"]
            # embedding rows through the PHYSICAL layout (per-target-row
            # gather cost, 128/D× bytes — wins like the scatters do,
            # BENCHMARKS.md gather study); bias stays a logical-view take:
            # at dim=1 the physical fetch would be 128× the bytes
            rows_e = optim.packed_gather_rows(tp_emb, ids, D)
            rows_b = jnp.take(optim.unpack_rows(tp_bias, 1), ids, axis=0)

            def loss_fn(rows_e, rows_b):
                e1, e2 = rows_e[:b], rows_e[b:]
                b1, b2 = rows_b[:b, 0], rows_b[b:, 0]
                pred = jnp.sum(e1 * e2, axis=-1) + b1 + b2
                return losses.glove_loss(pred, count)

            loss, (g_e, g_b) = jax.value_and_grad(loss_fn, argnums=(0, 1))(rows_e, rows_b)
            new_e, os_e = optim.lazy_adam_packed_update(
                tp_emb, state.opt_state["embedding"], ids, g_e,
                dim=D, lr=cfg.learning_rate, step=state.step)
            new_b, os_b = optim.lazy_adam_packed_update(
                tp_bias, state.opt_state["bias"], ids, g_b,
                dim=1, lr=cfg.learning_rate, step=state.step)
            return state.replace(
                step=state.step + 1,
                params={"token_embedding": {"embedding": new_e},
                        "bias": {"embedding": new_b}},
                opt_state={"embedding": os_e, "bias": os_b},
            ), {"loss": loss}

        return train_step_packed

    def train_step(state: TrainState, batch):
        (t1, t2), count = batch
        b = t1.shape[0]
        ids = jnp.concatenate([t1, t2])
        from esrecsys_tpu.ops import guards

        ids = guards.check_ids(ids, model.num_embeddings, "token_embedding")
        t_emb = state.params["token_embedding"]["embedding"]
        t_bias = state.params["bias"]["embedding"]
        rows_e = jnp.take(t_emb, ids, axis=0)
        rows_b = jnp.take(t_bias, ids, axis=0)

        def loss_fn(rows_e, rows_b):
            e1, e2 = rows_e[:b], rows_e[b:]
            b1, b2 = rows_b[:b, 0], rows_b[b:, 0]
            pred = jnp.sum(e1 * e2, axis=-1) + b1 + b2
            return losses.glove_loss(pred, count)

        loss, (g_e, g_b) = jax.value_and_grad(loss_fn, argnums=(0, 1))(rows_e, rows_b)
        shd = cfg.n_model_shards > 1
        new_e, os_e = optim.lazy_adam_update(
            t_emb, state.opt_state["embedding"], ids, g_e,
            lr=cfg.learning_rate, step=state.step, rows_sharded=shd)
        new_b, os_b = optim.lazy_adam_update(
            t_bias, state.opt_state["bias"], ids, g_b,
            lr=cfg.learning_rate, step=state.step, rows_sharded=shd)
        return state.replace(
            step=state.step + 1,
            params={"token_embedding": {"embedding": new_e},
                    "bias": {"embedding": new_b}},
            opt_state={"embedding": os_e, "bias": os_b},
        ), {"loss": loss}

    return train_step


def use_packed_tables(cfg: GloveConfig) -> bool:
    """Packed physical-layout lazy-adam state: on for unsharded lazy_adam
    with a 128-divisor feature size and a multi-step device loop.

    Gates: row-sharding would reshape across the sharded dimension;
    feature sizes that don't divide 128 have no lane packing; and at
    steps_per_call=1 the pack/unpack reshapes wrap every single step —
    exactly the per-step reshape-around-scatter that loses more than it
    saves (ops/optim.py pack_rows)."""
    return (cfg.optimizer == "lazy_adam" and cfg.n_model_shards == 1
            and 128 % cfg.feature_size == 0 and cfg.steps_per_call > 1)


def packed_state_transforms(cfg: GloveConfig):
    """(state_pack, state_unpack) for ``fit`` — reshape every table to/from
    the 128-lane physical view around the step scan (free reshapes at the
    scan boundary; see ops/optim.py pack_rows)."""
    from esrecsys_tpu.ops import optim

    D = cfg.feature_size

    def pack(state):
        return state.replace(
            params={
                "token_embedding": {"embedding": optim.pack_rows(
                    state.params["token_embedding"]["embedding"])},
                "bias": {"embedding": optim.pack_rows(
                    state.params["bias"]["embedding"])},
            },
            opt_state={
                "embedding": {k: optim.pack_rows(v)
                              for k, v in state.opt_state["embedding"].items()},
                "bias": {k: optim.pack_rows(v)
                         for k, v in state.opt_state["bias"].items()},
            },
        )

    def unpack(state):
        return state.replace(
            params={
                "token_embedding": {"embedding": optim.unpack_rows(
                    state.params["token_embedding"]["embedding"], D)},
                "bias": {"embedding": optim.unpack_rows(
                    state.params["bias"]["embedding"], 1)},
            },
            opt_state={
                "embedding": {k: optim.unpack_rows(v, D)
                              for k, v in state.opt_state["embedding"].items()},
                "bias": {k: optim.unpack_rows(v, 1)
                         for k, v in state.opt_state["bias"].items()},
            },
        )

    return pack, unpack


def select_train_step(model: Glove, cfg: GloveConfig):
    if cfg.optimizer == "lazy_adam":
        return make_lazy_adam_train_step(model, cfg, packed=use_packed_tables(cfg))
    if cfg.optimizer != "adam":
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    return make_train_step(model)


def make_eval_step(model: Glove):
    def eval_step(state: TrainState, batch):
        (t1, t2), count = batch
        pred = state.apply_fn({"params": state.params}, (t1, t2))
        return {"loss": losses.glove_loss(pred, count)}

    return eval_step


def knn(state: TrainState, tokens: jax.Array, k: int = 10,
        valid_rows: Optional[int] = None):
    """Top-k neighbors by embedding dot product for a batch of token ids.

    ``valid_rows`` masks out table rows >= it (the table is padded to a
    128-multiple of rows for the packed physical layout — pad rows hold
    untrained init noise and must not surface as neighbors)."""
    scores = state.apply_fn({"params": state.params}, tokens, method=Glove.score_all)
    if valid_rows is not None and valid_rows < scores.shape[-1]:
        col = jnp.arange(scores.shape[-1])[None, :]
        scores = jnp.where(col < valid_rows, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return jax.device_get(top_scores), jax.device_get(top_idx)


def knn_hook(vocab: Vocabulary, probe_tokens: Sequence[str], k: int = 10):
    """Per-cadence nearest-neighbor dump (train_cooccurence.py:114-126 parity)."""
    ids = jnp.asarray([vocab.embedding_index(t) for t in probe_tokens], jnp.int32)

    def hook(state: TrainState, step: int) -> None:
        top_scores, top_idx = knn(state, ids, k, valid_rows=vocab.num_embeddings)
        for i, token in enumerate(probe_tokens):
            neighbors = " ".join(
                "%s:%.3f" % (vocab.token_from_embedding_index(int(top_idx[i, j])), top_scores[i, j])
                for j in range(k)
            )
            log.info("knn step=%d %s: %s", step, token, neighbors)

    return hook


def init_state(cfg: GloveConfig, num_embeddings: int, mesh) -> Tuple[Glove, TrainState]:
    # Tables are padded to a 128-multiple of rows so every table (embedding
    # D=feature_size, bias D=1) reshapes cleanly to its 128-lane physical
    # view (ops/optim.py pack_rows — the packed lazy-adam layout) and row
    # sharding divides evenly. Pad rows are unreachable by valid token ids;
    # knn() masks them out of neighbor dumps.
    valid_rows = num_embeddings
    num_embeddings = -(-num_embeddings // 128) * 128
    model = Glove(num_embeddings=num_embeddings, features=cfg.feature_size,
                  mesh=mesh, valid_rows=valid_rows)
    key = prng.stream(prng.base_key(cfg.seed), prng.STREAM_INIT)
    dummy = jnp.zeros((2,), jnp.int32)
    params = model.init(key, (dummy, dummy))["params"]
    if mesh is not None:
        params = apply_partition_rules(params, mesh)
    tx = optax.adam(cfg.learning_rate)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    if cfg.optimizer == "lazy_adam":
        from esrecsys_tpu.ops import optim

        state = state.replace(opt_state={
            "embedding": optim.adam_init(params["token_embedding"]["embedding"]),
            "bias": optim.adam_init(params["bias"]["embedding"]),
        })
    return model, state


def train(cfg: GloveConfig, tracker=None, vocab: Optional[Vocabulary] = None):
    mesh_lib.distributed_init_if_needed()  # live multi-host bootstrap
    # cfg.batch_size is the GLOBAL batch: each host's pipeline yields its
    # 1/process_count slice (input files sharded per process inside the
    # pipelines); fit() reassembles global arrays.
    local_bs = mesh_lib.process_local_batch(cfg.batch_size)
    host_seed = cfg.seed + jax.process_index()
    mesh = mesh_lib.make_mesh(n_model=cfg.n_model_shards)
    if vocab is None:
        vocab = Vocabulary.load(cfg.token_dictionary)
    num_embeddings = vocab.num_embeddings
    model, state = init_state(cfg, num_embeddings, mesh)

    ckpt = Checkpointer(f"{cfg.work_dir}/checkpoints")
    if cfg.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        log.info("resumed from step %d", int(state.step))

    tracker = tracker or make_tracker(run_dir=cfg.work_dir, config=config_lib.to_dict(cfg))
    batches = pipelines.glove_batches(
        cfg.train_pattern,
        local_bs,
        shuffle_buffer=cfg.shuffle_buffer_size,
        seed=host_seed,
    )
    probe_terms = [t for t in cfg.terms.split(",") if t]
    hooks = [knn_hook(vocab, probe_terms)] if probe_terms else []

    eval_pattern = cfg.eval_pattern or cfg.train_pattern
    eval_iter_fn = lambda: pipelines.glove_batches(
        eval_pattern, local_bs, shuffle_buffer=0, seed=host_seed + 1)

    result = fit(
        state,
        select_train_step(model, cfg),
        batches,
        num_steps=cfg.steps_per_epoch * cfg.num_epochs,
        eval_step=make_eval_step(model),
        eval_iter_fn=eval_iter_fn,
        eval_every=cfg.steps_per_epoch * cfg.eval_every_epochs,
        eval_steps=cfg.eval_steps,
        log_every=min(1000, cfg.steps_per_epoch),
        tracker=tracker,
        checkpointer=ckpt,
        checkpoint_every=cfg.steps_per_epoch * cfg.checkpoint_every_epochs,
        hooks=hooks,
        hook_every=cfg.steps_per_epoch,
        examples_per_step=cfg.batch_size,
        steps_per_call=cfg.steps_per_call,
        mesh=mesh,
        preemption=cfg.graceful_shutdown,
        **(dict(zip(("state_pack", "state_unpack"), packed_state_transforms(cfg)))
           if use_packed_tables(cfg) else {}),
    )
    from esrecsys_tpu.train.preemption import log_if_preempted

    if log_if_preempted(result, log):
        return result
    # settled final model as a deployable artifact + artifacts.jsonl entry
    # (train_cooccurence.py:188-192 parity — the reference registers its
    # trained model with the tracker)
    from esrecsys_tpu.train import export_model

    export_model(
        cfg.work_dir, "glove", result.state.params,
        step=int(jax.device_get(result.state.step)), tracker=tracker,
        metadata={"vocab_rows": vocab.num_embeddings,
                  "padded_rows": model.num_embeddings,
                  "feature_size": cfg.feature_size,
                  # logical (unpadded) row counts per table (uniform schema
                  # across workload artifacts — consumers must slice)
                  "valid_rows": {"token_embedding": vocab.num_embeddings,
                                 "bias": vocab.num_embeddings}})
    return result


def main(argv=None):
    # force=True: jax/absl may already have installed a root handler at
    # WARNING, which would swallow the knn/resume INFO lines.
    logging.basicConfig(level=logging.INFO, force=True)
    from esrecsys_tpu.axon_preflight import warn_cpu_fallback

    warn_cpu_fallback(log)
    cfg = config_lib.from_cli(GloveConfig, argv)
    train(cfg)


if __name__ == "__main__":
    main()
