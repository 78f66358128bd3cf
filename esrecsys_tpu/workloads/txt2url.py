"""Text→URL retrieval workload (wikipedia two-objective two-tower).

Replaces reference wikipedia/train_txt2url.py:204-292 (the one Keras model in
the repo) on the shared JAX harness: sentence encoder vs URL table trained
with the margin objective, plus the url2url head regressing sqrt(dice);
RMSprop with per-epoch learning-rate decay (:101-105); Keras-style max-norm
constraints as post-update projections; pretrained GloVe word-embedding
transfer (:260-261); WordNN / SentenceNN probe hooks
(debug_callbacks.py:17-104).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Sequence, Tuple

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
from esrecsys_tpu.models.txt2url import Txt2UrlModel, max_norm_project
from esrecsys_tpu.ops import losses
from esrecsys_tpu.train import Checkpointer, TrainState, fit

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class Txt2UrlConfig:
    txt2url_pattern: str = ""
    url2url_pattern: str = ""
    token_dictionary: str = ""
    title_dictionary: str = ""
    work_dir: str = "/tmp/txt2url"
    word_dim: int = 64
    rnn_size: int = 64
    url_dim: int = 64
    encoder_type: str = "lstm"      # lstm (reference parity) | mean
    sentence_length: int = 32
    max_sentences_per_doc: int = 4
    batch_size: int = 64
    shuffle_buffer: int = 10_000
    learning_rate: float = 1e-3
    learning_rate_decay: float = 0.9   # per steps_per_epoch multiplier —
    # reference default (train_txt2url.py:78, applied at :101-105)
    steps_per_epoch: int = 10_000
    num_epochs: int = 10
    margin: float = 1.0
    word_max_norm: float = 3.0      # train_txt2url.py:217
    url_max_norm: float = 3.0       # flag url_max_norm
    text_objective: str = "margin"  # margin (matching pairs — the default,
    # documented divergence) | softmax (in-batch discriminative) |
    # reference_exact (the reference's (B,B) all-pairs broadcast semantics
    # for BOTH heads, train_txt2url.py:164-167,252-257 — opt-in so quality
    # parity is attributable, VERDICT r3 missing #1)
    glove_checkpoint: str = ""      # pretrained word embeddings to transfer
    n_model_shards: int = 1         # row-shard the ~1M-row url (and word)
    # tables over the ``model`` mesh axis — the natural TP case for this
    # workload (SURVEY §2.5); remaining devices form the data axis
    eval_txt2url_pattern: str = ""  # held-out docs; "" = no in-train eval
    eval_url2url_pattern: str = ""  # held-out url pairs (defaults to the
    # train url2url pairs when only the text pattern is held out)
    eval_every_steps: int = 10_000
    eval_steps: int = 16
    eval_recall_k: int = 10         # text→URL recall@k over the FULL url
    # table per eval batch (the quantitative form of the SentenceNN probe,
    # debug_callbacks.py:57-104); 0 disables the retrieval part
    seed: int = 0
    resume: bool = False
    # SIGTERM => coordinated stop + checkpoint + clean exit (train/preemption.py)
    graceful_shutdown: bool = True
    probe_words: str = ""
    probe_sentences: str = ""


def _objective_losses(model, cfg: Txt2UrlConfig, params, apply_fn, batch):
    """(text_loss, url_loss) under ``cfg.text_objective`` — shared by the
    train and eval steps so both always score the objective being trained."""
    if cfg.text_objective == "reference_exact":
        # (B,B) all-pairs semantics of the reference's Keras graph:
        # MAE(text_loss_matrix, 0) = mean over B² entries of
        # square(relu(margin - text_i·url_j)) (train_txt2url.py:254,257 with
        # the zeros target broadcast), and MSE of every url1_i·url2_j
        # against row i's sqrt(dice) (:252,257 — Keras broadcasts the (B,)
        # target across the (B,B) output's last axis).
        text_sim, url_sim = apply_fn(
            {"params": params},
            batch["url_near_text"], batch["tokens"],
            batch["url1"], batch["url2"],
            method=Txt2UrlModel.all_pairs_scores)
        text_loss = jnp.mean(jnp.square(losses.relu(cfg.margin - text_sim)))
        url_loss = jnp.mean(
            jnp.square(url_sim - batch["sqrt_dice"][:, None]))
        return text_loss, url_loss
    text_score, url_score, text_embed, url_embed = apply_fn(
        {"params": params},
        batch["url_near_text"], batch["tokens"],
        batch["url1"], batch["url2"],
    )
    if cfg.text_objective == "margin":
        text_loss = losses.margin_square_loss(text_score, cfg.margin)
    else:
        text_loss = losses.in_batch_softmax(text_embed, url_embed)
    url_loss = jnp.mean(jnp.square(url_score - batch["sqrt_dice"]))
    return text_loss, url_loss


def make_train_step(model: Txt2UrlModel, cfg: Txt2UrlConfig):
    def train_step(state: TrainState, batch):
        def loss_fn(params):
            text_loss, url_loss = _objective_losses(
                model, cfg, params, state.apply_fn, batch)
            return text_loss + url_loss, {"text_loss": text_loss, "url_loss": url_loss}

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        # Keras max_norm constraints: project table rows after the update.
        p = new_state.params
        p = _project(p, ("encoder", "word_embedding", "embedding"), cfg.word_max_norm)
        p = _project(p, ("url_embedding", "embedding"), cfg.url_max_norm)
        return new_state.replace(params=p), {"loss": loss, **parts}

    return train_step


def make_eval_step(model: Txt2UrlModel, cfg: Txt2UrlConfig):
    """Held-out eval: both train objectives plus text→URL retrieval
    recall@k over the FULL url table (the quantitative form of the
    reference's qualitative SentenceNN probe, debug_callbacks.py:57-104 —
    the reference itself trains with no eval at all, train_txt2url.py).

    Emitting ``eval_*`` metrics makes the workload a sweepable target for
    tools/sweep.py (metric: eval_recall_at_k / eval_loss).
    """

    def eval_step(state: TrainState, batch):
        text_loss, url_loss = _objective_losses(
            model, cfg, state.params, state.apply_fn, batch)
        metrics = {"loss": text_loss + url_loss, "text_loss": text_loss,
                   "url_loss": url_loss}
        if cfg.eval_recall_k:
            scores = state.apply_fn(
                {"params": state.params}, batch["tokens"],
                method=Txt2UrlModel.score_text_vs_all)  # (B, n_urls)
            from esrecsys_tpu.ops.metrics import ranking_metrics

            _, top = jax.lax.top_k(scores, cfg.eval_recall_k)
            hit = (top == batch["url_near_text"][:, None])  # rank-ordered
            # one relevant URL per sentence → denom 1, NDCG degenerates
            # to MRR-with-log-discount: skip it
            rm = ranking_metrics(hit, jnp.ones(hit.shape[0], jnp.float32),
                                 cfg.eval_recall_k, "url", ndcg=False)
            metrics["recall_at_k"] = rm["url_recall"]
            metrics["mrr_at_k"] = rm["url_mrr"]
        return metrics

    return eval_step


def _project(params, path: Tuple[str, ...], max_norm: float):
    def update(tree, path, value):
        if len(path) == 1:
            new = dict(tree)
            new[path[0]] = value
            return new
        new = dict(tree)
        new[path[0]] = update(tree[path[0]], path[1:], value)
        return new

    leaf = params
    for k in path:
        leaf = leaf[k]
    return update(params, list(path), max_norm_project(leaf, max_norm))


def load_glove_word_embeddings(params, glove_params) -> dict:
    """Transfer pretrained GloVe token embeddings into the word table
    (train_txt2url.py:260-261 by-name transfer)."""
    table = glove_params["token_embedding"]["embedding"]
    target = params["encoder"]["word_embedding"]["embedding"]
    if (table.shape[1] != target.shape[1] or table.shape[0] < target.shape[0]):
        raise ValueError(f"glove table {table.shape} != word table {target.shape}")
    # GloVe tables are padded to a 128-multiple of rows (workloads/glove.py
    # init_state, packed physical layout); pad rows are untrained — drop them.
    if table.shape[0] > target.shape[0]:
        table = table[: target.shape[0]]
    new = dict(params)
    enc = dict(new["encoder"])
    we = dict(enc["word_embedding"])
    we["embedding"] = table
    enc["word_embedding"] = we
    new["encoder"] = enc
    return new


def word_nn_hook(model: Txt2UrlModel, token_vocab: Vocabulary, words: Sequence[str], k=10):
    """WordNN parity (debug_callbacks.py:17-54): probe words vs word table."""
    ids = jnp.asarray([token_vocab.embedding_index(w) for w in words], jnp.int32)

    def hook(state: TrainState, step: int) -> None:
        table = state.params["encoder"]["word_embedding"]["embedding"]
        q = table[ids]
        scores = q @ table.T
        top_s, top_i = jax.lax.top_k(scores, k)
        top_s, top_i = jax.device_get((top_s, top_i))
        for i, w in enumerate(words):
            nn_str = " ".join(
                f"{token_vocab.token_from_embedding_index(int(top_i[i, j]))}:{top_s[i, j]:.3f}"
                for j in range(k)
            )
            log.info("word_nn step=%d %s: %s", step, w, nn_str)

    return hook


def sentence_nn_hook(model: Txt2UrlModel, token_vocab: Vocabulary,
                     title_vocab: Vocabulary, sentences: Sequence[str],
                     sentence_length: int, k=10):
    """SentenceNN parity (debug_callbacks.py:57-104): probe sentences → text
    tower → nearest URL embeddings."""
    rows = []
    for s in sentences:
        from esrecsys_tpu.data.vocab import simple_tokenize

        ids = token_vocab.embedding_indices(simple_tokenize(s))[:sentence_length]
        rows.append(ids + [0] * (sentence_length - len(ids)))
    tokens = jnp.asarray(rows, jnp.int32)

    def hook(state: TrainState, step: int) -> None:
        scores = state.apply_fn({"params": state.params}, tokens,
                                method=Txt2UrlModel.score_text_vs_all)
        top_s, top_i = jax.device_get(jax.lax.top_k(scores, k))
        for i, s in enumerate(sentences):
            nn_str = " ".join(
                f"{title_vocab.token(int(top_i[i, j])) if top_i[i, j] < len(title_vocab) else '?'}"
                f":{top_s[i, j]:.3f}"
                for j in range(k)
            )
            log.info("sentence_nn step=%d %r: %s", step, s, nn_str)

    return hook


def init_state(cfg: Txt2UrlConfig, word_vocab_size: int, url_vocab_size: int,
               mesh=None) -> Tuple[Txt2UrlModel, TrainState]:
    model = Txt2UrlModel(
        word_vocab_size=word_vocab_size,
        url_vocab_size=url_vocab_size,
        word_dim=cfg.word_dim,
        rnn_size=cfg.rnn_size,
        url_dim=cfg.url_dim,
        encoder_type=cfg.encoder_type,
        mesh=mesh,
    )
    key = prng.stream(prng.base_key(cfg.seed), prng.STREAM_INIT)
    b, L = 2, cfg.sentence_length
    params = model.init(
        key,
        jnp.zeros(b, jnp.int32), jnp.zeros((b, L), jnp.int32),
        jnp.zeros(b, jnp.int32), jnp.zeros(b, jnp.int32),
    )["params"]
    if mesh is not None:
        from esrecsys_tpu.parallel.sharding import apply_partition_rules

        params = apply_partition_rules(params, mesh)
    if cfg.learning_rate_decay < 1.0:
        schedule = optax.exponential_decay(
            cfg.learning_rate, cfg.steps_per_epoch, cfg.learning_rate_decay,
            staircase=True,
        )
    else:
        schedule = cfg.learning_rate
    tx = optax.rmsprop(schedule)
    return model, TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def train(cfg: Txt2UrlConfig, tracker=None):
    mesh_lib.distributed_init_if_needed()  # live multi-host bootstrap
    mesh = mesh_lib.make_mesh_for_batch(cfg.batch_size, n_model=cfg.n_model_shards)
    local_bs = mesh_lib.process_local_batch(cfg.batch_size)
    host_seed = cfg.seed + jax.process_index()
    token_vocab = Vocabulary.load(cfg.token_dictionary)
    title_vocab = Vocabulary.load(cfg.title_dictionary)
    doc_freq = np.asarray(
        [title_vocab.doc_frequency(i) for i in range(len(title_vocab))], np.float64
    )
    model, state = init_state(cfg, token_vocab.num_embeddings, len(title_vocab),
                              mesh=mesh)

    if cfg.glove_checkpoint:
        # Build a GloVe template matching the word table, restore its latest
        # checkpoint, and transfer the token embeddings by name
        # (train_txt2url.py:260-261 semantics).
        from esrecsys_tpu.workloads import glove as glove_wl

        gcfg = glove_wl.GloveConfig(feature_size=cfg.word_dim)
        _, glove_state = glove_wl.init_state(
            gcfg, num_embeddings=token_vocab.num_embeddings, mesh=None
        )
        glove_state = Checkpointer(cfg.glove_checkpoint).restore(glove_state)
        state = state.replace(
            params=load_glove_word_embeddings(state.params, glove_state.params)
        )
        log.info("transferred GloVe word embeddings from %s", cfg.glove_checkpoint)

    ckpt = Checkpointer(f"{cfg.work_dir}/checkpoints")
    if cfg.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)

    tracker = tracker or make_tracker(run_dir=cfg.work_dir, config=config_lib.to_dict(cfg))
    batches = pipelines.txt2url_batches(
        cfg.txt2url_pattern, cfg.url2url_pattern, doc_freq,
        local_bs, cfg.sentence_length, cfg.max_sentences_per_doc,
        shuffle_buffer=cfg.shuffle_buffer, seed=host_seed,
    )
    hooks = []
    if cfg.probe_words:
        hooks.append(word_nn_hook(model, token_vocab, cfg.probe_words.split(",")))
    if cfg.probe_sentences:
        hooks.append(sentence_nn_hook(model, token_vocab, title_vocab,
                                      cfg.probe_sentences.split("|"),
                                      cfg.sentence_length))
    eval_kwargs = {}
    if cfg.eval_txt2url_pattern:
        eval_kwargs = dict(
            eval_step=make_eval_step(model, cfg),
            eval_iter_fn=lambda: pipelines.txt2url_batches(
                cfg.eval_txt2url_pattern,
                cfg.eval_url2url_pattern or cfg.url2url_pattern,
                doc_freq, local_bs, cfg.sentence_length,
                cfg.max_sentences_per_doc, shuffle_buffer=0, seed=host_seed,
            ),
            eval_every=cfg.eval_every_steps,
            eval_steps=cfg.eval_steps,
        )
    result = fit(
        state,
        make_train_step(model, cfg),
        batches,
        num_steps=cfg.steps_per_epoch * cfg.num_epochs,
        log_every=min(1000, cfg.steps_per_epoch),
        **eval_kwargs,
        tracker=tracker,
        checkpointer=ckpt,
        checkpoint_every=cfg.steps_per_epoch,
        hooks=hooks,
        hook_every=cfg.steps_per_epoch,
        examples_per_step=cfg.batch_size,
        mesh=mesh,
        preemption=cfg.graceful_shutdown,
    )
    from esrecsys_tpu.train.preemption import log_if_preempted

    if log_if_preempted(result, log):
        return result
    # final two-tower model as a deployable artifact (train_txt2url.py's
    # saved keras model equivalent)
    from esrecsys_tpu.train import export_model

    export_model(
        cfg.work_dir, "txt2url", result.state.params,
        step=int(jax.device_get(result.state.step)), tracker=tracker,
        metadata={"word_dim": cfg.word_dim, "url_dim": cfg.url_dim,
                  "rnn_size": cfg.rnn_size, "encoder_type": cfg.encoder_type,
                  "sentence_length": cfg.sentence_length,
                  # logical (unpadded) row counts per table: rows past these
                  # are shard/pack alignment padding — consumers must slice
                  "valid_rows": {"word_embed": token_vocab.num_embeddings,
                                 "url_embed": len(title_vocab)}})
    return result


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    from esrecsys_tpu.axon_preflight import warn_cpu_fallback

    warn_cpu_fallback(log)
    cfg = config_lib.from_cli(Txt2UrlConfig, argv)
    train(cfg)


if __name__ == "__main__":
    main()
