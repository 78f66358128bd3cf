"""Shop-the-Look workload: scene→product two-tower training + offline serving.

Replaces reference pinterest/train_shop_the_look.py:130-232 (training),
make_embeddings.py (catalog index) and make_recommendations.py (top-k pages)
on the shared harness. Loss parity: triplet hinge sum + norm-cap
regularization / batch (train_shop_the_look.py:93-109). Fixes carried over
from the model layer: BatchNorm running statistics are persisted and eval
runs with them (the reference discards both — SURVEY.md §2.4).

CLI:
  python -m esrecsys_tpu.workloads.stl --mode train --stl_json pairs.json ...
  python -m esrecsys_tpu.workloads.stl --mode index ...
  python -m esrecsys_tpu.workloads.stl --mode recommend ...
"""

from __future__ import annotations

import dataclasses
import logging
import os
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from esrecsys_tpu.core import config as config_lib
from esrecsys_tpu.core import mesh as mesh_lib
from esrecsys_tpu.core import prng
from esrecsys_tpu.core.tracking import make_tracker
from esrecsys_tpu.data import images as images_lib
from esrecsys_tpu.models.cnn import STLModel
from esrecsys_tpu.ops import losses
from esrecsys_tpu.retrieval.html import save_results_pages
from esrecsys_tpu.retrieval.index import EmbeddingIndex, build_index
from esrecsys_tpu.retrieval.mips import topk_over_matrix
from esrecsys_tpu.train import Checkpointer, TrainState, fit

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class STLConfig:
    """Defaults follow the reference run (pinterest/README.md:85,
    train_shop_the_look.py:45-69)."""

    mode: str = "train"            # train | index | recommend
    stl_json: str = ""             # scene→product pair jsonl
    image_dir: str = ""
    work_dir: str = "/tmp/stl"
    image_size: int = 512
    output_size: int = 64
    filters: Tuple[int, ...] = (16, 32, 64, 128)
    learning_rate: float = 1e-4
    regularization: float = 0.2
    num_negatives: int = 5
    batch_size: int = 16
    max_steps: int = 30_000
    log_every_steps: int = 100
    eval_every_steps: int = 2000
    eval_steps: int = 16
    checkpoint_every_steps: int = 10_000
    use_bf16: bool = True          # bfloat16 conv stack (params stay f32)
    seed: int = 0
    resume: bool = False
    # SIGTERM => coordinated stop + checkpoint + clean exit (train/preemption.py)
    graceful_shutdown: bool = True
    # index/recommend mode:
    index_out: str = ""            # defaults to work_dir/{scene,product}_index.npz
    top_k: int = 10
    max_results: int = 100


# ---------------------------------------------------------------- triplets

def generate_triplets(
    pairs: Sequence[Tuple[str, str]], num_neg: int, seed: int = 0
) -> Tuple[List[Tuple[str, str, str]], List[Tuple[str, str, str]]]:
    """(scene, pos, neg) triplets with the deterministic ``i % 10 == 0`` test
    split (train_shop_the_look.py:72-91 semantics, numpy RNG instead of a
    per-pair jax.random host loop)."""
    rng = np.random.default_rng(seed)
    products = [p for _, p in pairs]
    train, test = [], []
    for i, (scene, pos) in enumerate(pairs):
        neg_indices = rng.integers(0, len(pairs), num_neg)
        dest = test if i % 10 == 0 else train
        for j in neg_indices:
            dest.append((scene, pos, products[j]))
    return train, test


# ------------------------------------------------------------------ steps

def make_train_step(cfg: STLConfig):
    def train_step(state: TrainState, batch):
        scene, pos, neg = batch

        def loss_fn(params):
            (pos_score, neg_score, scene_e, pos_e, neg_e), new_state = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                scene, pos, neg, True,
                mutable=["batch_stats"],
            )
            triplet = losses.triplet_hinge_sum(pos_score, neg_score, margin=1.0)
            reg = (
                losses.embedding_norm_cap(scene_e, 1.0)
                + losses.embedding_norm_cap(pos_e, 1.0)
                + losses.embedding_norm_cap(neg_e, 1.0)
            )
            loss = (triplet + cfg.regularization * reg) / cfg.batch_size
            return loss, new_state["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return new_state, {"loss": loss}

    return train_step


def make_eval_step(cfg: STLConfig):
    def eval_step(state: TrainState, batch):
        scene, pos, neg = batch
        # train=False: running BatchNorm statistics (reference evals with
        # train=True mini-batch stats, train_shop_the_look.py:113-116).
        pos_score, neg_score, *_ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            scene, pos, neg, False,
        )
        return {
            "loss": losses.triplet_hinge_sum(pos_score, neg_score) / cfg.batch_size,
            # fraction of triplets ranked correctly (pos over neg) — the
            # standard triplet-tower quality number; the reference logs
            # only the hinge loss (train_shop_the_look.py:113-116)
            "triplet_accuracy": jnp.mean(
                (pos_score > neg_score).astype(jnp.float32)),
        }

    return eval_step


# ------------------------------------------------------------------ wiring

def init_state(cfg: STLConfig) -> Tuple[STLModel, TrainState]:
    model = STLModel(
        output_size=cfg.output_size,
        filters=tuple(cfg.filters),
        dtype=jnp.bfloat16 if cfg.use_bf16 else jnp.float32,
    )
    key = prng.stream(prng.base_key(cfg.seed), prng.STREAM_INIT)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    variables = model.init(key, dummy, dummy, dummy, True)
    tx = optax.adam(cfg.learning_rate)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )
    return model, state


def _pairs(cfg: STLConfig) -> List[Tuple[str, str]]:
    pairs = images_lib.load_scene_product_pairs(cfg.stl_json)
    valid = images_lib.valid_scene_product(pairs, cfg.image_dir)
    log.info("%d/%d pairs have both images on disk", len(valid), len(pairs))
    return valid


def train(cfg: STLConfig, tracker=None):
    from esrecsys_tpu.core import mesh as mesh_lib

    mesh_lib.distributed_init_if_needed()  # live multi-host bootstrap
    # DP mesh over all devices: image-triplet batches are sharded over the
    # ``data`` axis (SURVEY §2.5 — the CNN towers are the pure-DP case);
    # dense-param gradient sync is inserted by XLA. BatchNorm note: the
    # whole step is one GSPMD program, so the BN mean/variance reductions
    # over the batch axis lower to cross-device collectives — batch stats
    # are GLOBAL-batch statistics, not per-device (torch would need
    # SyncBatchNorm for this; reference trains BN on single-device,
    # pinterest/models.py).
    mesh = mesh_lib.make_mesh_for_batch(cfg.batch_size)
    local_bs = mesh_lib.process_local_batch(cfg.batch_size)
    host_seed = cfg.seed + jax.process_index()
    pairs = _pairs(cfg)
    train_trips, test_trips = generate_triplets(pairs, cfg.num_negatives, cfg.seed)
    log.info("%d train / %d test triplets", len(train_trips), len(test_trips))

    model, state = init_state(cfg)
    ckpt = Checkpointer(f"{cfg.work_dir}/checkpoints")
    if cfg.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        log.info("resumed from step %d", int(state.step))

    tracker = tracker or make_tracker(run_dir=cfg.work_dir, config=config_lib.to_dict(cfg))
    train_iter = images_lib.triplet_image_dataset(
        train_trips, cfg.image_dir, local_bs, cfg.image_size, seed=host_seed
    )
    eval_iter_fn = lambda: images_lib.triplet_image_dataset(
        test_trips, cfg.image_dir, local_bs, cfg.image_size,
        repeat=True, shuffle=False,
    )
    result = fit(
        state,
        make_train_step(cfg),
        train_iter,
        num_steps=cfg.max_steps,
        eval_step=make_eval_step(cfg),
        eval_iter_fn=eval_iter_fn,
        eval_every=cfg.eval_every_steps,
        eval_steps=cfg.eval_steps,
        log_every=cfg.log_every_steps,
        tracker=tracker,
        checkpointer=ckpt,
        checkpoint_every=cfg.checkpoint_every_steps,
        examples_per_step=cfg.batch_size,
        mesh=mesh,
        preemption=cfg.graceful_shutdown,
    )
    from esrecsys_tpu.train.preemption import log_if_preempted

    if log_if_preempted(result, log):
        return result
    # final CNN towers (+BatchNorm running stats) as a deployable artifact;
    # index mode loads it (train_shop_the_look.py:223-232 parity)
    from esrecsys_tpu.train import export_model

    export_model(
        cfg.work_dir, "stl", result.state.params,
        step=int(jax.device_get(result.state.step)), tracker=tracker,
        batch_stats=result.state.batch_stats,
        metadata={"output_size": cfg.output_size, "image_size": cfg.image_size,
                  "filters": list(cfg.filters)})
    return result


def build_catalog_indexes(cfg: STLConfig, state: Optional[TrainState] = None):
    """Embed unique scenes and products → two EmbeddingIndex files
    (make_embeddings.py:64-130 parity, without the tail-drop).

    Loads the final-model ARTIFACT written by :func:`train` when one exists
    (the deploy path, train_shop_the_look.py:223-232); falls back to the
    latest checkpoint otherwise."""
    from esrecsys_tpu.train import latest_artifact, load_model

    pairs = _pairs(cfg)
    scenes = sorted({s for s, _ in pairs})
    products = sorted({p for _, p in pairs})
    model, template = init_state(cfg)
    if state is None:
        artifact = latest_artifact(cfg.work_dir, "stl")
        if artifact is not None:
            params, batch_stats, meta = load_model(artifact)
            state = template.replace(
                params=jax.tree_util.tree_map(jnp.asarray, params),
                batch_stats=jax.tree_util.tree_map(jnp.asarray, batch_stats),
            )
            log.info("loaded model artifact %s (step %s)", artifact, meta["step"])
        else:
            state = Checkpointer(f"{cfg.work_dir}/checkpoints").restore(template)

    def embed(method):
        f = jax.jit(
            lambda imgs: state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                imgs, method=method,
            )
        )
        return f

    out = cfg.index_out or cfg.work_dir
    os.makedirs(out, exist_ok=True)
    paths = {}
    for name, keys, method in [
        ("scene", scenes, STLModel.get_scene_embed),
        ("product", products, STLModel.get_product_embed),
    ]:
        batches = images_lib.keyed_image_dataset(
            keys, cfg.image_dir, cfg.batch_size, cfg.image_size
        )
        index = build_index(embed(method), batches)
        path = os.path.join(out, f"{name}_index.npz")
        index.save(path)
        paths[name] = path
        log.info("wrote %d %s embeddings to %s", len(index), name, path)
    return paths


def recommend(cfg: STLConfig):
    """Top-k products per scene → HTML pages
    (make_recommendations.py:103-132 parity, chunked MIPS instead of a full
    catalog matmul per query)."""
    out = cfg.index_out or cfg.work_dir
    scene_index = EmbeddingIndex.load(os.path.join(out, "scene_index.npz"))
    product_index = EmbeddingIndex.load(os.path.join(out, "product_index.npz"))

    queries = jnp.asarray(scene_index.vectors[: cfg.max_results])
    items = jnp.asarray(product_index.vectors)
    vals, idx = jax.jit(partial(topk_over_matrix, k=cfg.top_k))(queries, items)
    vals, idx = np.asarray(vals), np.asarray(idx)

    def results():
        for q in range(queries.shape[0]):
            yield scene_index.ids[q], [
                (product_index.ids[idx[q, j]], float(vals[q, j]))
                for j in range(cfg.top_k)
            ]

    pages_dir = os.path.join(cfg.work_dir, "recommendations")
    n = save_results_pages(pages_dir, results(), images_lib.key_to_url, cfg.max_results)
    log.info("wrote %d pages to %s", n, pages_dir)
    return pages_dir


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    from esrecsys_tpu.axon_preflight import warn_cpu_fallback

    warn_cpu_fallback(log)
    cfg = config_lib.from_cli(STLConfig, argv)
    if cfg.mode == "train":
        train(cfg)
    elif cfg.mode == "index":
        build_catalog_indexes(cfg)
    elif cfg.mode == "recommend":
        recommend(cfg)
    else:
        raise SystemExit(f"unknown --mode {cfg.mode}")


if __name__ == "__main__":
    main()
