import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrecsys_tpu.data import images as images_lib
from esrecsys_tpu.models.cnn import STLModel, ImageTower
from esrecsys_tpu.retrieval.index import EmbeddingIndex
from esrecsys_tpu.workloads import stl as stl_wl


SMALL = dict(output_size=8, filters=(4, 8))  # 16x downsample → 32px images


def test_tower_shapes_and_downsample():
    tower = ImageTower(**SMALL)
    x = jnp.zeros((2, 32, 32, 3))
    variables = tower.init(jax.random.PRNGKey(0), x, True)
    out, _ = tower.apply(variables, x, True, mutable=["batch_stats"])
    assert out.shape == (2, 8)
    assert out.dtype == jnp.float32


def test_batch_stats_update_and_eval_uses_them():
    """The reference discards batch_stats (train_shop_the_look.py:95-98);
    ours must actually move."""
    model = STLModel(**SMALL)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 3 + 1
    variables = model.init(jax.random.PRNGKey(0), x, x, x, True)
    stats0 = variables["batch_stats"]
    _, upd = model.apply(variables, x, x, x, True, mutable=["batch_stats"])
    stats1 = upd["batch_stats"]
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), stats0, stats1
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0

    # eval path (train=False) must not need mutable and must differ from
    # train-mode stats when the batch is shifted
    out_eval = model.apply(
        {"params": variables["params"], "batch_stats": stats1}, x, x, x, False
    )
    assert out_eval[0].shape == (2,)


def test_generate_triplets_split():
    pairs = [(f"s{i}", f"p{i}") for i in range(30)]
    train, test = stl_wl.generate_triplets(pairs, num_neg=3, seed=0)
    assert len(train) == 27 * 3 and len(test) == 3 * 3
    test_scenes = {s for s, _, _ in test}
    assert test_scenes == {"s0", "s10", "s20"}  # i % 10 == 0 split
    # deterministic
    train2, _ = stl_wl.generate_triplets(pairs, num_neg=3, seed=0)
    assert train == train2


@pytest.fixture(scope="module")
def image_corpus(tmp_path_factory):
    """Synthetic JPEG corpus: scenes/products with class-colored images."""
    from PIL import Image

    tmp = tmp_path_factory.mktemp("stl")
    img_dir = tmp / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    pairs = []
    rows = []
    for i in range(20):
        scene_key = f"{i:02d}aa" + "0" * 28
        product_key = f"{i:02d}bb" + "0" * 28
        # scenes/products of the same pair share a dominant color channel
        color = i % 3
        for key, bright in [(scene_key, 180), (product_key, 200)]:
            arr = rng.integers(0, 60, (32, 32, 3), dtype=np.uint8)
            arr[:, :, color] = bright
            Image.fromarray(arr).save(img_dir / f"{key}.jpg")
        pairs.append((scene_key, product_key))
        rows.append(json.dumps({"scene": scene_key, "product": product_key}))
    # one pair with a missing product image (must be filtered)
    rows.append(json.dumps({"scene": pairs[0][0], "product": "ff" * 16}))
    stl_json = tmp / "pairs.json"
    stl_json.write_text("\n".join(rows))
    return str(stl_json), str(img_dir), pairs


def test_pair_loading_and_validation(image_corpus):
    stl_json, img_dir, pairs = image_corpus
    loaded = images_lib.load_scene_product_pairs(stl_json)
    assert len(loaded) == 21
    valid = images_lib.valid_scene_product(loaded, img_dir)
    assert len(valid) == 20  # missing-image pair dropped


def test_key_to_url():
    key = "abcdef" + "0" * 26
    url = images_lib.key_to_url(key)
    assert url == f"http://i.pinimg.com/400x/ab/cd/ef/{key}.jpg"


def test_triplet_image_dataset(image_corpus):
    stl_json, img_dir, pairs = image_corpus
    trips = [(pairs[0][0], pairs[0][1], pairs[1][1])]
    it = images_lib.triplet_image_dataset(trips, img_dir, batch_size=2,
                                          image_size=32, repeat=True)
    scene, pos, neg = next(it)
    assert scene.shape == (2, 32, 32, 3)
    assert -0.5 <= scene.min() and scene.max() <= 0.5


def test_keyed_image_dataset_tail_not_dropped(image_corpus):
    _, img_dir, pairs = image_corpus
    keys = [s for s, _ in pairs][:5]  # 5 keys, batch 2 → tail of 1
    batches = list(images_lib.keyed_image_dataset(keys, img_dir, batch_size=2,
                                                  image_size=32))
    assert sum(v for _, _, v in batches) == 5
    assert batches[-1][2] == 1  # valid count of padded tail


def test_stl_train_index_recommend_e2e(image_corpus, tmp_path):
    stl_json, img_dir, pairs = image_corpus
    cfg = stl_wl.STLConfig(
        stl_json=stl_json,
        image_dir=img_dir,
        work_dir=str(tmp_path / "wd"),
        image_size=32,
        output_size=8,
        filters=(4, 8),
        batch_size=4,
        num_negatives=2,
        learning_rate=3e-3,
        max_steps=30,
        log_every_steps=10,
        eval_every_steps=15,
        eval_steps=2,
        checkpoint_every_steps=30,
        use_bf16=False,
        top_k=3,
        max_results=5,
    )
    result = stl_wl.train(cfg)
    assert result.steps_run == 30
    assert np.isfinite(result.last_train_metrics["train_loss"])
    assert "eval_loss" in result.last_eval_metrics
    # batch_stats were persisted through training
    stats = jax.tree_util.tree_leaves(result.state.batch_stats)
    assert any(float(jnp.abs(s).max()) > 0 for s in stats)

    paths = stl_wl.build_catalog_indexes(cfg, state=result.state)
    scene_idx = EmbeddingIndex.load(paths["scene"])
    product_idx = EmbeddingIndex.load(paths["product"])
    assert len(scene_idx) == 20 and len(product_idx) == 20

    pages_dir = stl_wl.recommend(cfg)
    pages = os.listdir(pages_dir)
    assert len(pages) == 5
    content = open(os.path.join(pages_dir, sorted(pages)[0])).read()
    assert "i.pinimg.com" in content and "<table" in content


def test_embedding_index_roundtrip(tmp_path):
    idx = EmbeddingIndex(["a", "b"], np.eye(2, 4, dtype=np.float32))
    p = str(tmp_path / "i.npz")
    idx.save(p)
    idx2 = EmbeddingIndex.load(p)
    np.testing.assert_array_equal(idx2.vector("b"), idx.vector("b"))
    # reference-format JSON
    pj = str(tmp_path / "i.json")
    idx.save(pj)
    idx3 = EmbeddingIndex.load(pj)
    np.testing.assert_allclose(idx3.vector("a"), idx.vector("a"))
    with pytest.raises(ValueError):
        EmbeddingIndex(["a"], np.zeros((2, 3)))
