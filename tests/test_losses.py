import jax
import jax.numpy as jnp
import numpy as np

from esrecsys_tpu.ops import losses, negatives


def test_glove_loss_closed_form():
    # Exact spec from train_cooccurence.py:75-84:
    # weight = min(1, count/100)^0.75 ; target = log10(1+count); mean(w*(t-p)^2)
    count = jnp.array([0.0, 50.0, 100.0, 400.0])
    pred = jnp.array([0.0, 1.0, 2.0, 3.0])
    w = np.minimum(1.0, np.asarray(count) / 100.0) ** 0.75
    t = np.log10(1.0 + np.asarray(count))
    expected = np.mean(w * (t - np.asarray(pred)) ** 2)
    np.testing.assert_allclose(losses.glove_loss(pred, count), expected, rtol=1e-6)


def test_glove_weight_saturates():
    assert float(losses.glove_weight(jnp.asarray(1e9))) == 1.0
    assert float(losses.glove_weight(jnp.asarray(0.0))) == 0.0


def test_triplet_hinge_sum():
    pos = jnp.array([2.0, 0.0])
    neg = jnp.array([0.0, 0.5])
    # relu(1 + 0 - 2) + relu(1 + .5 - 0) = 0 + 1.5
    np.testing.assert_allclose(losses.triplet_hinge_sum(pos, neg), 1.5)


def test_mean_and_extremal_triplet():
    pos = jnp.array([1.0, 3.0])
    neg = jnp.array([0.0, 2.0])
    # mean: relu(1 + 1 - 2) = 0 ; extremal: relu(1 + 2 - 1) = 2
    np.testing.assert_allclose(losses.mean_triplet(pos, neg), 0.0)
    np.testing.assert_allclose(losses.extremal_triplet(pos, neg), 2.0)


def test_self_affinity_hinges():
    aff = jnp.array([[0.0, 1.0], [0.25, -1.0]])
    np.testing.assert_allclose(
        losses.self_affinity_floor(aff, 0.5),
        np.mean(np.maximum(0.5 - np.asarray(aff), 0)),
    )
    np.testing.assert_allclose(
        losses.self_affinity_ceiling(aff), np.mean(np.maximum(np.asarray(aff), 0))
    )


def test_norm_caps():
    norms = jnp.array([0.5, 2.0, 12.0])
    np.testing.assert_allclose(losses.norm_cap(norms, 10.0), 2.0)
    emb = jnp.array([[3.0, 4.0], [0.1, 0.0]])  # norms 5, 0.1
    np.testing.assert_allclose(losses.embedding_norm_cap(emb, 1.0), 4.0)


def test_margin_square_loss():
    score = jnp.array([2.0, 0.0])
    # relu(1-2)^2=0 ; relu(1-0)^2=1 ; mean=0.5
    np.testing.assert_allclose(losses.margin_square_loss(score), 0.5)


def test_in_batch_softmax_prefers_aligned():
    d = 8
    q = jax.random.normal(jax.random.PRNGKey(0), (16, d))
    aligned = losses.in_batch_softmax(q, q)  # items == queries: diagonal dominant
    shuffled = losses.in_batch_softmax(q, jnp.roll(q, 1, axis=0))
    assert float(aligned) < float(shuffled)
    # log_q correction shifts logits; uniform correction is a no-op on the loss
    uniform = jnp.full((16,), 3.0)
    np.testing.assert_allclose(
        losses.in_batch_softmax(q, q, log_q=uniform), aligned, rtol=1e-5
    )


def test_sample_negatives_on_device():
    key = jax.random.PRNGKey(0)
    ids = negatives.sample_negative_ids(key, 64, 1000)
    assert ids.shape == (64,)
    assert int(ids.min()) >= 0 and int(ids.max()) < 1000
    corpora = [jnp.arange(100), jnp.arange(100) * 2]
    idx, a, b = negatives.sample_negative_rows(key, 8, corpora)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(idx))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(a) * 2)

    # per-example shape: (batch, num_negatives)
    idx2, a2, b2 = negatives.sample_negative_rows(key, 8, corpora, batch_size=3)
    assert idx2.shape == (3, 8) and a2.shape == (3, 8)
    np.testing.assert_array_equal(np.asarray(b2), np.asarray(a2) * 2)

    # must work inside jit (the whole point vs the reference's host sampling)
    @jax.jit
    def step(key):
        return negatives.sample_negative_ids(key, 4, 10)

    assert step(key).shape == (4,)


def test_exact_negative_range_excludes_last_row():
    """exact_range=True reproduces the reference's [0, n-1) off-by-one
    (train_spotify.py:149): the last corpus row is never sampled."""
    key = jax.random.PRNGKey(7)
    n = 4
    ids = negatives.sample_negative_ids(key, 20_000, n, exact_range=True)
    vals = set(np.asarray(ids).tolist())
    assert vals == {0, 1, 2}  # 20k draws over 3 values: all present, no 3
    ids_full = negatives.sample_negative_ids(key, 20_000, n)
    assert set(np.asarray(ids_full).tolist()) == {0, 1, 2, 3}
