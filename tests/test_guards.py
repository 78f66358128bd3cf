"""Id-range guards: an out-of-range embedding id fails loudly in debug mode
(SURVEY §5 sanitizers; the reference gathers garbage silently,
train_spotify.py:152-156)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrecsys_tpu.ops import guards


@pytest.fixture(autouse=True)
def _reset_mode():
    yield
    guards.set_mode("off")


def test_clamp_mode_clips():
    guards.set_mode("clamp")
    ids = jnp.asarray([-3, 0, 5, 99], jnp.int32)
    out = guards.check_ids(ids, 10)
    np.testing.assert_array_equal(np.asarray(out), [0, 0, 5, 9])


def test_off_mode_is_identity():
    guards.set_mode("off")
    ids = jnp.asarray([123456], jnp.int32)
    assert guards.check_ids(ids, 10) is ids


def test_error_mode_throws_through_fit():
    """A batch with an out-of-range token id must raise from fit()."""
    from esrecsys_tpu.train import fit
    from esrecsys_tpu.workloads import glove as gw

    guards.set_mode("error")
    cfg = gw.GloveConfig(feature_size=4, optimizer="lazy_adam", batch_size=4,
                         steps_per_call=2)
    model, state = gw.init_state(cfg, num_embeddings=16, mesh=None)

    def batches(bad):
        hi = model.num_embeddings + 5 if bad else 10
        while True:
            t = np.asarray([1, 2, 3, hi - 1], np.int32)
            yield (t, t), np.ones(4, np.float32)

    pack, unpack = gw.packed_state_transforms(cfg)
    # good ids: trains fine
    fit(state, gw.select_train_step(model, cfg), batches(False), num_steps=2,
        steps_per_call=2, state_pack=pack, state_unpack=unpack)
    # out-of-range id: loud failure, with the table name in the message
    model2, state2 = gw.init_state(cfg, num_embeddings=16, mesh=None)
    with pytest.raises(Exception, match="token_embedding"):
        fit(state2, gw.select_train_step(model2, cfg), batches(True),
            num_steps=2, steps_per_call=2, state_pack=pack, state_unpack=unpack)


def test_error_mode_table_embed_boundary():
    """The central TableEmbed lookup is guarded for every dense model."""
    from jax.experimental import checkify

    from esrecsys_tpu.models.glove import Glove

    guards.set_mode("error")
    model = Glove(num_embeddings=16, features=4)
    params = model.init(jax.random.PRNGKey(0), (jnp.zeros(2, jnp.int32),) * 2)

    def apply(ids):
        return model.apply(params, (ids, ids))

    checked = checkify.checkify(apply, errors=checkify.user_checks)
    err, _ = checked(jnp.asarray([1, 2], jnp.int32))
    err.throw()  # fine
    err, _ = checked(jnp.asarray([1, 99], jnp.int32))
    with pytest.raises(Exception, match="out of range"):
        err.throw()


def test_error_mode_eval_step_is_functionalized():
    """Eval steps contain the same guarded lookups; fit must checkify them
    too (regression: eval used to crash at trace time in error mode)."""
    import numpy as np

    from esrecsys_tpu.train import fit
    from esrecsys_tpu.workloads import glove as gw

    guards.set_mode("error")
    cfg = gw.GloveConfig(feature_size=4, optimizer="adam", batch_size=4)
    model, state = gw.init_state(cfg, num_embeddings=16, mesh=None)

    def batches():
        t = np.asarray([1, 2, 3, 4], np.int32)
        while True:
            yield (t, t), np.ones(4, np.float32)

    res = fit(state, gw.select_train_step(model, cfg), batches(), num_steps=2,
              eval_step=gw.make_eval_step(model), eval_iter_fn=batches,
              eval_every=2, eval_steps=1)
    assert np.isfinite(res.last_eval_metrics["eval_loss"])
