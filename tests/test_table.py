import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from esrecsys_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, data_sharding
from esrecsys_tpu.parallel import table as table_lib
from esrecsys_tpu.parallel import sharding as sharding_lib


def _dense(table, ids):
    return np.asarray(table)[np.asarray(ids)]


@pytest.fixture(scope="module")
def setup(mesh_model8):
    key = jax.random.PRNGKey(0)
    tbl = table_lib.init_table(key, num_rows=64, dim=16, mesh=mesh_model8)
    ids = jnp.array([0, 1, 7, 8, 9, 33, 63, 5])
    return mesh_model8, tbl, ids


def test_init_table_sharded_and_padded(mesh_model8):
    tbl = table_lib.init_table(jax.random.PRNGKey(0), num_rows=61, dim=8, mesh=mesh_model8)
    assert tbl.shape == (64, 8)  # padded to multiple of 8 shards
    assert tbl.sharding.spec == P(MODEL_AXIS, None)


@pytest.mark.parametrize("strategy", ["auto", "shard_map"])
def test_lookup_matches_dense(setup, strategy):
    mesh, tbl, ids = setup
    out = jax.jit(
        lambda t, i: table_lib.lookup(t, i, mesh=mesh, strategy=strategy, ids_data_sharded=False)
    )(tbl, ids)
    np.testing.assert_allclose(np.asarray(out), _dense(tbl, ids), rtol=1e-6)


def test_lookup_shard_map_data_sharded(mesh8):
    # (data=4, model=2) mesh: ids batch sharded over data, table over model.
    tbl = table_lib.init_table(jax.random.PRNGKey(1), 32, 8, mesh=mesh8)
    ids = jnp.arange(16) % 32
    ids = jax.device_put(ids, data_sharding(mesh8))
    out = jax.jit(
        lambda t, i: table_lib.lookup(t, i, mesh=mesh8, strategy="shard_map")
    )(tbl, ids)
    np.testing.assert_allclose(np.asarray(out), _dense(tbl, ids), rtol=1e-6)


@pytest.mark.parametrize("strategy", ["auto", "shard_map"])
def test_lookup_gradients_match_dense(setup, strategy):
    mesh, tbl, ids = setup

    def loss(t):
        e = table_lib.lookup(t, ids, mesh=mesh, strategy=strategy, ids_data_sharded=False)
        return jnp.sum(e * e)

    g = jax.jit(jax.grad(loss))(tbl)

    def loss_dense(t):
        return jnp.sum(jnp.take(t, ids, axis=0) ** 2)

    g_dense = jax.grad(loss_dense)(jax.device_put(tbl, jax.devices("cpu")[0]))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_dense), rtol=1e-5)
    # duplicate ids (5 appears once, but 0..9 pattern) accumulate correctly:
    assert np.abs(np.asarray(g)).sum() > 0


def test_lookup_2d_ids(setup):
    mesh, tbl, _ = setup
    ids = jnp.array([[1, 2, 3], [4, 5, 0]])
    out = table_lib.lookup(tbl, ids, mesh=mesh, strategy="shard_map", ids_data_sharded=False)
    assert out.shape == (2, 3, 16)
    np.testing.assert_allclose(np.asarray(out), _dense(tbl, ids), rtol=1e-6)


@pytest.mark.parametrize("pool", ["mean", "sum", "max"])
def test_lookup_pooled(setup, pool):
    mesh, tbl, _ = setup
    ids = jnp.array([[1, 2, 0], [0, 0, 0], [5, 5, 5]])  # 0 = mask
    out = table_lib.lookup_pooled(tbl, ids, pool=pool, mask_id=0, mesh=mesh)
    t = np.asarray(tbl)
    if pool == "sum":
        exp0 = t[1] + t[2]
    elif pool == "mean":
        exp0 = (t[1] + t[2]) / 2
    else:
        exp0 = np.maximum(t[1], t[2])
    np.testing.assert_allclose(np.asarray(out[0]), exp0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.zeros(16), atol=0)  # all masked
    if pool == "mean":
        np.testing.assert_allclose(np.asarray(out[2]), t[5], rtol=1e-5)


def test_lookup_pooled_no_mask(setup):
    mesh, tbl, _ = setup
    ids = jnp.array([[0, 1]])
    out = table_lib.lookup_pooled(tbl, ids, pool="sum", mask_id=None, mesh=mesh)
    t = np.asarray(tbl)
    np.testing.assert_allclose(np.asarray(out[0]), t[0] + t[1], rtol=1e-5)


def test_sharded_table_dataclass(mesh_model8):
    st = table_lib.ShardedTable("tokens", num_rows=100, dim=8, strategy="shard_map")
    assert st.padded_rows(mesh_model8) == 104
    params = st.init(jax.random.PRNGKey(0), mesh_model8)
    out = st(params, jnp.array([0, 99]), mesh=mesh_model8)
    assert out.shape == (2, 8)


def test_partition_rules(mesh8):
    tree = {
        "token_embedding": jnp.zeros((16, 4)),
        "dense": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros((4,))},
        "scalar": jnp.zeros(()),
    }
    placed = sharding_lib.apply_partition_rules(tree, mesh8)
    assert placed["token_embedding"].sharding.spec == P(MODEL_AXIS, None)
    assert placed["dense"]["kernel"].sharding.spec == P()
    specs = sharding_lib.sharding_tree(tree, mesh8)
    assert specs["token_embedding"].spec == P(MODEL_AXIS, None)


def test_lookup_strategy_validation(setup):
    mesh, tbl, ids = setup
    with pytest.raises(ValueError, match="unknown strategy"):
        table_lib.lookup(tbl, ids, mesh=mesh, strategy="bogus")
    with pytest.raises(ValueError, match="unknown pool"):
        table_lib.lookup_pooled(tbl, ids, pool="bogus", mesh=mesh)


def test_large_table_sharded_lookup(mesh_model8):
    """Scale check toward the 100M-row stretch: a 2M-row table sharded over 8
    shards, shard_map lookup + grad on rows spanning every shard."""
    rows, dim = 2_000_000, 8
    tbl = table_lib.init_table(jax.random.PRNGKey(0), rows, dim, mesh=mesh_model8)
    assert tbl.shape == (2_000_000, 8)
    per_shard = rows // 8
    ids = jnp.asarray([0, per_shard - 1, per_shard, 3 * per_shard + 7, rows - 1])
    out = jax.jit(
        lambda t, i: table_lib.lookup(t, i, mesh=mesh_model8, strategy="shard_map",
                                      ids_data_sharded=False)
    )(tbl, ids)
    np.testing.assert_allclose(np.asarray(out), _dense(tbl, ids), rtol=1e-6)

    def loss(t):
        e = table_lib.lookup(t, ids, mesh=mesh_model8, strategy="shard_map",
                             ids_data_sharded=False)
        return jnp.sum(e)

    g = jax.jit(jax.grad(loss))(tbl)
    # trailing Nones may be trimmed; row dim must be model-sharded
    assert g.sharding.spec[0] == "model"
    np.testing.assert_allclose(float(jnp.sum(g)), len(ids) * dim)


def test_scale_table_tool_sharded(mesh8):
    """The scale CLI's core loop runs sharded and updates the table."""
    from esrecsys_tpu.tools.scale_table import ScaleConfig, run

    res = run(ScaleConfig(rows=1024, dim=8, dtype="float32", ids_per_step=64,
                          steps_per_call=2, calls=1, n_model=8))
    assert res["value"] > 0
    assert res["rows"] == 1024 and res["n_model"] == 8


def test_scale_table_tool_momentum(mesh8):
    from esrecsys_tpu.tools.scale_table import ScaleConfig, run

    res = run(ScaleConfig(rows=512, dim=8, dtype="float32", ids_per_step=32,
                          steps_per_call=2, calls=1, momentum=0.9, n_model=1))
    assert res["value"] > 0
