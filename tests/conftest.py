"""Test harness: run everything on an 8-virtual-device CPU platform.

Multi-chip sharding (the `(data, model)` mesh, sharded tables, sharded MIPS)
is validated here without TPU hardware, per SURVEY.md §4's recommended
strategy. Env vars must be set before jax initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep TF (used only for tf.data input pipelines) off any accelerator.
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from esrecsys_tpu.core import mesh as mesh_lib

    return mesh_lib.make_mesh(n_data=4, n_model=2)


@pytest.fixture(scope="session")
def mesh_model8():
    from esrecsys_tpu.core import mesh as mesh_lib

    return mesh_lib.make_mesh(n_data=1, n_model=8)
