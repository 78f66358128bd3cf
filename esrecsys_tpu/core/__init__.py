"""Core: mesh & sharding helpers, config, PRNG discipline, tracking, profiling."""

from esrecsys_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    data_sharding,
    replicated,
    table_sharding,
)
from esrecsys_tpu.core.prng import key_for_step, split_like
from esrecsys_tpu.core.tracking import (
    Tracker,
    NullTracker,
    JsonlTracker,
    CompositeTracker,
    make_tracker,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "data_sharding",
    "replicated",
    "table_sharding",
    "key_for_step",
    "split_like",
    "Tracker",
    "NullTracker",
    "JsonlTracker",
    "CompositeTracker",
    "make_tracker",
]
