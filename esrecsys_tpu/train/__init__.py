"""Training runtime: one harness shared by every workload."""

from esrecsys_tpu.train.state import TrainState
from esrecsys_tpu.train.loop import fit, FitResult
from esrecsys_tpu.train.checkpoint import Checkpointer
from esrecsys_tpu.train.export import export_model, latest_artifact, load_model
from esrecsys_tpu.train.preemption import PreemptionGuard

__all__ = ["TrainState", "fit", "FitResult", "Checkpointer",
           "export_model", "latest_artifact", "load_model",
           "PreemptionGuard"]
