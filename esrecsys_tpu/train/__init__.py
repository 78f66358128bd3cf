"""Training runtime: one harness shared by every workload."""

from esrecsys_tpu.train.state import TrainState
from esrecsys_tpu.train.loop import fit, FitResult
from esrecsys_tpu.train.checkpoint import Checkpointer

__all__ = ["TrainState", "fit", "FitResult", "Checkpointer"]
