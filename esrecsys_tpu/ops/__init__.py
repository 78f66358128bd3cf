"""Compute ops: losses, on-device negative sampling, Pallas kernels, MIPS."""

from esrecsys_tpu.ops import losses
from esrecsys_tpu.ops.negatives import sample_negative_ids, sample_negative_rows

__all__ = ["losses", "sample_negative_ids", "sample_negative_rows"]
