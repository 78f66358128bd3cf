"""Retrieval: brute-force MIPS top-k (chunked + sharded) and catalog indexing."""

from esrecsys_tpu.retrieval.mips import chunked_topk, topk_over_matrix, sharded_topk_over_matrix

__all__ = ["chunked_topk", "topk_over_matrix", "sharded_topk_over_matrix"]
