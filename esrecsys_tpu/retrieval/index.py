"""Offline catalog embedding index.

Replaces reference pinterest/make_embeddings.py:64-130: batch-embed unique
catalog images through the (jitted) tower methods and persist an id→vector
store. Differences: tail items are not dropped (the reference's
``drop_remainder=True`` at :95,114 silently loses up to batch_size-1 items);
storage is npz (compact, mmap-able) with a JSON option for reference-format
compatibility.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, Iterable, List, Sequence, Tuple

import jax
import numpy as np


class EmbeddingIndex:
    """An id→vector store with dense matrix access for MIPS."""

    def __init__(self, ids: Sequence[str], vectors: np.ndarray):
        if len(ids) != vectors.shape[0]:
            raise ValueError(f"{len(ids)} ids vs {vectors.shape[0]} vectors")
        self.ids: List[str] = list(ids)
        self.vectors = np.asarray(vectors, np.float32)
        self._id2row = {k: i for i, k in enumerate(self.ids)}
        self._buf: "np.ndarray | None" = None  # see reserve()

    def reserve(self, capacity: int) -> None:
        """Preallocate host storage so :meth:`extend` appends in O(n)
        instead of re-copying the whole matrix per call (the serving
        ``add_capacity`` host mirror). ``vectors`` becomes a view of the
        first ``len(self)`` rows; callers never see the tail."""
        if capacity <= len(self.ids):
            return
        buf = np.zeros((capacity, self.vectors.shape[1]), np.float32)
        buf[:len(self.ids)] = self.vectors
        self._buf = buf
        self.vectors = buf[:len(self.ids)]

    def __len__(self) -> int:
        return len(self.ids)

    def vector(self, id_: str) -> np.ndarray:
        return self.vectors[self._id2row[id_]]

    def extend(self, ids: Sequence[str], vectors: np.ndarray) -> None:
        """Append new items (serving ``/admin/add_items``). Rejects ids
        already present (an id must keep meaning ONE vector — updates go
        through a reload) and dimension mismatches, atomically: on error
        nothing is appended."""
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.vectors.shape[1]:
            raise ValueError(
                f"vectors {vectors.shape} != (n, {self.vectors.shape[1]})")
        if len(ids) != vectors.shape[0]:
            raise ValueError(f"{len(ids)} ids vs {vectors.shape[0]} vectors")
        # normalize BEFORE validating: stored keys are str, so a numeric id
        # (e.g. a JSON number over /admin/add_items) must collide with its
        # string form, not slip past the duplicate guard
        ids = [str(i) for i in ids]
        dup = [i for i in ids if i in self._id2row]
        if dup or len(set(ids)) != len(ids):
            raise ValueError(f"duplicate ids: {(dup or 'within batch')}")
        base = len(self.ids)
        self.ids.extend(ids)
        for j, key in enumerate(ids):
            self._id2row[key] = base + j
        if self._buf is not None and base + len(ids) <= self._buf.shape[0]:
            # preallocated growth capacity (reserve): O(n) in-place append
            self._buf[base:base + len(ids)] = vectors
            self.vectors = self._buf[:base + len(ids)]
        else:
            self._buf = None  # capacity exhausted: back to copy-append
            self.vectors = np.concatenate([self.vectors, vectors], axis=0)

    # ---- persistence ----

    def save(self, path: str) -> None:
        if path.endswith(".json"):
            # reference format: {id: [floats]} (make_embeddings.py:109-111)
            with open(path, "w") as f:
                json.dump({k: self.vectors[i].tolist() for i, k in enumerate(self.ids)}, f)
        else:
            np.savez_compressed(path, ids=np.asarray(self.ids), vectors=self.vectors)

    @classmethod
    def load(cls, path: str) -> "EmbeddingIndex":
        if path.endswith(".json"):
            with open(path) as f:
                d = json.load(f)
            ids = list(d.keys())
            return cls(ids, np.asarray([d[k] for k in ids], np.float32))
        with np.load(path, allow_pickle=False) as z:
            return cls([str(x) for x in z["ids"]], z["vectors"])


def build_index(
    embed_fn: Callable,
    batches: Iterable[Tuple[Sequence[str], np.ndarray, int]],
) -> EmbeddingIndex:
    """Run ``embed_fn`` (jitted tower) over keyed batches → EmbeddingIndex.

    ``batches`` yields (keys, images, valid_count) as produced by
    :func:`esrecsys_tpu.data.images.keyed_image_dataset`.
    """
    ids: List[str] = []
    vecs: List[np.ndarray] = []
    for keys, images, valid in batches:
        emb = np.asarray(jax.device_get(embed_fn(images)))
        ids.extend(keys[:valid])
        vecs.append(emb[:valid])
    return EmbeddingIndex(ids, np.concatenate(vecs, axis=0))
