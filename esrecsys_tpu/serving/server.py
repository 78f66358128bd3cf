"""Online retrieval serving — the piece the reference describes but never
builds.

The book's serving chapter frames a collector/ranker/server architecture
(book-text/CH6-Serving-models-and-architecture.tex:6,55-59); the reference
code stops at offline HTML page generation (pinterest/make_recommendations.py
— "no online server exists", SURVEY.md §1). This module closes that gap with
a dependency-free HTTP service over the TPU retrieval path:

  * ``RetrievalService`` — loads an :class:`EmbeddingIndex`, keeps the
    catalog matrix device-resident, and answers top-k queries through ONE
    jitted, fixed-shape MIPS call (queries are padded to ``max_batch`` so the
    query path compiles exactly once, the same static-shape discipline as the
    trainers). Queries can be raw vectors or catalog ids (item-to-item).
  * ``QueryBatcher`` — request coalescing: concurrent single queries are
    collected (up to ``max_batch``, bounded by a short wait window) into ONE
    compiled device call instead of one dispatch per request — the
    collector-side batching the book's serving chapter describes
    (CH6-Serving-models-and-architecture.tex:55-59).
  * query-side model inference: pluggable ``encoders`` embed raw queries —
    ``text`` through a trained txt2url sentence tower, ``image_key`` through
    an STL tower (:mod:`esrecsys_tpu.serving.encoders`).
  * ``serve`` — a stdlib ``ThreadingHTTPServer`` exposing:
      GET  /healthz                 → {"status": "ok", "items": N, ...}
      GET  /statsz                  → {"mode", "queries", "device_calls",
                                       "queries_per_dispatch", "reloads",
                                       "uptime_s", ...} (observability)
      POST /v1/topk                 → body {"vector": [...] | "id": "..." |
                                           "text": "..." |
                                           "image_key": "...", "k": 10,
                                           "exclude": ["id", ...]}  (opt.)
                                    → {"ids": [...], "scores": [...]}
                                    batch: {"vectors": [[...], ...]}
                                    → {"ids": [[...], ...], "scores": ...}
                                    "exclude" drops already-seen catalog
                                    items (the playlist's own tracks; the
                                    query item on id queries) via a host
                                    post-filter over an over-fetched
                                    top-(k+E) — requires k+E <= max_k
      POST /admin/reload            → body {"index": "path.npz"} (optional;
                                      defaults to the serving index path) —
                                      zero-downtime hot swap to a freshly
                                      exported artifact (RetrievalHTTPServer).
                                      "aux": "rebuild" (default) retrains
                                      IVF/PQ for the new catalog; "reuse"
                                      keeps the running centroids/codebooks
                                      and pays only the assign/encode pass
      POST /admin/add_items         → body {"ids": [...], "vectors": [[...]]}
                                      — live streaming catalog growth into
                                      --add_capacity headroom: zero
                                      recompiles (capacity-static shapes +
                                      a traced valid bound), new items
                                      queryable immediately
      POST /admin/set_filter        → body {"name": ..., "ids": [...]} —
                                      register/replace a named eligibility
                                      mask; queries pass "filter": name to
                                      only see those rows (device-side,
                                      both scan phases, every mode)
"""

from __future__ import annotations

import collections
import json
import logging
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from esrecsys_tpu.core.transfer import chunked_device_put as _chunked_device_put
from esrecsys_tpu.retrieval.index import EmbeddingIndex
from esrecsys_tpu.retrieval.mips import topk_over_matrix

log = logging.getLogger(__name__)


def _rows_update(buf: jax.Array, rows: jax.Array, start) -> jax.Array:
    """Overwrite ``buf[start:start+len(rows)]`` in place (donated buffer,
    traced start): the /admin/add_items write primitive. One tiny compile
    per (buf shape, rows shape) pair — clients that batch adds at a
    consistent size compile once."""
    return _rows_update_jit(buf, rows, jnp.int32(start))


_rows_update_jit = jax.jit(
    lambda buf, rows, start: jax.lax.dynamic_update_slice_in_dim(
        buf, rows.astype(buf.dtype), start, axis=0),
    donate_argnums=0)

# column twin of _rows_update for the fused mode's (D, Mp) transposed scan
# copy: item i lives in column i, so add_items writes the same slice index
_cols_update_jit = jax.jit(
    lambda buf, cols, start: jax.lax.dynamic_update_slice_in_dim(
        buf, cols.astype(buf.dtype), start, axis=1),
    donate_argnums=0)

# flat twin for the fused int8 mode's (nblk8, L) scale rows: item i's scale
# lives at flat index i of the row-major view (fused.pack_catalog_codes),
# so a contiguous id range updates as one flat slice even when it crosses
# bin-block rows
_flat_update_jit = jax.jit(
    lambda buf, vals, start: jax.lax.dynamic_update_slice_in_dim(
        buf.reshape(-1), vals.astype(buf.dtype), start, axis=0
    ).reshape(buf.shape),
    donate_argnums=0)


def _finite_row(ids_row, scores_row):
    """JSON-safe (ids, scores) lists: drop -inf tail slots (a filter can
    leave fewer eligible items than k; -Infinity is not valid JSON)."""
    out_i, out_s = [], []
    for x, s in zip(ids_row, scores_row):
        s = float(s)
        if not np.isfinite(s):
            break  # scores are sorted descending; the -inf tail follows
        out_i.append(str(x))
        out_s.append(s)
    return out_i, out_s


def _npz_path(path: Optional[str]) -> Optional[str]:
    """np.savez* appends .npz to suffixless paths; normalize up front so
    the exists()-check on restart finds what save() actually wrote."""
    if path and not path.endswith(".npz"):
        return path + ".npz"
    return path


class RetrievalService:
    """Device-resident brute-force MIPS over an embedding index.

    One compiled query path: (max_batch, D) queries → top ``max_k``
    values/indices. Single queries are padded in; results are trimmed.
    """

    def __init__(self, index: EmbeddingIndex, max_k: int = 100,
                 max_batch: int = 8, block_size: int = 8192,
                 encoders: Optional[Dict[str, Callable]] = None,
                 approx: bool = False, recall_target: float = 0.95,
                 fused: bool = False, fused_bins: int = 4096,
                 quantized: bool = False,
                 rescore_int8: bool = False,
                 ivf_clusters: Optional[int] = None, nprobe: int = 8,
                 ivf_iters: int = 20,
                 build_train_sample: Optional[int] = None,
                 ivf_max_cell: Optional[int] = None,
                 ivf_index_path: Optional[str] = None,
                 pq_subspaces: Optional[int] = None, pq_codes: int = 256,
                 pq_iters: int = 15,
                 pq_oversample: int = 64,
                 pq_rotate: bool = False,
                 pq_anisotropic: Optional[float] = None,
                 pq_index_path: Optional[str] = None,
                 n_model_shards: Optional[int] = None,
                 add_capacity: int = 0,
                 filters: Optional[Dict[str, Sequence[str]]] = None,
                 ivf_warm_from=None, pq_warm_from=None):
        # ivf_warm_from / pq_warm_from: trained structures from a PREVIOUS
        # catalog generation (hot reload aux="reuse") — this catalog's aux
        # is derived from them assignment/encode-only, skipping k-means
        # (IVFIndex.reassign / PQCodebook.encode). They take precedence
        # over prebuilt-path loads AND fresh builds.
        self.index = index
        self.max_k = min(max_k, len(index))
        self.max_batch = max_batch
        # raw-query embedders, e.g. {"text": txt2url_text_encoder(...)}
        self.encoders = dict(encoders or {})
        self.device_calls = 0  # compiled query dispatches (coalescing stat)
        self.queries = 0       # query vectors answered
        # approx=True: hardware approx_max_k candidate selection + exact
        # rescore — 2.9x the exact path at ~0.99 overlap on the 2.26M chip run
        # (retrieval/mips.py approx_topk_over_matrix); exact stays default
        self.approx = approx
        self.recall_target = recall_target
        # quantized=True: the catalog SCAN runs in int8 (4x less HBM traffic,
        # double-rate MXU) with an exact full-precision rescore of the
        # candidates — only candidate selection sees the <=0.4%/row rounding
        # (retrieval/mips.py quantized_topk_over_matrix). Composes with
        # approx (int8 scan + approx_max_k selection).
        self.quantized = quantized
        # ivf_clusters=N: sublinear retrieval — k-means the catalog into N
        # cells at startup (retrieval/ivf.py), probe the best `nprobe` per
        # query. Composes with quantized (int8 candidate gathers); mutually
        # exclusive with approx (probe selection already approximates, and
        # the probed candidate set is too small for approx_max_k to help).
        # Mode guidance (measured at 2.26M items, BENCHMARKS.md "Retrieval
        # quality at MPD scale"): int8 is lossless at k<=100 — prefer it
        # whenever exact results matter; IVF recall depends on catalog
        # geometry — clustered (real trained) catalogs reach r@10 ~0.91 at
        # nprobe=16/1024, near-isotropic catalogs need most of the catalog
        # probed, so measure with tools/retrieval_quality_study.py
        # --artifact <export.npz> before enabling IVF in production.
        if (ivf_clusters or ivf_index_path) and approx:
            raise ValueError("ivf and approx are mutually exclusive"
                             " (ivf probe selection already approximates)")
        # fused=True: the Pallas scan+select kernel (retrieval/fused.py) —
        # the catalog streams through VMEM once and candidate selection
        # happens in-register (per-bin top-2), no score matrix and no
        # lax.top_k in the scan loop. Chip-measured fastest mode at 2.26M
        # items / k=500: 1318.7 q/s = 3.3x exact and 1.15x approx, at
        # HIGHER overlap than approx (0.9974 vs 0.9896 — BENCHMARKS.md).
        # It IS the alternative to every other scan+select pair, so it
        # composes with add_capacity, filters, n_model_shards (per-shard
        # kernel + local rescore + the exact ICI candidate exchange —
        # retrieval/fused.sharded_fused_topk_over_matrix) and quantized
        # (the kernel streams int8 codes + per-item scales — HALF the
        # bf16 layout's bytes; + rescore_int8 on top for an f32-free
        # catalog) — but not with approx/ivf/pq, which are alternative
        # selection strategies. Residency: +2*D bytes/item bf16 scan copy,
        # or +D+4 int8 codes+scales under quantized.
        if fused and (approx or ivf_clusters
                      or ivf_index_path or pq_subspaces or pq_index_path):
            raise ValueError(
                "fused is a complete scan+select path — it does not "
                "compose with approx/ivf/pq modes")
        if fused and quantized and n_model_shards:
            raise ValueError(
                "sharded fused serving scans bf16 — drop quantized or "
                "n_model_shards (int8 scan copies are single-shard)")
        self.fused = fused
        if fused:
            from esrecsys_tpu.core.mesh import pad_to_multiple

            # bin count: as requested (padded to lanes), and at least
            # ceil(max_k/2) so 2L >= k (fused.py recall math); resolved
            # BEFORE the catalog upload so the sharded layout can pad rows
            # to whole per-shard bin blocks. Batches whose (B, L) kernel
            # state outgrows VMEM no longer shrink L (which cost recall
            # quadratically) — binned_candidates chunks queries instead.
            self._fused_bins = max(
                pad_to_multiple(fused_bins, 128),
                pad_to_multiple(-(-min(max_k, len(index)) // 2), 128))
            # construction-time VMEM validation: query chunking bounds the
            # per-batch state, but the batch-independent footprint (D*L
            # catalog block + payload/scale tiles) plus the minimum
            # 8-query state is a floor — past it the kernel fails Mosaic
            # lowering on real TPU, invisibly to CPU-interpreter tests
            from esrecsys_tpu.retrieval.fused import validate_fused_bins

            validate_fused_bins(
                self._fused_bins, int(index.vectors.shape[1]),
                use_mask=filters is not None, use_scales=quantized)
        else:
            self._fused_bins = None
        # pq_subspaces=S: the catalog SCAN reads only S bytes/item of PQ
        # codes (retrieval/pq.py — 16x less traffic than f32 at D=32/S=8)
        # with an exact rescore of the candidates from the resident f32
        # catalog. Composes with ivf (IVF-PQ: probe cells, ADC-score the
        # candidates from codes, exact rescore — retrieval/ivf.py
        # ivf_pq_topk); mutually exclusive with approx/quantized.
        if (pq_subspaces or pq_index_path) and (approx or quantized):
            raise ValueError("pq is an alternative catalog scan — it does "
                             "not compose with approx/quantized")
        # rescore_int8=True: the f32 catalog is NOT kept device-resident —
        # the candidate rescore dequantizes gathered int8 rows instead
        # (D bytes/item, ≤0.4%-of-row-max rounding in returned scores).
        # Residency drops to S+D+4 bytes/item (pq modes) or D+4 (int8
        # modes) vs 4·D+ — the knob that serves catalogs whose f32 form
        # outgrows HBM. Requires a scan that doesn't read f32 rows itself.
        if rescore_int8 and not (quantized or pq_subspaces or pq_index_path):
            raise ValueError(
                "rescore_int8 drops the resident f32 catalog, so the scan "
                "must not need it: enable quantized or a pq mode")
        self.rescore_int8 = rescore_int8
        # n_model_shards=N: catalog rows sharded over the mesh's `model`
        # axis — serving scales past one chip's HBM. Each device scans its
        # local rows (exact), local top-k candidates ride ICI
        # (O(B*k*shards), catalog-size independent — mips.py
        # sharded_topk_over_matrix, the same path the sharded trainers
        # evaluate with). Composes with quantized (per-shard int8 scan +
        # local rescore + the same ICI candidate exchange —
        # mips.sharded_quantized_topk_over_matrix) and with rescore_int8
        # on top (no f32 rows on ANY chip); approx/ivf/pq stay
        # single-chip modes.
        if n_model_shards and (approx or ivf_clusters
                               or ivf_index_path or pq_subspaces
                               or pq_index_path):  # (incl. ivf+pq)
            raise ValueError(
                "n_model_shards serves the sharded scan (exact or "
                "quantized) — it does not compose with approx/ivf/pq")
        # add_capacity=N: preallocate N extra catalog rows so
        # /admin/add_items can append items with ZERO recompiles — buffers
        # stay at static capacity shapes, only a traced valid-count scalar
        # moves (mips/pq valid_count). Full-scan modes only: IVF's bucket
        # table and the sharded layout change shape on growth — those
        # catalogs grow via /admin/reload instead.
        if add_capacity and (ivf_clusters or ivf_index_path
                             or n_model_shards):
            raise ValueError(
                "add_capacity composes with the full-scan modes "
                "(exact/approx/int8/pq); ivf and sharded catalogs grow "
                "via /admin/reload")
        # filters={name: [allowed ids]}: named per-row eligibility masks
        # for filtered retrieval — a query carrying "filter": name only
        # sees those rows, enforced in BOTH scan phases (mips/pq/ivf
        # item_mask). filters={} enables the machinery with no masks yet
        # (register at runtime via set_filter / POST /admin/set_filter).
        if filters is not None and n_model_shards:
            raise ValueError(
                "filters are single-chip modes for now (the mask buffer "
                "is not sharded) — drop n_model_shards or the filters")
        self.add_capacity = int(add_capacity)
        self._n_valid = len(index)
        self.capacity = self._n_valid + self.add_capacity
        if self.add_capacity:
            # growable services clamp max_k to CAPACITY, not the seed size:
            # a catalog that starts small and grows must not be capped at
            # its launch-day size forever (topk clamps per request anyway)
            self.max_k = min(max_k, self.capacity)
            # host mirror preallocated too: extend() appends in O(n)
            # instead of re-copying the whole matrix under the query lock
            index.reserve(self.capacity)
        import os

        ivf_index_path = _npz_path(ivf_index_path)
        pq_index_path = _npz_path(pq_index_path)
        # One build-vs-load decision per aux structure, shared by the f32
        # upload gate below and the build branches further down — they must
        # agree or a skipped upload would feed build(None, ...).
        ivf_prebuilt = bool(ivf_index_path and os.path.exists(ivf_index_path))
        pq_prebuilt = bool(pq_index_path and os.path.exists(pq_index_path))
        self.nprobe = nprobe
        self.pq_oversample = pq_oversample
        self.n_model_shards = n_model_shards
        if n_model_shards:
            from esrecsys_tpu.core.mesh import (make_mesh, pad_to_multiple,
                                                table_sharding)

            self._mesh = make_mesh(n_model=n_model_shards)
            self._valid_items = len(index)
            # fused: each shard's slice must split into whole bin blocks
            # (retrieval/fused.sharded_fused_topk_over_matrix layout rule)
            padded = pad_to_multiple(
                self._valid_items,
                n_model_shards * (self._fused_bins if fused else 1))
            vecs = index.vectors
            if padded != self._valid_items:  # pad host-side, pre-upload
                vecs = np.pad(vecs, ((0, padded - self._valid_items), (0, 0)))
            # chunked even when sharded: per-shard pieces of a catalog big
            # enough to NEED sharding still exceed the ~100 MB single-
            # transfer stall threshold (CLAUDE.md)
            self._items = (None if rescore_int8 else _chunked_device_put(
                vecs, table_sharding(self._mesh, vecs.ndim)))
            if quantized or rescore_int8:
                # quantize host-side on the PADDED rows so int8/scales
                # shard identically to the f32 table (the scan masks
                # padding via valid_items); never a full f32 upload in r8
                from esrecsys_tpu.retrieval.mips import quantize_rows_np

                q8, sc = quantize_rows_np(vecs)
                self._q_items = _chunked_device_put(
                    q8, table_sharding(self._mesh, 2))
                self._scales = _chunked_device_put(
                    sc, table_sharding(self._mesh, 1))
            else:
                self._q_items = self._scales = None
        else:
            self._mesh = None
            self._valid_items = None
            # With rescore_int8 and every requested aux structure prebuilt
            # on disk, the f32 matrix is never uploaded AT ALL (cold start
            # ships int8 + codes only — catalogs beyond f32-in-HBM scale).
            # When a build needs it, it is uploaded here and dropped after.
            # warm_from derivations consume self._items too (reassign /
            # encode run on the resident catalog), so they force the
            # upload even when a prebuilt path exists (warm wins over it)
            f32_needed = (not rescore_int8
                          or ivf_warm_from is not None
                          or pq_warm_from is not None
                          or ((ivf_clusters or ivf_index_path)
                              and not ivf_prebuilt)
                          or ((pq_subspaces or pq_index_path)
                              and not pq_prebuilt))
            self._items = (_chunked_device_put(index.vectors)
                           if f32_needed else None)  # (N, D) resident
        self._dim = int(index.vectors.shape[1])
        if n_model_shards:
            pass  # int8 handled in the mesh branch above (sharded uploads)
        elif quantized or rescore_int8:
            from esrecsys_tpu.retrieval.mips import quantize_rows

            if self._items is not None:
                self._q_items, self._scales = jax.jit(quantize_rows)(
                    self._items)
            else:  # f32 skipped: quantize host-side, upload int8 only
                from esrecsys_tpu.retrieval.mips import quantize_rows_np

                q8, sc = quantize_rows_np(index.vectors)
                self._q_items = _chunked_device_put(q8)
                self._scales = jnp.asarray(sc)
        else:
            self._q_items = self._scales = None
        if ivf_clusters or ivf_index_path or ivf_warm_from is not None:
            from esrecsys_tpu.retrieval.ivf import IVFIndex

            if ivf_warm_from is not None:
                # assignment-only warm start from the previous generation's
                # centroids; re-save so a prebuilt-path cache stays current
                self.ivf = ivf_warm_from.reassign(
                    self._items, max_cell=ivf_max_cell)
                if ivf_index_path:
                    self.ivf.save(ivf_index_path)
            elif ivf_prebuilt:
                # prebuilt inverted file: restarts skip the k-means build
                # (the dominant startup cost at flagship scale)
                self.ivf = IVFIndex.load(ivf_index_path)
                if (self.ivf.n_items != len(index)
                        or self.ivf.centroids.shape[1] != self._dim):
                    raise ValueError(
                        f"ivf index at {ivf_index_path} was built for "
                        f"{self.ivf.n_items} items dim "
                        f"{self.ivf.centroids.shape[1]}, catalog is "
                        f"{len(index)} items dim {self._dim}")
                if (ivf_max_cell
                        and self.ivf.bucket_ids.shape[1] > ivf_max_cell):
                    log.warning(
                        "ivf_max_cell=%d ignored: prebuilt index at %s has "
                        "Lmax=%d (built without the cap). Delete the file "
                        "to rebuild with cells capped.", ivf_max_cell,
                        ivf_index_path, self.ivf.bucket_ids.shape[1])
            else:
                if not ivf_clusters:
                    raise ValueError(
                        f"ivf_index_path {ivf_index_path!r} does not exist "
                        "and no ivf_clusters given to build one")
                # k-means over the ALREADY-resident catalog (jnp.asarray is
                # a no-op on a device array) — never a second upload of the
                # full matrix, which stalls on tunneled links (CLAUDE.md)
                self.ivf = IVFIndex.build(
                    self._items, ivf_clusters, iters=ivf_iters,
                    max_cell=ivf_max_cell,
                    train_sample=build_train_sample)
                if ivf_index_path:
                    self.ivf.save(ivf_index_path)
            self._centroids = jnp.asarray(self.ivf.centroids)
            self._bucket_ids = jnp.asarray(self.ivf.bucket_ids)
        else:
            self.ivf = None
            self._centroids = self._bucket_ids = None
        if pq_subspaces or pq_index_path or pq_warm_from is not None:
            from esrecsys_tpu.retrieval.pq import PQCodebook

            if pq_warm_from is not None:
                # encode-only warm start against the previous generation's
                # codebooks (+rotation); re-save keeps a path cache current
                self.pq = pq_warm_from.encode(self._items)
                if pq_index_path:
                    self.pq.save(pq_index_path)
            elif pq_prebuilt:
                # prebuilt codebook: restarts skip the S k-means trainings
                self.pq = PQCodebook.load(pq_index_path)
                if (self.pq.n_items != len(index)
                        or self.pq.centroids.shape[0]
                        * self.pq.centroids.shape[2] != self._dim):
                    raise ValueError(
                        f"pq codebook at {pq_index_path} was built for "
                        f"{self.pq.n_items} items dim "
                        f"{self.pq.centroids.shape[0] * self.pq.centroids.shape[2]},"
                        f" catalog is {len(index)} items dim {self._dim}")
                # warn only on EXPLICIT build requests (pq_subspaces
                # given): pq_codes alone is a build modifier whose default
                # must not read as a request, and without pq_subspaces
                # "delete to retrain" would leave the server unable to start
                if pq_subspaces and (self.pq.n_subspaces != pq_subspaces
                                     or self.pq.n_codes != pq_codes):
                    log.warning(
                        "prebuilt pq codebook at %s has S=%d C=%d; requested "
                        "S=%d C=%d ignored. Delete the file to retrain.",
                        pq_index_path, self.pq.n_subspaces, self.pq.n_codes,
                        pq_subspaces, pq_codes)
            else:
                if not pq_subspaces:
                    raise ValueError(
                        f"pq_index_path {pq_index_path!r} does not exist "
                        "and no pq_subspaces given to build one")
                # trains on the ALREADY-resident catalog (sliced per
                # subspace on device — never a second full upload)
                self.pq = PQCodebook.build(
                    self._items, pq_subspaces, n_codes=pq_codes,
                    iters=pq_iters, rotate=pq_rotate,
                    anisotropic_threshold=pq_anisotropic,
                    train_sample=build_train_sample)
                if pq_index_path:
                    self.pq.save(pq_index_path)
            self._pq_centroids = jnp.asarray(self.pq.centroids)
            self._pq_codes = jnp.asarray(self.pq.codes)
            self._pq_rot = (jnp.asarray(self.pq.rotation)
                            if self.pq.rotation is not None else None)
        else:
            self.pq = None
            self._pq_centroids = self._pq_codes = self._pq_rot = None
        if self.add_capacity:
            # builds are done (k-means/codebooks trained on REAL rows
            # only); now pad every residency buffer to capacity with
            # zeros. Padded rows are invisible to queries — the scan
            # masks them via the traced valid-count in both phases —
            # and /admin/add_items overwrites them in place
            # (dynamic_update_slice on donated buffers, no recompile).
            pad = self.capacity - self._n_valid
            if self._items is not None:
                self._items = jnp.pad(self._items, ((0, pad), (0, 0)))
            if self._q_items is not None:
                self._q_items = jnp.pad(self._q_items, ((0, pad), (0, 0)))
                self._scales = jnp.pad(self._scales, (0, pad))
            if self._pq_codes is not None:
                self._pq_codes = jnp.pad(self._pq_codes, ((0, pad), (0, 0)))
            if self.pq is not None:
                # host mirror of the codes at capacity: add_items appends
                # in O(n) and republishes self.pq over a VIEW instead of
                # re-concatenating the whole code matrix per add
                buf = np.zeros((self.capacity, self.pq.codes.shape[1]),
                               np.uint8)
                buf[:self._n_valid] = self.pq.codes
                self._pq_codes_host = buf
                self.pq = self.pq._replace(codes=buf[:self._n_valid])
            else:
                self._pq_codes_host = None
        if rescore_int8:
            # builds are done: free the f32 matrix (if it was ever up).
            # From here the int8 catalog + aux codes are the residency.
            self._items = None
        self._fused_scales = None
        if fused and quantized:
            from esrecsys_tpu.retrieval.fused import pack_catalog_codes

            # int8 scan layout from the ALREADY-QUANTIZED rows (host-pinned
            # quantizer under rescore_int8 — no f32 ever touches device):
            # transposed codes + per-bin scale rows, once at build
            self._items_packed, self._fused_scales = jax.jit(
                lambda qi, sc: pack_catalog_codes(
                    qi, sc, self._fused_bins))(self._q_items, self._scales)
        elif fused:
            from esrecsys_tpu.retrieval.fused import pack_catalog

            # device-side transpose+cast of the (already capacity- or
            # shard-padded) f32 rows, ONCE — per-query packing would
            # relayout the whole catalog every call (fused.py pack_catalog)
            if self._mesh is not None:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                from esrecsys_tpu.core.mesh import MODEL_AXIS

                # scan copy columns shard with their source rows
                self._items_packed = jax.jit(
                    lambda it: pack_catalog(it, self._fused_bins,
                                            shards=n_model_shards),
                    out_shardings=NamedSharding(
                        self._mesh, P(None, MODEL_AXIS)))(self._items)
            else:
                self._items_packed = jax.jit(
                    lambda it: pack_catalog(it, self._fused_bins))(
                        self._items)
        else:
            self._items_packed = None

        # ---- filtered retrieval: named per-row eligibility masks ----
        # masks live at the buffers' row count (capacity when growable):
        # rows appended later default to False in every existing filter
        # until set_filter re-registers it
        self._filters_enabled = filters is not None
        self._all_mask = (jnp.ones((self.capacity,), bool)
                          if self._filters_enabled else
                          jnp.ones((1,), bool))  # dummy: arg never traced
        self._filter_masks: Dict[str, jax.Array] = {}
        for name, id_list in (filters or {}).items():
            mask, matched = self._mask_from_ids(id_list)
            self._filter_masks[str(name)] = mask
            log.info("filter %r: %d/%d ids matched the catalog", name,
                     matched, len(id_list))

        # The catalog is an ARGUMENT of the jitted query, never a closure:
        # closed-over arrays become compile-time constants, which tunneled
        # PJRT backends re-ship with the program (a 580 MB catalog stalls the
        # compile request entirely).
        def query(q, items, q_items, scales, centroids, bucket_ids,
                  pq_centroids, pq_codes, pq_rot, valid, fmask,
                  items_packed, fused_scales):
            # valid (traced scalar) bounds the real rows when growth
            # capacity is preallocated; None (static) otherwise so
            # non-growable services compile the exact same programs as
            # before add_capacity existed. Same discipline for fmask
            # (filtered retrieval): a service without filters never pays
            # the mask's scan traffic.
            vc = valid if self.add_capacity else None
            fm = fmask if self._filters_enabled else None
            # approx/quantized paths want LARGE blocks (few scan iterations,
            # few candidates to rescore) — the 11.7k q/s number was measured
            # at 262144; the exact path's small-block default would explode
            # nblk*per_block_k rescore work
            if self._mesh is not None:
                if self.fused:
                    from esrecsys_tpu.retrieval.fused import (
                        sharded_fused_topk_over_matrix)

                    # per-shard Pallas fused scan+select + LOCAL exact
                    # rescore + the same ICI candidate exchange as the
                    # exact sharded path
                    return sharded_fused_topk_over_matrix(
                        q, items, items_packed, self.max_k,
                        mesh=self._mesh, num_bins=self._fused_bins,
                        valid_items=self._valid_items)
                if self.quantized:
                    from esrecsys_tpu.retrieval.mips import (
                        sharded_quantized_topk_over_matrix)

                    # per-shard int8 scan + LOCAL rescore (f32 rows when
                    # resident, dequantized int8 under rescore_int8) +
                    # the same ICI candidate exchange as the exact path
                    return sharded_quantized_topk_over_matrix(
                        q, q_items, scales, self.max_k, mesh=self._mesh,
                        rescore_items=items,  # None under rescore_int8
                        block_size=max(block_size, 262_144),
                        valid_items=self._valid_items)
                from esrecsys_tpu.retrieval.mips import (
                    sharded_topk_over_matrix)

                return sharded_topk_over_matrix(
                    q, items, self.max_k, mesh=self._mesh,
                    block_size=block_size,
                    valid_items=self._valid_items)
            if self.fused:
                from esrecsys_tpu.retrieval.fused import (
                    binned_topk_over_matrix)

                if self.quantized:
                    # int8 scan copy (codes + per-bin scales, half the
                    # bf16 bytes); rescore reads f32 rows — or dequantized
                    # int8 rows under rescore_int8 (f32-free catalog)
                    r8f = self.rescore_int8
                    return binned_topk_over_matrix(
                        q, q_items if r8f else items, self.max_k,
                        num_bins=self._fused_bins,
                        valid_count=vc, item_mask=fm,
                        items_packed=items_packed,
                        item_scales=fused_scales,
                        rescore_scales=scales if r8f else None)
                # Pallas fused scan+select over the resident (D, Mp) bf16
                # scan copy; the f32 rows serve only the exact rescore
                return binned_topk_over_matrix(
                    q, items, self.max_k, num_bins=self._fused_bins,
                    valid_count=vc, item_mask=fm,
                    items_packed=items_packed)
            # rescore_int8: no f32 catalog exists — rescore gathers int8
            # rows and dequantizes (items arg is None in that case)
            r8 = self.rescore_int8
            if self.pq is not None and self.ivf is not None:
                from esrecsys_tpu.retrieval.ivf import ivf_pq_topk

                # IVF-PQ: sublinear probe + S-bytes-per-candidate ADC +
                # exact rescore of ~oversample*k candidates
                return ivf_pq_topk(q, centroids, bucket_ids,
                                   q_items if r8 else items,
                                   self.max_k, nprobe=self.nprobe,
                                   pq_centroids=pq_centroids,
                                   pq_codes=pq_codes,
                                   oversample=self.pq_oversample,
                                   rotation=pq_rot,
                                   item_scales=scales if r8 else None,
                                   item_mask=fm)
            if self.pq is not None:
                from esrecsys_tpu.retrieval.pq import pq_topk

                # oversample sets the exact-rescore candidate budget
                # (~oversample*max_k of the catalog). Default 64 = the
                # measured MPD-scale sweet spot (overlap@10 0.988 at a
                # ~6k-row rescore); 256 is exact there (BENCHMARKS.md
                # "PQ quality at MPD scale")
                return pq_topk(q, pq_centroids, pq_codes, self.max_k,
                               rescore_items=q_items if r8 else items,
                               block_size=max(block_size, 262_144),
                               oversample=self.pq_oversample,
                               rotation=pq_rot,
                               rescore_scales=scales if r8 else None,
                               valid_count=vc, item_mask=fm)
            if self.ivf is not None:
                from esrecsys_tpu.retrieval.ivf import ivf_topk

                return ivf_topk(q, centroids, bucket_ids,
                                q_items if r8 else items, self.max_k,
                                nprobe=self.nprobe, q_items=q_items,
                                item_scales=scales,
                                rescore_scales=scales if r8 else None,
                                item_mask=fm)
            if self.quantized:
                from esrecsys_tpu.retrieval.mips import (
                    quantized_topk_over_matrix)

                return quantized_topk_over_matrix(
                    q, q_items, scales, q_items if r8 else items, self.max_k,
                    block_size=max(block_size, 262_144),
                    select="approx" if self.approx else "exact",
                    recall_target=self.recall_target,
                    rescore_scales=scales if r8 else None,
                    valid_count=vc, item_mask=fm)
            if self.approx:
                from esrecsys_tpu.retrieval.mips import approx_topk_over_matrix

                return approx_topk_over_matrix(
                    q, items, self.max_k, block_size=max(block_size, 262_144),
                    recall_target=self.recall_target,
                    valid_count=vc, item_mask=fm)
            return topk_over_matrix(q, items, self.max_k, block_size,
                                    valid_count=vc, item_mask=fm)

        self._query_fn = jax.jit(query)
        self._query = lambda q, items, fmask=None: self._query_fn(
            q, items, self._q_items, self._scales,
            self._centroids, self._bucket_ids,
            self._pq_centroids, self._pq_codes, self._pq_rot,
            jnp.int32(self._n_valid),
            self._all_mask if fmask is None else fmask,
            self._items_packed, self._fused_scales)
        # Compile once at construction so first request latency is steady.
        warm = jnp.zeros((max_batch, self._dim), jnp.float32)
        jax.device_get(jax.tree_util.tree_leaves(
            self._query(warm, self._items))[0][:1])
        self._lock = threading.Lock()
        # per-dispatch device latency ring (seconds); bounded so a
        # long-lived server never grows it — /statsz reports percentiles
        self._lat = collections.deque(maxlen=2048)

    def _mask_from_ids(self, id_list: Sequence[str]):
        """(device bool mask over the row buffers, n ids that matched).
        Off-catalog ids no-op (filter lists and catalogs drift on
        different cadences); the match count lets callers alarm on it."""
        mask = np.zeros(self.capacity, bool)
        rows = [self.index._id2row.get(str(i)) for i in id_list]
        matched = [r for r in rows if r is not None]
        if matched:
            mask[np.asarray(matched, np.int64)] = True
        return jnp.asarray(mask), len(matched)

    def set_filter(self, name: str, id_list: Sequence[str]) -> int:
        """Register or replace a named eligibility filter at runtime
        (POST /admin/set_filter). Returns how many ids matched the
        catalog. After add_items, re-register any filter that should
        include the new rows (they default to ineligible). Runtime
        registrations do NOT survive /admin/reload (row positions change
        with the catalog) — only the startup ``filters`` dict is
        re-applied to the new generation; re-POST the rest after."""
        if not self._filters_enabled:
            raise ValueError(
                "filters are not enabled: start the service with "
                "filters={...} (or --filters_json) to preallocate the "
                "mask path")
        mask, matched = self._mask_from_ids(id_list)
        with self._lock:
            self._filter_masks[str(name)] = mask
        return matched

    def add_items(self, ids: Sequence[str], vectors: np.ndarray) -> int:
        """Append items to the LIVE catalog without recompiling or
        restarting (requires ``add_capacity`` headroom at construction).

        The compiled query keeps its capacity-static shapes; this
        overwrites preallocated rows in place (donated
        ``dynamic_update_slice``) and advances the traced valid-count the
        scans mask by — new items are queryable on the next dispatch.
        Derived residencies update consistently: int8 rows/scales via the
        host quantizer (bit-identical to the device one —
        :func:`~esrecsys_tpu.retrieval.mips.quantize_rows_np`), PQ codes
        via :meth:`~esrecsys_tpu.retrieval.pq.PQCodebook.encode` against
        the trained (possibly rotated/anisotropic) codebooks. Returns the
        new catalog size. The streaming half of continuous deployment:
        adds keep freshness between /admin/reload generations; codebook/
        centroid drift still wants the periodic retrain+reload.
        """
        if not self.add_capacity:
            raise ValueError(
                "service has no growth headroom: start it with "
                "add_capacity=N (--add_capacity) to enable add_items")
        vectors = np.atleast_2d(np.asarray(vectors, np.float32))
        n = vectors.shape[0]
        if vectors.shape[1] != self._dim:
            raise ValueError(
                f"vectors dim {vectors.shape[1]} != index dim {self._dim}")
        str_ids = [str(i) for i in ids]
        with self._lock:  # queries round-trip under this lock, so no
            # in-flight dispatch holds the buffers we donate below
            if self._n_valid + n > self.capacity:
                raise ValueError(
                    f"capacity exhausted: {self._n_valid}+{n} > "
                    f"{self.capacity}; reload with a larger add_capacity")
            # pre-validate ids so NO state (host or device) moves for a
            # batch that would be rejected; the host index mutates LAST —
            # a device failure mid-way then leaves the batch fully
            # retriable (rows written beyond _n_valid stay invisible)
            dup = [i for i in str_ids if i in self.index._id2row]
            if dup or len(set(str_ids)) != len(str_ids):
                raise ValueError(f"duplicate ids: {dup or 'within batch'}")
            start = self._n_valid
            end = start + n
            if self._items is not None:
                self._items = _rows_update(
                    self._items, jnp.asarray(vectors), start)
            q8 = sc = None
            if self._q_items is not None:
                from esrecsys_tpu.retrieval.mips import quantize_rows_np

                q8, sc = quantize_rows_np(vectors)
                self._q_items = _rows_update(
                    self._q_items, jnp.asarray(q8), start)
                self._scales = _rows_update(
                    self._scales, jnp.asarray(sc), start)
            if self._items_packed is not None:
                # transposed scan copy: item rows are columns there. The
                # int8 copy (fused+quantized) appends the quantized rows;
                # its per-bin scale rows are the row-major reshape of the
                # flat per-item scales (pack_catalog_codes), so the same
                # contiguous slice updates them flat
                cols = q8.T if self._fused_scales is not None else vectors.T
                self._items_packed = _cols_update_jit(
                    self._items_packed, jnp.asarray(cols), jnp.int32(start))
                if self._fused_scales is not None:
                    self._fused_scales = _flat_update_jit(
                        self._fused_scales, jnp.asarray(sc),
                        jnp.int32(start))
            if self.pq is not None:
                from esrecsys_tpu.retrieval.pq import PQCodebook

                enc = self.pq.encode(vectors)
                self._pq_codes = _rows_update(
                    self._pq_codes, jnp.asarray(enc.codes), start)
                # republish over the preallocated host mirror (O(n), no
                # full-codes copy); reload aux=reuse / re-save read self.pq
                self._pq_codes_host[start:end] = enc.codes
                self.pq = PQCodebook(
                    self.pq.centroids, self._pq_codes_host[:end], end,
                    self.pq.rotation, self.pq.anisotropic_threshold)
            self.index.extend(str_ids, vectors)
            self._n_valid = end
            return self._n_valid

    @property
    def dim(self) -> int:
        return self._dim

    @property
    def latency_ms(self) -> Optional[Dict[str, float]]:
        """Per-dispatch device latency percentiles over the last <=2048
        compiled query dispatches (pad-to-max_batch + device round-trip;
        HTTP framing excluded). None until the first real query."""
        lat = list(self._lat)
        if not lat:
            return None
        p50, p90, p99 = np.percentile(np.asarray(lat) * 1e3, [50, 90, 99])
        return {"p50": round(float(p50), 2), "p90": round(float(p90), 2),
                "p99": round(float(p99), 2), "n": len(lat)}

    @property
    def resident_bytes_per_item(self) -> int:
        """Device bytes held per catalog item by the scan+rescore path
        (f32 matrix, int8 matrix + scales, IVF slot, PQ codes; excludes
        catalog-size-independent structures like centroids). Summed over
        the mesh when sharded. This is the number rescore_int8 shrinks:
        e.g. D=64 pq S=8 goes 264 → 76."""
        b = 0
        if self._items is not None:
            b += 4 * self._dim
        if self._items_packed is not None:
            if self._fused_scales is not None:
                b += self._dim + 4  # int8 scan copy + per-bin scale rows
            else:
                b += 2 * self._dim  # bf16 transposed scan copy (fused)
        if self._q_items is not None:
            b += self._dim + 4  # int8 row + f32 scale
        if self.ivf is not None:
            b += 4  # one int32 bucket slot per item (pre-padding)
        if self.pq is not None:
            b += self.pq.bytes_per_item
        return b

    @property
    def mode(self) -> str:
        """Human-readable name of the active catalog-scan mode."""
        r8 = "+r8" if self.rescore_int8 else ""  # int8 rescore, f32-free
        if self.n_model_shards:
            q8 = "+int8" if self.quantized else ""
            fz = f"+fused:bins={self._fused_bins}" if self.fused else ""
            return f"sharded:{self.n_model_shards}{q8}{fz}{r8}"
        if self.pq is not None:
            rot = "+rotated" if self.pq.rotation is not None else ""
            aniso = (f"+aniso={self.pq.anisotropic_threshold:g}"
                     if self.pq.anisotropic_threshold is not None else "")
            pq_part = (f"pq:S={self.pq.n_subspaces}{rot}{aniso}"
                       f":oversample={self.pq_oversample}{r8}")
            if self.ivf is not None:
                return (f"ivf:{self.ivf.n_clusters}:nprobe={self.nprobe}"
                        f"+{pq_part}")
            return pq_part
        if self.ivf is not None:
            q8 = "+int8" if self.quantized else ""
            return f"ivf:{self.ivf.n_clusters}:nprobe={self.nprobe}{q8}{r8}"
        if self.fused:
            q8 = "+int8" if self.quantized else ""
            return f"fused:bins={self._fused_bins}{q8}{r8}"
        if self.quantized:
            return ("int8+approx" if self.approx else "int8") + r8
        return "approx" if self.approx else "exact"

    def exclusion_budget(self, k: int, exclude) -> int:
        """Validate an exclusion list against the compiled top-k width.

        Exclusion is a host-side post-filter over an over-fetched top-k
        (the compiled query path stays fixed-shape at ``max_k``), so k
        results can only be guaranteed when ``k + len(exclude)`` fits in
        one device answer. Returns the over-fetch width to request."""
        budget = k + len(set(exclude))
        if budget > self.max_k:
            raise ValueError(
                f"k={k} + {len(set(exclude))} excluded ids exceeds "
                f"max_k={self.max_k}: raise --max_k or shrink the "
                "exclusion list")
        return budget

    @staticmethod
    def _filter_excluded(ids_row, scores_row, exclude: frozenset, k: int):
        """Drop excluded ids from one over-fetched result row, keep k."""
        keep = [j for j, x in enumerate(ids_row) if x not in exclude][:k]
        return ids_row[keep], scores_row[keep]

    def topk(self, vectors: np.ndarray, k: Optional[int] = None,
             exclude: Optional[Sequence[str]] = None,
             filter: Optional[str] = None,
             ) -> Tuple[np.ndarray, np.ndarray]:
        """(B, D) query vectors → (ids (B, k) of str, scores (B, k)).

        ``exclude``: catalog ids to drop from every row (e.g. tracks
        already in the playlist, the query item itself). Ids not in the
        catalog count against the ``k + len(exclude) <= max_k`` budget but
        otherwise no-op, so "recently seen" lists may safely contain
        off-catalog items. Filtering happens on host over an over-fetched
        top-(k+E): the compiled device query keeps its one static shape.

        ``filter``: name of a registered eligibility mask (set_filter) —
        only those rows can be returned, enforced on device in both scan
        phases. Rows whose score comes back -inf (fewer eligible items
        than k) carry a sanitized id; check ``np.isfinite(scores)``.
        """
        fmask = None
        if filter is not None:
            if not self._filters_enabled:
                raise ValueError("filters are not enabled on this service")
            try:
                fmask = self._filter_masks[filter]
            except KeyError:
                raise ValueError(
                    f"unknown filter {filter!r}; registered: "
                    f"{sorted(self._filter_masks)}") from None
        k = self.max_k if k is None else min(k, self.max_k)
        # growable services allow max_k up to CAPACITY; never return more
        # rows than real items exist right now (-inf pad must not leak)
        k = min(k, self._n_valid)
        fetch = k if not exclude else self.exclusion_budget(k, exclude)
        if fetch > self._n_valid:
            # the over-fetch that guarantees k survivors cannot fit in the
            # current (still-growing) catalog — same contract as
            # exclusion_budget's k+E <= max_k, against live size
            raise ValueError(
                f"k + len(exclude) = {fetch} exceeds the current catalog "
                f"size {self._n_valid}")
        excl = frozenset(exclude) if exclude else frozenset()
        q = np.atleast_2d(np.asarray(vectors, np.float32))
        if q.shape[1] != self._dim:
            raise ValueError(f"query dim {q.shape[1]} != index dim {self._dim}")
        out_v, out_i = [], []
        for start in range(0, q.shape[0], self.max_batch):
            chunk = q[start:start + self.max_batch]
            pad = self.max_batch - chunk.shape[0]
            padded = np.pad(chunk, ((0, pad), (0, 0)))
            with self._lock:
                self.device_calls += 1
                self.queries += chunk.shape[0]
                t0 = time.perf_counter()
                vals, idxs = jax.device_get(
                    self._query(jnp.asarray(padded), self._items, fmask))
                self._lat.append(time.perf_counter() - t0)
            out_v.append(vals[: chunk.shape[0], :fetch])
            out_i.append(idxs[: chunk.shape[0], :fetch])
        vals = np.concatenate(out_v, axis=0)
        idxs = np.concatenate(out_i, axis=0)
        ids = np.asarray(self.index.ids, dtype=object)[idxs]
        if excl:
            rows = [self._filter_excluded(ids[b], vals[b], excl, k)
                    for b in range(ids.shape[0])]
            ids = np.stack([r[0] for r in rows])
            vals = np.stack([r[1] for r in rows])
        return ids, vals

    def topk_by_id(self, item_id: str, k: Optional[int] = None,
                   exclude: Optional[Sequence[str]] = None,
                   filter: Optional[str] = None):
        """Item-to-item: query with a catalog item's own vector.

        Pass ``exclude=[item_id]`` to drop the query item from its own
        results (it otherwise ranks first by construction)."""
        ids, vals = self.topk(self.index.vector(item_id)[None, :], k,
                              exclude=exclude, filter=filter)
        return ids[0], vals[0]

    def encode(self, kind: str, payload) -> np.ndarray:
        """Run a raw query through its registered model encoder."""
        if kind not in self.encoders:
            raise ValueError(
                f"no {kind!r} encoder registered (have {sorted(self.encoders)})")
        return np.asarray(self.encoders[kind](payload), np.float32)


class QueryBatcher:
    """Coalesce concurrent single-vector queries into one compiled call.

    Requests park on a queue; a dispatcher thread drains up to
    ``service.max_batch`` of them (waiting at most ``max_wait_ms`` for
    followers after the first) and issues ONE padded device call, then
    distributes per-request top-k slices. Under a burst of B <= max_batch
    concurrent requests this is one dispatch instead of B.
    """

    class Closed(RuntimeError):
        """Raised by submit() once close() has begun — callers holding a
        stale batcher (a hot reload swapped in a new one) retry on the
        current one instead of hanging on a queue nobody drains."""

    def __init__(self, service: RetrievalService, max_wait_ms: float = 2.0):
        self.service = service
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        self._inflight = 0
        self._state_lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, vector: np.ndarray, k: int,
               exclude: Optional[Sequence[str]] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Blocking: one (D,) query → (ids (k,), scores (k,)).

        ``exclude`` rides per-request through a coalesced batch: the
        dispatcher over-fetches to the batch's largest k+E budget and
        filters each slot on host."""
        vec = np.asarray(vector, np.float32)
        if vec.shape != (self.service.dim,):
            # validate BEFORE enqueueing: a malformed query must fail alone,
            # not poison the whole coalesced batch it would ride in
            raise ValueError(
                f"query shape {vec.shape} != ({self.service.dim},)")
        # budget check up front too, for the same poison-isolation reason
        excl = frozenset(exclude) if exclude else frozenset()
        fetch = self.service.exclusion_budget(k, excl) if excl else k
        with self._state_lock:
            if self._closed:
                raise QueryBatcher.Closed("batcher closed (hot reload)")
            self._inflight += 1
        try:
            done = threading.Event()
            slot: dict = {"k": k, "exclude": excl, "fetch": fetch}
            self._q.put((vec, done, slot))
            done.wait()
        finally:
            with self._state_lock:
                self._inflight -= 1
        if "err" in slot:
            raise slot["err"]
        return slot["ids"], slot["scores"]

    def idle(self) -> bool:
        with self._state_lock:
            return self._inflight == 0 and self._q.empty()

    def close(self) -> None:
        """Stop the dispatcher. submit() racing past the closed check can
        still enqueue; the post-join drain fails those waiters with
        :class:`Closed` instead of leaving them blocked forever."""
        with self._state_lock:
            if self._closed:
                return
            self._closed = True
        self._q.put(None)
        self._thread.join(timeout=5)
        while True:  # fail any stragglers that slipped in
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is None:
                continue
            _, done, slot = item
            slot["err"] = QueryBatcher.Closed("batcher closed (hot reload)")
            done.set()

    def _loop(self) -> None:
        while True:
            first = self._q.get()
            if first is None:
                return
            batch = [first]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.service.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    self._finish(batch)
                    return
                batch.append(nxt)
            self._finish(batch)

    def _finish(self, batch) -> None:
        try:
            vecs = np.stack([b[0] for b in batch])
            kmax = max(b[2]["fetch"] for b in batch)
            ids, scores = self.service.topk(vecs, kmax)
            for i, (_, done, slot) in enumerate(batch):
                row_ids, row_scores = RetrievalService._filter_excluded(
                    ids[i], scores[i], slot["exclude"], slot["k"])
                slot["ids"] = row_ids
                slot["scores"] = row_scores
                done.set()
        except Exception as e:  # propagate to every waiter
            for _, done, slot in batch:
                slot["err"] = e
                done.set()


class _Handler(BaseHTTPRequestHandler):
    """Reads the server's (service, batcher) pair ONCE per request — a
    single attribute read, so a hot reload can never hand a handler the
    new service with the old batcher (or vice versa). In-flight requests
    finish on the pair they read; a request that raced a reload into a
    just-closed batcher gets :class:`QueryBatcher.Closed` and retries on
    the current pair."""

    def _send(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # route through logging, not stderr
        log.debug("serving: " + fmt, *args)

    def do_GET(self):
        service, _ = self.server.serving
        if self.path == "/healthz":
            self._send(200, {"status": "ok", "items": len(service.index),
                             "dim": service.dim, "max_k": service.max_k,
                             "index": self.server.index_path})
        elif self.path == "/statsz":
            q, d = service.queries, service.device_calls
            self._send(200, {
                "mode": service.mode,
                "items": len(service.index),
                "capacity": service.capacity,  # items + add_items headroom
                "filters": (sorted(service._filter_masks)
                            if service._filters_enabled else None),
                "resident_bytes_per_item": service.resident_bytes_per_item,
                "index": self.server.index_path,
                "queries": q,
                "device_calls": d,
                # >1 means coalescing is winning (several requests per
                # compiled dispatch); counters reset on hot reload
                "queries_per_dispatch": round(q / d, 2) if d else None,
                "reloads": self.server.reloads,
                # device dispatch latency percentiles (last <=2048 calls)
                "latency_ms": service.latency_ms,
                "uptime_s": round(time.time() - self.server.started, 1)})
        else:
            self._send(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        if self.path.startswith("/admin/"):
            token = getattr(self.server, "admin_token", None)
            if token and self.headers.get("X-Admin-Token") != token:
                self._send(403, {"error": "bad or missing X-Admin-Token"})
                return
        if self.path == "/admin/reload":
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                aux = req.get("aux", "rebuild")
                t0 = time.perf_counter()
                self.server.reload_index(req.get("index"), aux=aux)
                self._send(200, {
                    "status": "ok",
                    "items": len(self.server.service.index),
                    "index": self.server.index_path,
                    "aux": aux,
                    "reload_seconds": round(time.perf_counter() - t0, 3)})
            except Exception as e:  # missing file, dim mismatch, ...
                self._send(400, {"error": str(e)})
            return
        if self.path == "/admin/set_filter":
            # register/replace a named eligibility mask at runtime:
            # {"name": "genre:jazz", "ids": ["t1", ...]}
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                name = req.get("name")
                ids = req.get("ids")
                if not isinstance(name, str) or not isinstance(ids, list):
                    self._send(400, {"error": "need 'name' (str) and "
                                              "'ids' (list)"})
                    return
                matched = self.server.service.set_filter(name, ids)
                self._send(200, {"status": "ok", "filter": name,
                                 "matched": matched, "given": len(ids)})
            except Exception as e:
                self._send(400, {"error": str(e)})
            return
        if self.path == "/admin/add_items":
            # streaming catalog growth: {"ids": [...], "vectors": [[...]]}
            # appends into preallocated capacity (RetrievalService
            # add_items — zero recompiles, new items queryable at once)
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                ids = req.get("ids") or []
                vecs = np.asarray(req.get("vectors") or [], np.float32)
                service = self.server.service
                total = service.add_items(ids, vecs)
                self._send(200, {
                    "status": "ok", "added": len(ids), "items": total,
                    "capacity_left": service.capacity - total})
            except Exception as e:  # no headroom, dup ids, bad dims, ...
                self._send(400, {"error": str(e)})
            return
        if self.path != "/v1/topk":
            self._send(404, {"error": f"unknown path {self.path}"})
            return
        service, batcher = self.server.serving
        try:
            length = int(self.headers.get("Content-Length", "0"))
            req = json.loads(self.rfile.read(length) or b"{}")
            k = int(req.get("k", service.max_k))
            # "exclude": catalog ids dropped from the results (items the
            # user already has — e.g. the playlist's own tracks, or the
            # query item itself on id queries). k + len(exclude) must fit
            # the compiled top-k width (max_k); off-catalog ids no-op.
            exclude = req.get("exclude", [])
            if not (isinstance(exclude, list)
                    and all(isinstance(x, str) for x in exclude)):
                self._send(400, {"error": "'exclude' must be a list of "
                                          "catalog id strings"})
                return
            # "filter": name of a registered eligibility mask — only
            # those catalog rows can be returned (device-side, both scan
            # phases). Filtered requests bypass the coalescer: the batch
            # shares ONE compiled dispatch and therefore one mask.
            filt = req.get("filter")
            if filt is not None and not isinstance(filt, str):
                self._send(400, {"error": "'filter' must be a string"})
                return
            # batch form: "vectors" = list of query vectors, answered in
            # one service call (bulk/offline scoring; bypasses the
            # single-query coalescer, which exists for the concurrent-
            # singles pattern); "exclude" applies to every row
            if "vectors" in req:
                vecs = np.asarray(req["vectors"], np.float32)
                if vecs.ndim != 2:
                    self._send(400, {"error": "'vectors' must be a list "
                                              "of equal-length vectors"})
                    return
                ids_b, scores_b = service.topk(vecs, k, exclude=exclude,
                                               filter=filt)
                rows = [_finite_row(i_r, s_r)
                        for i_r, s_r in zip(ids_b, scores_b)]
                self._send(200, {"ids": [r[0] for r in rows],
                                 "scores": [r[1] for r in rows]})
                return
            # resolve the query to ONE vector: raw, catalog id, or a raw
            # query embedded through a registered model encoder
            if "vector" in req:
                vec = np.asarray(req["vector"], np.float32)
            elif "id" in req:
                vec = service.index.vector(str(req["id"]))
            elif "text" in req:
                vec = service.encode("text", str(req["text"]))
            elif "image_key" in req:
                vec = service.encode("image_key", str(req["image_key"]))
            else:
                self._send(400, {"error":
                                 "need 'vector', 'id', 'text' or 'image_key'"})
                return
            if batcher is not None and filt is None:
                try:
                    ids, scores = batcher.submit(vec, k, exclude=exclude)
                except QueryBatcher.Closed:
                    # a reload retired the batcher between our pair-read
                    # and the submit — retry once on the current pair
                    service, batcher = self.server.serving
                    if batcher is not None:
                        ids, scores = batcher.submit(vec, k, exclude=exclude)
                    else:
                        ids2, scores2 = service.topk(vec[None, :], k,
                                                     exclude=exclude)
                        ids, scores = ids2[0], scores2[0]
            else:
                ids2, scores2 = service.topk(vec[None, :], k,
                                             exclude=exclude, filter=filt)
                ids, scores = ids2[0], scores2[0]
            out_ids, out_scores = _finite_row(ids, scores)
            self._send(200, {"ids": out_ids, "scores": out_scores})
        except KeyError as e:
            self._send(404, {"error": f"unknown id {e}"})
        except Exception as e:  # malformed JSON, wrong dim, ...
            self._send(400, {"error": str(e)})


class RetrievalHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer + zero-downtime index reload.

    ``reload_index(path)`` builds a complete NEW RetrievalService (device
    upload, aux index builds, one-time compile) while the old one keeps
    answering, then swaps the ``(service, batcher)`` pair in ONE attribute
    assignment — the train→export→serve loop (tools/full_scale_run.py) can
    push a fresh artifact into a live server with no restart and no failed
    queries. Reloads are serialized; queries are never blocked by one. The
    retired batcher is closed by a background thread once its in-flight
    requests drain; a submit that races the close gets
    :class:`QueryBatcher.Closed` and the handler retries on the new pair.

    Aux structures (IVF inverted file, PQ codebook) are REBUILT for the new
    catalog; configured ``ivf_index_path``/``pq_index_path`` caches are
    overwritten, since they describe the catalog being served. Build
    parameters not restatable from config (a prebuilt-only IVF/PQ) are
    carried over from the running service.

    Peak DEVICE memory during a reload is old + new catalog (plus build
    workspaces): that double residency IS the zero-downtime mechanism.
    For catalogs using more than ~half of HBM, reload via restart or use
    ``n_model_shards`` so each chip holds 1/N.
    """

    index_path: str

    # (service, batcher) — swapped as ONE attribute so handlers can never
    # observe a mixed pair; properties below keep the old access paths
    _serving: Tuple[RetrievalService, Optional[QueryBatcher]]

    @property
    def serving(self) -> Tuple[RetrievalService, Optional[QueryBatcher]]:
        return self._serving

    @property
    def service(self) -> RetrievalService:
        return self._serving[0]

    @property
    def batcher(self) -> Optional[QueryBatcher]:
        return self._serving[1]

    admin_token: Optional[str] = None  # set → /admin/* requires header

    def _configure(self, index_path: str, service_kwargs: dict,
                   coalesce: bool, max_wait_ms: float) -> None:
        self.index_path = index_path
        self._service_kwargs = dict(service_kwargs)
        self._coalesce = coalesce
        self._max_wait_ms = max_wait_ms
        self._reload_lock = threading.Lock()
        self.started = time.time()
        self.reloads = 0

    @staticmethod
    def _retire_batcher(batcher: QueryBatcher, grace_s: float = 60.0):
        """Close a replaced batcher AFTER its in-flight requests drain (so
        none hang on an undrained queue), forcing the close at grace_s."""
        def closer():
            deadline = time.monotonic() + grace_s
            while not batcher.idle() and time.monotonic() < deadline:
                time.sleep(0.05)
            batcher.close()
        threading.Thread(target=closer, daemon=True).start()

    def reload_index(self, index_path: Optional[str] = None,
                     aux: str = "rebuild") -> None:
        """Swap in a new catalog with zero downtime.

        ``aux`` picks how IVF/PQ structures follow the catalog:
        ``"rebuild"`` (default) retrains them from scratch for the new
        vectors; ``"reuse"`` keeps the RUNNING service's trained
        centroids/codebooks and pays only the assignment/encode pass
        (IVFIndex.reassign / PQCodebook.encode) — the cheap path for
        frequent retrain→deploy cycles, with a periodic full rebuild to
        shed drift. ``"reuse"`` on a service with no aux structures is a
        no-op equal to ``"rebuild"``.
        """
        if aux not in ("rebuild", "reuse"):
            raise ValueError(f"aux must be 'rebuild' or 'reuse', got {aux!r}")
        with self._reload_lock:
            path = index_path or self.index_path
            index = EmbeddingIndex.load(path)
            kwargs = dict(self._service_kwargs)
            old, old_batcher = self._serving
            if aux == "reuse":
                if old.ivf is not None:
                    kwargs["ivf_warm_from"] = old.ivf
                if old.pq is not None:
                    kwargs["pq_warm_from"] = old.pq
            # rebuild aux indexes for the NEW catalog (never load a cache
            # built for the old one); recover build params from the running
            # service when config only had a prebuilt path
            ivf_path = _npz_path(kwargs.pop("ivf_index_path", None))
            pq_path = _npz_path(kwargs.pop("pq_index_path", None))
            if ivf_path and not kwargs.get("ivf_clusters"):
                # derive ONCE and persist: old.ivf.n_clusters is the
                # POST-split count when ivf_max_cell is set, so re-deriving
                # from the current service every reload would ratchet C
                # upward across deploy cycles
                kwargs["ivf_clusters"] = old.ivf.n_clusters
                self._service_kwargs["ivf_clusters"] = old.ivf.n_clusters
            if pq_path and not kwargs.get("pq_subspaces"):
                kwargs["pq_subspaces"] = old.pq.n_subspaces
                kwargs["pq_codes"] = old.pq.n_codes
                kwargs["pq_rotate"] = old.pq.rotation is not None
                kwargs["pq_anisotropic"] = old.pq.anisotropic_threshold
                self._service_kwargs.update(
                    pq_subspaces=kwargs["pq_subspaces"],
                    pq_codes=kwargs["pq_codes"],
                    pq_rotate=kwargs["pq_rotate"],
                    pq_anisotropic=kwargs["pq_anisotropic"])
            service = RetrievalService(index, **kwargs)
            if ivf_path and service.ivf is not None:
                service.ivf.save(ivf_path)
            if pq_path and service.pq is not None:
                service.pq.save(pq_path)
            # surface silently-changing aux geometry: params that a
            # prebuilt cache overrode at startup take effect now
            if (old.pq is not None and service.pq is not None
                    and (old.pq.n_subspaces != service.pq.n_subspaces
                         or old.pq.n_codes != service.pq.n_codes)):
                log.warning("reload changed pq S=%d C=%d -> S=%d C=%d",
                            old.pq.n_subspaces, old.pq.n_codes,
                            service.pq.n_subspaces, service.pq.n_codes)
            if (old.ivf is not None and service.ivf is not None
                    and old.ivf.n_clusters != service.ivf.n_clusters):
                log.warning("reload changed ivf C=%d -> C=%d",
                            old.ivf.n_clusters, service.ivf.n_clusters)
            batcher = (QueryBatcher(service, max_wait_ms=self._max_wait_ms)
                       if self._coalesce else None)
            # ONE-attribute swap: handlers read the pair atomically
            self._serving = (service, batcher)
            self.index_path = path
            self.reloads += 1
            if old_batcher is not None:
                self._retire_batcher(old_batcher)
            log.info("reloaded %s: %d items (dim %d)", path, len(index),
                     service.dim)


def serve(index_path: str, host: str = "127.0.0.1", port: int = 8000,
          max_k: int = 100, max_batch: int = 8,
          encoders: Optional[Dict[str, Callable]] = None,
          coalesce: bool = True,
          max_wait_ms: float = 2.0,
          approx: bool = False,
          recall_target: float = 0.95,
          fused: bool = False,
          fused_bins: int = 4096,
          quantized: bool = False,
          rescore_int8: bool = False,
          ivf_clusters: Optional[int] = None,
          nprobe: int = 8,
          ivf_iters: int = 20,
          ivf_max_cell: Optional[int] = None,
          build_train_sample: Optional[int] = None,
          ivf_index_path: Optional[str] = None,
          pq_subspaces: Optional[int] = None,
          pq_codes: int = 256,
          pq_iters: int = 15,
          pq_oversample: int = 64,
          pq_rotate: bool = False,
          pq_anisotropic: Optional[float] = None,
          pq_index_path: Optional[str] = None,
          n_model_shards: Optional[int] = None,
          add_capacity: int = 0,
          filters: Optional[Dict[str, Sequence[str]]] = None,
          admin_token: Optional[str] = None) -> ThreadingHTTPServer:
    """Load an index and return a ready (not yet running) HTTP server.

    Call ``.serve_forever()`` to block, or run it in a thread for tests.
    ``coalesce`` batches concurrent requests into the one compiled query
    (QueryBatcher); ``encoders`` enables raw-text / image-key queries;
    ``approx`` switches the query path to hardware ``approx_max_k``
    candidate selection + exact rescore (~2.9x the exact path at
    ``recall_target`` overlap on a 2.26M catalog — BENCHMARKS.md);
    ``quantized`` scans the catalog in int8 with an exact rescore (4x less
    HBM traffic; composes with ``approx``); ``ivf_clusters`` builds a
    k-means inverted file at startup and probes ``nprobe`` cells per query
    (sublinear — retrieval/ivf.py; composes with ``quantized``);
    ``ivf_index_path`` loads a prebuilt inverted file if present, else
    builds and saves there (restarts skip the k-means);
    ``pq_subspaces`` switches the scan to S-byte-per-item PQ codes with an
    exact rescore (retrieval/pq.py — exclusive with approx/quantized;
    combined WITH ``ivf_clusters`` it becomes IVF-PQ: sublinear probe +
    ADC candidate scoring + exact rescore, retrieval/ivf.ivf_pq_topk).
    """
    index = EmbeddingIndex.load(index_path)
    service_kwargs = dict(max_k=max_k, max_batch=max_batch,
                          encoders=encoders, approx=approx,
                          recall_target=recall_target,
                          fused=fused, fused_bins=fused_bins,
                          quantized=quantized,
                          rescore_int8=rescore_int8,
                          ivf_clusters=ivf_clusters, nprobe=nprobe,
                          ivf_iters=ivf_iters, ivf_max_cell=ivf_max_cell,
                          build_train_sample=build_train_sample,
                          ivf_index_path=ivf_index_path,
                          pq_subspaces=pq_subspaces, pq_codes=pq_codes,
                          pq_iters=pq_iters,
                          pq_oversample=pq_oversample,
                          pq_rotate=pq_rotate,
                          pq_anisotropic=pq_anisotropic,
                          pq_index_path=pq_index_path,
                          n_model_shards=n_model_shards,
                          add_capacity=add_capacity,
                          filters=filters)
    service = RetrievalService(index, **service_kwargs)
    batcher = QueryBatcher(service, max_wait_ms=max_wait_ms) if coalesce else None
    httpd = RetrievalHTTPServer((host, port), _Handler)
    httpd._configure(index_path, service_kwargs, coalesce, max_wait_ms)
    # the pair is one attribute (atomic reload swap); .service/.batcher
    # read-only properties expose it for tests/tools
    httpd._serving = (service, batcher)
    # /admin/* auth: reload loads an arbitrary npz path and triggers
    # device-heavy rebuilds — REQUIRED when binding beyond localhost
    httpd.admin_token = admin_token
    if host not in ("127.0.0.1", "localhost", "::1") and not admin_token:
        log.warning("serving on %s without --admin_token: /admin/reload is "
                    "open to any client that can reach this port", host)
    log.info("serving %d items (dim %d) on %s:%d", len(index), service.dim,
             host, port)
    return httpd


def main(argv=None):
    import argparse

    from esrecsys_tpu.axon_preflight import warn_cpu_fallback

    warn_cpu_fallback(log)

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_k", type=int, default=100)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--no_coalesce", action="store_true")
    p.add_argument("--approx", action="store_true",
                   help="approx_max_k candidate selection + exact rescore "
                        "(~2.9x exact throughput at --recall_target overlap)")
    p.add_argument("--recall_target", type=float, default=0.95)
    p.add_argument("--fused", action="store_true",
                   help="Pallas fused scan+select kernel "
                        "(retrieval/fused.py): selection happens in VMEM "
                        "during the scan — fastest chip mode at 2.26M "
                        "items/k=500 (3.3x exact, 1.15x approx at higher "
                        "overlap; BENCHMARKS.md); +2*D bytes/item for "
                        "the bf16 transposed scan copy")
    p.add_argument("--fused_bins", type=int, default=4096,
                   help="fused-mode bin count L (recall rises ~L^2; VMEM "
                        "auto-caps it at the compiled batch width)")
    p.add_argument("--quantized", action="store_true",
                   help="int8 catalog scan + exact full-precision rescore "
                        "(4x less HBM traffic; composes with --approx)")
    p.add_argument("--rescore_int8", action="store_true",
                   help="drop the resident f32 catalog: the candidate "
                        "rescore dequantizes int8 rows instead (requires "
                        "--quantized or a pq mode). Residency falls to "
                        "S+D+4 bytes/item (pq) or D+4 (int8) vs 4*D+ — "
                        "serves catalogs whose f32 form outgrows HBM; "
                        "returned scores carry <=0.4%-of-row-max int8 "
                        "rounding. With prebuilt --ivf_index/--pq_index "
                        "caches the f32 matrix is never uploaded at all")
    p.add_argument("--ivf_clusters", type=int, default=0,
                   help="build a k-means inverted file with this many cells "
                        "at startup; probe --nprobe cells per query "
                        "(sublinear; composes with --quantized)")
    p.add_argument("--nprobe", type=int, default=8)
    p.add_argument("--ivf_iters", type=int, default=20,
                   help="k-means iterations for a fresh IVF build")
    p.add_argument("--build_train_sample", type=int, default=0,
                   help="train startup IVF/PQ k-means on this many sampled "
                        "rows instead of the full catalog (one full encode "
                        "pass still runs) — ~iters-fold cheaper builds at "
                        "big M, negligible recall cost (BENCHMARKS.md "
                        "'Sample-trained index builds'); 262144 is a solid "
                        "default for C<=4096 cells / 256 codes")
    p.add_argument("--ivf_max_cell", type=int, default=0,
                   help="cap IVF cell size: oversized cells are split "
                        "(balanced median cuts), shrinking the padded "
                        "probe width nprobe×Lmax that every query pays; "
                        "try 2×(items/clusters) on imbalanced catalogs")
    p.add_argument("--ivf_index", default="",
                   help="path to a prebuilt inverted file (.npz): loaded if "
                        "present, else built from --ivf_clusters and saved "
                        "here so restarts skip the k-means")
    p.add_argument("--pq_subspaces", type=int, default=0,
                   help="scan PQ codes of this many bytes/item instead of "
                        "the f32 catalog (16x less scan traffic at D=32/S=8)"
                        " with an exact candidate rescore; exclusive with "
                        "--approx/--quantized; combined with --ivf_clusters "
                        "it becomes IVF-PQ (sublinear + compressed)")
    p.add_argument("--pq_codes", type=int, default=256,
                   help="PQ codebook entries per subspace (<=256)")
    p.add_argument("--pq_iters", type=int, default=15,
                   help="PQ codebook k-means iterations (pin this to the "
                        "value a calibration tuned with — "
                        "tools/retrieval_autotune emits it)")
    p.add_argument("--pq_oversample", type=int, default=64,
                   help="exact-rescore candidate budget ~oversample*max_k "
                        "(default matches the measured MPD-scale optimum: "
                        "0.988 overlap@10 at a ~6k-row rescore; 256 is "
                        "exact there — BENCHMARKS.md)")
    p.add_argument("--pq_rotate", action="store_true",
                   help="train the PQ codebook in a random-orthonormal "
                        "rotated space (OPQ-lite): balances per-subspace "
                        "variance on anisotropic catalogs; queries are "
                        "rotated at search, rescore stays exact")
    p.add_argument("--pq_anisotropic", type=float, default=0.0,
                   help="train the PQ codebook under the score-aware "
                        "(anisotropic) loss with this threshold T "
                        "(e.g. 0.2; needs T >= 1/sqrt(dim)) — spends code "
                        "distortion on the MIPS-relevant parallel "
                        "direction; raises raw-ADC/small-oversample "
                        "recall at zero search-time cost "
                        "(retrieval/pq.anisotropic_eta)")
    p.add_argument("--pq_index", default="",
                   help="path to a prebuilt PQ codebook (.npz): loaded if "
                        "present, else built from --pq_subspaces and saved "
                        "here so restarts skip codebook training")
    p.add_argument("--admin_token", default="",
                   help="require this X-Admin-Token header on /admin/* "
                        "(reload loads arbitrary npz paths and triggers "
                        "device-heavy rebuilds — set it whenever --host "
                        "is not localhost)")
    p.add_argument("--n_model_shards", type=int, default=0,
                   help="shard the catalog's rows over this many devices "
                        "on the mesh's model axis (serve catalogs beyond "
                        "one chip's HBM; exact sharded scan — composes "
                        "with --quantized/--rescore_int8 or --fused)")
    p.add_argument("--add_capacity", type=int, default=0,
                   help="preallocate this many extra catalog rows so "
                        "POST /admin/add_items can append items live with "
                        "zero recompiles (full-scan modes: exact/approx/"
                        "int8/pq; ivf/sharded grow via /admin/reload)")
    p.add_argument("--filters_json", default="",
                   help="enable filtered retrieval: a JSON file of "
                        '{"name": ["catalog id", ...], ...} eligibility '
                        "lists; queries pass \"filter\": name to only see "
                        "those rows (device-side mask, both scan phases). "
                        "'{}' enables the path with no masks yet — "
                        "register via POST /admin/set_filter")
    # query-side model inference (serving/encoders.py)
    p.add_argument("--txt2url_artifact", default="",
                   help="enable 'text' queries via this trained artifact")
    p.add_argument("--token_dictionary", default="")
    p.add_argument("--stl_artifact", default="",
                   help="enable 'image_key' queries via this trained artifact")
    p.add_argument("--image_dir", default="")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)
    from esrecsys_tpu.serving import encoders as encoders_lib

    enc = {}
    if args.txt2url_artifact:
        enc["text"] = encoders_lib.txt2url_text_encoder(
            args.txt2url_artifact, args.token_dictionary)
    if args.stl_artifact:
        enc["image_key"] = encoders_lib.stl_image_encoder(
            args.stl_artifact, args.image_dir)
    serve(args.index, args.host, args.port, args.max_k, args.max_batch,
          encoders=enc, coalesce=not args.no_coalesce,
          approx=args.approx,
          recall_target=args.recall_target,
          fused=args.fused,
          fused_bins=args.fused_bins,
          quantized=args.quantized,
          rescore_int8=args.rescore_int8,
          ivf_clusters=args.ivf_clusters or None,
          nprobe=args.nprobe,
          ivf_iters=args.ivf_iters,
          ivf_max_cell=args.ivf_max_cell or None,
          build_train_sample=args.build_train_sample or None,
          ivf_index_path=args.ivf_index or None,
          pq_subspaces=args.pq_subspaces or None,
          pq_codes=args.pq_codes,
          pq_iters=args.pq_iters,
          pq_oversample=args.pq_oversample,
          pq_rotate=args.pq_rotate,
          pq_anisotropic=args.pq_anisotropic or None,
          pq_index_path=args.pq_index or None,
          n_model_shards=args.n_model_shards or None,
          add_capacity=args.add_capacity,
          filters=(json.loads(
              args.filters_json if args.filters_json.strip().startswith("{")
              else open(args.filters_json).read())
              if args.filters_json else None),
          admin_token=args.admin_token or None).serve_forever()


if __name__ == "__main__":
    main()
