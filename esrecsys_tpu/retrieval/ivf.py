"""IVF (inverted-file) approximate retrieval: sublinear search over big
catalogs via on-device k-means partitioning.

The exact/approx/quantized paths (:mod:`esrecsys_tpu.retrieval.mips`) all
stream the WHOLE catalog per query batch — cost linear in catalog size no
matter how good the levers. IVF adds the standard sublinear alternative:
partition the catalog into ``n_clusters`` cells with k-means, then score a
query only against the ``nprobe`` cells whose centroids it matches best —
``nprobe/n_clusters`` of the catalog touched per query (times imbalance).

TPU-shaped throughout:
  * k-means assignment is a blocked ``(block, D) @ (D, C)`` matmul under
    ``lax.map`` (MXU; peak memory O(block × C), never O(M × C)), centroid
    update is one ``segment_sum`` scatter-add — both inside one jitted
    ``lax.scan`` over iterations, static shapes everywhere.
  * the cell layout is a dense padded (C, Lmax) id table (pad -1), so probe
    search is gather + one batched einsum + ``top_k`` — no ragged shapes,
    compiled exactly once. Because EVERY probe pays the padded width,
    ``IVFIndex.build(max_cell=...)`` caps cell size by balanced splitting
    (clustered catalogs are heavy-tailed; measured 5.4× imbalance at MPD
    scale, BENCHMARKS.md).
  * search composes with the int8 path: pass ``q_items``/``item_scales``
    (from :func:`esrecsys_tpu.retrieval.mips.quantize_rows`) and the
    candidate scan gathers int8 rows (4× less gather traffic), with an
    exact full-precision rescore of the final k.

No reference counterpart: the reference scores full matrices per query
(pinterest/make_recommendations.py:49-65, spotify/train_spotify.py:113-131).
Sublinear retrieval is what makes the serving path survive catalogs that
outgrow brute force.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from esrecsys_tpu.core.mesh import pad_to_multiple
from esrecsys_tpu.retrieval.mips import NEG_INF


def kmeans_assign(items: jax.Array, centroids: jax.Array,
                  block_size: int = 65_536) -> jax.Array:
    """Blocked nearest-centroid assignment: (M, D) × (C, D) → (M,) int32.

    L2 argmin dropping the ``|x|²`` term (constant per row). Streamed in
    fixed blocks so the (block, C) distance tile — not an (M, C) matrix —
    is the working set, the same discipline as the MIPS scans.
    """
    items = items.astype(jnp.float32)
    m = items.shape[0]
    block = min(block_size, pad_to_multiple(m, 128))
    mp = pad_to_multiple(m, block)
    items_p = jnp.pad(items, ((0, mp - m), (0, 0)))
    cn = jnp.sum(centroids * centroids, axis=-1)  # (C,)

    def blk(start):
        x = jax.lax.dynamic_slice_in_dim(items_p, start, block, axis=0)
        s = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
        return jnp.argmin(cn[None, :] - 2.0 * s, axis=-1).astype(jnp.int32)

    nblk = mp // block
    out = jax.lax.map(blk, jnp.arange(nblk, dtype=jnp.int32) * block)
    return out.reshape(-1)[:m]


def kmeans(items: jax.Array, n_clusters: int, iters: int = 20, seed: int = 0,
           block_size: int = 65_536,
           train_sample: Optional[int] = None,
           ) -> Tuple[jax.Array, jax.Array]:
    """Blocked L2 k-means on device.

    Returns ``(centroids (C, D) f32, assignments (M,) int32)``. Empty
    clusters keep their previous centroid (deterministic; they stay
    candidates for reassignment next iteration). Distances drop the
    ``|x|²`` term (constant per row for the argmin).

    ``train_sample=N`` (N < M) trains the centroids on a seeded uniform
    N-row subsample, then assigns the FULL catalog once — the standard
    big-catalog k-means recipe (centroid quality saturates long before
    M rows; Lloyd cost is O(M·C·D·iters), so sampling converts the
    dominant build cost into one O(M·C·D) encode pass). Measured at MPD
    scale in BENCHMARKS.md ("Sample-trained index builds").
    """
    items = items.astype(jnp.float32)
    m, d = items.shape
    if n_clusters > m:
        raise ValueError(f"n_clusters {n_clusters} > items {m}")

    key = jax.random.PRNGKey(seed)
    train = items
    if train_sample is not None and train_sample < m:
        if train_sample < n_clusters:
            raise ValueError(
                f"train_sample {train_sample} < n_clusters {n_clusters}")
        key, sk = jax.random.split(key)
        rows = jax.random.choice(sk, m, (train_sample,), replace=False)
        train = jnp.take(items, rows, axis=0)
    mt = train.shape[0]

    # distinct random rows as init (k-means++ is sequential — hostile to a
    # single compiled program; random init + iters is standard for IVF)
    init_rows = jax.random.choice(key, mt, (n_clusters,), replace=False)
    cent0 = jnp.take(train, init_rows, axis=0)

    def step(cent, _):
        a = kmeans_assign(train, cent, block_size)
        sums = jax.ops.segment_sum(train, a, num_segments=n_clusters)
        counts = jax.ops.segment_sum(jnp.ones((mt,), jnp.float32), a,
                                     num_segments=n_clusters)
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts, 1.0)[:, None], cent)
        return new, None

    cent, _ = jax.lax.scan(step, cent0, None, length=iters)
    return cent, kmeans_assign(items, cent, block_size)


def _split_to_cap(ids: np.ndarray, x: np.ndarray, cap: int,
                  power_iters: int = 8) -> list:
    """Recursively split a cell (global ``ids``, rows ``x`` float64) into
    balanced parts of size <= ``cap``; returns ``[(ids, centroid f32)]``.

    Each split is a median cut on the cell's top principal direction
    (host-side power iteration, deterministic). Median guarantees balance
    (the point of the cap); the principal direction keeps each half
    geometrically coherent so its mean is a meaningful probe centroid.
    Zero-variance cells fall back to an index-order cut.
    """
    if ids.size <= cap:
        return [(ids, x.mean(axis=0).astype(np.float32))]
    xc = x - x.mean(axis=0)
    v = np.ones((x.shape[1],), np.float64)
    for _ in range(power_iters):
        v = xc.T @ (xc @ v)
        n = np.linalg.norm(v)
        if n < 1e-12:  # zero variance: any balanced cut works
            v = None
            break
        v /= n
    order = (np.arange(ids.size) if v is None
             else np.argsort(xc @ v, kind="stable"))
    half = ids.size // 2  # argsort-median: exact halves even with ties
    lo, hi = order[:half], order[half:]
    return (_split_to_cap(ids[lo], x[lo], cap, power_iters)
            + _split_to_cap(ids[hi], x[hi], cap, power_iters))


def _assemble_cells(cents: list, assign: np.ndarray, vectors,
                    max_cell: Optional[int]) -> "IVFIndex":
    """Host-side tail shared by build/reassign: assignment → cell lists →
    optional balanced splitting of over-cap cells → dense padded table."""
    n_clusters = len(cents)
    order = np.argsort(assign, kind="stable")
    counts = np.bincount(assign, minlength=n_clusters)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    cells = [order[starts[c]: starts[c] + counts[c]].astype(np.int64)
             for c in range(n_clusters)]
    if max_cell is not None:
        if max_cell < 1:
            raise ValueError(f"max_cell must be >= 1, got {max_cell}")
        # host catalogs index in numpy; device catalogs gather on
        # device and pull ONLY the oversized cell's rows (never
        # jnp.asarray(host_array) per cell — that re-uploads the whole
        # catalog each iteration on tunneled links)
        host_vecs = vectors if isinstance(vectors, np.ndarray) else None
        for slot in [i for i, g in enumerate(cells)
                     if g.size > max_cell]:
            g = cells[slot]
            if host_vecs is not None:
                x = host_vecs[g].astype(np.float64)
            else:
                x = np.asarray(jax.device_get(jnp.take(
                    vectors, jnp.asarray(g), axis=0)), np.float64)
            parts = _split_to_cap(g, x, max_cell)
            (cells[slot], cents[slot]) = parts[0]
            for ids_p, cent_p in parts[1:]:
                cells.append(ids_p)
                cents.append(cent_p)
    counts = np.array([g.size for g in cells])
    lmax = max(int(counts.max()), 1)
    table = np.full((len(cells), lmax), -1, np.int32)
    for c, g in enumerate(cells):
        table[c, : g.size] = g
    return IVFIndex(np.stack(cents).astype(np.float32), table,
                    vectors.shape[0])


class IVFIndex(NamedTuple):
    """Built IVF layout: centroids + dense padded cell id table."""

    centroids: np.ndarray   # (C, D) f32
    bucket_ids: np.ndarray  # (C, Lmax) int32, pad -1
    n_items: int

    @property
    def n_clusters(self) -> int:
        return self.centroids.shape[0]

    @property
    def imbalance(self) -> float:
        """Lmax / mean cell size — the probe-cost multiplier vs perfectly
        balanced cells (probe search pays padded cells)."""
        return self.bucket_ids.shape[1] * self.n_clusters / max(self.n_items, 1)

    @classmethod
    def build(cls, vectors, n_clusters: int, iters: int = 20,
              seed: int = 0, max_cell: Optional[int] = None,
              train_sample: Optional[int] = None) -> "IVFIndex":
        """k-means on device, cell table assembled host-side (one-time).

        ``vectors`` may be a host np.ndarray or an ALREADY-resident device
        array (``jnp.asarray`` is then a no-op) — callers holding the
        catalog on device (RetrievalService) must pass that, not the host
        copy, to avoid a second full-catalog upload.

        ``max_cell`` caps cell size: probe cost is ``nprobe × Lmax`` (the
        padded table width), so one popular cell taxes EVERY probe — the
        measured imbalance on clustered MPD-scale catalogs is 5.4×
        (BENCHMARKS.md "Retrieval quality at MPD scale"). Cells over the
        cap are recursively median-split on their principal direction
        (balanced, deterministic; subcell centroid = member mean), which
        grows C a little and shrinks Lmax a lot. Only the oversized cells'
        rows are pulled to host. A natural cap is
        ``2 * n_items / n_clusters`` (2× the mean cell).

        ``train_sample=N`` trains the k-means centroids on an N-row
        subsample and pays only one full-catalog assign pass — cuts the
        dominant build cost ~iters× at big M (see :func:`kmeans`).
        """
        cent, assign = jax.jit(
            kmeans, static_argnums=(1, 2, 3),
            static_argnames=("train_sample",))(
            jnp.asarray(vectors, jnp.float32), n_clusters, iters, seed,
            train_sample=train_sample)
        cent = np.asarray(jax.device_get(cent))
        a = np.asarray(jax.device_get(assign))
        return _assemble_cells(list(cent), a, vectors, max_cell)

    def reassign(self, vectors, max_cell: Optional[int] = None) -> "IVFIndex":
        """Warm-start layout for a NEW catalog: keep these trained
        centroids verbatim, pay ONE blocked assign pass + host table
        assembly — no k-means at all.

        The continuous-deployment move (serving/server.py /admin/reload
        ``aux: "reuse"``): successive retrain cycles shift embeddings
        little, so yesterday's centroids still partition today's catalog
        well, and assignment is the ~iters×-cheaper tail of a build (the
        same pass :func:`kmeans` ``train_sample`` reduces a build TO).
        Drift accumulates across many reuse cycles — schedule a periodic
        full rebuild.

        ``max_cell`` re-applies the balanced-split cap (the new catalog
        may overfill a cell the cap had kept small); splitting grows
        ``n_clusters``, so carrying it across many reuse cycles grows C
        monotonically — another reason to rebuild periodically.
        """
        if vectors.shape[1] != self.centroids.shape[1]:
            raise ValueError(
                f"catalog dim {vectors.shape[1]} != ivf centroid dim "
                f"{self.centroids.shape[1]}")
        if isinstance(vectors, jax.Array):
            dev = vectors.astype(jnp.float32)
        else:  # host catalog: chunked upload (tunneled links stall >100 MB)
            from esrecsys_tpu.core.transfer import chunked_device_put

            dev = chunked_device_put(np.asarray(vectors, np.float32))
        a = np.asarray(jax.device_get(jax.jit(kmeans_assign)(
            dev, jnp.asarray(self.centroids))))
        return _assemble_cells(list(self.centroids), a, vectors, max_cell)

    def save(self, path: str) -> None:
        np.savez_compressed(path, centroids=self.centroids,
                            bucket_ids=self.bucket_ids,
                            n_items=np.int64(self.n_items))

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        with np.load(path, allow_pickle=False) as z:
            return cls(z["centroids"], z["bucket_ids"], int(z["n_items"]))


def _probe_candidates(qf, centroids, bucket_ids, nprobe):
    """Shared probe prelude: score coarse centroids, take the ``nprobe``
    best cells per query, flatten their (padded) member ids.

    Returns ``(cand (B, P*L) int32 with -1 pads, valid mask, safe ids)``.
    """
    c, l = bucket_ids.shape
    cs = jnp.dot(qf, centroids.T, preferred_element_type=jnp.float32)
    _, probes = jax.lax.top_k(cs, nprobe)  # (B, P)
    cand = jnp.take(bucket_ids, probes.reshape(-1), axis=0)
    cand = cand.reshape(qf.shape[0], nprobe * l)
    return cand, cand >= 0, jnp.maximum(cand, 0)


def _pad_topk_to_k(vals, idxs, k, k_eff):
    """Shared tail: sanitize -inf slot indices to 0 and honor the
    requested ``k`` with -inf padding when ``k_eff < k``."""
    idxs = jnp.where(jnp.isfinite(vals), idxs, 0)
    if k_eff < k:
        pad = k - k_eff
        vals = jnp.pad(vals, [(0, 0)] * (vals.ndim - 1) + [(0, pad)],
                       constant_values=NEG_INF)
        idxs = jnp.pad(idxs, [(0, 0)] * (idxs.ndim - 1) + [(0, pad)])
    return vals, idxs


def ivf_topk(
    queries: jax.Array,      # (B, D)
    centroids: jax.Array,    # (C, D)
    bucket_ids: jax.Array,   # (C, L) int32, pad -1
    items: jax.Array,        # (M, D) full-precision catalog
    k: int,
    nprobe: int,
    q_items: Optional[jax.Array] = None,     # (M, D) int8: int8 probe scan
    item_scales: Optional[jax.Array] = None,  # (M,) f32
    rescore_scales: Optional[jax.Array] = None,  # (M,): items is int8
    item_mask: Optional[jax.Array] = None,   # (M,) bool: filtered retrieval
) -> Tuple[jax.Array, jax.Array]:
    """Probe the ``nprobe`` best cells per query, exact top-k within them.

    Returned scores are full-precision dots (``Precision.HIGHEST``) of the
    returned indices. With ``q_items``/``item_scales``, candidate scoring
    gathers int8 rows instead of f32 (4× less gather traffic; per-item
    scales preserve cross-item ranking, per-query scales drop out) and only
    the final k are rescored from ``items`` — selection error is bounded by
    int8 rounding exactly as in
    :func:`~esrecsys_tpu.retrieval.mips.quantized_topk_over_matrix`.

    With ``rescore_scales`` (requires ``q_items``), ``items`` is the int8
    catalog itself (pass ``items=q_items``) and the final-k rescore
    dequantizes — no f32 catalog resident; the unquantized query side
    still sharpens phase-1 scores (see quantized_topk_over_matrix).

    Recall is governed by ``nprobe``: items whose cell the query does not
    probe are unreachable (that is the sublinear trade; measured curves in
    tests/test_ivf.py and BENCHMARKS.md). ``nprobe == n_clusters`` scans
    every cell and recovers the exact result.
    """
    c, l = bucket_ids.shape
    nprobe = min(nprobe, c)
    qf = queries.astype(jnp.float32)
    cand, valid, safe = _probe_candidates(qf, centroids, bucket_ids, nprobe)
    if q_items is not None:
        from esrecsys_tpu.retrieval.mips import quantize_rows

        qq, _ = quantize_rows(queries)  # query scale is rank-invariant
        rows_q = jnp.take(q_items, safe, axis=0)  # (B, PL, D) int8
        s = jnp.einsum("bd,bnd->bn", qq, rows_q,
                       preferred_element_type=jnp.int32).astype(jnp.float32)
        s = s * jnp.take(item_scales, safe, axis=0)
    else:
        rows = jnp.take(items, safe, axis=0)  # (B, PL, D)
        s = jnp.einsum("bd,bnd->bn", qf, rows,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if item_mask is not None:  # filtered retrieval: candidate eligibility
        valid = valid & jnp.take(item_mask, safe, axis=0)
    s = jnp.where(valid, s, NEG_INF)
    k_eff = min(k, nprobe * l)
    vals, sel = jax.lax.top_k(s, k_eff)
    idxs = jnp.take_along_axis(cand, sel, axis=-1)
    if q_items is not None:
        # exact rescore of the selected k only, then re-sort
        safe_k = jnp.maximum(idxs, 0)
        rows = jnp.take(items, safe_k, axis=0)
        if rescore_scales is not None:
            rows = rows.astype(jnp.float32) * jnp.take(
                rescore_scales, safe_k, axis=0)[..., None]
        rv = jnp.einsum("bd,bnd->bn", qf, rows,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        vals = jnp.where(jnp.isfinite(vals), rv, NEG_INF)
        vals, order = jax.lax.top_k(vals, k_eff)
        idxs = jnp.take_along_axis(idxs, order, axis=-1)
    return _pad_topk_to_k(vals, idxs, k, k_eff)


def ivf_pq_topk(
    queries: jax.Array,       # (B, D)
    centroids: jax.Array,     # (C, D) coarse probe centroids
    bucket_ids: jax.Array,    # (C, L) int32, pad -1
    items: jax.Array,         # (M, D) full-precision OR int8 rescore catalog
    k: int,
    nprobe: int,
    pq_centroids: jax.Array,  # (S, Cc, Ds) f32 (retrieval/pq.py codebooks)
    pq_codes: jax.Array,      # (M, S) uint8
    oversample: int = 4,
    rotation: Optional[jax.Array] = None,
    item_scales: Optional[jax.Array] = None,  # (M,) f32: items is int8
    item_mask: Optional[jax.Array] = None,    # (M,) bool: filtered retrieval
) -> Tuple[jax.Array, jax.Array]:
    """IVF-PQ: sublinear probe + compressed candidate scoring + exact
    rescore — the standard big-catalog composition (inverted file over PQ
    codes), absent from the reference entirely.

    Probe selection is identical to :func:`ivf_topk`; candidate scoring
    gathers S BYTES per candidate (the PQ codes) instead of 4·D f32 or D
    int8 — at D=32/S=8 that is 16×/4× less candidate gather traffic — and
    sums S per-query LUT lookups (ADC, :mod:`esrecsys_tpu.retrieval.pq`).
    The top ``min(oversample·k, nprobe·L)`` ADC candidates are rescored
    exactly from ``items`` and the final k returned with full-precision
    scores. Selection error therefore has two bounded sources: cells not
    probed (``nprobe``, as in ivf_topk) and ADC ranking inside probed cells
    (``oversample``, as in pq_topk); ``nprobe == n_clusters`` plus an
    oversample covering ``nprobe·L`` recovers the exact result (tested).

    ``rotation`` must be the codebook's pre-rotation when one was trained.
    With ``item_scales``, ``items`` is the int8 catalog from
    :func:`~esrecsys_tpu.retrieval.mips.quantize_rows` and the rescore
    dequantizes the gathered candidates — the resident catalog then costs
    S+D+4 bytes/item instead of S+4·D, with ≤ 0.4%-of-row-max int8
    rounding in the returned scores (see pq.pq_topk ``rescore_scales``).
    """
    from esrecsys_tpu.retrieval.pq import adc_lut  # lazy: pq imports ivf

    c, l = bucket_ids.shape
    s_sub = pq_centroids.shape[0]
    nprobe = min(nprobe, c)
    qf = queries.astype(jnp.float32)
    cand, valid, safe = _probe_candidates(qf, centroids, bucket_ids, nprobe)
    lut = adc_lut(qf, pq_centroids, rotation)  # (B, S, Cc)
    rows_c = jnp.take(pq_codes, safe, axis=0)  # (B, PL, S) uint8
    s = jnp.zeros(cand.shape, jnp.float32)
    for sub in range(s_sub):  # S is small and static: unrolled gathers
        s = s + jnp.take_along_axis(
            lut[:, sub, :], rows_c[:, :, sub].astype(jnp.int32), axis=-1)
    if item_mask is not None:  # filtered retrieval: candidate eligibility
        valid = valid & jnp.take(item_mask, safe, axis=0)
    s = jnp.where(valid, s, NEG_INF)

    # exact rescore of the oversampled ADC top set, then the final k
    n_cand = min(max(oversample * k, k), nprobe * l)
    adc_vals, sel = jax.lax.top_k(s, n_cand)
    idxs = jnp.take_along_axis(cand, sel, axis=-1)
    safe_idx = jnp.maximum(idxs, 0)
    rows = jnp.take(items, safe_idx, axis=0)  # (B, n_cand, D)
    if item_scales is not None:
        rows = rows.astype(jnp.float32) * jnp.take(
            item_scales, safe_idx, axis=0)[..., None]
    rv = jnp.einsum("bd,bnd->bn", qf, rows,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    rv = jnp.where(jnp.isfinite(adc_vals), rv, NEG_INF)
    k_eff = min(k, n_cand)
    vals, order = jax.lax.top_k(rv, k_eff)
    idxs = jnp.take_along_axis(idxs, order, axis=-1)
    return _pad_topk_to_k(vals, idxs, k, k_eff)
