"""Product quantization (PQ): few-bytes-per-item catalog codes (default
8) for catalogs whose dense form outgrows HBM.

The scan paths in :mod:`esrecsys_tpu.retrieval.mips` need the catalog
resident as f32 (4·D bytes/item) or int8 (D bytes/item). PQ compresses to
``n_subspaces`` bytes/item (default 8 — 16× smaller than f32 at D=32):
the dimension axis is split into S subspaces, each subspace gets its own
256-entry k-means codebook, and an item is stored as its S nearest-centroid
ids. A query scores an item as the sum of S table lookups (ADC — the
query·centroid dot products are precomputed per query into a (S, 256) LUT),
so the scan streams only the codes.

TPU-shaped:
  * codebook training reuses :func:`esrecsys_tpu.retrieval.ivf.kmeans`
    (blocked MXU assignment matmuls) once per subspace — every subspace has
    identical shapes, so the trainer compiles once;
  * the LUT build is one ``(B, S, Ds) × (S, C, Ds)`` einsum; block scoring
    is S gathers from the per-query LUT summed on the VPU, streamed with
    the same two-phase skeleton as the int8/approx scans
    (:func:`~esrecsys_tpu.retrieval.mips._streamed_candidate_topk`), so
    candidate selection is PQ-approximate and the returned ranking is an
    exact rescore of the selected candidates whenever a full-precision
    catalog is resident for phase 2.

When even a rescore catalog cannot be resident, ``rescore_items=None``
returns the raw ADC ranking — quality is then bounded by PQ distortion
alone (measure it per catalog:
``tools/retrieval_quality_study.py --pq_subspaces S``). Two levers move
that bound at ZERO search-time cost: ``rotate`` (OPQ-lite variance
balancing) and ``anisotropic_threshold`` (score-aware training — spend
the 256 codes' distortion budget on the direction that perturbs MIPS
scores; :func:`anisotropic_eta`).

No reference counterpart (the reference scores full f32 matrices,
pinterest/make_recommendations.py:49-65; its largest catalog fits HBM).
PQ is what lets the serving path survive catalogs 10-100× beyond that.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from esrecsys_tpu.core.mesh import pad_to_multiple
from esrecsys_tpu.core.transfer import chunked_device_put
from esrecsys_tpu.retrieval.ivf import kmeans, kmeans_assign
from esrecsys_tpu.retrieval.mips import (NEG_INF, _streamed_candidate_topk,
                                         chunked_topk)


def anisotropic_eta(threshold: float, d: int) -> float:
    """Parallel/orthogonal weight ratio for the score-aware PQ loss.

    For MIPS, quantization error PARALLEL to the datapoint perturbs the
    scores of exactly the queries that would rank it highly; orthogonal
    error mostly perturbs scores that were low anyway. The score-aware
    loss therefore weights the parallel residual ``eta`` times the
    orthogonal one, with ``eta = (d-1) * T^2 / (1 - T^2)`` for a relative
    score-preservation threshold ``T`` (the anisotropic vector
    quantization recipe popularized by ScaNN; public technique, see
    PAPERS.md). Plain reconstruction-loss PQ is the ``eta = 1`` special
    case.

    We fix ``h_orth = 1, h_par = eta`` and require ``eta >= 1``
    (``T >= 1/sqrt(d)``): below that the parallel direction would be
    weighted NEGATIVELY relative to orthogonal, making the per-centroid
    normal matrix indefinite.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    t2 = float(threshold) ** 2
    eta = (d - 1) * t2 / (1.0 - t2)
    if eta < 1.0:
        raise ValueError(
            f"threshold {threshold} gives eta={eta:.3f} < 1 at dim {d}; "
            f"need threshold >= 1/sqrt(d) = {1.0 / np.sqrt(d):.3f}")
    return eta


@partial(jax.jit, static_argnames=("block", "update_centroids"))
def _aniso_subspace_step(x_s, a_other, w, valid, cents_s, codes_s, *,
                         block: int, update_centroids: bool):
    """One coordinate-descent step of the score-aware loss on ONE subspace.

    The full-vector loss ``|r|^2 + w * (x.r)^2`` (``w = (eta-1)/|x|^2``)
    couples subspaces only through the scalar ``x.r = sum_s a_s`` with
    ``a_s = x_s . (x_s - cent[code_s])``, so holding the other subspaces'
    ``a_other = sum_{t!=s} a_t`` fixed:

      * centroid update (given assignments) is the exact minimizer of a
        per-centroid quadratic: solve
        ``(n_c I + sum_i w_i x_i x_i^T) mu = sum_i x_i + sum_i w_i
        (a_other_i + |x_i|^2) x_i`` — 256 tiny (Ds, Ds) solves;
      * reassignment scores all C candidates per row with one blocked
        (block, Ds) @ (Ds, C) MXU matmul:
        ``cost = |x_s - c|^2 + w (a_other + a_cand)^2``.

    Both steps monotonically decrease the total loss. Shapes are
    identical for every subspace, so this compiles once per (block,
    update_centroids). Padded rows carry ``valid = 0`` and are excluded
    from the centroid statistics.
    """
    mp, ds = x_s.shape
    c = cents_s.shape[0]
    starts = jnp.arange(mp // block, dtype=jnp.int32) * block

    if update_centroids:
        eye = jnp.eye(ds, dtype=jnp.float32)

        def stats(start):
            xs = jax.lax.dynamic_slice_in_dim(x_s, start, block, axis=0)
            cd = jax.lax.dynamic_slice_in_dim(codes_s, start, block, axis=0)
            ao = jax.lax.dynamic_slice_in_dim(a_other, start, block, axis=0)
            vv = jax.lax.dynamic_slice_in_dim(valid, start, block, axis=0)
            wv = jax.lax.dynamic_slice_in_dim(w, start, block, axis=0) * vv
            onehot = (cd[:, None] == jnp.arange(c, dtype=jnp.int32)[None, :]
                      ).astype(jnp.float32) * vv[:, None]
            xs_norm = jnp.sum(xs * xs, axis=1)
            cnt = jnp.sum(onehot, axis=0)                      # (C,)
            sx = onehot.T @ xs                                 # (C, Ds)
            bvec = wv * (ao + xs_norm)
            sb = onehot.T @ (xs * bvec[:, None])               # (C, Ds)
            sxx = jnp.einsum("mc,md,me->cde",                  # (C, Ds, Ds)
                             onehot * wv[:, None], xs, xs)
            return cnt, sx, sb, sxx

        cnt, sx, sb, sxx = jax.tree.map(
            lambda t: jnp.sum(t, axis=0), jax.lax.map(stats, starts))
        lhs = cnt[:, None, None] * eye[None] + sxx
        # empty cells keep their previous centroid (and a nonsingular lhs)
        safe_lhs = jnp.where(cnt[:, None, None] > 0, lhs, eye[None])
        mu = jnp.linalg.solve(safe_lhs, (sx + sb)[..., None])[..., 0]
        cents_s = jnp.where(cnt[:, None] > 0, mu, cents_s)

    cn = jnp.sum(cents_s * cents_s, axis=1)

    def assign(start):
        xs = jax.lax.dynamic_slice_in_dim(x_s, start, block, axis=0)
        ao = jax.lax.dynamic_slice_in_dim(a_other, start, block, axis=0)
        wv = jax.lax.dynamic_slice_in_dim(w, start, block, axis=0)
        xs_norm = jnp.sum(xs * xs, axis=1)
        dot = jnp.dot(xs, cents_s.T, preferred_element_type=jnp.float32)
        a_cand = xs_norm[:, None] - dot                        # (m, C)
        cost = (xs_norm[:, None] - 2.0 * dot + cn[None, :]
                ) + wv[:, None] * (ao[:, None] + a_cand) ** 2
        code = jnp.argmin(cost, axis=1).astype(jnp.int32)
        a_new = jnp.take_along_axis(a_cand, code[:, None], axis=1)[:, 0]
        return code, a_new

    codes_new, a_new = jax.lax.map(assign, starts)
    return cents_s, codes_new.reshape(-1), a_new.reshape(-1)


def _refine_anisotropic(dev: jax.Array, cents, codes, eta: float,
                        sweeps: int, block_size: int = 65_536,
                        update_centroids: bool = True):
    """Run ``sweeps`` coordinate-descent sweeps (all S subspaces each) of
    the score-aware loss, starting from reconstruction-trained
    ``cents``/``codes``. Returns (centroids (S,C,Ds) np.f32, codes (M,S)
    np.uint8). With ``update_centroids=False`` this is assignment-only —
    the anisotropic ENCODER for a fixed codebook."""
    m, d = dev.shape
    s_sub, _, ds = np.shape(cents)
    block = min(block_size, pad_to_multiple(m, 128))
    mp = pad_to_multiple(m, block)
    xp = jnp.pad(dev.astype(jnp.float32), ((0, mp - m), (0, 0)))
    valid = (jnp.arange(mp) < m).astype(jnp.float32)
    codes_p = jnp.pad(jnp.asarray(codes, jnp.int32), ((0, mp - m), (0, 0)))
    xnorm2 = jnp.sum(xp * xp, axis=1)
    w = jnp.where(xnorm2 > 0, (eta - 1.0) / jnp.maximum(xnorm2, 1e-12), 0.0)
    cents_dev = jnp.asarray(cents, jnp.float32)

    x_subs, cents_list, codes_cols, a_cols = [], [], [], []
    for s in range(s_sub):
        xs = jax.lax.slice_in_dim(xp, s * ds, (s + 1) * ds, axis=1)
        gathered = jnp.take(cents_dev[s], codes_p[:, s], axis=0)
        x_subs.append(xs)
        cents_list.append(cents_dev[s])
        codes_cols.append(codes_p[:, s])
        a_cols.append(jnp.sum(xs * xs, 1) - jnp.sum(xs * gathered, 1))
    a = jnp.stack(a_cols, axis=1)  # (Mp, S)

    for _ in range(sweeps):
        for s in range(s_sub):
            a_other = jnp.sum(a, axis=1) - a[:, s]
            cs, code_s, a_s = _aniso_subspace_step(
                x_subs[s], a_other, w, valid, cents_list[s], codes_cols[s],
                block=block, update_centroids=update_centroids)
            cents_list[s], codes_cols[s] = cs, code_s
            a = a.at[:, s].set(a_s)

    new_cents = np.asarray(jax.device_get(jnp.stack(cents_list)))
    new_codes = np.asarray(jax.device_get(
        jnp.stack(codes_cols, axis=1)[:m])).astype(np.uint8)
    return new_cents, new_codes


def anisotropic_loss(vectors, book: "PQCodebook", threshold: float) -> float:
    """Mean score-aware loss of an encoding (host-side; tests/studies)."""
    x = np.asarray(vectors, np.float32)
    r = x - book.decode()
    n2 = np.sum(x * x, axis=1)
    par = np.where(n2 > 0,
                   np.sum(x * r, axis=1) ** 2 / np.maximum(n2, 1e-12), 0.0)
    eta = anisotropic_eta(threshold, x.shape[1])
    return float(np.mean(np.sum(r * r, axis=1) + (eta - 1.0) * par))


class PQCodebook(NamedTuple):
    """Trained PQ codebooks + encoded catalog.

    ``rotation`` (optional, D×D orthonormal) is the OPQ-style pre-rotation:
    codes live in the ROTATED space (balanced per-subspace variance), but
    since ``q·x == (qR)·(xR)`` the ADC scores still approximate
    original-space dot products — queries are rotated at search time and
    the exact rescore stays in the original space untouched.
    """

    centroids: np.ndarray  # (S, C, Ds) f32
    codes: np.ndarray      # (M, S) uint8
    n_items: int
    rotation: Optional[np.ndarray] = None  # (D, D) orthonormal, or None
    anisotropic_threshold: Optional[float] = None  # score-aware loss T,
    # or None for plain reconstruction-loss PQ. Kept on the book so
    # ``encode`` (new catalogs against trained codebooks) assigns with
    # the SAME loss the codebook was trained under.

    @property
    def n_subspaces(self) -> int:
        return self.centroids.shape[0]

    @property
    def n_codes(self) -> int:
        return self.centroids.shape[1]

    @property
    def bytes_per_item(self) -> int:
        return self.n_subspaces  # one uint8 code per subspace

    @classmethod
    def build(cls, vectors, n_subspaces: int = 8, n_codes: int = 256,
              iters: int = 15, seed: int = 0,
              rotate: bool = False,
              train_sample: Optional[int] = None,
              anisotropic_threshold: Optional[float] = None,
              anisotropic_sweeps: int = 3) -> "PQCodebook":
        """Train per-subspace k-means codebooks and encode the catalog.

        ``vectors`` may be host or already-device-resident (the device copy
        is sliced per subspace; nothing is re-uploaded). Each subspace
        trains on identical shapes, so the jitted k-means compiles once.
        ``rotate`` applies a seeded random orthonormal pre-rotation before
        the subspace split (OPQ-lite): it spreads anisotropic variance
        evenly over subspaces, which tightens codes exactly where catalogs
        hurt PQ most (clustered/correlated dimensions).

        ``train_sample=N`` trains each subspace codebook on an N-row
        subsample and pays only one full-catalog encode pass per subspace
        (see :func:`~esrecsys_tpu.retrieval.ivf.kmeans`) — 256 codes
        saturate long before millions of training rows, so this cuts the
        dominant build cost ~iters× (measured: BENCHMARKS.md
        "Sample-trained index builds").

        ``anisotropic_threshold=T`` switches the training objective from
        reconstruction error to the score-aware (anisotropic) loss — see
        :func:`anisotropic_eta`. The reconstruction-trained codebook is
        the INIT; ``anisotropic_sweeps`` coordinate-descent sweeps then
        jointly refine centroids + codes under the weighted loss (with
        ``train_sample``, centroid refinement runs on the sample and the
        full catalog gets assignment-only sweeps). ADC search is
        unchanged — only where the 256 codes spend their distortion
        moves (toward the score-relevant parallel direction). Composes
        with ``rotate`` (the loss is rotation-invariant).
        """
        m, d = vectors.shape
        if d % n_subspaces:
            raise ValueError(
                f"dim {d} not divisible by n_subspaces {n_subspaces}")
        if not 2 <= n_codes <= 256:
            raise ValueError(f"n_codes must be in [2, 256], got {n_codes}")
        if n_codes > m:
            raise ValueError(f"n_codes {n_codes} > items {m}")
        eta = (anisotropic_eta(anisotropic_threshold, d)
               if anisotropic_threshold is not None else None)
        ds = d // n_subspaces
        if isinstance(vectors, jax.Array):
            dev = vectors.astype(jnp.float32)
        else:  # host catalog: chunked upload (tunneled links stall >100 MB)
            dev = chunked_device_put(np.asarray(vectors, np.float32))
        rotation = None
        if rotate:
            q_rng = np.random.default_rng(seed)
            rotation, _ = np.linalg.qr(
                q_rng.standard_normal((d, d)).astype(np.float64))
            rotation = rotation.astype(np.float32)
            dev = dev @ jnp.asarray(rotation)  # train/encode in rotated space
        # seed stays TRACED (PRNGKey accepts tracers): one k-means compile
        # shared by all S subspaces, not one per distinct seed
        fit = jax.jit(kmeans, static_argnums=(1, 2),
                      static_argnames=("train_sample",))
        cents, codes = [], []
        for s in range(n_subspaces):
            cent, assign = fit(
                jax.lax.slice_in_dim(dev, s * ds, (s + 1) * ds, axis=1),
                n_codes, iters, seed + s, train_sample=train_sample)
            cents.append(np.asarray(jax.device_get(cent)))
            codes.append(np.asarray(jax.device_get(assign)))
        cents = np.stack(cents)
        codes = np.stack(codes, axis=1).astype(np.uint8)
        if eta is not None:
            if train_sample is not None and train_sample < m:
                # centroid refinement saturates like k-means does: run the
                # joint sweeps on the same-sized sample, then give the
                # full catalog assignment-only sweeps (the anisotropic
                # encoder) against the refined codebook.
                idx = np.random.default_rng(seed).choice(
                    m, train_sample, replace=False)
                idx_dev = jnp.asarray(np.sort(idx))
                cents, _ = _refine_anisotropic(
                    jnp.take(dev, idx_dev, axis=0), cents,
                    np.asarray(codes[np.sort(idx)], np.int32), eta,
                    sweeps=anisotropic_sweeps)
                _, codes = _refine_anisotropic(
                    dev, cents, np.asarray(codes, np.int32), eta,
                    sweeps=max(1, anisotropic_sweeps - 1),
                    update_centroids=False)
            else:
                cents, codes = _refine_anisotropic(
                    dev, cents, np.asarray(codes, np.int32), eta,
                    sweeps=anisotropic_sweeps)
        return cls(cents, codes, m, rotation, anisotropic_threshold)

    def encode(self, vectors) -> "PQCodebook":
        """Re-encode a NEW catalog against these trained codebooks: keep
        centroids + rotation verbatim, pay one blocked nearest-centroid
        pass per subspace — no k-means at all.

        The continuous-deployment move (serving/server.py /admin/reload
        ``aux: "reuse"``): 256 codes trained on yesterday's embedding
        geometry still quantize today's lightly-retrained catalog well,
        and encoding is the ~iters×-cheaper tail of a build. Drift
        accumulates across many reuse cycles — schedule a periodic full
        rebuild.
        """
        m, d = vectors.shape
        if d != self.n_subspaces * self.centroids.shape[2]:
            raise ValueError(
                f"catalog dim {d} != codebook dim "
                f"{self.n_subspaces * self.centroids.shape[2]}")
        ds = self.centroids.shape[2]
        if isinstance(vectors, jax.Array):
            dev = vectors.astype(jnp.float32)
        else:
            dev = chunked_device_put(np.asarray(vectors, np.float32))
        if self.rotation is not None:
            dev = dev @ jnp.asarray(self.rotation)
        assign = jax.jit(kmeans_assign)
        cents_dev = jnp.asarray(self.centroids)
        codes = np.stack([np.asarray(jax.device_get(assign(
            jax.lax.slice_in_dim(dev, s * ds, (s + 1) * ds, axis=1),
            cents_dev[s]))) for s in range(self.n_subspaces)],
            axis=1).astype(np.uint8)
        if self.anisotropic_threshold is not None:
            # the codebook was trained under the score-aware loss; assign
            # new rows under the same loss (nearest-centroid init above,
            # then assignment-only coordinate sweeps)
            eta = anisotropic_eta(self.anisotropic_threshold, d)
            _, codes = _refine_anisotropic(
                dev, self.centroids, np.asarray(codes, np.int32), eta,
                sweeps=2, update_centroids=False)
        return PQCodebook(self.centroids, codes, m, self.rotation,
                          self.anisotropic_threshold)

    def save(self, path: str) -> None:
        extra = {}
        if self.rotation is not None:
            extra["rotation"] = self.rotation
        if self.anisotropic_threshold is not None:
            extra["anisotropic_threshold"] = np.float64(
                self.anisotropic_threshold)
        np.savez_compressed(path, centroids=self.centroids,
                            codes=self.codes, n_items=np.int64(self.n_items),
                            **extra)

    @classmethod
    def load(cls, path: str) -> "PQCodebook":
        with np.load(path, allow_pickle=False) as z:
            rot = z["rotation"] if "rotation" in z.files else None
            thr = (float(z["anisotropic_threshold"])
                   if "anisotropic_threshold" in z.files else None)
            return cls(z["centroids"], z["codes"], int(z["n_items"]), rot,
                       thr)

    def decode(self) -> np.ndarray:
        """Reconstruct the (M, D) approximation in the ORIGINAL space
        (host-side; for tests and distortion measurement, not the query
        path)."""
        parts = [self.centroids[s][self.codes[:, s]]
                 for s in range(self.n_subspaces)]
        dec = np.concatenate(parts, axis=1)
        return dec @ self.rotation.T if self.rotation is not None else dec


def adc_lut(queries_f32: jax.Array, centroids: jax.Array,
            rotation: Optional[jax.Array] = None) -> jax.Array:
    """(B..., S, C) per-query ADC lookup tables:
    ``lut[..., s, c] = <q_s, cent_sc>``, with the query rotated into the
    codebook's space when a pre-rotation was trained."""
    s_sub, _, ds = centroids.shape
    q = (queries_f32 @ rotation.astype(jnp.float32)
         if rotation is not None else queries_f32)
    return jnp.einsum("...sd,scd->...sc",
                      q.reshape(q.shape[:-1] + (s_sub, ds)), centroids,
                      preferred_element_type=jnp.float32)


def pq_topk(
    queries: jax.Array,        # (B, D)
    centroids: jax.Array,      # (S, C, Ds) f32
    codes: jax.Array,          # (M, S) uint8
    k: int,
    rescore_items: Optional[jax.Array] = None,  # (M, D): exact phase-2
    block_size: int = 262_144,
    per_block_k: Optional[int] = None,
    oversample: int = 64,
    rotation: Optional[jax.Array] = None,
    rescore_scales: Optional[jax.Array] = None,  # (M,): rescore_items is int8
    valid_count: Optional[jax.Array] = None,     # scalar (may be traced)
    item_mask: Optional[jax.Array] = None,       # (M,) bool: filtered scan
) -> Tuple[jax.Array, jax.Array]:
    """ADC top-k over PQ codes, with an optional exact candidate rescore.

    Phase 1 streams the (M, S) code matrix in blocks: per-query scores are
    S lookups into the precomputed ``q·centroid`` LUT, summed — the only
    HBM traffic is S bytes/item. With ``rescore_items`` the selected
    ``nblk×per_block_k`` candidates are rescored exactly (the returned
    ranking is exact over the candidate set, as in the int8 scan); without
    it the raw ADC scores/order are returned (PQ-distorted, catalogs
    beyond HBM). ``rotation`` must be the codebook's pre-rotation when one
    was trained (codes live in rotated space; queries are rotated here;
    ``rescore_items`` stays in the ORIGINAL space — dots are
    rotation-invariant).

    With ``rescore_scales``, ``rescore_items`` is the int8 catalog from
    :func:`~esrecsys_tpu.retrieval.mips.quantize_rows` — the resident
    rescore catalog then costs D bytes/item instead of 4·D (S+D+4
    bytes/item total with the codes), trading ≤ 0.4%-of-row-max int8
    rounding in the rescore. The middle ground between the exact f32
    rescore and no rescore at all, for catalogs whose f32 form outgrows
    HBM but whose int8 form does not.

    ``valid_count`` (may be traced): rows >= it are preallocated growth
    capacity, masked in selection and rescore — the serving
    ``/admin/add_items`` hook (compile per capacity, not per size).
    """
    s_sub, c, ds = centroids.shape
    b_shape, d = queries.shape[:-1], queries.shape[-1]
    if d != s_sub * ds:
        raise ValueError(f"query dim {d} != S*Ds = {s_sub}*{ds}")
    num_items = codes.shape[0]
    block = min(block_size, pad_to_multiple(num_items, 128))
    padded_rows = pad_to_multiple(num_items, block)
    if padded_rows != num_items:
        codes = jnp.pad(codes, ((0, padded_rows - num_items), (0, 0)))
        if item_mask is not None:
            item_mask = jnp.pad(item_mask, (0, padded_rows - num_items))
    nblk = padded_rows // block
    kb = per_block_k or min(block, max(-(-oversample * k // nblk), 1))

    qf = queries.astype(jnp.float32)
    # LUT/selection run in the codebook's (possibly rotated) space; the
    # exact rescore below uses the ORIGINAL-space query against the
    # original-space rescore_items
    lut = adc_lut(qf, centroids, rotation)  # (B..., S, C)

    def score_from(start):
        blk = jax.lax.dynamic_slice_in_dim(codes, start, block, axis=0)
        total = jnp.zeros(b_shape + (block,), jnp.float32)
        for s in range(s_sub):  # S is small and static: unrolled gathers
            total = total + jnp.take(lut[..., s, :],
                                     blk[:, s].astype(jnp.int32), axis=-1)
        if item_mask is not None:
            mblk = jax.lax.dynamic_slice_in_dim(item_mask, start, block)
            total = jnp.where(mblk, total, NEG_INF)
        return total

    if rescore_items is not None:
        return _streamed_candidate_topk(
            lambda b: score_from(b * block), qf, rescore_items, num_items, k,
            block, nblk, kb, select="exact", recall_target=0.95,
            rescore_scales=rescore_scales, valid_bound=valid_count,
            item_mask=item_mask)

    # no rescore catalog: the shared streaming top-k over the raw ADC scores
    # (tail masking, -inf padding to k, descending order — mips.chunked_topk)
    # chunked_topk takes its block size from score_from's output shape
    vals, idxs = chunked_topk(score_from, num_items, k,
                              valid_bound=valid_count)
    idxs = jnp.where(jnp.isfinite(vals), idxs, 0)
    return vals, idxs
