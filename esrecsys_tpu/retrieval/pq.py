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
``tools/retrieval_quality_study.py --pq_subspaces S``).

No reference counterpart (the reference scores full f32 matrices,
pinterest/make_recommendations.py:49-65; its largest catalog fits HBM).
PQ is what lets the serving path survive catalogs 10-100× beyond that.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from esrecsys_tpu.core.mesh import pad_to_multiple
from esrecsys_tpu.core.transfer import chunked_device_put
from esrecsys_tpu.retrieval.ivf import kmeans, kmeans_assign
from esrecsys_tpu.retrieval.mips import (_streamed_candidate_topk,
                                         chunked_topk)


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
              train_sample: Optional[int] = None) -> "PQCodebook":
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
        """
        m, d = vectors.shape
        if d % n_subspaces:
            raise ValueError(
                f"dim {d} not divisible by n_subspaces {n_subspaces}")
        if not 2 <= n_codes <= 256:
            raise ValueError(f"n_codes must be in [2, 256], got {n_codes}")
        if n_codes > m:
            raise ValueError(f"n_codes {n_codes} > items {m}")
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
        return cls(np.stack(cents),
                   np.stack(codes, axis=1).astype(np.uint8), m, rotation)

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
        codes = [np.asarray(jax.device_get(assign(
            jax.lax.slice_in_dim(dev, s * ds, (s + 1) * ds, axis=1),
            cents_dev[s]))) for s in range(self.n_subspaces)]
        return PQCodebook(self.centroids,
                          np.stack(codes, axis=1).astype(np.uint8),
                          m, self.rotation)

    def save(self, path: str) -> None:
        extra = ({"rotation": self.rotation}
                 if self.rotation is not None else {})
        np.savez_compressed(path, centroids=self.centroids,
                            codes=self.codes, n_items=np.int64(self.n_items),
                            **extra)

    @classmethod
    def load(cls, path: str) -> "PQCodebook":
        with np.load(path, allow_pickle=False) as z:
            rot = z["rotation"] if "rotation" in z.files else None
            return cls(z["centroids"], z["codes"], int(z["n_items"]), rot)

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
        return total

    if rescore_items is not None:
        return _streamed_candidate_topk(
            lambda b: score_from(b * block), qf, rescore_items, num_items, k,
            block, nblk, kb, select="exact", recall_target=0.95,
            rescore_scales=rescore_scales)

    # no rescore catalog: the shared streaming top-k over the raw ADC scores
    # (tail masking, -inf padding to k, descending order — mips.chunked_topk)
    # chunked_topk takes its block size from score_from's output shape
    vals, idxs = chunked_topk(score_from, num_items, k)
    idxs = jnp.where(jnp.isfinite(vals), idxs, 0)
    return vals, idxs
