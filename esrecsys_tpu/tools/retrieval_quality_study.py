"""Retrieval QUALITY study at MPD scale: IVF recall-vs-cost and int8 overlap.

The serving path ships three approximate modes (``--approx``,
``--quantized``, ``--ivf_clusters``; serving/server.py) whose THROUGHPUT
numbers are chip-gated — but their QUALITY (recall vs the exact scan) is a
pure function of the index math and the catalog geometry, identical on any
platform. This measures it at the flagship catalog size (2,262,292 items —
the MPD track corpus the reference evaluates over,
spotify/train_spotify.py:113-131) so the accuracy side of every serving
mode is on record even when no chip is reachable:

  * IVF (retrieval/ivf.py): recall@k vs ``nprobe`` with the measured
    fraction of the catalog actually scored per query (nprobe·Lmax/N — the
    sublinear cost knob), on two catalog geometries:
      - ``clustered``: a heavy-tailed gaussian mixture (trained embedding
        catalogs cluster by artist/genre; cell sizes end up zipf-ish);
      - ``isotropic``: a single gaussian — the ANN worst case, where
        cells tile a featureless sphere and probe recall is the floor.
  * int8 full-scan (quantized_topk_over_matrix): overlap@k with the exact
    f32 scan — the quantization-only error, no cell truncation.

Pass ``--artifact path/to/catalog.npz`` (an EmbeddingIndex export) to run
the same study on a REAL trained catalog instead of the synthetic ones.

Run:  python -m esrecsys_tpu.tools.retrieval_quality_study \
          [--n_items 2262292] [--out /tmp/retrieval_quality.json]
"""

from __future__ import annotations

import argparse
import json
import logging
import time

import numpy as np

from esrecsys_tpu.core.transfer import chunked_device_put

log = logging.getLogger(__name__)


def synth_catalog(kind: str, n: int, n_queries: int, d: int,
                  rng: np.random.Generator, components: int = 4096):
    """MPD-shaped synthetic (catalog, queries) — f32, unnormalized (MIPS
    not cosine). Queries are drawn from the SAME distribution as the
    catalog (same mixture for ``clustered``): serving queries are context
    embeddings living in the trained item space, not outliers.

    Regimes: ``isotropic`` (single gaussian — the ANN floor),
    ``clustered`` (heavy-tailed gaussian mixture — trained artist/genre
    catalogs), ``correlated`` (the clustered mixture with a steeply
    decaying per-dimension variance spectrum — trained embeddings
    concentrate variance in leading directions, the axis-aligned
    anisotropy that plain PQ subspace splits suffer under and
    ``--pq_rotate`` redistributes)."""
    if kind == "isotropic":
        return (rng.standard_normal((n, d), np.float32),
                rng.standard_normal((n_queries, d), np.float32))
    # clustered: heavy-tailed component weights (zipf) so cell sizes look
    # like a real artist/genre distribution, noise small vs centroid scale
    cent = rng.standard_normal((components, d)).astype(np.float32) * 2.0
    w = 1.0 / np.arange(1, components + 1) ** 0.7
    w /= w.sum()
    # correlated: variance falls e-fold every d/6 dims, so the leading
    # subspace would otherwise carry nearly all the signal
    scales = (np.exp(-np.arange(d) / (d / 6.0)).astype(np.float32)
              if kind == "correlated" else np.ones(d, np.float32))

    def draw(m):
        comp = rng.choice(components, size=m, p=w)
        return (cent[comp]
                + rng.standard_normal((m, d)).astype(np.float32) * 0.45
                ) * scales

    return draw(n), draw(n_queries)


def exact_topk(vecs: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from esrecsys_tpu.retrieval.mips import topk_over_matrix

    _, idx = jax.jit(topk_over_matrix, static_argnums=(2,))(
        jnp.asarray(queries), chunked_device_put(vecs), k)
    return np.asarray(jax.device_get(idx))


def recall(found: np.ndarray, truth: np.ndarray) -> float:
    """Mean fraction of each truth row recovered in the found row."""
    hits = [np.intersect1d(f, t).size for f, t in zip(found, truth)]
    return float(np.mean(hits) / truth.shape[1])


def ivf_curve(vecs, queries, truth10, truth100, n_clusters, iters, nprobes,
              batch: int = 32, max_cell=None) -> dict:
    import jax
    import jax.numpy as jnp

    from esrecsys_tpu.retrieval.ivf import IVFIndex, ivf_topk

    # upload ONCE, chunked; build consumes the device array directly
    # (jnp.asarray is a no-op on it), so the catalog never ships unchunked
    items = chunked_device_put(vecs)
    t0 = time.perf_counter()
    index = IVFIndex.build(items, n_clusters, iters=iters, max_cell=max_cell)
    build_s = time.perf_counter() - t0
    cent = jnp.asarray(index.centroids)
    buckets = jnp.asarray(index.bucket_ids)
    n, lmax = vecs.shape[0], index.bucket_ids.shape[1]
    log.info("ivf built: C=%d Lmax=%d imbalance=%.2f (%.1fs)",
             index.n_clusters, lmax, index.imbalance, build_s)
    fn = jax.jit(ivf_topk, static_argnums=(4, 5))
    out = {"n_clusters": index.n_clusters, "lmax": lmax,
           "max_cell": max_cell,
           "imbalance": round(index.imbalance, 3),
           "build_seconds": round(build_s, 1), "curve": [],
           "_index": index}  # stripped before reporting; reused by ivfpq
    for p in nprobes:
        found = []
        for s in range(0, queries.shape[0], batch):
            vals, idx = fn(jnp.asarray(queries[s:s + batch]), cent, buckets,
                           items, 100, p)
            # pad slots come back as index 0 with NEG_INF scores — mask
            # them so item 0 can't count as a retrieved hit
            idx = jnp.where(jnp.isfinite(vals), idx, -1)
            found.append(np.asarray(jax.device_get(idx)))
        found = np.concatenate(found)
        p_eff = min(p, index.n_clusters)  # ivf_topk clamps internally
        row = {"nprobe": p,
               "catalog_fraction_scored": round(p_eff * lmax / n, 5),
               "recall@10": round(recall(found[:, :10], truth10), 4),
               "recall@100": round(recall(found, truth100), 4)}
        out["curve"].append(row)
        log.info("nprobe=%-3d frac=%.4f r@10=%.3f r@100=%.3f", p,
                 row["catalog_fraction_scored"], row["recall@10"],
                 row["recall@100"])
    return out


def int8_overlap(vecs, queries, truth10, truth100, batch: int = 128) -> dict:
    import jax
    import jax.numpy as jnp

    from esrecsys_tpu.retrieval.mips import (quantize_rows,
                                             quantized_topk_over_matrix)

    items = chunked_device_put(vecs)
    q_items, scales = jax.jit(quantize_rows)(items)
    fn = jax.jit(quantized_topk_over_matrix,
                 static_argnames=("k", "select"))
    found = []
    for s in range(0, queries.shape[0], batch):
        vals, idx = fn(jnp.asarray(queries[s:s + batch]), q_items, scales,
                       items, k=100, select="exact")
        idx = jnp.where(jnp.isfinite(vals), idx, -1)  # mask pad slots
        found.append(np.asarray(jax.device_get(idx)))
    found = np.concatenate(found)
    return {"overlap@10": round(recall(found[:, :10], truth10), 4),
            "overlap@100": round(recall(found, truth100), 4)}


def pq_quality(vecs, queries, truth10, truth100, n_subspaces: int,
               n_codes: int = 256, iters: int = 15,
               batch: int = 128, oversamples=(4, 16, 64, 256),
               rotate: bool = False,
               anisotropic: float = None) -> dict:
    """PQ ADC scan quality (retrieval/pq.py): overlap vs the exact scan —
    the exact-rescore serving path swept over its candidate-budget knob
    (``oversample``: ~oversample*k candidates rescored per query), plus raw
    ADC (the beyond-HBM fallback, bounded by code distortion alone). The
    codebook is trained ONCE; only the scan phase repeats."""
    import jax
    import jax.numpy as jnp

    from esrecsys_tpu.retrieval.pq import PQCodebook, pq_topk

    t0 = time.perf_counter()
    book = PQCodebook.build(vecs, n_subspaces, n_codes=n_codes, iters=iters,
                            rotate=rotate, anisotropic_threshold=anisotropic)
    build_s = time.perf_counter() - t0
    log.info("pq built: S=%d C=%d (%d bytes/item vs %d f32) aniso=%s "
             "in %.1fs", n_subspaces, n_codes, book.bytes_per_item,
             4 * vecs.shape[1], anisotropic, build_s)
    cents = jnp.asarray(book.centroids)
    codes = jnp.asarray(book.codes)
    rot = (jnp.asarray(book.rotation)
           if book.rotation is not None else None)
    items = chunked_device_put(vecs)
    fn = jax.jit(pq_topk, static_argnames=("k", "block_size", "per_block_k",
                                           "oversample"))

    def scan(rescore, oversample):
        found = []
        for s in range(0, queries.shape[0], batch):
            vals, idx = fn(jnp.asarray(queries[s:s + batch]), cents, codes,
                           k=100, rescore_items=rescore,
                           oversample=oversample, rotation=rot)
            idx = jnp.where(jnp.isfinite(vals), idx, -1)  # mask pad slots
            found.append(np.asarray(jax.device_get(idx)))
        found = np.concatenate(found)
        return {"overlap@10": round(recall(found[:, :10], truth10), 4),
                "overlap@100": round(recall(found, truth100), 4)}

    out = {"n_subspaces": n_subspaces, "n_codes": n_codes,
           "rotated": rotate, "anisotropic_threshold": anisotropic,
           "bytes_per_item": book.bytes_per_item,
           "compression_vs_f32": round(4 * vecs.shape[1] / n_subspaces, 1),
           "build_seconds": round(build_s, 1), "rescored_curve": [],
           "_book": book}  # stripped before reporting; reused by ivfpq
    # candidate count actually rescored: nblk * ceil(oversample*k/nblk)
    block = min(262_144, vecs.shape[0])
    nblk = -(-vecs.shape[0] // block)
    for o in oversamples:
        row = scan(items, o)
        row["oversample"] = o
        row["candidates_rescored"] = nblk * max(-(-o * 100 // nblk), 1)
        out["rescored_curve"].append(row)
        log.info("pq rescored o=%-4d (%d cand): o@10=%.3f o@100=%.3f", o,
                 row["candidates_rescored"], row["overlap@10"],
                 row["overlap@100"])
    out["raw_adc"] = scan(None, 4)
    log.info("pq raw_adc: o@10=%.3f o@100=%.3f",
             out["raw_adc"]["overlap@10"], out["raw_adc"]["overlap@100"])
    return out


def ivfpq_curve(vecs, queries, truth10, truth100, index, book,
                nprobes, oversample=64, batch: int = 32) -> dict:
    """IVF-PQ (retrieval/ivf.ivf_pq_topk): probe + ADC candidate scoring
    from S-byte codes + exact rescore, swept over nprobe at a fixed
    rescore budget. Reuses the coarse ``index`` and ``book`` the
    standalone sections already built (hundreds of seconds each at MPD
    scale — never rebuilt)."""
    import jax
    import jax.numpy as jnp

    from esrecsys_tpu.retrieval.ivf import ivf_pq_topk

    items = chunked_device_put(vecs)
    n_subspaces = book.n_subspaces
    build_s = 0.0  # structures reused from ivf/pq sections
    cent = jnp.asarray(index.centroids)
    buckets = jnp.asarray(index.bucket_ids)
    pq_cent = jnp.asarray(book.centroids)
    pq_codes = jnp.asarray(book.codes)
    rot = (jnp.asarray(book.rotation)
           if book.rotation is not None else None)
    n, lmax = vecs.shape[0], index.bucket_ids.shape[1]
    log.info("ivfpq: reusing C=%d Lmax=%d S=%d", index.n_clusters, lmax,
             n_subspaces)
    fn = jax.jit(ivf_pq_topk, static_argnames=("k", "nprobe", "oversample"))
    out = {"n_clusters": index.n_clusters, "lmax": lmax,
           "n_subspaces": n_subspaces, "oversample": oversample,
           "rotated": book.rotation is not None, "curve": []}
    for p in nprobes:
        found = []
        for st in range(0, queries.shape[0], batch):
            vals, idx = fn(jnp.asarray(queries[st:st + batch]), cent,
                           buckets, items, k=100, nprobe=p,
                           pq_centroids=pq_cent, pq_codes=pq_codes,
                           oversample=oversample, rotation=rot)
            idx = jnp.where(jnp.isfinite(vals), idx, -1)  # mask pad slots
            found.append(np.asarray(jax.device_get(idx)))
        found = np.concatenate(found)
        p_eff = min(p, index.n_clusters)
        row = {"nprobe": p,
               # ADC reads S bytes per probed slot; the f32 gather is only
               # the oversample*k rescore — report the probed fraction
               "catalog_fraction_probed": round(p_eff * lmax / n, 5),
               "recall@10": round(recall(found[:, :10], truth10), 4),
               "recall@100": round(recall(found, truth100), 4)}
        out["curve"].append(row)
        log.info("ivfpq nprobe=%-3d frac=%.4f r@10=%.3f r@100=%.3f", p,
                 row["catalog_fraction_probed"], row["recall@10"],
                 row["recall@100"])
    return out


def study(vecs: np.ndarray, queries: np.ndarray, n_clusters: int, iters: int,
          nprobes: list, max_cell=None, pq_subspaces=None,
          pq_oversamples=(4, 16, 64, 256), pq_rotate: bool = False,
          pq_anisotropic=None,
          pq_iters: int = 15, ivfpq: bool = False) -> dict:
    t0 = time.perf_counter()
    truth100 = exact_topk(vecs, queries, 100)
    truth10 = truth100[:, :10]
    log.info("exact ground truth (%.1fs)", time.perf_counter() - t0)
    if ivfpq and not pq_subspaces:
        raise ValueError("--ivfpq needs --pq_subspaces")
    out = {
        "n_items": int(vecs.shape[0]), "dim": int(vecs.shape[1]),
        "n_queries": int(queries.shape[0]),
        "int8_fullscan": int8_overlap(vecs, queries, truth10, truth100),
        "ivf": ivf_curve(vecs, queries, truth10, truth100, n_clusters,
                         iters, nprobes, max_cell=max_cell),
    }
    if pq_subspaces:
        # PQ trains with ITS OWN iters knob (default = the serving
        # default, RetrievalService pq_iters=15) so the study measures the
        # codebook production would actually build — --kmeans_iters stays
        # the IVF coarse-quantizer knob
        out["pq"] = pq_quality(vecs, queries, truth10, truth100,
                               pq_subspaces, iters=pq_iters,
                               oversamples=pq_oversamples, rotate=pq_rotate,
                               anisotropic=pq_anisotropic)
    if ivfpq:
        out["ivfpq"] = ivfpq_curve(
            vecs, queries, truth10, truth100, out["ivf"]["_index"],
            out["pq"]["_book"], nprobes, oversample=max(pq_oversamples))
    out["ivf"].pop("_index", None)
    if pq_subspaces:
        out["pq"].pop("_book", None)
    return out


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    from esrecsys_tpu.axon_preflight import warn_cpu_fallback

    warn_cpu_fallback(log)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n_items", type=int, default=2_262_292)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--n_queries", type=int, default=512)
    p.add_argument("--n_clusters", type=int, default=1024)
    p.add_argument("--max_cell", type=int, default=0,
                   help="cap IVF cell size (0 = off): oversized cells are "
                        "balanced-split, shrinking the padded probe width "
                        "every query pays (retrieval/ivf.py IVFIndex.build)")
    p.add_argument("--pq_subspaces", type=int, default=0,
                   help="also measure PQ ADC scan quality with this many "
                        "bytes/item (0 = off; retrieval/pq.py)")
    p.add_argument("--pq_oversamples", default="4,16,64,256",
                   help="rescore candidate budgets to sweep "
                        "(~oversample*100 candidates per query)")
    p.add_argument("--pq_rotate", action="store_true",
                   help="OPQ-lite random-orthonormal pre-rotation before "
                        "the subspace split (retrieval/pq.py)")
    p.add_argument("--pq_anisotropic", type=float, default=0.0,
                   help="score-aware (anisotropic) PQ training threshold T "
                        "(0 = off; needs T >= 1/sqrt(dim) — "
                        "retrieval/pq.anisotropic_eta)")
    p.add_argument("--ivfpq", action="store_true",
                   help="also sweep IVF-PQ (probe + ADC codes + exact "
                        "rescore, retrieval/ivf.ivf_pq_topk) over --nprobes "
                        "at the largest --pq_oversamples budget")
    p.add_argument("--pq_iters", type=int, default=15,
                   help="PQ codebook k-means iters (default = the serving "
                        "build default; --kmeans_iters governs IVF only)")
    p.add_argument("--kmeans_iters", type=int, default=10)
    p.add_argument("--nprobes", default="1,2,4,8,16,32,64")
    p.add_argument("--regimes", default="clustered,isotropic")
    p.add_argument("--artifact", default="",
                   help="EmbeddingIndex .npz: study a real catalog instead")
    p.add_argument("--out", default="/tmp/retrieval_quality.json")
    args = p.parse_args(argv)
    nprobes = [int(x) for x in args.nprobes.split(",")]
    pq_oversamples = [int(x) for x in args.pq_oversamples.split(",")]
    if args.ivfpq and not args.pq_subspaces:
        # fail BEFORE hours of ground truth / builds, not inside study()
        p.error("--ivfpq needs --pq_subspaces")
    rng = np.random.default_rng(0)
    results = {}
    if args.artifact:
        from esrecsys_tpu.retrieval.index import EmbeddingIndex

        vecs = np.asarray(EmbeddingIndex.load(args.artifact).vectors,
                          np.float32)
        # held-out queries: perturbed catalog rows (serving queries are
        # context embeddings near, not at, item embeddings)
        qi = rng.choice(vecs.shape[0], args.n_queries, replace=False)
        queries = vecs[qi] + 0.1 * rng.standard_normal(
            (args.n_queries, vecs.shape[1])).astype(np.float32)
        results["artifact"] = study(vecs, queries, args.n_clusters,
                                    args.kmeans_iters, nprobes,
                                    max_cell=args.max_cell or None,
                                    pq_subspaces=args.pq_subspaces or None,
                                    pq_oversamples=pq_oversamples,
                                    pq_rotate=args.pq_rotate,
                                    pq_anisotropic=(args.pq_anisotropic
                                                    or None),
                                    pq_iters=args.pq_iters,
                                    ivfpq=args.ivfpq)
    else:
        for kind in args.regimes.split(","):
            log.info("=== regime: %s (%d x %d) ===", kind, args.n_items,
                     args.dim)
            vecs, queries = synth_catalog(kind, args.n_items,
                                          args.n_queries, args.dim, rng)
            results[kind] = study(vecs, queries, args.n_clusters,
                                  args.kmeans_iters, nprobes,
                                  max_cell=args.max_cell or None,
                                  pq_subspaces=args.pq_subspaces or None,
                                  pq_oversamples=pq_oversamples,
                                  pq_rotate=args.pq_rotate,
                                  pq_anisotropic=args.pq_anisotropic or None,
                                  pq_iters=args.pq_iters,
                                  ivfpq=args.ivfpq)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
