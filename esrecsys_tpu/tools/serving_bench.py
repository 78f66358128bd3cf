"""Serving-mode bench: throughput × quality for every retrieval mode.

One command measures the real serving path (`RetrievalService.topk`, the
same compiled query the HTTP server dispatches — HTTP framing excluded)
across the mode lattice:

  exact            streamed grouped top-k (retrieval/mips.topk_over_matrix)
  approx           hardware approx_max_k selection + exact rescore
  fused            Pallas fused scan+select kernel (retrieval/fused.py):
                   in-VMEM per-bin top-2 selection, no score matrix
                   (``--fused_bins`` sets the bin count L)
  quantized        int8 catalog scan + exact rescore
  quantized_approx int8 scan + approx_max_k selection
  ivf              k-means inverted file, nprobe cells per query
                   (``--ivf_max_cell`` caps cell width)
  ivf_quantized    ivf probe + int8 candidate gathers
  pq               product-quantization ADC scan + exact rescore
                   (``--pq_subspaces/--pq_oversample/--pq_rotate``)
  ivf_pq           ivf probe + PQ ADC candidate scoring + exact rescore
  quantized_r8     int8 scan + int8 rescore — NO resident f32 catalog
  pq_r8            PQ ADC scan + int8 rescore (S+D+4 bytes/item residency)
  ivf_pq_r8        ivf probe + PQ ADC + int8 rescore (f32-free sublinear)

reporting, per mode: queries/s (wall, steady-state over ``--queries``
queries in ``--batch`` chunks), mean overlap@k vs the exact mode on a
query subsample, and setup time (quantize / k-means build).

Catalogs are synthetic: ``--structured`` draws a mixture of components
(clusterable, like trained embeddings — the IVF-relevant case);
the default is Gaussian (worst case for IVF, fair for the scan modes).

Run (chip): python -m esrecsys_tpu.tools.serving_bench \
    --items 2262292 --dim 64 --k 500 --batch 256 --ivf_clusters 4096
Smoke (CPU): --items 20000 --queries 256 --batch 32 --k 50 \
    --ivf_clusters 64 --nprobe 8
"""

from __future__ import annotations

import argparse
import json
import logging
import time

import numpy as np

log = logging.getLogger(__name__)

MODES = ("exact", "approx", "fused", "fused_q8", "fused_q8_r8",
         "quantized", "quantized_approx",
         "ivf", "ivf_quantized", "pq", "ivf_pq",
         "quantized_r8", "pq_r8", "ivf_pq_r8", "filtered")


def make_catalog(n: int, dim: int, structured: bool, seed: int = 0):
    rng = np.random.default_rng(seed)
    if structured:
        n_comp = max(16, n // 1000)
        means = rng.normal(size=(n_comp, dim)).astype(np.float32) * 3.0
        comp = rng.integers(0, n_comp, n)
        x = means[comp] + rng.normal(size=(n, dim)).astype(np.float32) * 0.3
        return x.astype(np.float32)
    return rng.normal(size=(n, dim)).astype(np.float32)


def mode_kwargs(mode: str, args) -> dict:
    """Serving kwargs for a named retrieval mode.

    ``args`` is any object carrying the build knobs (argparse namespaces
    from this bench and tools/full_scale_run both work): ``recall_target``,
    ``ivf_clusters``, ``nprobe``, ``ivf_iters``, ``pq_subspaces``,
    ``pq_oversample``, ``pq_rotate``, ``pq_anisotropic``, ``ivf_max_cell``,
    ``build_train_sample``. The returned dict feeds either
    ``RetrievalService(index, **kw)`` or ``serving.server.serve(path, **kw)``
    (their mode-selection keywords are identical).
    """
    kw = {}
    if mode == "approx":
        kw.update(approx=True, recall_target=args.recall_target)
    elif mode == "fused":
        kw.update(fused=True,
                  fused_bins=getattr(args, "fused_bins", 4096))
    elif mode == "fused_q8":
        # int8 fused scan (codes + per-item scales in the kernel — half
        # the bf16 scan bytes), exact f32 rescore
        kw.update(fused=True, quantized=True,
                  fused_bins=getattr(args, "fused_bins", 4096))
    elif mode == "fused_q8_r8":
        # + int8 rescore: no f32 catalog anywhere (D+4 + D+4 B/item)
        kw.update(fused=True, quantized=True, rescore_int8=True,
                  fused_bins=getattr(args, "fused_bins", 4096))
    elif mode == "quantized":
        kw.update(quantized=True)
    elif mode == "quantized_approx":
        kw.update(quantized=True, approx=True,
                  recall_target=args.recall_target)
    elif mode == "ivf":
        kw.update(ivf_clusters=args.ivf_clusters, nprobe=args.nprobe,
                  ivf_iters=args.ivf_iters)
    elif mode == "ivf_quantized":
        kw.update(ivf_clusters=args.ivf_clusters, nprobe=args.nprobe,
                  ivf_iters=args.ivf_iters, quantized=True)
    elif mode == "pq":
        kw.update(pq_subspaces=args.pq_subspaces,
                  pq_oversample=args.pq_oversample,
                  pq_rotate=args.pq_rotate,
                  pq_anisotropic=getattr(args, 'pq_anisotropic', 0) or None)
    elif mode == "ivf_pq":
        kw.update(ivf_clusters=args.ivf_clusters, nprobe=args.nprobe,
                  ivf_iters=args.ivf_iters,
                  pq_subspaces=args.pq_subspaces,
                  pq_oversample=args.pq_oversample,
                  pq_rotate=args.pq_rotate,
                  pq_anisotropic=getattr(args, 'pq_anisotropic', 0) or None)
    elif mode == "quantized_r8":
        kw.update(quantized=True, rescore_int8=True)
    elif mode == "pq_r8":
        kw.update(pq_subspaces=args.pq_subspaces,
                  pq_oversample=args.pq_oversample,
                  pq_rotate=args.pq_rotate,
                  pq_anisotropic=getattr(args, 'pq_anisotropic', 0) or None,
                  rescore_int8=True)
    elif mode == "ivf_pq_r8":
        kw.update(ivf_clusters=args.ivf_clusters, nprobe=args.nprobe,
                  ivf_iters=args.ivf_iters,
                  pq_subspaces=args.pq_subspaces,
                  pq_oversample=args.pq_oversample,
                  pq_rotate=args.pq_rotate,
                  pq_anisotropic=getattr(args, 'pq_anisotropic', 0) or None,
                  rescore_int8=True)
    if mode.startswith("ivf") and getattr(args, "ivf_max_cell", 0):
        kw.update(ivf_max_cell=args.ivf_max_cell)
    if getattr(args, "build_train_sample", 0) and (
            "ivf" in mode or "pq" in mode):
        kw.update(build_train_sample=args.build_train_sample)
    return kw


def service_for(mode: str, index, k: int, batch: int, args):
    from esrecsys_tpu.serving.server import RetrievalService

    if mode == "filtered":
        return RetrievalService(index, max_k=k, max_batch=batch, filters={})
    return RetrievalService(index, max_k=k, max_batch=batch,
                            **mode_kwargs(mode, args))


def bench_mode(mode: str, index, queries: np.ndarray, k: int, args,
               exact_ids: np.ndarray | None, vecs: np.ndarray | None = None):
    t0 = time.time()
    svc = service_for(mode, index, k, args.batch, args)
    fkw = {}
    if mode == "filtered":
        # a 50% eligibility mask (every even row) registered up front;
        # queries then carry the filter name — the on-device two-phase
        # masked scan (retrieval/mips valid_bound + mask) is what's timed
        rng = np.random.default_rng(7)
        eligible = np.arange(0, len(index.ids), 2)
        svc.set_filter("bench", [index.ids[i] for i in eligible])
        fkw = {"filter": "bench"}
    setup_s = time.time() - t0  # includes device upload + compile + build

    # warm path is compiled at construction; measure steady-state wall
    t0 = time.time()
    ids = None
    for rep in range(args.reps):
        ids, _ = svc.topk(queries, k=k, **fkw)
    wall = time.time() - t0
    qps = args.reps * queries.shape[0] / wall

    overlap = None
    if mode == "filtered" and vecs is not None:
        # truth = exact top-k over the ELIGIBLE half, computed on host
        sub = min(queries.shape[0], args.overlap_queries)
        evecs = vecs[::2]
        scores = queries[:sub] @ evecs.T
        want = np.argsort(-scores, axis=1)[:, :k] * 2  # back to catalog rows
        overlap = float(np.mean([
            len({int(x) for x in ids[b]} & set(want[b].tolist())) / k
            for b in range(sub)]))
    elif exact_ids is not None:
        sub = min(queries.shape[0], args.overlap_queries)
        overlap = float(np.mean([
            len(set(ids[b]) & set(exact_ids[b])) / k for b in range(sub)]))
    out = {"mode": mode, "queries_per_s": round(qps, 1),
           "overlap_vs_exact": overlap, "setup_s": round(setup_s, 2),
           "resident_bytes_per_item": svc.resident_bytes_per_item}
    if mode.startswith("ivf"):
        out["ivf_imbalance"] = round(svc.ivf.imbalance, 2)
        out["ivf_lmax"] = int(svc.ivf.bucket_ids.shape[1])
    if svc.pq is not None:
        out["pq_bytes_per_item"] = svc.pq.bytes_per_item
    return out, ids


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    from esrecsys_tpu.axon_preflight import warn_cpu_fallback

    note = warn_cpu_fallback(log)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--items", type=int, default=2_262_292)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--k", type=int, default=500)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--queries", type=int, default=2048)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--overlap_queries", type=int, default=256)
    p.add_argument("--modes", default=",".join(MODES))
    p.add_argument("--structured", action="store_true")
    p.add_argument("--recall_target", type=float, default=0.95)
    p.add_argument("--fused_bins", type=int, default=4096,
                   help="fused-mode bin count (retrieval/fused.py)")
    p.add_argument("--ivf_clusters", type=int, default=4096)
    p.add_argument("--nprobe", type=int, default=64)
    p.add_argument("--ivf_iters", type=int, default=10)
    p.add_argument("--build_train_sample", type=int, default=0,
                   help="train IVF/PQ k-means on this many sampled rows "
                        "(setup_s then measures the sample-trained build)")
    p.add_argument("--ivf_max_cell", type=int, default=0,
                   help="cap IVF cell size (0 = off; retrieval/ivf.py)")
    p.add_argument("--pq_subspaces", type=int, default=8)
    p.add_argument("--pq_oversample", type=int, default=64)
    p.add_argument("--pq_rotate", action="store_true")
    p.add_argument("--pq_anisotropic", type=float, default=0.0,
                   help="score-aware PQ training threshold T (0 = off; retrieval/pq.anisotropic_eta)")
    p.add_argument("--out", default="/tmp/serving_bench.json")
    args = p.parse_args(argv)

    from esrecsys_tpu.retrieval.index import EmbeddingIndex

    vecs = make_catalog(args.items, args.dim, args.structured)
    index = EmbeddingIndex([str(i) for i in range(args.items)], vecs)
    rng = np.random.default_rng(99)
    # queries near the catalog manifold (the serving case)
    qrows = rng.integers(0, args.items, args.queries)
    queries = (vecs[qrows] + rng.normal(size=(args.queries, args.dim))
               .astype(np.float32) * 0.1)

    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    bad = set(modes) - set(MODES)
    if bad:
        raise SystemExit(f"unknown modes {sorted(bad)}; pick from {MODES}")
    results = []
    exact_ids = None
    if "exact" in modes:  # run exact first: it is the overlap reference
        modes = ["exact"] + [m for m in modes if m != "exact"]
    for mode in modes:
        res, ids = bench_mode(mode, index, queries, args.k, args,
                              exact_ids if mode != "exact" else None,
                              vecs=vecs)
        if mode == "exact":
            exact_ids = ids
        results.append(res)
        log.info("%s", res)

    out = {"items": args.items, "dim": args.dim, "k": args.k,
           "batch": args.batch, "structured": args.structured,
           "platform_note": note, "results": results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
