"""Retrieval auto-tuner: pick the cheapest serving mode meeting a recall
target on YOUR catalog, and emit the serving flags that turn it on.

The serving path ships six approximate scan modes (int8 / IVF / PQ and
their compositions — serving/server.py), each with its own quality knob.
BENCHMARKS.md records their recall/cost curves on synthetic geometries,
but the right (mode, knob) for a real catalog depends on ITS geometry —
the decision the reference never had to make (it brute-forces every
catalog: pinterest/make_recommendations.py:49-65). This tool makes that
decision measurable and automatic:

  1. sample calibration queries (perturbed catalog rows — serving
     queries are context embeddings near, not at, item rows);
  2. compute exact ground-truth top-k once;
  3. build each candidate structure ONCE (IVF index, PQ codebooks,
     int8 catalog), then sweep each mode's knob ascending (nprobe /
     oversample) until the target recall is met on calibration;
  4. rank every config that met target by scan traffic per query
     (bytes the catalog scan must move per query), and print the
     winner's serving flags — or, with ``--measure_throughput``, by
     MEASURED queries/s of each feasible config on this host.

Cost model (bytes of catalog traffic per query vector, D-dim f32, M
items, S-byte PQ codes, IVF probe width ``nprobe x Lmax``):

  exact         4*D*M                 int8        D*M
  fused         2*D*M                 ivf         4*D*nprobe*Lmax
  ivf_int8      D*nprobe*Lmax         pq          S*M + 4*D*cand
  ivf_pq        S*nprobe*Lmax + 4*D*cand

(``cand``: exact-rescore candidates, ~oversample*k.) Residency is
reported per item alongside (f32 catalog + aux structures), matching
``/statsz``'s accounting, so beyond-HBM constraints can veto a winner.

Bytes are a PROXY that misranks selection-bound regimes: BENCHMARKS.md's
chip lattice (2.26M items, k=500) shows the int8 scan moving 4x fewer
bytes than exact yet winning only 7%, while the fused Pallas kernel
(2x int8's bytes, but zero in-scan selection cost) beats every mode.
``--measure_throughput`` replaces the proxy with reality: it times each
feasible config's compiled fn on this host and ranks by q/s — run it ON
THE SERVING HARDWARE for deployment decisions.

``--approx`` (hardware ``approx_max_k``) is deliberately NOT calibrated
here: on CPU it lowers to exact top-k, so calibration off-chip would
report recall 1.0 regardless of its ``recall_target`` knob. Its recall
contract is already XLA-calibrated on TPU; pick it via BENCHMARKS.md.

Run:
  python -m esrecsys_tpu.tools.retrieval_autotune \
      --artifact catalog.npz --target_recall 0.95 --k 10
Prints the recommended mode + flags; full ranking goes to ``--out``.
"""

from __future__ import annotations

import argparse
import json
import logging
import time

import numpy as np

from esrecsys_tpu.core.transfer import chunked_device_put
# the SAME metric the quality study reports — calibration and study must
# never drift apart
from esrecsys_tpu.tools.retrieval_quality_study import recall as _recall

log = logging.getLogger(__name__)


def _batched_found(fn, queries, batch):
    """Run a jitted (vals, idx) top-k fn over query batches; mask pad
    slots (NEG_INF scores come back as index 0) to -1."""
    import jax
    import jax.numpy as jnp

    found = []
    for s in range(0, queries.shape[0], batch):
        vals, idx = fn(jnp.asarray(queries[s:s + batch]))
        idx = jnp.where(jnp.isfinite(vals), idx, -1)
        found.append(np.asarray(jax.device_get(idx)))
    return np.concatenate(found)


def autotune(vecs: np.ndarray, queries: np.ndarray, target_recall: float,
             k: int = 10,
             nprobes=(1, 2, 4, 8, 16, 32, 64, 128),
             oversamples=(4, 16, 64, 256),
             ivf_clusters: int = 0, ivf_max_cell: int = 0,
             pq_subspaces: int = 8, pq_rotate: bool = False,
             pq_anisotropic: float = 0.0,
             build_iters: int = 10, train_sample: int = 0,
             batch: int = 64,
             fused_bins_sweep=(512, 1024, 2048, 4096, 8192),
             measure_throughput: bool = False) -> dict:
    """Calibrate every candidate mode on (vecs, queries); return the
    ranked feasible configs. Recall calibration is a pure function of
    the catalog geometry — identical on CPU and TPU; with
    ``measure_throughput`` the ranking additionally times each feasible
    config on THIS host (meaningful on the serving hardware)."""
    import jax
    import jax.numpy as jnp

    from esrecsys_tpu.retrieval.fused import binned_topk_over_matrix
    from esrecsys_tpu.retrieval.fused import pack_catalog as _pack_catalog
    from esrecsys_tpu.retrieval.ivf import IVFIndex, ivf_pq_topk, ivf_topk
    from esrecsys_tpu.retrieval.mips import (quantize_rows,
                                             quantized_topk_over_matrix,
                                             topk_over_matrix)
    from esrecsys_tpu.retrieval.pq import PQCodebook, pq_topk

    m, d = vecs.shape
    if not ivf_clusters:
        # sqrt-law default, rounded to a power of two, >= 16
        ivf_clusters = max(16, 1 << int(np.log2(max(16.0, np.sqrt(m)))))
    ts = train_sample or None

    items = chunked_device_put(np.asarray(vecs, np.float32))
    t0 = time.perf_counter()
    truth = np.asarray(jax.device_get(jax.jit(
        topk_over_matrix, static_argnums=(2,))(
            jnp.asarray(queries), items, k)[1]))
    log.info("ground truth: %d queries, k=%d (%.1fs)", len(queries), k,
             time.perf_counter() - t0)

    configs = []  # every (mode, knob) tried, feasible or not

    def add(mode, knob, recall, scan_bytes, resident, kwargs, flags,
            fn=None):
        configs.append({
            "mode": mode, "knob": knob, "recall": round(recall, 4),
            "scan_bytes_per_query": int(scan_bytes),
            "resident_bytes_per_item": round(resident, 1),
            "meets_target": recall >= target_recall,
            "kwargs": kwargs, "flags": flags,
            "_fn": fn})  # curried top-k fn; popped before return
        log.info("%-14s %-22s recall=%.3f scan=%.2f MB/query", mode,
                 str(knob), recall, scan_bytes / 1e6)

    # NOTE: arrays are always ARGUMENTS of the jitted library fns, never
    # closed over — closed-over arrays become program constants the axon
    # tunnel re-ships per call (CLAUDE.md). The un-jitted lambdas below
    # only curry those arguments.

    # ---- exact & int8 full scans (no knob) --------------------------------
    jexact = jax.jit(topk_over_matrix, static_argnums=(2,))
    add("exact", None, 1.0, 4 * d * m, 4 * d, {}, "",
        fn=lambda q: jexact(q, items, k))
    q8, scales = jax.jit(quantize_rows)(items)
    j8 = jax.jit(quantized_topk_over_matrix, static_argnames=("k", "select"))
    fn8 = lambda q: j8(q, q8, scales, items, k=k, select="exact")
    r8 = _recall(_batched_found(fn8, queries, batch), truth)
    add("int8", None, r8, d * m, 4 * d + d + 4, {"quantized": True},
        "--quantized", fn=fn8)

    # ---- fused Pallas scan+select (bins sweep) -----------------------------
    # recall rises ~quadratically with L (expected losses C(k,3)/L^2,
    # retrieval/fused.py); calibration runs the REAL kernel (compiled
    # Mosaic on TPU, interpreter on CPU — same semantics), so bf16
    # selection effects are included. Serving may cap bins below the
    # calibrated L when max_batch*L outgrows VMEM (fused.auto_bins).
    jfused = jax.jit(binned_topk_over_matrix,
                     static_argnames=("k", "num_bins"))
    jpack = jax.jit(_pack_catalog, static_argnums=(1,))
    for L in fused_bins_sweep:
        packed = jpack(items, L)
        fnf = (lambda q, _L=L, _p=packed:
               jfused(q, items, k=k, num_bins=_L, items_packed=_p))
        r = _recall(_batched_found(fnf, queries, batch), truth)
        add("fused", {"bins": L}, r, 2 * d * m + 4 * d * k,
            4 * d + 2 * d, {"fused": True, "fused_bins": L},
            f"--fused --fused_bins {L}", fn=fnf)
        if r >= target_recall:
            break

    # ---- IVF (probe sweep), f32 and int8 candidate gathers ----------------
    t0 = time.perf_counter()
    index = IVFIndex.build(items, ivf_clusters, iters=build_iters,
                           max_cell=ivf_max_cell or None, train_sample=ts)
    log.info("ivf built: C=%d Lmax=%d (%.1fs)", index.n_clusters,
             index.bucket_ids.shape[1], time.perf_counter() - t0)
    cent = jnp.asarray(index.centroids)
    buckets = jnp.asarray(index.bucket_ids)
    lmax = index.bucket_ids.shape[1]
    ivf_kw = {"ivf_clusters": ivf_clusters, "ivf_iters": build_iters}
    ivf_fl = f"--ivf_clusters {ivf_clusters} --ivf_iters {build_iters}"
    if ivf_max_cell:
        ivf_kw["ivf_max_cell"] = ivf_max_cell
        ivf_fl += f" --ivf_max_cell {ivf_max_cell}"
    jivf = jax.jit(ivf_topk, static_argnums=(4, 5))
    for p in nprobes:
        if p > index.n_clusters:
            break
        fn = lambda q, _p=p: jivf(q, cent, buckets, items, k, _p)
        r = _recall(_batched_found(fn, queries, batch), truth)
        # residency mirrors /statsz: +4 = the int32 bucket slot per item
        add("ivf", {"nprobe": p}, r, 4 * d * p * lmax, 4 * d + 4,
            dict(ivf_kw, nprobe=p), f"{ivf_fl} --nprobe {p}", fn=fn)
        if r >= target_recall:
            break
    for p in nprobes:
        if p > index.n_clusters:
            break
        fn = lambda q, _p=p: jivf(
            q, cent, buckets, items, k, _p, q_items=q8, item_scales=scales)
        r = _recall(_batched_found(fn, queries, batch), truth)
        add("ivf_int8", {"nprobe": p}, r, d * p * lmax,
            4 * d + d + 4 + 4,
            dict(ivf_kw, nprobe=p, quantized=True),
            f"{ivf_fl} --nprobe {p} --quantized", fn=fn)
        if r >= target_recall:
            break

    # ---- PQ (oversample sweep) + IVF-PQ (probe sweep at max budget) -------
    t0 = time.perf_counter()
    pq_iters = max(build_iters, 15)
    book = PQCodebook.build(
        items, pq_subspaces, iters=pq_iters,
        rotate=pq_rotate, anisotropic_threshold=pq_anisotropic or None,
        train_sample=ts)
    log.info("pq built: S=%d rot=%s aniso=%s (%.1fs)", pq_subspaces,
             pq_rotate, pq_anisotropic or None, time.perf_counter() - t0)
    pq_cent = jnp.asarray(book.centroids)
    pq_codes = jnp.asarray(book.codes)
    rot = jnp.asarray(book.rotation) if book.rotation is not None else None
    s_b = book.bytes_per_item
    # pin the calibrated build depth: a serving rebuild at a different
    # pq_iters would be a DIFFERENT codebook than the one that met target
    pq_kw = {"pq_subspaces": pq_subspaces, "pq_iters": pq_iters}
    pq_fl = f"--pq_subspaces {pq_subspaces} --pq_iters {pq_iters}"
    if pq_rotate:
        pq_kw["pq_rotate"] = True
        pq_fl += " --pq_rotate"
    if pq_anisotropic:
        pq_kw["pq_anisotropic"] = pq_anisotropic
        pq_fl += f" --pq_anisotropic {pq_anisotropic}"
    jpq = jax.jit(pq_topk, static_argnames=("k", "block_size",
                                            "per_block_k", "oversample"))
    for o in oversamples:
        fn = lambda q, _o=o: jpq(
            q, pq_cent, pq_codes, k=k, rescore_items=items, oversample=_o,
            rotation=rot)
        r = _recall(_batched_found(fn, queries, batch), truth)
        add("pq", {"oversample": o}, r, s_b * m + 4 * d * o * k,
            4 * d + s_b, dict(pq_kw, pq_oversample=o),
            f"{pq_fl} --pq_oversample {o}", fn=fn)
        if r >= target_recall:
            break
    o_max = max(oversamples)
    jivfpq = jax.jit(ivf_pq_topk,
                     static_argnames=("k", "nprobe", "oversample"))
    for p in nprobes:
        if p > index.n_clusters:
            break
        fn = lambda q, _p=p: jivfpq(
            q, cent, buckets, items, k=k, nprobe=_p, pq_centroids=pq_cent,
            pq_codes=pq_codes, oversample=o_max, rotation=rot)
        r = _recall(_batched_found(fn, queries, batch), truth)
        add("ivf_pq", {"nprobe": p, "oversample": o_max}, r,
            s_b * p * lmax + 4 * d * o_max * k, 4 * d + s_b + 4,
            dict(ivf_kw, **pq_kw, nprobe=p, pq_oversample=o_max),
            f"{ivf_fl} {pq_fl} --nprobe {p} --pq_oversample {o_max}",
            fn=fn)
        if r >= target_recall:
            break

    if measure_throughput:
        # rank by reality, not the bytes proxy: time each feasible
        # config's compiled fn on THIS host (serving_bench methodology —
        # steady-state wall over repeated batched calls, device_get as
        # the true barrier; CLAUDE.md tunnel notes)
        qs = np.asarray(queries, np.float32)
        for c in configs:
            if not c["meets_target"] or c["_fn"] is None:
                continue
            _batched_found(c["_fn"], qs[:batch], batch)  # warm/compile
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                _batched_found(c["_fn"], qs, batch)
            wall = time.perf_counter() - t0
            c["queries_per_s"] = round(reps * qs.shape[0] / wall, 1)
            log.info("%-14s %-22s measured %.1f q/s", c["mode"],
                     str(c["knob"]), c["queries_per_s"])

    for c in configs:
        c.pop("_fn", None)
    feasible = sorted(
        (c for c in configs if c["meets_target"]),
        key=((lambda c: -c.get("queries_per_s", 0.0))
             if measure_throughput
             else (lambda c: c["scan_bytes_per_query"])))
    return {
        "n_items": int(m), "dim": int(d), "k": k,
        "target_recall": target_recall,
        "n_queries": int(queries.shape[0]),
        "ranked_by": ("measured_queries_per_s" if measure_throughput
                      else "scan_bytes_per_query"),
        "recommended": feasible[0] if feasible else None,
        "feasible": feasible,
        "all_configs": configs,
    }


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    from esrecsys_tpu.axon_preflight import warn_cpu_fallback

    warn_cpu_fallback(log)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", default="",
                   help="EmbeddingIndex .npz to tune for (else synthetic)")
    p.add_argument("--target_recall", type=float, default=0.95)
    p.add_argument("--k", type=int, default=10,
                   help="recall@k the target applies to (match serving k)")
    p.add_argument("--n_queries", type=int, default=256)
    p.add_argument("--query_noise", type=float, default=0.1,
                   help="calibration queries = catalog rows + this much "
                        "gaussian noise (x row std)")
    p.add_argument("--ivf_clusters", type=int, default=0,
                   help="IVF coarse clusters (0 = sqrt(M) power of two)")
    p.add_argument("--ivf_max_cell", type=int, default=0)
    p.add_argument("--pq_subspaces", type=int, default=8)
    p.add_argument("--pq_rotate", action="store_true")
    p.add_argument("--pq_anisotropic", type=float, default=0.0)
    p.add_argument("--build_iters", type=int, default=10)
    p.add_argument("--build_train_sample", type=int, default=0)
    p.add_argument("--nprobes", default="1,2,4,8,16,32,64,128")
    p.add_argument("--oversamples", default="4,16,64,256")
    p.add_argument("--fused_bins_sweep", default="512,1024,2048,4096,8192",
                   help="fused-mode bin counts tried ascending "
                        "(retrieval/fused.py; recall ~ 1 - C(k,3)/(L^2 k))")
    p.add_argument("--measure_throughput", action="store_true",
                   help="rank feasible configs by MEASURED q/s on this "
                        "host instead of the scan-bytes proxy (run on the "
                        "serving hardware; see module docstring)")
    # synthetic fallback knobs (demo / CI)
    p.add_argument("--n_items", type=int, default=100_000)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--regime", default="clustered")
    p.add_argument("--out", default="/tmp/retrieval_autotune.json")
    args = p.parse_args(argv)

    rng = np.random.default_rng(0)
    if args.artifact:
        from esrecsys_tpu.retrieval.index import EmbeddingIndex

        vecs = np.asarray(EmbeddingIndex.load(args.artifact).vectors,
                          np.float32)
        qi = rng.choice(vecs.shape[0], args.n_queries, replace=False)
        queries = (vecs[qi] + args.query_noise * vecs.std()
                   * rng.standard_normal((args.n_queries, vecs.shape[1]))
                   ).astype(np.float32)
    else:
        from esrecsys_tpu.tools.retrieval_quality_study import synth_catalog

        vecs, queries = synth_catalog(args.regime, args.n_items,
                                      args.n_queries, args.dim, rng)

    result = autotune(
        vecs, queries, args.target_recall, k=args.k,
        nprobes=[int(x) for x in args.nprobes.split(",")],
        oversamples=[int(x) for x in args.oversamples.split(",")],
        ivf_clusters=args.ivf_clusters, ivf_max_cell=args.ivf_max_cell,
        pq_subspaces=args.pq_subspaces, pq_rotate=args.pq_rotate,
        pq_anisotropic=args.pq_anisotropic,
        build_iters=args.build_iters,
        train_sample=args.build_train_sample,
        fused_bins_sweep=[int(x) for x in args.fused_bins_sweep.split(",")],
        measure_throughput=args.measure_throughput)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    rec = result["recommended"]
    if rec is None:
        print(json.dumps({"recommended": None,
                          "note": "no config met target; raise knob caps "
                                  "or lower --target_recall"}))
    else:
        line = {"recommended": rec["mode"], "knob": rec["knob"],
                "recall": rec["recall"],
                "scan_MB_per_query":
                    round(rec["scan_bytes_per_query"] / 1e6, 2),
                "serve_flags": rec["flags"]}
        if "queries_per_s" in rec:
            line["measured_queries_per_s"] = rec["queries_per_s"]
        print(json.dumps(line))


if __name__ == "__main__":
    main()
