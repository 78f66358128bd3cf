"""The step-loop harness.

One loop replacing the reference's three near-identical hand-written loops
(train_shop_the_look.py:190-221, train_spotify.py:255-288,
train_cooccurence.py:179-186): jitted train step with donated state, windowed
metric means, eval cadence, checkpoint cadence, tracker logging, qualitative
hooks (KNN probes), and resume-from-step.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import jax
import numpy as np

from esrecsys_tpu.core.profiling import StepTimer
from esrecsys_tpu.core.tracking import NullTracker, Tracker

log = logging.getLogger(__name__)


@dataclasses.dataclass
class FitResult:
    state: Any
    last_train_metrics: Dict[str, float]
    last_eval_metrics: Dict[str, float]
    steps_run: int
    # the run was stopped by a termination signal (train/preemption.py):
    # state WAS checkpointed at this step; callers should skip final
    # export/eval and exit promptly so the grace window is not overrun
    preempted: bool = False
    # wall-clock accounting of the non-train stages, so composed runs can
    # split "sustained ex/s WITH cadences" into its parts (the first entry
    # of eval_round_s / the first dispatch carry the jit compiles — large
    # on the tunneled chip, see CLAUDE.md): seconds per eval round, per
    # checkpoint save, and of the first (compiling) train dispatch
    eval_round_s: tuple = ()
    ckpt_save_s: tuple = ()
    first_dispatch_s: float = 0.0


def fit(
    state: Any,
    train_step: Callable[[Any, Any], tuple],
    train_iter: Iterator[Any],
    num_steps: int,
    *,
    eval_step: Optional[Callable[[Any, Any], Dict[str, Any]]] = None,
    eval_setup_fn: Optional[Callable[[Any], Any]] = None,
    eval_iter_fn: Optional[Callable[[], Iterator[Any]]] = None,
    eval_every: int = 0,
    eval_steps: int = 0,
    log_every: int = 100,
    tracker: Optional[Tracker] = None,
    checkpointer: Optional[Any] = None,
    checkpoint_every: int = 0,
    hooks: Sequence[Callable[[Any, int], None]] = (),
    hook_every: int = 0,
    examples_per_step: int = 0,
    donate_state: bool = True,
    eval_on_train: bool = False,
    state_pack: Optional[Callable[[Any], Any]] = None,
    state_unpack: Optional[Callable[[Any], Any]] = None,
    prefetch: int = 2,
    steps_per_call: int = 1,
    mesh: Optional[Any] = None,
    profile_dir: Optional[str] = None,
    profile_steps: int = 20,
    preemption: Any = None,
) -> FitResult:
    """Run the training loop.

    Args:
      state: TrainState (resumes from ``state.step``, like the reference loops
        resume at train_shop_the_look.py:185-190).
      train_step: (state, batch) -> (state, metrics). Jitted here with the
        state donated, so table updates are in-place on device.
      train_iter: infinite iterator of device-ready batches.
      num_steps: final step number (absolute, not incremental).
      eval_step: (state, batch) -> metrics dict; averaged over ``eval_steps``.
        With ``eval_setup_fn``, called as (state, batch, aux).
      eval_setup_fn: (state) -> aux computed ONCE per eval round and passed to
        every eval_step call in the round (e.g. the full-corpus embedding
        matrix — the reference recomputes it per eval example,
        train_spotify.py:113-131).
      eval_iter_fn: builds a fresh eval iterator each eval round. Required
        when ``eval_step`` is given, unless ``eval_on_train=True`` explicitly
        opts into evaluating on the next training batches (the metric then
        measures train-data fit, not generalization).
      hooks: qualitative callbacks, e.g. probe-KNN dumps
        (train_cooccurence.py:114-126 parity).
      steps_per_call: run this many train steps per device dispatch via
        ``lax.scan`` over a stacked batch — amortizes host-dispatch latency
        (the reference pays one dispatch per step, two for GloVe:
        train_cooccurence.py:103-112). Cadences (log/eval/checkpoint/hook)
        fire at the first opportunity on or after their multiple.
      mesh: when given, every train batch leaf is placed batch-sharded over
        the ``data`` axis (leading dim, or dim 1 under steps_per_call > 1) —
        the DP input placement the reference never does.
      profile_dir: capture a TensorBoard-viewable device trace of the first
        ``profile_steps`` post-compile steps (the reference has no profiling
        at all, SURVEY.md §5).
      preemption: ``True`` installs a SIGTERM guard for the duration of the
        loop; or pass a managed ``train.preemption.PreemptionGuard``. On a
        signal the loop stops at the next dispatch boundary — agreed
        across processes so every host checkpoints the SAME step — saves,
        and returns ``preempted=True`` (the reference loses everything
        since the last cadenced save, SURVEY.md §5 failure detection).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from esrecsys_tpu.core.mesh import DATA_AXIS
    tracker = tracker or NullTracker()
    if eval_step is not None and eval_iter_fn is None and not eval_on_train:
        raise ValueError(
            "eval_step given without eval_iter_fn — eval would silently run "
            "on training batches; pass eval_iter_fn or set eval_on_train=True"
        )
    donate = (0,) if donate_state else ()
    init_step = int(jax.device_get(state.step))
    # clamp the device loop to the remaining steps so short runs (tests,
    # debug configs) don't overshoot num_steps by up to a whole call; the
    # loop advances in spc-step chunks, and when spc does not divide the
    # remaining count the FINAL call runs the shorter tail chunk (one extra
    # compile at that scan length) instead of overshooting or collapsing
    # spc to a small divisor
    remaining = max(1, num_steps - init_step)
    spc = max(1, min(steps_per_call, remaining))
    if remaining % spc:
        log.info(
            "steps_per_call=%d does not divide the remaining %d steps; the "
            "final call runs the %d-step tail (one extra compile at that "
            "scan length)", spc, remaining, remaining % spc)
    # state_pack/state_unpack: optional in-jit layout transform — e.g.
    # reshaping embedding tables to their 128-lane physical view so
    # per-step scatters hit fewer target rows (ops/optim.py pack_rows).
    # Applied ONCE for the whole run, not per dispatch: on TPU the
    # (R, D) <-> (R*D/128, 128) reshape materializes a tiled relayout
    # copy whose cost dwarfs the win it buys — per-dispatch transforms
    # measured 36.9k vs 661k ex/s for the momentum flagship and 733k vs
    # 814k for momentum-0 (BENCHMARKS.md r5 pack-boundary study). The
    # loop instead trains on the packed state and unpacks a logical VIEW
    # only at boundaries that need it (eval, hooks, checkpoint, return).
    if spc > 1:
        def multi_step(state, stacked_batch):
            return jax.lax.scan(lambda s, b: train_step(s, b),
                                state, stacked_batch)

        step_fn = multi_step
    else:
        step_fn = train_step
    # id-range guards: in "error" mode the step is checkify-functionalized so
    # an out-of-range embedding id raises on the host (ops/guards.py)
    from esrecsys_tpu.ops import guards as _guards

    step_fn, _throws = _guards.wrap_step_if_checking(step_fn)
    jit_train = jax.jit(step_fn, donate_argnums=donate)
    # eval/setup contain the same guarded lookups: functionalize them too in
    # error mode or their checkify.check calls fail at trace time
    def _jit_checked(fn):
        if fn is None:
            return None
        wrapped, throws = _guards.wrap_step_if_checking(fn)
        jitted = jax.jit(wrapped)
        if not throws:
            return jitted

        def call(*args):
            err, out = jitted(*args)
            err.throw()
            return out

        return call

    jit_eval = _jit_checked(eval_step)
    jit_eval_setup = _jit_checked(eval_setup_fn)

    # donate the logical state into the pack: without it the caller's full
    # logical tables + momentum buffers stay pinned in HBM for the whole
    # run next to the packed copy (an OOM at the 100M-row scale). fit
    # therefore CONSUMES its input state whenever state_pack is set —
    # callers must not reuse the passed-in TrainState afterwards.
    jit_pack = (jax.jit(state_pack, donate_argnums=0)
                if state_pack is not None else None)
    jit_unpack = (jax.jit(state_unpack)
                  if state_unpack is not None else None)
    if jit_pack is not None:
        state = jit_pack(state)

    # logical view of the (possibly packed) training state, computed at
    # most once per dispatch and only when a boundary consumer fires
    _lstate_cache: list = [None]

    def lstate():
        if jit_unpack is None:
            return state
        if _lstate_cache[0] is None:
            _lstate_cache[0] = jit_unpack(state)
        return _lstate_cache[0]

    timer = (
        StepTimer(examples_per_step * spc, window=max(log_every // spc, 1))
        if examples_per_step
        else None
    )
    window: Dict[str, list] = {}
    last_train: Dict[str, float] = {}
    last_eval: Dict[str, float] = {}

    def crossed(step: int, cadence: int, width: int = 0) -> bool:
        """True when [step-width, step] crossed a multiple of ``cadence``."""
        width = width or spc
        return cadence > 0 and (step // cadence) > ((step - width) // cadence)

    from esrecsys_tpu.train import preemption as _preemption

    guard = _preemption.resolve(preemption)
    own_guard = preemption is True  # fit installs/restores the handlers
    preempted = False

    steps_run = 0
    step = init_step
    profiling = False

    # Host-side batch prefetch: pull + stack the next call's batches on a
    # background thread so host prep overlaps device execution
    # (data/prefetch.py). Disabled when eval falls back to the training
    # iterator (eval_on_train) — the producer thread would race the eval
    # loop's pulls.
    def _pull_stacked():
        left = remaining
        while True:
            take = min(spc, left) if left > 0 else spc
            left -= take
            batches = [next(train_iter) for _ in range(take)]
            yield jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)

    raw_feed = _pull_stacked() if spc > 1 else train_iter
    if prefetch > 0 and not (eval_step is not None and eval_iter_fn is None):
        from esrecsys_tpu.data.prefetch import prefetched

        feed = prefetched(raw_feed, depth=prefetch)
    else:
        feed = raw_feed

    multiproc = jax.process_count() > 1

    def place(batch, lead=None):
        if mesh is None:
            return batch
        if lead is None:
            lead = 1 if spc > 1 else 0

        def put(x):
            spec = [None] * x.ndim
            if x.ndim > lead:
                spec[lead] = DATA_AXIS
            sharding = NamedSharding(mesh, P(*spec))
            if multiproc:
                # each host loaded only its batch slice (pipelines shard
                # files per process); assemble the global array from the
                # per-process local data — the multi-host input path the
                # reference never has (train_cooccurence.py:148-150 logs
                # process_index but loads everything everywhere)
                return jax.make_array_from_process_local_data(
                    sharding, np.asarray(x))
            return jax.device_put(x, sharding)

        return jax.tree_util.tree_map(put, batch)

    # stage accounting for FitResult (composed-run cost split). The host
    # loop runs ahead of the device (async dispatch), so before starting a
    # stage timer the pending train backlog is DRAINED with a true barrier
    # — otherwise queued train time lands in whichever stage syncs next
    # and the split lies in both directions (observed: a 618k ex/s "steady"
    # reading against a 348k isolated step). device_get, not
    # block_until_ready: only device_get round-trips the axon tunnel
    # (CLAUDE.md); one ~28 ms round-trip per cadence event.
    eval_round_s: list = []
    ckpt_save_s: list = []
    first_dispatch_s = 0.0

    def drain(last_metrics) -> None:
        leaves = jax.tree_util.tree_leaves(last_metrics)
        if leaves:
            jax.device_get(leaves[0])

    if own_guard:
        guard.__enter__()
    try:
        while step < num_steps:
            if profile_dir and steps_run == spc and not profiling:
                # start after the first (compile) call so the trace is steady-state
                jax.profiler.start_trace(profile_dir)
                profiling = True
            cur = min(spc, num_steps - step)  # final call may be the tail chunk
            batch = next(feed)
            t_call = time.perf_counter() if steps_run == 0 else None
            if _throws:
                err, (state, metrics) = jit_train(state, place(batch))
                err.throw()
            else:
                state, metrics = jit_train(state, place(batch))
            if t_call is not None:
                # first call traces+compiles synchronously before enqueuing
                first_dispatch_s = time.perf_counter() - t_call
            _lstate_cache[0] = None  # logical view is stale now
            step += cur
            steps_run += cur
            for k, v in metrics.items():
                window.setdefault(k, []).append(v)

            if crossed(step, log_every, cur):
                # One device_get for the whole window (keeps the loop async).
                # Concatenate raveled per-call arrays before the mean: the tail
                # call's metrics have scan length `remaining % spc`, so the
                # window can be ragged and np.mean on the list would raise.
                vals = jax.device_get(window)
                last_train = {
                    f"train_{k}": float(np.mean(np.concatenate(
                        [np.ravel(a) for a in v])))
                    for k, v in vals.items()
                }
                if timer is not None:
                    t = timer.tick(examples_per_step * cur, force=True)
                    if t:
                        last_train.update(t)
                tracker.log(last_train, step)
                window = {}
            elif timer is not None:
                timer.tick(examples_per_step * cur)

            if jit_eval is not None and crossed(step, eval_every, cur):
                drain(metrics)  # pending train time stays train time
                t_eval = time.perf_counter()
                acc: Dict[str, list] = {}
                it = eval_iter_fn() if eval_iter_fn is not None else None
                est = lstate()  # eval consumes the logical layout
                aux = (jit_eval_setup(est),) if jit_eval_setup is not None else ()
                for _ in range(eval_steps):
                    ebatch = next(it if it is not None else train_iter)
                    if multiproc:
                        # eval batches are also per-host slices; assemble them
                        # (single-process keeps the established un-placed path)
                        ebatch = place(ebatch, lead=0)
                    em = jax.device_get(jit_eval(est, ebatch, *aux))
                    for k, v in em.items():
                        acc.setdefault(k, []).append(v)
                last_eval = {f"eval_{k}": float(np.mean(v)) for k, v in acc.items()}
                eval_round_s.append(round(time.perf_counter() - t_eval, 3))
                tracker.log(last_eval, step)

            if hooks and crossed(step, hook_every, cur):
                for hook in hooks:
                    hook(lstate(), step)

            if profiling and steps_run >= spc + profile_steps:
                jax.block_until_ready(jax.tree_util.tree_leaves(metrics))
                jax.profiler.stop_trace()
                profiling = False

            if checkpointer is not None and crossed(step, checkpoint_every, cur):
                # checkpoints always hold the LOGICAL layout so they restore
                # across packed/unpacked configs (train/checkpoint.py)
                drain(metrics)
                t_ck = time.perf_counter()
                checkpointer.save(step, lstate())
                ckpt_save_s.append(round(time.perf_counter() - t_ck, 3))

            # preemption: polled once per dispatch, AGREED across processes
            # (any host signalled => all stop here), so the tail save below
            # writes one consistent step from every process
            if guard is not None and guard.should_stop():
                log.warning(
                    "termination signal: stopping cleanly at step %d "
                    "(checkpoint follows; resume re-launches from it)", step)
                preempted = True
                break
    finally:
        if own_guard:
            guard.__exit__(None, None, None)

    if profiling:
        jax.profiler.stop_trace()
    state = lstate()  # hand back (and checkpoint) the logical layout
    if checkpointer is not None and steps_run:
        t_ck = time.perf_counter()
        checkpointer.save(int(jax.device_get(state.step)), state)
        # async checkpointers (Checkpointer(async_save=True)) overlap
        # mid-run saves with training; the FINAL save must be durable
        # before fit returns (callers may exit or hand the dir off)
        wait = getattr(checkpointer, "wait", None)
        if wait is not None:
            wait()
        # counted with the cadence saves so the stage split accounts the
        # whole wall (this one also drains any tail train backlog)
        ckpt_save_s.append(round(time.perf_counter() - t_ck, 3))
    return FitResult(state, last_train, last_eval, steps_run, preempted,
                     eval_round_s=tuple(eval_round_s),
                     ckpt_save_s=tuple(ckpt_save_s),
                     first_dispatch_s=round(first_dispatch_s, 3))
