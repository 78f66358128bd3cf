"""Co-occurrence matrix construction.

Two builders, matching the reference's two Spark jobs:

  * :func:`build_token_cooccurrence` — sliding context window over body
    tokens with 1/distance weighting, symmetric storage only for
    ``my_idx > other_idx`` (wikipedia/make_cooccurrence.py:33-55);
  * :func:`build_url_cooccurrence` — unweighted pair counts over each doc's
    link set, for url2url dice training (wikipedia/make_dice.py:41-80).

Both accumulate into a dict-of-dicts (the reference does the same per Spark
partition, then reduceByKey; at single-box scale one accumulator suffices)
and emit CooccurrenceRow shards split at ``max_row_size``
(make_cooccurrence.py:80-92). A C++ fast path for the window loop lives in
:mod:`esrecsys_tpu.native` and is used automatically when built.

CLI:
  python -m esrecsys_tpu.etl.cooccurrence --mode tokens \
      --input 'docs/part-*' --token_dictionary tokens.bz2 --output cooc/
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Iterable, List, Sequence

from esrecsys_tpu.core import config as config_lib
from esrecsys_tpu.data import recordio
from esrecsys_tpu.data.protos import CooccurrenceRow, SparseDocument, TextDocument
from esrecsys_tpu.data.vocab import Vocabulary

log = logging.getLogger(__name__)

class PyCoocAccumulator:
    """Pure-Python accumulator (fallback; same semantics as the C++ one)."""

    def __init__(self) -> None:
        self.rows: Dict[int, Dict[int, float]] = {}

    def add_window(self, token_ids: Sequence[int], window: int) -> None:
        """Sliding-window counts with 1/distance weights
        (make_cooccurrence.py:33-55 semantics: only ``my_idx > other_idx``
        kept; same-index pairs skipped)."""
        n = len(token_ids)
        for i in range(n):
            my_idx = token_ids[i]
            start = max(0, i - window)
            end = min(n, i + window)
            row = self.rows.setdefault(my_idx, {})
            for j in range(start, end):
                other = token_ids[j]
                if my_idx <= other:
                    continue
                row[other] = row.get(other, 0.0) + 1.0 / abs(i - j)
            if not row:
                self.rows.pop(my_idx, None)

    def add_pairs(self, ids: Sequence[int]) -> None:
        """All unordered pairs of a link set, stored on larger-id rows
        (make_dice.py:41-54 semantics)."""
        unique = sorted(set(ids))
        for i, a in enumerate(unique):
            row = self.rows.setdefault(a, {})
            for b in unique[:i]:
                row[b] = row.get(b, 0.0) + 1.0
            if not row:
                self.rows.pop(a, None)

    def export(self):
        import numpy as np

        rows, others, counts = [], [], []
        for idx in sorted(self.rows):
            for other, c in sorted(self.rows[idx].items()):
                rows.append(idx)
                others.append(other)
                counts.append(c)
        return (
            np.asarray(rows, np.int64),
            np.asarray(others, np.int64),
            np.asarray(counts, np.float64),
        )


def make_accumulator(native: bool = True):
    """C++ accumulator when buildable, Python otherwise."""
    if native:
        try:
            from esrecsys_tpu.native import NativeCoocAccumulator

            return NativeCoocAccumulator()
        except Exception as e:  # missing toolchain etc. — degrade silently
            log.debug("native accumulator unavailable (%s); using Python", e)
    return PyCoocAccumulator()


def rows_from_accumulator(acc, max_row_size: int = 1000) -> Iterable[CooccurrenceRow]:
    """Split rows at ``max_row_size`` entries (make_cooccurrence.py:80-92)."""
    rows, others, counts = acc.export()
    n = rows.shape[0]
    start = 0
    while start < n:
        idx = rows[start]
        end = start
        while end < n and rows[end] == idx and end - start < max_row_size:
            end += 1
        yield CooccurrenceRow(
            index=int(idx),
            other_index=[int(o) for o in others[start:end]],
            count=[float(c) for c in counts[start:end]],
        )
        start = end


def build_token_cooccurrence(
    input_pattern: str,
    vocab: Vocabulary,
    output_dir: str,
    window: int = 10,
    max_row_size: int = 1000,
    rows_per_shard: int = 10_000,
) -> int:
    acc = make_accumulator()
    n_docs = 0
    for doc in recordio.read_protos(input_pattern, TextDocument, skip_corrupt=True):
        ids = vocab.embedding_indices(doc.tokens)
        acc.add_window(ids, window)
        n_docs += 1
        if n_docs % 10_000 == 0:
            log.info("processed %d docs", n_docs)
    n = 0
    with recordio.ShardedWriter(output_dir, rows_per_shard) as w:
        for row in rows_from_accumulator(acc, max_row_size):
            w.write_proto(row)
            n += 1
    log.info("%d docs -> %d cooccurrence rows -> %s", n_docs, n, output_dir)
    return n


def build_url_cooccurrence(
    input_pattern: str,
    output_dir: str,
    max_row_size: int = 1000,
    rows_per_shard: int = 10_000,
) -> int:
    """url2url pair counts from SparseDocument link sets (make_dice parity).

    Reads the url2url SparseDocuments (primary + secondary indices)."""
    acc = make_accumulator()
    for sdoc in recordio.read_protos(input_pattern, SparseDocument, skip_corrupt=True):
        ids = [sdoc.primary_index] + list(sdoc.secondary_index)
        acc.add_pairs(ids)
    n = 0
    with recordio.ShardedWriter(output_dir, rows_per_shard) as w:
        for row in rows_from_accumulator(acc, max_row_size):
            w.write_proto(row)
            n += 1
    log.info("%d url cooccurrence rows -> %s", n, output_dir)
    return n


@dataclasses.dataclass(frozen=True)
class CooccurrenceConfig:
    mode: str = "tokens"        # tokens | urls
    input: str = ""
    output: str = ""
    token_dictionary: str = ""
    context_window: int = 10    # make_cooccurrence.py:26
    max_row_size: int = 1000


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    cfg = config_lib.from_cli(CooccurrenceConfig, argv)
    if cfg.mode == "tokens":
        vocab = Vocabulary.load(cfg.token_dictionary)
        build_token_cooccurrence(
            cfg.input, vocab, cfg.output, cfg.context_window, cfg.max_row_size
        )
    elif cfg.mode == "urls":
        build_url_cooccurrence(cfg.input, cfg.output, cfg.max_row_size)
    else:
        raise SystemExit(f"unknown --mode {cfg.mode}")


if __name__ == "__main__":
    main()
