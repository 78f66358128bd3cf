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

Accumulator = Dict[int, Dict[int, float]]


def accumulate_window(
    token_ids: Sequence[int],
    window: int,
    acc: Accumulator,
) -> None:
    """Sliding-window counts with 1/distance weights
    (make_cooccurrence.py:33-55 semantics: only ``my_idx > other_idx`` kept;
    same-index pairs skipped)."""
    try:
        from esrecsys_tpu.native import cooccur_window

        cooccur_window(token_ids, window, acc)
        return
    except ImportError:
        pass
    n = len(token_ids)
    for i in range(n):
        my_idx = token_ids[i]
        start = max(0, i - window)
        end = min(n, i + window)
        row = acc.setdefault(my_idx, {})
        for j in range(start, end):
            other = token_ids[j]
            if my_idx <= other:
                continue
            row[other] = row.get(other, 0.0) + 1.0 / abs(i - j)
        if not row:
            acc.pop(my_idx, None)


def accumulate_pairs(ids: Sequence[int], acc: Accumulator) -> None:
    """All unordered pairs of a link set, stored for larger-id rows
    (make_dice.py:41-54 semantics)."""
    unique = sorted(set(ids))
    for i, a in enumerate(unique):
        for b in unique[:i]:
            row = acc.setdefault(a, {})
            row[b] = row.get(b, 0.0) + 1.0


def rows_from_accumulator(acc: Accumulator, max_row_size: int = 1000) -> Iterable[CooccurrenceRow]:
    """Split rows at ``max_row_size`` entries (make_cooccurrence.py:80-92)."""
    for idx in sorted(acc):
        items = sorted(acc[idx].items())
        for start in range(0, len(items), max_row_size):
            chunk = items[start : start + max_row_size]
            yield CooccurrenceRow(
                index=idx,
                other_index=[k for k, _ in chunk],
                count=[v for _, v in chunk],
            )


def build_token_cooccurrence(
    input_pattern: str,
    vocab: Vocabulary,
    output_dir: str,
    window: int = 10,
    max_row_size: int = 1000,
    rows_per_shard: int = 10_000,
) -> int:
    acc: Accumulator = {}
    n_docs = 0
    for doc in recordio.read_protos(input_pattern, TextDocument, skip_corrupt=True):
        ids = vocab.embedding_indices(doc.tokens)
        accumulate_window(ids, window, acc)
        n_docs += 1
        if n_docs % 10_000 == 0:
            log.info("processed %d docs, %d rows", n_docs, len(acc))
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
    acc: Accumulator = {}
    for sdoc in recordio.read_protos(input_pattern, SparseDocument, skip_corrupt=True):
        ids = [sdoc.primary_index] + list(sdoc.secondary_index)
        accumulate_pairs(ids, acc)
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
