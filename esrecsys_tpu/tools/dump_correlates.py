"""Top-correlate printers for co-occurrence shards.

Capability parity with reference wikipedia/dump_cooccurrence.py:28-33 (raw
counts) and dump_dice.py:28-51 (dice = joint/(df_a+df_b); note the train-time
variant uses 2*joint/(df_a+df_b) — both exposed via --scale).

  python -m esrecsys_tpu.tools.dump_correlates --input 'cooc/part-*' \
      --dictionary titles.bz2 --metric dice --topk 10
"""

from __future__ import annotations

import dataclasses
import heapq

from esrecsys_tpu.core import config as config_lib
from esrecsys_tpu.data import recordio
from esrecsys_tpu.data.protos import CooccurrenceRow
from esrecsys_tpu.data.vocab import Vocabulary


@dataclasses.dataclass(frozen=True)
class DumpConfig:
    input: str = ""
    dictionary: str = ""
    metric: str = "count"   # count | dice
    scale: float = 1.0      # dump_dice uses 1.0; train_txt2url uses 2.0
    topk: int = 10
    limit: int = 20         # rows to print (0 = all)
    embedding_indices: bool = False  # True if rows use embedding-index space


def main(argv=None):
    cfg = config_lib.from_cli(DumpConfig, argv)
    vocab = Vocabulary.load(cfg.dictionary)

    def name(idx: int) -> str:
        if cfg.embedding_indices:
            return vocab.token_from_embedding_index(idx)
        return vocab.token(idx) if idx < len(vocab) else f"?{idx}"

    def df(idx: int) -> float:
        i = idx - 1 if cfg.embedding_indices else idx
        if 0 <= i < len(vocab):
            return float(vocab.doc_frequency(i))
        return 1.0

    printed = 0
    for row in recordio.read_protos(cfg.input, CooccurrenceRow, skip_corrupt=True):
        scored = []
        for other, joint in zip(row.other_index, row.count):
            if cfg.metric == "dice":
                score = cfg.scale * float(joint) / (df(row.index) + df(other))
            else:
                score = float(joint)
            scored.append((score, other))
        top = heapq.nlargest(cfg.topk, scored)
        correlates = " ".join(f"{name(o)}:{s:.4f}" for s, o in top)
        print(f"{name(row.index)}: {correlates}")
        printed += 1
        if cfg.limit and printed >= cfg.limit:
            break


if __name__ == "__main__":
    main()
