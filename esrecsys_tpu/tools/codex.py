"""codex: cat tool for record shards of any framework proto.

Capability parity with reference wikipedia/codex.py:20-47 (``--proto
wiki|doc|sdoc|tstat|cooccur``), plus `--limit`.

  python -m esrecsys_tpu.tools.codex --input 'shards/part-*.bz2' --proto doc
"""

from __future__ import annotations

import dataclasses

from esrecsys_tpu.core import config as config_lib
from esrecsys_tpu.data import recordio
from esrecsys_tpu.data.protos import (
    CooccurrenceRow,
    Page,
    SparseDocument,
    TextDocument,
    TokenStat,
)

PROTOS = {
    "wiki": Page,
    "doc": TextDocument,
    "sdoc": SparseDocument,
    "tstat": TokenStat,
    "cooccur": CooccurrenceRow,
}


@dataclasses.dataclass(frozen=True)
class CodexConfig:
    input: str = ""
    proto: str = "doc"
    limit: int = 0  # 0 = all


def main(argv=None):
    cfg = config_lib.from_cli(CodexConfig, argv)
    if cfg.proto not in PROTOS:
        raise SystemExit(f"--proto must be one of {sorted(PROTOS)}")
    n = 0
    for msg in recordio.read_protos(cfg.input, PROTOS[cfg.proto], skip_corrupt=True):
        print(msg)
        n += 1
        if cfg.limit and n >= cfg.limit:
            break


if __name__ == "__main__":
    main()
