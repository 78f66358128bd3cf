"""Dictionary building from TextDocument shards.

Capability parity with reference wikipedia/make_dictionary.py:92-138 (Spark):
per-shard TokenStat counting (frequency + doc_frequency), merge, min-frequency
filter, frequency-desc sort, truncation, contiguous index assignment — as a
plain shard-map + Counter-merge. Token dictionary counts body tokens; title
dictionary counts primary + secondary URLs.

CLI:
  python -m esrecsys_tpu.etl.dictionary --input 'docs/part-*' \
      --token_output tokens.bz2 --title_output titles.bz2
"""

from __future__ import annotations

import dataclasses
import logging
from collections import Counter
from typing import Iterable, Tuple

from esrecsys_tpu.core import config as config_lib
from esrecsys_tpu.data import recordio
from esrecsys_tpu.data.protos import TextDocument
from esrecsys_tpu.data.vocab import Vocabulary

log = logging.getLogger(__name__)


def count_doc_tokens(docs: Iterable[TextDocument]) -> Tuple[Counter, Counter]:
    freq: Counter = Counter()
    doc_freq: Counter = Counter()
    for doc in docs:
        freq.update(doc.tokens)
        doc_freq.update(set(doc.tokens))
    return freq, doc_freq


def count_doc_titles(docs: Iterable[TextDocument]) -> Tuple[Counter, Counter]:
    """Counts primary + secondary titles (make_dictionary.py:52-64)."""
    freq: Counter = Counter()
    doc_freq: Counter = Counter()
    for doc in docs:
        titles = [doc.primary] + list(doc.secondary)
        freq.update(titles)
        doc_freq.update(set(titles))
    return freq, doc_freq


def build_token_dictionary(
    input_pattern: str, min_frequency: int = 50, max_size: int = 500_000
) -> Vocabulary:
    freq, doc_freq = count_doc_tokens(
        recordio.read_protos(input_pattern, TextDocument, skip_corrupt=True)
    )
    return Vocabulary.from_counts(freq, doc_freq, min_frequency, max_size)


def build_title_dictionary(
    input_pattern: str, min_frequency: int = 5, max_size: int = 5_000_000
) -> Vocabulary:
    freq, doc_freq = count_doc_titles(
        recordio.read_protos(input_pattern, TextDocument, skip_corrupt=True)
    )
    vocab = Vocabulary.from_counts(freq, doc_freq, min_frequency, max_size)
    return vocab


@dataclasses.dataclass(frozen=True)
class DictionaryConfig:
    """Defaults follow wikipedia/README.md:94-95 (tokens: min freq 50, max
    500k; titles: min freq 5, max 5M)."""

    input: str = ""
    token_output: str = ""
    title_output: str = ""
    min_token_frequency: int = 50
    max_token_dictionary_size: int = 500_000
    min_title_frequency: int = 5
    max_title_dictionary_size: int = 5_000_000


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    cfg = config_lib.from_cli(DictionaryConfig, argv)
    if cfg.token_output:
        vocab = build_token_dictionary(
            cfg.input, cfg.min_token_frequency, cfg.max_token_dictionary_size
        )
        vocab.save(cfg.token_output)
        log.info("token dictionary: %d entries -> %s", len(vocab), cfg.token_output)
    if cfg.title_output:
        vocab = build_title_dictionary(
            cfg.input, cfg.min_title_frequency, cfg.max_title_dictionary_size
        )
        vocab.save(cfg.title_output)
        log.info("title dictionary: %d entries -> %s", len(vocab), cfg.title_output)


if __name__ == "__main__":
    main()
