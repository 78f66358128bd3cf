"""TextDocument → SparseDocument conversion.

Capability parity with reference wikipedia/make_sparse_doc.py:32-99 (two
variants: txt2url = primary title index + token embedding indices; url2url =
primary + secondary title indices) and count_terms.py:32-94 (L2-normalized
TF-IDF sparse docs).

CLI:
  python -m esrecsys_tpu.etl.sparse_docs --mode txt2url --input 'docs/part-*' \
      --token_dictionary tokens.bz2 --title_dictionary titles.bz2 --output out/
"""

from __future__ import annotations

import dataclasses
import logging
import math
from collections import Counter
from typing import Iterator, Optional

from esrecsys_tpu.core import config as config_lib
from esrecsys_tpu.data import recordio
from esrecsys_tpu.data.protos import SparseDocument, TextDocument
from esrecsys_tpu.data.vocab import Vocabulary

log = logging.getLogger(__name__)


def doc_to_txt2url(
    doc: TextDocument, token_vocab: Vocabulary, title_vocab: Vocabulary
) -> Optional[SparseDocument]:
    """primary title index + token *embedding* indices
    (make_sparse_doc.py:32-48: docs whose primary title is OOV are dropped)."""
    primary = title_vocab.token_index(doc.primary)
    if primary is None:
        return None
    return SparseDocument(
        url=doc.primary,
        primary_index=primary,
        token_index=token_vocab.embedding_indices(doc.tokens),
    )


def doc_to_url2url(
    doc: TextDocument, title_vocab: Vocabulary
) -> Optional[SparseDocument]:
    """primary + secondary title dictionary indices
    (make_sparse_doc.py:51-68: OOV secondaries dropped; doc kept only if the
    primary is in-dictionary and at least one secondary survives)."""
    primary = title_vocab.token_index(doc.primary)
    if primary is None:
        return None
    secondary = [
        idx
        for t in doc.secondary
        if (idx := title_vocab.token_index(t)) is not None
    ]
    if not secondary:
        return None
    return SparseDocument(url=doc.primary, primary_index=primary,
                          secondary_index=secondary)


def doc_to_tfidf(
    doc: TextDocument, token_vocab: Vocabulary, title_vocab: Vocabulary
) -> Optional[SparseDocument]:
    """L2-normalized TF-IDF over in-dictionary tokens
    (count_terms.py:32-74: idf = log1p(max_df) - log1p(df) + 1, clamped >= 0).
    Token indices here are *dictionary* indices (count_terms semantics), not
    embedding indices."""
    primary = title_vocab.token_index(doc.primary)
    if primary is None:
        return None
    counts = Counter()
    for tok in doc.tokens:
        idx = token_vocab.token_index(tok)
        if idx is not None:
            counts[idx] += 1
    if not counts:
        return None
    max_df = token_vocab.max_doc_frequency
    idx_list, tfidf = [], []
    for idx, tf in sorted(counts.items()):
        idf = math.log1p(max_df) - math.log1p(token_vocab.doc_frequency(idx)) + 1.0
        idx_list.append(idx)
        tfidf.append(tf * max(idf, 0.0))
    norm = math.sqrt(sum(v * v for v in tfidf)) or 1.0
    return SparseDocument(
        url=doc.primary,
        primary_index=primary,
        token_index=idx_list,
        token_tfidf=[v / norm for v in tfidf],
    )


_CONVERTERS = {
    "txt2url": lambda doc, tok, title: doc_to_txt2url(doc, tok, title),
    "url2url": lambda doc, tok, title: doc_to_url2url(doc, title),
    "tfidf": lambda doc, tok, title: doc_to_tfidf(doc, tok, title),
}


def convert(
    mode: str,
    input_pattern: str,
    output_dir: str,
    token_vocab: Optional[Vocabulary],
    title_vocab: Vocabulary,
    docs_per_shard: int = 1000,
) -> int:
    fn = _CONVERTERS[mode]
    n = 0
    with recordio.ShardedWriter(output_dir, docs_per_shard) as w:
        for doc in recordio.read_protos(input_pattern, TextDocument, skip_corrupt=True):
            sdoc = fn(doc, token_vocab, title_vocab)
            if sdoc is not None:
                w.write_proto(sdoc)
                n += 1
    log.info("%s: wrote %d sparse docs to %s", mode, n, output_dir)
    return n


@dataclasses.dataclass(frozen=True)
class SparseDocConfig:
    mode: str = "txt2url"      # txt2url | url2url | tfidf
    input: str = ""
    output: str = ""
    token_dictionary: str = ""
    title_dictionary: str = ""
    docs_per_shard: int = 1000


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    cfg = config_lib.from_cli(SparseDocConfig, argv)
    token_vocab = Vocabulary.load(cfg.token_dictionary) if cfg.token_dictionary else None
    title_vocab = Vocabulary.load(cfg.title_dictionary)
    convert(cfg.mode, cfg.input, cfg.output, token_vocab, title_vocab,
            cfg.docs_per_shard)


if __name__ == "__main__":
    main()
