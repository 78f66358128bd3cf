"""Data layer: record IO, schemas, vocabularies, input pipelines."""

from esrecsys_tpu.data import recordio
from esrecsys_tpu.data.vocab import (
    JsonVocab,
    Vocabulary,
    VocabEntry,
    count_tokens,
    minhash,
    mod_hash,
    simple_tokenize,
)

__all__ = [
    "recordio",
    "JsonVocab",
    "Vocabulary",
    "VocabEntry",
    "count_tokens",
    "minhash",
    "mod_hash",
    "simple_tokenize",
]
