"""Vocabularies and ID spaces.

One module replacing the reference's three id schemes:

  * ``Vocabulary`` — frequency-sorted string↔index dictionary with minhash OOV
    hashing, matching the exact embedding-index layout of the reference's
    ``TokenDictionary`` (wikipedia/token_dictionary.py:17-118):
    index 0 = mask, 1..size = dictionary tokens (by frequency rank),
    1+size .. 1+size+65535 = minhash OOV buckets.
  * ``minhash`` — crc32 over sliding 4-byte windows of the first 10 bytes,
    reduced to 16 bits (token_dictionary.py:39-56). Exact-parity semantics so
    embedding tables trained here score reference-tokenized data identically.
  * ``mod_hash`` — modulo bucketing for huge id spaces (reference
    spotify/models.py:29,42 hashes albums into 100k rows inside the model;
    here it's a data-layer primitive usable on host or device).
  * ``JsonVocab`` — insertion-ordered uri→int dictionaries stored as JSON,
    matching spotify/make_dictionary.py:41-78.

Vocabulary files are TokenStat records in pb.b64.bz2 (reference format), so
dictionaries built by either codebase interoperate.
"""

from __future__ import annotations

import json
import re
import zlib
from collections import Counter
from dataclasses import dataclass
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from esrecsys_tpu.data import recordio
from esrecsys_tpu.data.protos import TokenStat

MINHASH_BUCKETS = 65536
MASK_INDEX = 0

# Same separator class as the reference tokenizer (token_dictionary.py:22).
_TOKEN_FILTER = re.compile("[ !@#$%^&*()_+\t\n\",.:;\\\\/?><|{}'\\[\\]]")


def simple_tokenize(text: str) -> List[str]:
    """Regex-split + lowercase; drops empty tokens."""
    return [t.lower() for t in _TOKEN_FILTER.split(text) if t]


def minhash(token: str | bytes) -> int:
    """Min of crc32 over sliding 4-byte windows of the first 10 bytes, 16-bit.

    Exact reimplementation of the reference OOV hash
    (token_dictionary.py:39-56): tokens of <= 4 bytes hash whole; longer
    tokens take the min crc16 over windows [i, i+4) for i in [0, min(10,n)-4).
    """
    # Parity quirk: the reference measures length in *characters* but slices
    # *bytes* (token_dictionary.py:42-55), so multi-byte tokens window over
    # fewer bytes than they have. Reproduced exactly.
    n = len(token)
    b = token.encode("utf-8") if isinstance(token, str) else token
    if n <= 4:
        return zlib.crc32(b) & 0xFFFF
    n = min(10, n)
    h = 0xFFFFFFFF
    for i in range(n - 4):
        h = min(h, zlib.crc32(b[i : i + 4]) & 0xFFFF)
    return h


def mod_hash(ids, num_buckets: int):
    """Modulo bucketing for huge id spaces (spotify album hashing parity)."""
    import jax.numpy as jnp

    if isinstance(ids, (int, np.integer)):
        return int(ids % num_buckets)
    if isinstance(ids, np.ndarray):
        return np.mod(ids, num_buckets)
    return jnp.mod(ids, num_buckets)


@dataclass
class VocabEntry:
    token: str
    frequency: int = 0
    doc_frequency: int = 0
    url: str = ""


class Vocabulary:
    """Frequency-sorted dictionary with minhash OOV and mask index 0."""

    def __init__(self, entries: Optional[Sequence[VocabEntry]] = None):
        self._entries: List[VocabEntry] = []
        self._token2index: Dict[str, int] = {}
        self._max_doc_frequency = 0
        if entries:
            for e in entries:
                self._append(e)

    def _append(self, e: VocabEntry) -> None:
        self._token2index[e.token] = len(self._entries)
        self._entries.append(e)
        self._max_doc_frequency = max(self._max_doc_frequency, e.doc_frequency)

    # ---- construction ----

    @classmethod
    def from_counts(
        cls,
        frequency: Dict[str, int],
        doc_frequency: Optional[Dict[str, int]] = None,
        min_frequency: int = 0,
        max_size: Optional[int] = None,
        urls: Optional[Dict[str, str]] = None,
    ) -> "Vocabulary":
        """Build by frequency-desc sort, min-frequency filter, truncation.

        Same recipe as the reference Spark job (make_dictionary.py:108-117):
        filter(freq >= min), sort by frequency desc, truncate, assign index.
        """
        items = [(t, f) for t, f in frequency.items() if f >= min_frequency]
        items.sort(key=lambda kv: (-kv[1], kv[0]))  # deterministic tie-break
        if max_size is not None:
            items = items[:max_size]
        entries = [
            VocabEntry(
                token=t,
                frequency=f,
                doc_frequency=(doc_frequency or {}).get(t, 0),
                url=(urls or {}).get(t, ""),
            )
            for t, f in items
        ]
        return cls(entries)

    # ---- core lookups ----

    def __len__(self) -> int:
        return len(self._entries)

    @property
    def size(self) -> int:
        return len(self._entries)

    @property
    def num_embeddings(self) -> int:
        """Embedding-table row count: 1 mask + dictionary + minhash buckets
        (token_dictionary.py:66-68)."""
        return 1 + self.size + MINHASH_BUCKETS

    @property
    def max_doc_frequency(self) -> int:
        return self._max_doc_frequency

    def token_index(self, token: str) -> Optional[int]:
        return self._token2index.get(token)

    def token(self, index: int) -> str:
        return self._entries[index].token

    def doc_frequency(self, index: int) -> int:
        return self._entries[index].doc_frequency

    def frequency(self, index: int) -> int:
        return self._entries[index].frequency

    def embedding_index(self, token: str) -> int:
        """0 reserved for mask; known tokens 1..size; OOV minhash after."""
        idx = self._token2index.get(token)
        if idx is not None:
            return 1 + idx
        return 1 + self.size + minhash(token)

    def embedding_indices(self, tokens: Iterable[str]) -> List[int]:
        return [self.embedding_index(t) for t in tokens]

    def token_from_embedding_index(self, embedding_index: int) -> str:
        if embedding_index == MASK_INDEX:
            return "NULL"
        if embedding_index <= self.size:
            return self._entries[embedding_index - 1].token
        return "MINHASH %d" % (embedding_index - 1 - self.size)

    # ---- persistence (reference TokenStat pb.b64.bz2 format) ----

    def save(self, path: str) -> None:
        def stats():
            for i, e in enumerate(self._entries):
                yield TokenStat(
                    token=e.token,
                    url=e.url,
                    frequency=e.frequency,
                    doc_frequency=e.doc_frequency,
                    index=i,
                )

        recordio.write_protos(path, stats())

    @classmethod
    def load(cls, path: str) -> "Vocabulary":
        vocab = cls()
        for i, ts in enumerate(recordio.read_protos(path, TokenStat)):
            if ts.index != i:
                raise ValueError(f"non-contiguous index {ts.index} at row {i} in {path}")
            vocab._append(
                VocabEntry(
                    token=ts.token,
                    frequency=ts.frequency,
                    doc_frequency=ts.doc_frequency,
                    url=ts.url,
                )
            )
        return vocab


class JsonVocab:
    """Insertion-ordered uri→int dictionary (spotify make_dictionary parity).

    The reference stores these as plain JSON dicts mapping uri → index in
    insertion order (spotify/make_dictionary.py:41-78) and loads them for
    training (train_spotify.py:165-176).
    """

    def __init__(self, mapping: Optional[Dict[str, int]] = None):
        self.mapping: Dict[str, int] = dict(mapping or {})

    def add(self, uri: str) -> int:
        idx = self.mapping.get(uri)
        if idx is None:
            idx = len(self.mapping)
            self.mapping[uri] = idx
        return idx

    def __len__(self) -> int:
        return len(self.mapping)

    def __getitem__(self, uri: str) -> int:
        return self.mapping[uri]

    def get(self, uri: str, default=None):
        return self.mapping.get(uri, default)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.mapping, f)

    @classmethod
    def load(cls, path: str) -> "JsonVocab":
        with open(path) as f:
            return cls(json.load(f))


def count_tokens(docs_tokens: Iterable[Sequence[str]]) -> Tuple[Counter, Counter]:
    """(frequency, doc_frequency) over an iterable of token lists."""
    freq: Counter = Counter()
    doc_freq: Counter = Counter()
    for tokens in docs_tokens:
        freq.update(tokens)
        doc_freq.update(set(tokens))
    return freq, doc_freq
