import os

import numpy as np
import pytest

from esrecsys_tpu.data import recordio, vocab
from esrecsys_tpu.data.protos import CooccurrenceRow, TextDocument, TokenStat

# Golden values computed by executing the reference TokenDictionary.minhash
# (wikipedia/token_dictionary.py:39-56) — byte-for-byte parity required so
# OOV buckets line up across codebases.
MINHASH_GOLD = {
    "a": 48707,
    "the": 28134,
    "hello": 227,
    "computer": 28474,
    "antidisestablishmentarianism": 3832,
    "naïve": 50383,
    "日本語のテキスト": 4751,
    "abcd": 52497,
    "abcde": 52497,
    "xxxxxxxxxx": 25719,
    "xxxxxxxxxxx": 25719,
    "News": 13934,
    "12345": 57507,
}


def test_minhash_reference_parity():
    for token, expected in MINHASH_GOLD.items():
        assert vocab.minhash(token) == expected, token
    assert all(0 <= v < vocab.MINHASH_BUCKETS for v in MINHASH_GOLD.values())


def test_simple_tokenize():
    assert vocab.simple_tokenize('Hello, World! (test) [x]') == ["hello", "world", "test", "x"]
    assert vocab.simple_tokenize("") == []
    assert vocab.simple_tokenize("  a  b ") == ["a", "b"]


def test_vocab_build_sort_filter_truncate():
    freq = {"common": 100, "mid": 50, "rare": 1, "tie_b": 50}
    v = vocab.Vocabulary.from_counts(freq, min_frequency=2, max_size=3)
    # sorted by freq desc, tie broken by token asc, 'rare' filtered
    assert [v.token(i) for i in range(len(v))] == ["common", "mid", "tie_b"]
    assert v.token_index("rare") is None


def test_embedding_index_layout():
    v = vocab.Vocabulary.from_counts({"b": 2, "a": 3})
    assert v.embedding_index("a") == 1          # rank 0 -> 1
    assert v.embedding_index("b") == 2
    oov = v.embedding_index("zzz_unseen")
    assert oov == 1 + 2 + vocab.minhash("zzz_unseen")
    assert v.num_embeddings == 1 + 2 + vocab.MINHASH_BUCKETS
    assert v.token_from_embedding_index(0) == "NULL"
    assert v.token_from_embedding_index(1) == "a"
    assert v.token_from_embedding_index(oov).startswith("MINHASH ")


def test_vocab_save_load_roundtrip(tmp_path):
    v = vocab.Vocabulary.from_counts(
        {"x": 5, "y": 3}, doc_frequency={"x": 2, "y": 1}, urls={"x": "http://x"}
    )
    p = str(tmp_path / "dict.pb.b64.bz2")
    v.save(p)
    v2 = vocab.Vocabulary.load(p)
    assert len(v2) == 2
    assert v2.token(0) == "x" and v2.frequency(0) == 5 and v2.doc_frequency(0) == 2
    assert v2.max_doc_frequency == 2
    assert v2.embedding_index("y") == v.embedding_index("y")


def test_vocab_load_rejects_noncontiguous(tmp_path):
    p = str(tmp_path / "bad.bz2")
    recordio.write_protos(
        p, [TokenStat(token="a", index=0), TokenStat(token="b", index=5)]
    )
    with pytest.raises(ValueError, match="non-contiguous"):
        vocab.Vocabulary.load(p)


def test_json_vocab(tmp_path):
    jv = vocab.JsonVocab()
    assert jv.add("uri:1") == 0
    assert jv.add("uri:2") == 1
    assert jv.add("uri:1") == 0  # idempotent
    p = str(tmp_path / "d.json")
    jv.save(p)
    assert vocab.JsonVocab.load(p)["uri:2"] == 1


def test_mod_hash():
    assert vocab.mod_hash(100005, 100000) == 5
    np.testing.assert_array_equal(
        vocab.mod_hash(np.array([1, 100001]), 100000), np.array([1, 1])
    )


@pytest.mark.parametrize("ext", ["bz2", "gz", "raw"])
def test_recordio_roundtrip(tmp_path, ext):
    p = str(tmp_path / f"f.{ext}")
    payloads = [b"hello", b"", b"\x00\xff binary \n embedded"]
    assert recordio.write_records(p, payloads) == 3
    assert list(recordio.read_records(p)) == payloads


def test_recordio_proto_roundtrip_and_corrupt(tmp_path):
    p = str(tmp_path / "docs.bz2")
    docs = [
        TextDocument(primary="t1", tokens=["a", "b"], url="u1"),
        TextDocument(primary="t2", secondary=["s"], tokens=["c"]),
    ]
    recordio.write_protos(p, docs)
    out = list(recordio.read_protos(str(tmp_path / "*.bz2"), TextDocument))
    assert [d.primary for d in out] == ["t1", "t2"]
    # corrupt record: skipped with skip_corrupt (ioutil.py:27-38 semantics)
    recordio.write_records(str(tmp_path / "docs2.bz2"), [b"\x01\x02garbage_not_proto\xff\xff\xff"])
    all_docs = list(
        recordio.read_protos(str(tmp_path / "*.bz2"), CooccurrenceRow, skip_corrupt=True)
    )
    assert isinstance(all_docs, list)  # no raise


def test_sharded_writer(tmp_path):
    d = str(tmp_path / "shards")
    with recordio.ShardedWriter(d, records_per_shard=2, ext="gz") as w:
        for i in range(5):
            w.write(f"rec{i}".encode())
    files = sorted(os.listdir(d))
    assert files == ["part-00000.gz", "part-00001.gz", "part-00002.gz"]
    recs = []
    for f in files:
        recs += [r.decode() for r in recordio.read_records(os.path.join(d, f))]
    assert recs == [f"rec{i}" for i in range(5)]


def test_proto_stream_and_shuffle(tmp_path):
    d = tmp_path
    recordio.write_protos(str(d / "a.bz2"), [TokenStat(token=f"t{i}") for i in range(10)])
    recordio.write_protos(str(d / "b.bz2"), [TokenStat(token=f"t{i}") for i in range(10, 20)])
    tokens = [t.token for t in recordio.proto_stream(str(d / "*.bz2"), TokenStat)]
    assert tokens == [f"t{i}" for i in range(20)]
    shuffled = [
        t.token
        for t in recordio.shuffled(
            recordio.proto_stream(str(d / "*.bz2"), TokenStat), buffer_size=8, seed=1
        )
    ]
    assert sorted(shuffled) == sorted(tokens) and shuffled != tokens
    with pytest.raises(FileNotFoundError):
        next(recordio.proto_stream(str(d / "nope*.bz2"), TokenStat))


def test_count_tokens():
    freq, doc_freq = vocab.count_tokens([["a", "a", "b"], ["a", "c"]])
    assert freq == {"a": 3, "b": 1, "c": 1}
    assert doc_freq == {"a": 2, "b": 1, "c": 1}
