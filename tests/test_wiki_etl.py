"""Full wikipedia ETL chain on a synthetic XML dump."""

import subprocess
import sys

import numpy as np
import pytest

from esrecsys_tpu.data import recordio
from esrecsys_tpu.data.protos import CooccurrenceRow, Page, SparseDocument, TextDocument
from esrecsys_tpu.data.vocab import Vocabulary
from esrecsys_tpu.etl import cooccurrence as cooc
from esrecsys_tpu.etl import dictionary as dict_etl
from esrecsys_tpu.etl import sparse_docs, wiki

XML = """<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">
  <page>
    <title>Alpha Beta</title><ns>0</ns><id>1</id>
    <revision><id>11</id><timestamp>t</timestamp>
      <text>alpha beta gamma [[Gamma Page]] alpha beta [[Wikipedia:Ignore|x]] [[Delta|shown text]]</text>
    </revision>
  </page>
  <page>
    <title>Redirected</title><ns>0</ns><id>2</id>
    <redirect title="Alpha Beta"/>
    <revision><id>12</id><text>unused</text></revision>
  </page>
  <page>
    <title>Wikipedia:Admin</title><ns>4</ns><id>3</id>
    <revision><id>13</id><text>namespace page</text></revision>
  </page>
  <page>
    <title>Gamma Page</title><ns>0</ns><id>4</id>
    <revision><id>14</id><text>gamma delta epsilon gamma [[Alpha Beta]]</text></revision>
  </page>
  <page>
    <title>Delta</title><ns>0</ns><id>5</id>
    <revision><id>15</id><text>delta alpha [[Gamma Page]] [[Alpha Beta]]</text></revision>
  </page>
</mediawiki>"""


@pytest.fixture(scope="module")
def etl_dirs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wiki")
    xml = tmp / "dump.xml"
    xml.write_text(XML)
    d = {
        "xml": str(xml),
        "pages": str(tmp / "pages"),
        "docs": str(tmp / "docs"),
        "tok_dict": str(tmp / "tokens.bz2"),
        "title_dict": str(tmp / "titles.bz2"),
        "cooc": str(tmp / "cooc"),
        "sdoc_t2u": str(tmp / "sdoc_t2u"),
        "sdoc_u2u": str(tmp / "sdoc_u2u"),
        "url_cooc": str(tmp / "url_cooc"),
    }
    return d


def test_xml_to_pages(etl_dirs):
    n = wiki.xml_to_pages(etl_dirs["xml"], etl_dirs["pages"], pages_per_shard=2)
    assert n == 5
    pages = list(recordio.read_protos(etl_dirs["pages"] + "/part-*", Page))
    assert [p.title for p in pages] == [
        "Alpha Beta", "Redirected", "Wikipedia:Admin", "Gamma Page", "Delta"]
    assert pages[1].redirect_title == "Alpha Beta"
    assert pages[0].revision[0].text.startswith("alpha beta gamma")


def test_tokenize_pages(etl_dirs):
    n = wiki.tokenize_pages(etl_dirs["pages"] + "/part-*", etl_dirs["docs"])
    assert n == 3  # redirect + namespace pages filtered
    docs = list(recordio.read_protos(etl_dirs["docs"] + "/part-*", TextDocument))
    alpha = docs[0]
    assert alpha.primary == "https://en.wikipedia.org/wiki/Alpha_Beta"
    # [[Wikipedia:Ignore|x]] rejected; display text after | stripped
    assert list(alpha.secondary) == [
        "https://en.wikipedia.org/wiki/Delta",
        "https://en.wikipedia.org/wiki/Gamma_Page",
    ]
    assert "wikipedia:ignore" not in " ".join(alpha.tokens)
    assert alpha.tokens[:3] == ["alpha", "beta", "gamma"]


def test_normalize_title_url_special_chars():
    # '+' is legal in URL paths and url_normalize (the reference's library)
    # leaves it literal
    assert wiki.normalize_title_url("C++ (language)") == (
        "https://en.wikipedia.org/wiki/C++_(language)")
    assert wiki.normalize_title_url("Łódź") == (
        "https://en.wikipedia.org/wiki/%C5%81%C3%B3d%C5%BA")


def test_dictionaries(etl_dirs):
    tok = dict_etl.build_token_dictionary(etl_dirs["docs"] + "/part-*", min_frequency=2)
    tok.save(etl_dirs["tok_dict"])
    # alpha appears 4x, beta 2x(+1 in brackets text) gamma 3x delta 3x
    assert tok.token_index("alpha") is not None
    assert tok.token(0) in ("alpha", "gamma", "delta", "beta")
    titles = dict_etl.build_title_dictionary(etl_dirs["docs"] + "/part-*", min_frequency=1)
    titles.save(etl_dirs["title_dict"])
    # all three doc primaries + their links
    assert titles.token_index("https://en.wikipedia.org/wiki/Alpha_Beta") is not None
    # Alpha Beta referenced by all three docs -> highest frequency
    assert titles.token(0) == "https://en.wikipedia.org/wiki/Alpha_Beta"


def test_token_cooccurrence(etl_dirs):
    vocab = Vocabulary.load(etl_dirs["tok_dict"])
    n = cooc.build_token_cooccurrence(
        etl_dirs["docs"] + "/part-*", vocab, etl_dirs["cooc"], window=3)
    assert n > 0
    rows = list(recordio.read_protos(etl_dirs["cooc"] + "/part-*", CooccurrenceRow))
    # symmetric storage: every stored pair has row index > other index
    for row in rows:
        assert all(row.index > o for o in row.other_index)
    # adjacent pair (alpha, beta) occurs twice at distance 1 in doc1 →
    # weight contribution 2.0 from that doc (plus distance-2 pair in doc3? no)
    a = vocab.embedding_index("alpha")
    b = vocab.embedding_index("beta")
    hi, lo = max(a, b), min(a, b)
    found = 0.0
    for row in rows:
        if row.index == hi:
            for o, c in zip(row.other_index, row.count):
                if o == lo:
                    found += c
    assert found >= 2.0


def test_window_weighting_closed_form():
    acc = cooc.PyCoocAccumulator()
    acc.add_window([5, 9, 5, 2], window=10)
    # pairs (i>j only by value): (9,5) at dist 1 and dist 1 → 2.0;
    # (5,2) dist 1 → 1.0; (9,2) dist 2 → 0.5; (5,2) dist 3 → 1/3; (5,5) skipped
    np.testing.assert_allclose(acc.rows[9][5], 2.0)
    np.testing.assert_allclose(acc.rows[5][2], 1.0 + 1.0 / 3.0)
    np.testing.assert_allclose(acc.rows[9][2], 0.5)


def test_sparse_docs_and_url_cooccurrence(etl_dirs):
    tok = Vocabulary.load(etl_dirs["tok_dict"])
    titles = Vocabulary.load(etl_dirs["title_dict"])
    n1 = sparse_docs.convert("txt2url", etl_dirs["docs"] + "/part-*",
                             etl_dirs["sdoc_t2u"], tok, titles)
    assert n1 == 3
    sd = next(iter(recordio.read_protos(etl_dirs["sdoc_t2u"] + "/part-*", SparseDocument)))
    assert sd.primary_index == titles.token_index(sd.url)
    assert len(sd.token_index) > 0

    n2 = sparse_docs.convert("url2url", etl_dirs["docs"] + "/part-*",
                             etl_dirs["sdoc_u2u"], None, titles)
    assert n2 == 3
    n3 = cooc.build_url_cooccurrence(etl_dirs["sdoc_u2u"] + "/part-*", etl_dirs["url_cooc"])
    assert n3 > 0


def test_tfidf_sparse_docs(etl_dirs, tmp_path):
    tok = Vocabulary.load(etl_dirs["tok_dict"])
    titles = Vocabulary.load(etl_dirs["title_dict"])
    out = str(tmp_path / "tfidf")
    n = sparse_docs.convert("tfidf", etl_dirs["docs"] + "/part-*", out, tok, titles)
    assert n == 3
    sd = next(iter(recordio.read_protos(out + "/part-*", SparseDocument)))
    v = np.asarray(sd.token_tfidf)
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-5)  # L2 normalized


def test_codex_and_dump_tools(etl_dirs):
    from esrecsys_tpu.tools import codex, dump_correlates

    # run in-process via main(argv)
    codex.main(["--input", etl_dirs["docs"] + "/part-*", "--proto", "doc", "--limit", "1"])
    dump_correlates.main([
        "--input", etl_dirs["url_cooc"] + "/part-*",
        "--dictionary", etl_dirs["title_dict"],
        "--metric", "dice", "--limit", "2",
    ])


def test_glove_training_on_etl_output(etl_dirs, tmp_path):
    """The ETL output feeds the GloVe workload directly (end of the wikipedia
    chain = start of SURVEY §7's minimum slice)."""
    from esrecsys_tpu.core import mesh as mesh_lib
    from esrecsys_tpu.data.pipelines import glove_batches
    from esrecsys_tpu.train import fit
    from esrecsys_tpu.workloads import glove as glove_wl

    vocab = Vocabulary.load(etl_dirs["tok_dict"])
    cfg = glove_wl.GloveConfig(feature_size=4, batch_size=8, learning_rate=0.05)
    model, state = glove_wl.init_state(
        cfg, num_embeddings=vocab.num_embeddings, mesh=mesh_lib.make_mesh(n_model=1))
    batches = glove_batches(etl_dirs["cooc"] + "/part-*", 8, shuffle_buffer=16)
    result = fit(state, glove_wl.make_train_step(model), batches, num_steps=20)
    assert np.isfinite(result.last_train_metrics.get("train_loss", np.nan)) or result.steps_run == 20
