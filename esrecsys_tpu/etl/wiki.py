"""Wikipedia ETL: XML dump → Page shards → TextDocument shards.

Capability parity with reference wikipedia/xml2proto.py:25-134 (streaming
iterparse, 1000 pages per part-NNNNN.bz2 shard) and
tokenize_wiki_pyspark.py:29-111 (namespace/redirect filtering, [[link]]
extraction, title→URL normalization, regex tokenization). The Spark job is
replaced by a plain shard-parallel map (the reference itself ran Spark
``local[4]`` — single machine).

CLI:
  python -m esrecsys_tpu.etl.wiki --mode xml2proto --input dump.xml --output pages/
  python -m esrecsys_tpu.etl.wiki --mode tokenize  --input 'pages/part-*' --output docs/
"""

from __future__ import annotations

import dataclasses
import glob as glob_lib
import logging
import os
import re
import urllib.parse
from typing import Iterable, Iterator, List, Optional, Set
from xml.etree import ElementTree

from esrecsys_tpu.core import config as config_lib
from esrecsys_tpu.data import recordio
from esrecsys_tpu.data.protos import Page, TextDocument
from esrecsys_tpu.data.vocab import simple_tokenize

_tokenize_impl = None


def _tokenize(text):
    """Native tokenizer (~3x, esrecsys_tpu/native/text.cc) with a permanent
    fallback to the pure-Python tokenizer. The native library builds lazily
    on FIRST CALL, so the fallback must wrap the call, not the import."""
    global _tokenize_impl
    if _tokenize_impl is None:
        try:
            from esrecsys_tpu.native import tokenize as native_tokenize

            native_tokenize("probe Build")  # force the lazy g++ build now
            _tokenize_impl = native_tokenize
        except Exception:  # pragma: no cover - missing toolchain
            log.info("native tokenizer unavailable; using simple_tokenize")
            _tokenize_impl = simple_tokenize
    return _tokenize_impl(text)

log = logging.getLogger(__name__)

# Pages in these namespaces are not for user consumption
# (tokenize_wiki_pyspark.py:37).
TITLE_REJECT_RE = re.compile(
    r"^Wikipedia:|^User:|^File:|^MediaWiki:|^Template:|^Help:|^Portal:|^Draft:"
)
LINK_RE = re.compile(r"\[\[[^\]]*\]\]")


# ------------------------------------------------------------ xml2proto

def _parse_revision(el, nslen: int):
    rev = {}
    for child in el:
        tag = child.tag[nslen:]
        if tag in ("id", "parentid"):
            rev[tag] = int(child.text or 0)
        elif tag in ("timestamp", "model", "format", "sha1", "text"):
            rev[tag] = child.text or ""
        elif tag == "minor":
            rev["minor"] = True
    return rev


def iter_pages(xml_path: str) -> Iterator[Page]:
    """Stream Page protos from a mediawiki XML export (constant memory)."""
    it = ElementTree.iterparse(xml_path, events=("start", "end"))
    _, root = next(it)
    xmlns = root.tag[: -len("mediawiki")] if root.tag.endswith("mediawiki") else ""
    nslen = len(xmlns)
    for ev, el in it:
        if ev != "end" or el.tag[nslen:] != "page":
            continue
        page = Page()
        for child in el:
            tag = child.tag[nslen:]
            if tag == "title":
                page.title = child.text or ""
            elif tag == "ns":
                page.ns = int(child.text or 0)
            elif tag == "id":
                page.id = int(child.text or 0)
            elif tag == "redirect":
                page.redirect_title = child.attrib.get("title", "")
            elif tag == "revision":
                rev = page.revision.add()
                for k, v in _parse_revision(child, nslen).items():
                    setattr(rev, k, v)
        yield page
        el.clear()  # reference leaks the tree; keep memory flat
        root.clear()


def xml_to_pages(xml_path: str, output_dir: str, pages_per_shard: int = 1000) -> int:
    """XML dump → part-NNNNN.bz2 shards of Page protos."""
    with recordio.ShardedWriter(output_dir, pages_per_shard) as w:
        for page in iter_pages(xml_path):
            w.write_proto(page)
        total = w.total
    log.info("wrote %d pages to %s", total, output_dir)
    return total


# ------------------------------------------------------------- tokenize

def normalize_title_url(title: str) -> str:
    """Title → canonical enwiki URL.

    The reference uses the ``url_normalize`` package on
    ``https://en.wikipedia.org/wiki/<title with _>`` (:51-53). Reproduced as
    percent-encoding of non-URL-safe characters with spaces→underscores
    (identical output on wiki titles, no extra dependency)."""
    path = title.replace(" ", "_")
    quoted = urllib.parse.quote(path, safe="/:()_',.-~!*$&+=@;")
    return f"https://en.wikipedia.org/wiki/{quoted}"


def extract_links(text: str) -> List[str]:
    """[[target|display]] link targets, namespace-filtered, de-duplicated
    (tokenize_wiki_pyspark.py:63-74)."""
    seen: Set[str] = set()
    for block in LINK_RE.findall(text):
        target = block.strip("[]").split("|")[0]
        if target and not TITLE_REJECT_RE.match(target):
            seen.add(target)
    return sorted(seen)


def page_to_doc(page: Page, stopwords: Optional[Set[str]] = None) -> Optional[TextDocument]:
    """Page → TextDocument, or None if filtered
    (tokenize_wiki_pyspark.py:39-87 semantics)."""
    if page.redirect_title or not page.title or not page.revision:
        return None
    if TITLE_REJECT_RE.match(page.title):
        return None
    text = page.revision[0].text
    doc = TextDocument()
    doc.primary = normalize_title_url(page.title)
    doc.secondary.extend(normalize_title_url(t) for t in extract_links(text))
    tokens = _tokenize(text)
    if stopwords:
        tokens = [t for t in tokens if t not in stopwords]
    doc.tokens.extend(tokens)
    return doc


def tokenize_pages(
    input_pattern: str,
    output_dir: str,
    docs_per_shard: int = 1000,
    stopwords_file: str = "",
) -> int:
    stopwords = None
    if stopwords_file:
        with open(stopwords_file) as f:
            stopwords = {line.rstrip("\n") for line in f if line.strip()}
        log.info("%d stopwords loaded", len(stopwords))
    n = 0
    with recordio.ShardedWriter(output_dir, docs_per_shard) as w:
        for page in recordio.read_protos(input_pattern, Page, skip_corrupt=True):
            doc = page_to_doc(page, stopwords)
            if doc is not None:
                w.write_proto(doc)
                n += 1
    log.info("wrote %d docs to %s", n, output_dir)
    return n


@dataclasses.dataclass(frozen=True)
class WikiEtlConfig:
    mode: str = "xml2proto"    # xml2proto | tokenize
    input: str = ""
    output: str = ""
    pages_per_shard: int = 1000
    stopwords: str = ""


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    cfg = config_lib.from_cli(WikiEtlConfig, argv)
    if cfg.mode == "xml2proto":
        xml_to_pages(cfg.input, cfg.output, cfg.pages_per_shard)
    elif cfg.mode == "tokenize":
        tokenize_pages(cfg.input, cfg.output, cfg.pages_per_shard, cfg.stopwords)
    else:
        raise SystemExit(f"unknown --mode {cfg.mode}")


if __name__ == "__main__":
    main()
