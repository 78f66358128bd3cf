"""Native C++ kernels vs their pure-Python fallbacks."""

import base64

import numpy as np
import pytest

from esrecsys_tpu.etl.cooccurrence import PyCoocAccumulator, make_accumulator

native = pytest.importorskip("esrecsys_tpu.native")


def _has_toolchain():
    try:
        native._load()
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _has_toolchain(), reason="no g++ toolchain")


def test_native_window_matches_python():
    rng = np.random.default_rng(0)
    docs = [rng.integers(1, 50, rng.integers(2, 80)).tolist() for _ in range(20)]
    py = PyCoocAccumulator()
    cc = native.NativeCoocAccumulator()
    for d in docs:
        py.add_window(d, 10)
        cc.add_window(d, 10)
    pr, po, pc = py.export()
    nr, no, nc = cc.export()
    np.testing.assert_array_equal(pr, nr)
    np.testing.assert_array_equal(po, no)
    np.testing.assert_allclose(pc, nc, rtol=1e-12)


def test_native_pairs_matches_python():
    rng = np.random.default_rng(1)
    sets = [rng.integers(0, 30, rng.integers(2, 12)).tolist() for _ in range(30)]
    py = PyCoocAccumulator()
    cc = native.NativeCoocAccumulator()
    for s in sets:
        py.add_pairs(s)
        cc.add_pairs(s)
    for a, b in zip(py.export(), cc.export()):
        np.testing.assert_allclose(a, b)


def test_make_accumulator_prefers_native():
    acc = make_accumulator(native=True)
    assert type(acc).__name__ == "NativeCoocAccumulator"
    assert type(make_accumulator(native=False)).__name__ == "PyCoocAccumulator"


def test_b64_line_decoder():
    payloads = [b"hello world", b"", b"\x00\xff\x01" * 7, b"x"]
    blob = b"\n".join(base64.b64encode(p) for p in payloads) + b"\n"
    out = list(native.decode_b64_lines(blob))
    assert out == payloads


def test_b64_line_decoder_rejects_garbage():
    with pytest.raises(ValueError, match="line 1"):
        list(native.decode_b64_lines(b"aGVsbG8=\n!!notb64!!\n"))


def test_native_speedup_over_python():
    """The point of the native path: beat the Python loop clearly.

    Best-of-3 per side — a single timing on a loaded CI host jitters
    enough to cross any single-shot threshold (observed 3.88x under a
    concurrent chip benchmark with a 4x assert)."""
    import time

    rng = np.random.default_rng(2)
    # small id space → update-heavy (the steady-state regime of a real corpus)
    docs = [rng.integers(1, 200, 500).tolist() for _ in range(30)]

    def best_of(make, n=3):
        best = float("inf")
        for _ in range(n):
            acc = make()
            t0 = time.perf_counter()
            for d in docs:
                acc.add_window(d, 10)
            best = min(best, time.perf_counter() - t0)
        return best

    t_py = best_of(PyCoocAccumulator)
    t_cc = best_of(native.NativeCoocAccumulator)
    assert t_cc < t_py / 2.5, (t_py, t_cc)


def test_native_tokenize_matches_python():
    if not _has_toolchain():
        pytest.skip("native toolchain unavailable")
    from esrecsys_tpu.native import tokenize
    from esrecsys_tpu.data.vocab import simple_tokenize

    cases = [
        "",
        "    ",
        "The Quick BROWN fox! jumps,over;the:lazy dog",
        "café NAÏVE Straße ΛΌΓΟΣ мОсКвА [[Link|x]] a_b c\td",
        "ALLCAPS lower 123#tags{weird} 'quoted' [brackets]",
        "unicode: ÀÉÎÕÜ ß ﬁ Ⅷ ȘțĂâ",
        "\n\nnewlines\nand\ttabs\t",
    ]
    for c in cases:
        assert tokenize(c) == simple_tokenize(c), c
    rng = np.random.default_rng(0)
    words = ["the", "Quick", "bröwn", "FOX", "naïve", "ΛΌΓΟΣ", "a'b", "x|y"]
    text = " ".join(rng.choice(words, 5000))
    assert tokenize(text) == simple_tokenize(text)
