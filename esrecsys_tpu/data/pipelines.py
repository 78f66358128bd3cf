"""Input pipelines: device-ready numpy batch iterators per workload.

Replaces the reference's three per-project ``input_pipeline.py``s and its
python-generator-inside-tf.data arrangement for co-occurrence data
(wikipedia/cooccurrence_matrix.py:108-115 wraps a python generator in
tf.data only to call ``as_numpy_iterator`` on it — the tf layer adds copies
but no parallelism there). Batches here are plain numpy; the jitted step
moves them to device. tf.data is used only where it genuinely buys C++
parallelism: tfrecord parsing (spotify) and JPEG decode (pinterest images).
"""

from __future__ import annotations

import glob as glob_lib
import json
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from esrecsys_tpu.data import recordio
from esrecsys_tpu.data.protos import CooccurrenceRow

# ------------------------------------------------------------------ glove

def cooccurrence_triples(
    pattern: str, repeat: bool = True, shuffle_files: bool = True, seed: int = 0
) -> Iterator[Tuple[int, int, float]]:
    """Flatten CooccurrenceRow shards into (token1, token2, count) triples
    (cooccurrence_matrix.py:62-78 semantics)."""
    for row in recordio.proto_stream(
        pattern, CooccurrenceRow, shuffle_files=shuffle_files, repeat=repeat, seed=seed
    ):
        for other, count in zip(row.other_index, row.count):
            yield (row.index, other, count)


def glove_batches(
    pattern: str,
    batch_size: int,
    shuffle_buffer: int = 0,
    repeat: bool = True,
    seed: int = 0,
) -> Iterator[Tuple[Tuple[np.ndarray, np.ndarray], np.ndarray]]:
    """Batched ((token1, token2), count) numpy arrays.

    With repeat=False, trailing partial batches are dropped (static shapes
    for jit).
    """
    it = cooccurrence_triples(pattern, repeat=repeat, seed=seed)
    if shuffle_buffer:
        it = recordio.shuffled(it, shuffle_buffer, seed=seed + 1)
    t1 = np.empty(batch_size, np.int32)
    t2 = np.empty(batch_size, np.int32)
    ct = np.empty(batch_size, np.float32)
    i = 0
    for a, b, c in it:
        t1[i], t2[i], ct[i] = a, b, c
        i += 1
        if i == batch_size:
            yield (t1.copy(), t2.copy()), ct.copy()
            i = 0


# ------------------------------------------------------------- playlists

PLAYLIST_CONTEXT_KEYS = ("track_context", "album_context", "artist_context")
PLAYLIST_NEXT_KEYS = ("next_track", "next_album", "next_artist")


def playlist_batches(
    pattern: str,
    context_size: int = 5,
    max_next: int = 64,
    repeat: bool = True,
    shuffle_buffer: int = 0,
    batch_size: int = 1,
    seed: int = 0,
    drop_remainder: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Parse playlist tfrecords into fixed-shape numpy batches.

    Schema parity with reference spotify/input_pipeline.py:23-37 (context
    fixed at ``context_size``, next-track labels variable-length), but the
    ragged ``next_*`` features are padded/cropped to ``max_next`` with a
    ``next_mask`` so the training step stays static-shaped and jit-compiled
    once — the reference feeds ragged arrays and recompiles per unique
    playlist length it encounters.
    """
    import tensorflow as tf

    from esrecsys_tpu.core.mesh import process_local_files

    files = sorted(glob_lib.glob(pattern))
    if not files:
        raise FileNotFoundError(f"no files match {pattern}")
    files = process_local_files(files)  # multi-host: per-process shard slice
    schema = {
        **{k: tf.io.FixedLenFeature([context_size], tf.int64) for k in PLAYLIST_CONTEXT_KEYS},
        **{k: tf.io.VarLenFeature(tf.int64) for k in PLAYLIST_NEXT_KEYS},
    }

    def decode(rec):
        ex = tf.io.parse_single_example(rec, schema)
        out = {k: tf.cast(ex[k], tf.int32) for k in PLAYLIST_CONTEXT_KEYS}
        for k in PLAYLIST_NEXT_KEYS:
            dense = tf.cast(tf.sparse.to_dense(ex[k]), tf.int32)[:max_next]
            n = tf.shape(dense)[0]
            out[k] = tf.pad(dense, [[0, max_next - n]])
            if k == "next_track":
                out["next_mask"] = tf.pad(tf.ones([n], tf.float32), [[0, max_next - n]])
        return out

    ds = tf.data.TFRecordDataset(files)
    ds = ds.map(decode, num_parallel_calls=tf.data.AUTOTUNE)
    if repeat:
        ds = ds.repeat()
    if shuffle_buffer:
        ds = ds.shuffle(shuffle_buffer, seed=seed)
    if batch_size > 1:
        ds = ds.batch(batch_size, drop_remainder=drop_remainder)
    ds = ds.prefetch(tf.data.AUTOTUNE)
    return ds.as_numpy_iterator()


PLAYLIST_PACKED_KEYS = PLAYLIST_CONTEXT_KEYS + PLAYLIST_NEXT_KEYS + ("next_mask",)


def pack_playlists(
    tfrecord_pattern: str,
    out_dir: str,
    context_size: int = 5,
    max_next: int = 64,
    examples_per_shard: int = 262_144,
) -> List[str]:
    """ETL-time batch packing: tfrecords → fixed-shape npz shards.

    Per-example tfrecord parsing (VarLen decode, pad, mask) costs real host
    CPU at train time — on a weak host it caps the feed rate orders of
    magnitude below what one chip consumes. Packing does that work ONCE:
    each shard holds dense int32 arrays of shape (N, C)/(N, M) plus the
    float mask, so the train-time iterator is a whole-shard load + permute +
    slice (~70x the parse rate; each shard is fully materialized in host RAM
    while visited, so size ``examples_per_shard`` to the host — the default
    is ~270 MB/shard).
    (The reference pays the parse cost per step, spotify/input_pipeline.py.)
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    it = playlist_batches(
        tfrecord_pattern, context_size=context_size, max_next=max_next,
        repeat=False, batch_size=1024, drop_remainder=False,
    )
    buf: Dict[str, List[np.ndarray]] = {k: [] for k in PLAYLIST_PACKED_KEYS}
    count, shard, paths = 0, 0, []

    def flush():
        nonlocal count, shard
        if not count:
            return
        path = f"{out_dir}/packed-{shard:05d}.npz"
        np.savez(path, **{k: np.concatenate(v, axis=0) for k, v in buf.items()})
        paths.append(path)
        for v in buf.values():
            v.clear()
        count, shard = 0, shard + 1

    for batch in it:
        for k in PLAYLIST_PACKED_KEYS:
            buf[k].append(batch[k])
        count += batch["next_mask"].shape[0]
        if count >= examples_per_shard:
            flush()
    flush()
    return paths


def packed_playlist_batches(
    pattern: str,
    batch_size: int,
    repeat: bool = True,
    shuffle: bool = True,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Train-time iterator over :func:`pack_playlists` shards.

    Per epoch: shards in random order, a fresh permutation within each
    shard, fixed-shape ``batch_size`` slices (trailing partial batches are
    dropped, matching the tfrecord path's drop_remainder).
    """
    from esrecsys_tpu.core.mesh import process_local_files

    files = sorted(glob_lib.glob(pattern))
    if not files:
        raise FileNotFoundError(f"no files match {pattern}")
    files = process_local_files(files)  # multi-host: per-process shard slice
    rng = np.random.default_rng(seed)
    while True:
        order = rng.permutation(len(files)) if shuffle else np.arange(len(files))
        for fi in order:
            with np.load(files[fi]) as z:
                arrays = {k: z[k] for k in PLAYLIST_PACKED_KEYS}
            n = arrays["next_mask"].shape[0]
            perm = rng.permutation(n) if shuffle else np.arange(n)
            for start in range(0, n - batch_size + 1, batch_size):
                sel = perm[start : start + batch_size]
                yield {k: v[sel] for k, v in arrays.items()}
        if not repeat:
            return


def load_track_corpus(
    all_tracks_json: str,
    track_vocab_path: str,
    album_vocab_path: str,
    artist_vocab_path: str,
) -> Dict[str, np.ndarray]:
    """Load the full track corpus as sorted parallel int32 arrays.

    Reference: spotify/input_pipeline.py:51-87 (load_all_tracks +
    make_all_tracks_numpy) — all_tracks.json maps track index → raw metadata;
    uri dictionaries map uris → ids.
    """
    from esrecsys_tpu.data.vocab import JsonVocab

    track_vocab = JsonVocab.load(track_vocab_path)
    album_vocab = JsonVocab.load(album_vocab_path)
    artist_vocab = JsonVocab.load(artist_vocab_path)
    with open(all_tracks_json) as f:
        all_tracks = json.load(f)

    items = []
    for track_idx_str, meta in all_tracks.items():
        items.append(
            (
                int(track_idx_str),
                album_vocab[meta["album_uri"]],
                artist_vocab[meta["artist_uri"]],
            )
        )
    items.sort()
    arr = np.asarray(items, dtype=np.int32)
    return {
        "tracks": arr[:, 0].copy(),
        "albums": arr[:, 1].copy(),
        "artists": arr[:, 2].copy(),
        "num_tracks": len(track_vocab),
        "num_albums": len(album_vocab),
        "num_artists": len(artist_vocab),
    }


# -------------------------------------------------------------- txt2url

def sparse_doc_sentences(
    pattern: str,
    sentence_length: int,
    max_sentences_per_doc: int = 4,
    repeat: bool = True,
    seed: int = 0,
) -> Iterator[Tuple[int, np.ndarray]]:
    """Stream (primary_url_index, fixed-length token window) training pairs.

    Reference txt2url_generator semantics (train_txt2url.py:126-147): short
    docs are zero-padded; long docs contribute ``max_sentences_per_doc``
    random windows. This is how the reference "scales sequence length" —
    fragment sampling rather than long-sequence modeling (SURVEY.md §5).
    """
    from esrecsys_tpu.data.protos import SparseDocument

    rng = np.random.default_rng(seed)
    for sdoc in recordio.proto_stream(pattern, SparseDocument, shuffle_files=True,
                                      repeat=repeat, seed=seed):
        tokens = np.asarray(sdoc.token_index, dtype=np.int32)
        n = tokens.shape[0]
        if n == 0:
            continue
        if n <= sentence_length:
            out = np.zeros(sentence_length, np.int32)
            out[:n] = tokens
            yield int(sdoc.primary_index), out
        else:
            for _ in range(max_sentences_per_doc):
                start = int(rng.integers(0, n - sentence_length))
                yield int(sdoc.primary_index), tokens[start : start + sentence_length]


def url_dice_triples(
    pattern: str,
    doc_frequency: np.ndarray,
    repeat: bool = True,
    seed: int = 0,
) -> Iterator[Tuple[int, int, float]]:
    """(url1, url2, dice) from url2url co-occurrence rows.

    dice = 2*joint/(df_a + df_b) (train_txt2url.py:111-123).
    ``doc_frequency[i]`` is the title dictionary's doc frequency for index i.
    """
    for row in recordio.proto_stream(pattern, CooccurrenceRow, shuffle_files=True,
                                     repeat=repeat, seed=seed):
        df_main = float(doc_frequency[row.index])
        for other, joint in zip(row.other_index, row.count):
            dice = 2.0 * float(joint) / (float(doc_frequency[other]) + df_main)
            yield int(row.index), int(other), dice


def txt2url_batches(
    txt2url_pattern: str,
    url2url_pattern: str,
    doc_frequency: np.ndarray,
    batch_size: int,
    sentence_length: int = 32,
    max_sentences_per_doc: int = 4,
    shuffle_buffer: int = 0,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Joint batches for the two-objective model (triplet_generator parity,
    train_txt2url.py:170-201): text pairs + url2url dice pairs, with the
    sqrt(dice) target (:199-200)."""
    from esrecsys_tpu.data import recordio as rio

    text_it = sparse_doc_sentences(
        txt2url_pattern, sentence_length, max_sentences_per_doc, repeat=True, seed=seed
    )
    dice_it = url_dice_triples(url2url_pattern, doc_frequency, repeat=True, seed=seed)
    if shuffle_buffer:
        text_it = rio.shuffled(text_it, shuffle_buffer, seed=seed + 1)
        dice_it = rio.shuffled(dice_it, shuffle_buffer, seed=seed + 2)
    while True:
        url_near = np.empty(batch_size, np.int32)
        tokens = np.empty((batch_size, sentence_length), np.int32)
        url1 = np.empty(batch_size, np.int32)
        url2 = np.empty(batch_size, np.int32)
        dice = np.empty(batch_size, np.float32)
        for i in range(batch_size):
            url_near[i], tokens[i] = next(text_it)
            url1[i], url2[i], dice[i] = next(dice_it)
        yield {
            "url_near_text": url_near,
            "tokens": tokens,
            "url1": url1,
            "url2": url2,
            "sqrt_dice": np.sqrt(dice),
        }
