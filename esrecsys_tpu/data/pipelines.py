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

    files = sorted(glob_lib.glob(pattern))
    if not files:
        raise FileNotFoundError(f"no files match {pattern}")
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
        ds = ds.batch(batch_size, drop_remainder=True)
    ds = ds.prefetch(tf.data.AUTOTUNE)
    return ds.as_numpy_iterator()


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
