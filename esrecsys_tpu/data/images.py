"""Image input pipeline + Shop-the-Look dataset utilities.

Capability parity with reference pinterest/input_pipeline.py:20-49 (JPEG →
crop/pad 512² → scale to [-0.5, 0.5]; triplet and id-keyed datasets) and
pinterest/pin_util.py:27-56 (signature→CDN URL, valid-pair filtering).
tf.data does the decode in C++ threads; batches come out as numpy.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, List, Sequence, Tuple

IMAGE_SIZE = 512


def key_to_url(key: str) -> str:
    """Image signature → pinimg CDN URL (pin_util.py:27-32 scheme)."""
    prefix = f"{key[0:2]}/{key[2:4]}/{key[4:6]}"
    return f"http://i.pinimg.com/400x/{prefix}/{key}.jpg"


def key_to_filename(key: str, image_dir: str) -> str:
    return os.path.join(image_dir, key + ".jpg")


def load_scene_product_pairs(stl_json: str) -> List[Tuple[str, str]]:
    """Parse the STL scene→product json (one object per line or a json list)."""
    pairs = []
    with open(stl_json) as f:
        content = f.read().strip()
    if content.startswith("["):
        rows = json.loads(content)
    else:
        rows = [json.loads(line) for line in content.splitlines() if line.strip()]
    for row in rows:
        pairs.append((row["scene"], row["product"]))
    return pairs


def valid_scene_product(
    pairs: Sequence[Tuple[str, str]], image_dir: str
) -> List[Tuple[str, str]]:
    """Keep pairs whose images both exist non-empty on disk
    (pin_util.py:43-56 parity)."""

    def ok(key: str) -> bool:
        p = key_to_filename(key, image_dir)
        return os.path.isfile(p) and os.path.getsize(p) > 0

    return [(s, p) for s, p in pairs if ok(s) and ok(p)]


def _tf():
    import tensorflow as tf

    return tf


def _decode(tf, filename, image_size: int):
    raw = tf.io.read_file(filename)
    img = tf.io.decode_jpeg(raw, channels=3)
    img = tf.image.resize_with_crop_or_pad(img, image_size, image_size)
    # Scale to [-0.5, 0.5] (input_pipeline.py:20-23).
    return tf.cast(img, tf.float32) / 255.0 - 0.5


def triplet_image_dataset(
    triplets: Sequence[Tuple[str, str, str]],
    image_dir: str,
    batch_size: int,
    image_size: int = IMAGE_SIZE,
    repeat: bool = True,
    shuffle: bool = True,
    seed: int = 0,
) -> Iterator:
    """(scene, pos, neg) filename triplets → batched image triplets."""
    tf = _tf()
    from esrecsys_tpu.core.mesh import process_local_slice

    triplets = process_local_slice(triplets)  # multi-host: per-process slice
    files = [
        tuple(key_to_filename(k, image_dir) for k in t) for t in triplets
    ]
    ds = tf.data.Dataset.from_tensor_slices([list(t) for t in files])
    if repeat:
        ds = ds.repeat()
    if shuffle:
        ds = ds.shuffle(min(len(files), 4096), seed=seed)

    def mapper(row):
        return tuple(_decode(tf, row[i], image_size) for i in range(3))

    ds = ds.map(mapper, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(batch_size, drop_remainder=True)
    ds = ds.prefetch(tf.data.AUTOTUNE)
    return ds.as_numpy_iterator()


def keyed_image_dataset(
    keys: Sequence[str],
    image_dir: str,
    batch_size: int,
    image_size: int = IMAGE_SIZE,
) -> Iterator:
    """(key, image) batches for catalog embedding.

    Unlike the reference (make_embeddings.py:95,114 ``drop_remainder=True``,
    which silently drops tail items from the index), the tail batch is padded
    by repeating the last item and a count is yielded so callers can trim.
    Yields (keys (B,), images (B,H,W,3), valid_count).
    """
    tf = _tf()
    n = len(keys)
    padded = list(keys) + [keys[-1]] * ((-n) % batch_size)
    files = [key_to_filename(k, image_dir) for k in padded]
    ds = tf.data.Dataset.from_tensor_slices((list(padded), files))
    ds = ds.map(
        lambda k, f: (k, _decode(tf, f, image_size)),
        num_parallel_calls=tf.data.AUTOTUNE,
    )
    ds = ds.batch(batch_size)
    ds = ds.prefetch(tf.data.AUTOTUNE)
    for i, (ks, imgs) in enumerate(ds.as_numpy_iterator()):
        start = i * batch_size
        valid = min(batch_size, max(0, n - start))
        yield [k.decode() for k in ks], imgs, valid
