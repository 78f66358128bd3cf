"""Query-side model encoders for the online retrieval service.

The reference stops at offline artifact generation; the book's serving
chapter describes query-understanding in the collector
(book-text/CH6-Serving-models-and-architecture.tex:55-59). These factories
load a trained model ARTIFACT (train/export.py) and return a callable that
embeds a raw query — text through the txt2url sentence tower, a catalog
image through the STL scene tower — into the index's vector space, jitted
once at fixed shape.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


def txt2url_text_encoder(
    artifact_path: str,
    token_dictionary: str,
    sentence_length: Optional[int] = None,
) -> Callable[[str], np.ndarray]:
    """text → url-space embedding via a trained txt2url artifact.

    Tokenization matches training (data/vocab.py simple_tokenize + the
    vocabulary's minhash OOV), so served queries see exactly the training
    text path (reference debug_callbacks.py:57-80 does this only offline).
    """
    from esrecsys_tpu.data.vocab import Vocabulary, simple_tokenize
    from esrecsys_tpu.models.txt2url import Txt2UrlModel
    from esrecsys_tpu.train import load_model

    params, _, meta = load_model(artifact_path)
    vocab = Vocabulary.load(token_dictionary)
    L = sentence_length or int(meta.get("sentence_length", 32))
    word_table = params["encoder"]["word_embedding"]["embedding"]
    url_table = params["url_embedding"]["embedding"]
    model = Txt2UrlModel(
        word_vocab_size=word_table.shape[0],
        url_vocab_size=url_table.shape[0],
        word_dim=int(meta["word_dim"]),
        rnn_size=int(meta.get("rnn_size", meta["word_dim"])),
        url_dim=int(meta["url_dim"]),
        encoder_type=meta.get("encoder_type", "lstm"),
    )
    # params are jit ARGUMENTS, not closures: closed-over arrays become
    # program constants the tunneled backend re-ships per call (CLAUDE.md;
    # the ~1M-row url table alone can exceed the 256 MB compile cap)
    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    encode = jax.jit(lambda tokens, p: model.apply(
        {"params": p}, tokens, method=Txt2UrlModel.encode_text))

    def encoder(text: str) -> np.ndarray:
        ids = vocab.embedding_indices(simple_tokenize(text))[:L]
        row = np.asarray(ids + [0] * (L - len(ids)), np.int32)[None, :]
        return np.asarray(jax.device_get(encode(row, jparams)))[0]

    return encoder


def stl_image_encoder(
    artifact_path: str,
    image_dir: str,
    image_size: Optional[int] = None,
    tower: str = "scene",
) -> Callable[[str], np.ndarray]:
    """catalog image key → embedding via a trained STL artifact's tower."""
    from esrecsys_tpu.data import images as images_lib
    from esrecsys_tpu.models.cnn import STLModel
    from esrecsys_tpu.train import load_model

    params, batch_stats, meta = load_model(artifact_path)
    size = image_size or int(meta["image_size"])
    model = STLModel(output_size=int(meta["output_size"]),
                     filters=tuple(meta["filters"]))
    method = (STLModel.get_scene_embed if tower == "scene"
              else STLModel.get_product_embed)
    # variables as jit arguments, not closures (see txt2url note above)
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats),
    }
    embed = jax.jit(lambda img, v: model.apply(v, img, method=method))

    def encoder(key: str) -> np.ndarray:
        it = images_lib.keyed_image_dataset([key], image_dir, 1, size)
        _, img, _ = next(iter(it))
        return np.asarray(jax.device_get(embed(jnp.asarray(img), variables)))[0]

    return encoder
