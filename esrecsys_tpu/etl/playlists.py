"""Million-Playlist-Dataset ETL: JSON slices → uri dictionaries → tfrecords.

Capability parity with reference spotify/make_dictionary.py:53-78 (insertion-
order uri→int dicts) and spotify/make_training.py:46-116 (first ``context_size``
tracks as fixed context, remainder as variable-length next-track labels,
plus the ``all_tracks.json`` corpus dump). One CLI replaces both:

  python -m esrecsys_tpu.etl.playlists --playlists 'data/mpd.slice.*.json' \
      --output data/training
"""

from __future__ import annotations

import dataclasses
import glob as glob_lib
import json
import logging
import os
from typing import Dict, Iterator, Tuple

from esrecsys_tpu.core import config as config_lib
from esrecsys_tpu.data.vocab import JsonVocab

log = logging.getLogger(__name__)

TRACK_DICT = "track_uri_dict.json"
ARTIST_DICT = "artist_uri_dict.json"
ALBUM_DICT = "album_uri_dict.json"
ALL_TRACKS = "all_tracks.json"


@dataclasses.dataclass(frozen=True)
class PlaylistEtlConfig:
    playlists: str = ""           # glob of MPD json slices
    output: str = "data/training"
    dictionaries: str = ""        # defaults to output dir
    context_size: int = 5         # reference --topk (make_training.py:40)
    min_tracks: int = 10          # reference --min_next (make_training.py:41)
    records_per_file: int = 0     # 0 = one tfrecord per input slice (reference layout)
    pack: bool = False            # also emit packed fixed-shape npz shards
    pack_max_next: int = 64       # next-group padding for packed shards


def iter_playlists(pattern: str) -> Iterator[Tuple[str, list]]:
    files = sorted(glob_lib.glob(pattern))
    if not files:
        raise FileNotFoundError(f"no playlist files match {pattern}")
    for path in files:
        with open(path) as f:
            yield path, json.load(f)["playlists"]


def build_dictionaries(pattern: str, out_dir: str) -> Tuple[JsonVocab, JsonVocab, JsonVocab]:
    """First-seen-order uri→int dicts for tracks/artists/albums."""
    os.makedirs(out_dir, exist_ok=True)
    tracks, artists, albums = JsonVocab(), JsonVocab(), JsonVocab()
    for path, playlists in iter_playlists(pattern):
        for playlist in playlists:
            for track in playlist["tracks"]:
                tracks.add(track["track_uri"])
                artists.add(track["artist_uri"])
                albums.add(track["album_uri"])
        log.info("dictionaries after %s: %d tracks %d artists %d albums",
                 path, len(tracks), len(artists), len(albums))
    tracks.save(os.path.join(out_dir, TRACK_DICT))
    artists.save(os.path.join(out_dir, ARTIST_DICT))
    albums.save(os.path.join(out_dir, ALBUM_DICT))
    return tracks, artists, albums


def build_training(cfg: PlaylistEtlConfig) -> Dict[str, int]:
    """Write tfrecords + all_tracks.json. Returns counters."""
    import tensorflow as tf

    dict_dir = cfg.dictionaries or cfg.output
    tracks = JsonVocab.load(os.path.join(dict_dir, TRACK_DICT))
    artists = JsonVocab.load(os.path.join(dict_dir, ARTIST_DICT))
    albums = JsonVocab.load(os.path.join(dict_dir, ALBUM_DICT))
    os.makedirs(cfg.output, exist_ok=True)

    raw_tracks: Dict[int, dict] = {}
    written = skipped = 0
    for pidx, (path, playlists) in enumerate(iter_playlists(cfg.playlists)):
        out = os.path.join(cfg.output, "%05d.tfrecord" % pidx)
        with tf.io.TFRecordWriter(out) as writer:
            for playlist in playlists:
                if playlist.get("num_tracks", len(playlist["tracks"])) < cfg.min_tracks:
                    skipped += 1
                    continue
                ctx: Dict[str, list] = {"track": [], "album": [], "artist": []}
                nxt: Dict[str, list] = {"track": [], "album": [], "artist": []}
                for tidx, track in enumerate(playlist["tracks"]):
                    ids = (
                        tracks[track["track_uri"]],
                        albums[track["album_uri"]],
                        artists[track["artist_uri"]],
                    )
                    raw_tracks.setdefault(ids[0], track)
                    dest = ctx if tidx < cfg.context_size else nxt
                    dest["track"].append(ids[0])
                    dest["album"].append(ids[1])
                    dest["artist"].append(ids[2])
                if not nxt["track"]:
                    skipped += 1
                    continue
                feature = {
                    name: tf.train.Feature(int64_list=tf.train.Int64List(value=vals))
                    for name, vals in [
                        ("track_context", ctx["track"]),
                        ("album_context", ctx["album"]),
                        ("artist_context", ctx["artist"]),
                        ("next_track", nxt["track"]),
                        ("next_album", nxt["album"]),
                        ("next_artist", nxt["artist"]),
                    ]
                }
                example = tf.train.Example(features=tf.train.Features(feature=feature))
                writer.write(example.SerializeToString())
                written += 1
    with open(os.path.join(cfg.output, ALL_TRACKS), "w") as f:
        json.dump(raw_tracks, f)
    log.info("wrote %d playlists (%d skipped), %d unique tracks", written, skipped, len(raw_tracks))
    return {"written": written, "skipped": skipped, "unique_tracks": len(raw_tracks)}


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    cfg = config_lib.from_cli(PlaylistEtlConfig, argv)
    build_dictionaries(cfg.playlists, cfg.dictionaries or cfg.output)
    build_training(cfg)
    if cfg.pack:
        from esrecsys_tpu.data.pipelines import pack_playlists

        paths = pack_playlists(
            os.path.join(cfg.output, "*.tfrecord"),
            os.path.join(cfg.output, "packed"),
            context_size=cfg.context_size,
            max_next=cfg.pack_max_next,
        )
        log.info("packed %d npz shards", len(paths))


if __name__ == "__main__":
    main()
