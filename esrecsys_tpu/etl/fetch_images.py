"""Polite image fetcher for the Shop-the-Look dataset.

Capability parity with reference pinterest/fetch_images.py:45-104: dedupe
scene+product keys, skip already-downloaded files, retry with additive
backoff, rate-limit pause every N downloads. Differences: retries are capped
(the reference loops forever on a permanently-failing URL, :72-82) and
failures are reported at the end instead of hanging the job.

  python -m esrecsys_tpu.etl.fetch_images --stl_json pairs.json --image_dir imgs/
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
import urllib.request
from typing import List, Sequence

from esrecsys_tpu.core import config as config_lib
from esrecsys_tpu.data import images as images_lib

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class FetchConfig:
    stl_json: str = ""
    image_dir: str = "images"
    sleep_every: int = 100       # pause cadence (fetch_images.py:99-102)
    sleep_seconds: float = 1.0
    max_retries: int = 10        # reference retries forever; we cap
    backoff_seconds: float = 1.0  # additive backoff (+1s per failure, :78-80)


def unique_keys(stl_json: str) -> List[str]:
    pairs = images_lib.load_scene_product_pairs(stl_json)
    seen = []
    seen_set = set()
    for s, p in pairs:
        for k in (s, p):
            if k not in seen_set:
                seen_set.add(k)
                seen.append(k)
    return seen


def fetch_one(key: str, image_dir: str, max_retries: int, backoff: float) -> bool:
    path = images_lib.key_to_filename(key, image_dir)
    if os.path.isfile(path) and os.path.getsize(path) > 0:
        return True  # resume: skip existing (fetch_images.py:66-68)
    url = images_lib.key_to_url(key)
    delay = backoff
    for attempt in range(max_retries):
        try:
            with urllib.request.urlopen(url, timeout=30) as r:
                data = r.read()
            with open(path, "wb") as f:
                f.write(data)
            return True
        except Exception as e:  # noqa: BLE001 — any network error retries
            log.warning("fetch %s attempt %d failed: %s", key, attempt + 1, e)
            time.sleep(delay)
            delay += backoff
    return False


def fetch_all(cfg: FetchConfig) -> dict:
    os.makedirs(cfg.image_dir, exist_ok=True)
    keys = unique_keys(cfg.stl_json)
    log.info("%d unique images", len(keys))
    ok = failed = 0
    for i, key in enumerate(keys):
        if fetch_one(key, cfg.image_dir, cfg.max_retries, cfg.backoff_seconds):
            ok += 1
        else:
            failed += 1
            log.error("giving up on %s", key)
        if cfg.sleep_every and (i + 1) % cfg.sleep_every == 0:
            time.sleep(cfg.sleep_seconds)
    log.info("done: %d ok, %d failed", ok, failed)
    return {"ok": ok, "failed": failed}


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    fetch_all(config_lib.from_cli(FetchConfig, argv))


if __name__ == "__main__":
    main()
