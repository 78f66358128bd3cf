"""Workloads: thin configs wiring models + data + losses into the one harness.

Each module here replaces one reference train script:
  glove     ← wikipedia/train_cooccurence.py
  playlist  ← spotify/train_spotify.py
  stl       ← pinterest/train_shop_the_look.py
  txt2url   ← wikipedia/train_txt2url.py
"""
