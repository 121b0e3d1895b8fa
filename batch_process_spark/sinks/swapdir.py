"""Crash-safe directory swap for wholesale parquet rewrites.

``compact_parquet`` and the CDC upsert sink both replace a directory
with a freshly written one. A naive ``rmtree(path); rename(tmp, path)``
has a destruction window: a crash between the two calls leaves the
canonical path missing entirely, with the data stranded in the temp
dir. The swap here is never destructive of the only copy:

    1. rename(path, path + '.__old__')   # canonical data still intact
    2. rename(tmp, path)                 # new data takes the name
    3. rmtree(path + '.__old__')         # only now is anything deleted

A crash at any point leaves at least one complete copy on disk, and
``recover_swap`` (called on the next writer startup) rolls the state
forward or back deterministically.
"""

from __future__ import annotations

import os
import shutil

OLD_SUFFIX = ".__old__"


def swap_directory(tmp: str, path: str) -> None:
    """Atomically-enough replace ``path`` with ``tmp`` (single writer).

    ``path`` need not exist (first write). Same-filesystem renames only.
    """
    old = path.rstrip("/") + OLD_SUFFIX
    if os.path.exists(old):  # leftover from a crashed earlier swap
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def recover_swap(path: str, tmp: str | None = None) -> str:
    """Repair a crashed swap at writer startup. Returns one of
    'clean' | 'rolled_forward' | 'rolled_back'.

    States (P = canonical path, O = P.__old__, T = the temp dir):
      P present, O present  -> swap died after step 2: finish (drop O).
      P absent,  O present  -> swap died between 1 and 2: if T is
                               complete, finish the swap; else roll O
                               back to P.
      P absent,  T present  -> pre-fix layout crash: promote T.
    """
    old = path.rstrip("/") + OLD_SUFFIX
    if os.path.exists(path):
        if os.path.exists(old):
            shutil.rmtree(old)
            return "rolled_forward"
        return "clean"
    if os.path.exists(old):
        if tmp and os.path.exists(os.path.join(tmp, "_SUCCESS")):
            os.rename(tmp, path)
            shutil.rmtree(old)
            return "rolled_forward"
        os.rename(old, path)
        return "rolled_back"
    if tmp and os.path.exists(os.path.join(tmp, "_SUCCESS")):
        os.rename(tmp, path)
        return "rolled_forward"
    return "clean"
