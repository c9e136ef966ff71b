"""Shared store-file helpers for the incremental streaming paths.

``commit_store``/``resolve_store`` implement a two-generation overwrite
protocol for stores that CANNOT be rebuilt from retained data (the sketch
register store keeps no keys): a plain ``mode("overwrite")`` deletes the old
parquet before the new ``_SUCCESS`` lands, so a crash in that window would
silently reset the store. Here the fresh generation is written to a side
directory and renamed into place while the displaced generation waits at
``<path>.prev`` — at every crash point at least one complete generation is
on disk, and readers fall back to ``.prev`` when the main path is
incomplete.

Local-filesystem renames are the sandbox mechanism; a real deployment keeps
the same two-generation protocol through the Hadoop FileSystem API or a
table format's atomic commit (Iceberg/Delta snapshot swap).
"""

from __future__ import annotations

import os
import shutil


def store_exists(path: str) -> bool:
    """A store is complete only when its ``_SUCCESS`` marker landed."""
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def resolve_store(path: str) -> str | None:
    """The newest COMPLETE generation of the store: ``path`` itself, else
    the ``.prev`` backup a crashed swap left behind, else None."""
    if store_exists(path):
        return path
    prev = path + ".prev"
    if store_exists(prev):
        return prev
    return None


def commit_store(new_dir: str, path: str) -> None:
    """Swap a freshly-written complete generation (``new_dir``) into
    ``path``, parking the displaced generation at ``<path>.prev`` until the
    next successful swap."""
    if not store_exists(new_dir):
        raise ValueError(f"commit_store: {new_dir} has no _SUCCESS marker")
    prev = path + ".prev"
    if os.path.exists(prev):
        shutil.rmtree(prev)
    if os.path.exists(path):
        os.rename(path, prev)
    os.rename(new_dir, path)
