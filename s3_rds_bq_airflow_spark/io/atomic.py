"""Crash-safe directory swap for plain-parquet state.

``rmtree(target); os.replace(tmp, target)`` has a window where a
crash leaves NO readable table at all. The rename-aside protocol
keeps a readable current-or-previous version at every crash point:

    1. old readable  ->  os.replace(target, target__old)
    2. new readable  ->  os.replace(tmp, target)
    3. cleanup       ->  rmtree(target__old)

A crash after (1) leaves ``__old`` (recoverable via
``recover_directory``); after (2) the new version is live and a stale
``__old`` is swept on the next swap. On object stores / real
deployments a table format (Delta/Iceberg) commit replaces this; the
protocol is the plain-filesystem equivalent.
"""

from __future__ import annotations

import os
import shutil

_OLD_SUFFIX = "__sdc_old"


def swap_directory(tmp: str, target: str) -> None:
    """Atomically promote ``tmp`` to ``target`` (rename-aside)."""
    target = target.rstrip("/")
    old = target + _OLD_SUFFIX
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(target):
        os.replace(target, old)
    os.replace(tmp, target)
    if os.path.exists(old):
        shutil.rmtree(old)


def recover_directory(target: str) -> str | None:
    """After a crash: if ``target`` is missing but the ``__sdc_old``
    copy exists, restore it. Returns the readable path or None."""
    target = target.rstrip("/")
    old = target + _OLD_SUFFIX
    if os.path.exists(target):
        return target
    if os.path.exists(old):
        os.replace(old, target)
        return target
    return None
