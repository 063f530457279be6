"""Tagged console logging (reference utils/logging_utils.py:3-30).

Uses rich when available; falls back to plain prints. Per-tag colors and
quiet flags mirror the reference's table.
"""

from __future__ import annotations

import os
import sys
import time

_TAG_STYLES = {
    "MonoGS": "bold green",
    "Tracker": "bold cyan",
    "Mapper": "bold magenta",
    "System": "bold yellow",
    "Eval": "bold blue",
    "Bench": "bold white",
}

_QUIET_TAGS = set(
    os.environ.get("MONOGS_QUIET_TAGS", "").split(",")
) - {""}

try:
    from rich.console import Console

    _console = Console(file=sys.stderr)
except Exception:  # pragma: no cover
    _console = None

_T0 = time.time()


def Log(*args, tag: str = "MonoGS"):
    if tag in _QUIET_TAGS:
        return
    stamp = f"[{time.time() - _T0:8.2f}s]"
    if _console is not None:
        style = _TAG_STYLES.get(tag, "bold white")
        _console.print(f"{stamp} [{style}]\\[{tag}][/{style}]", *args)
    else:
        print(stamp, f"[{tag}]", *args, file=sys.stderr)
