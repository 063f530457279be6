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


class WandbLogger:
    """Gated wandb metric logging (reference slam.py:612-619: project init,
    frame_idx step metric, ate* metrics). No-op when wandb is unavailable or
    disabled — the zero-egress TPU rig has neither the package nor network."""

    def __init__(self, enabled: bool = False, project: str = "monogs_tpu",
                 name: str | None = None, config: dict | None = None):
        self._run = None
        if not enabled:
            return
        try:
            import wandb

            self._run = wandb.init(project=project, name=name, config=config)
            wandb.define_metric("frame_idx")
            wandb.define_metric("ate*", step_metric="frame_idx")
        except Exception as e:  # pragma: no cover
            Log(f"wandb disabled: {e}", tag="System")

    def log(self, metrics: dict):
        if self._run is not None:  # pragma: no cover
            import wandb

            wandb.log(metrics)

    def finish(self):
        if self._run is not None:  # pragma: no cover
            import wandb

            wandb.finish()


def Log(*args, tag: str = "MonoGS"):
    if tag in _QUIET_TAGS:
        return
    stamp = f"[{time.time() - _T0:8.2f}s]"
    if _console is not None:
        style = _TAG_STYLES.get(tag, "bold white")
        _console.print(f"{stamp} [{style}]\\[{tag}][/{style}]", *args)
    else:
        print(stamp, f"[{tag}]", *args, file=sys.stderr)
