"""Scalar metric logging.

Replaces the reference's tensorboardX SummaryWriter (chexpert.py:13,444,451)
with a zero-dependency JSONL scalar log, plus TensorBoard event files when
tensorboardX is importable (it is optional — the JSONL log is the source of
truth and what tests read).
"""

from __future__ import annotations

import json
import os
import time


class MetricsWriter:
    """Append-only scalar log: one JSON object per line in scalars.jsonl."""

    def __init__(self, logdir: str):
        from chexpert_tpu.utils.io import is_primary

        self.logdir = logdir
        # multi-process: every host computes identical scalars — only the
        # primary writes, the rest would race on the shared files
        self._active = is_primary()
        self._f = None
        self._tb = None
        if not self._active:
            return
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "scalars.jsonl"), "a")
        try:  # optional TensorBoard mirror
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(logdir=logdir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if not self._active:
            return
        rec = {"tag": tag, "value": float(value), "step": int(step), "ts": time.time()}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_text(self, tag: str, text: str) -> None:
        if not self._active:
            return
        rec = {"tag": tag, "text": text, "ts": time.time()}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_text(tag, text)

    def close(self) -> None:
        if not self._active:
            return
        self._f.close()
        if self._tb is not None:
            self._tb.close()
