"""Structured metric logging: stdout + CSV writers.

Preserves the reference's epoch-log surface (reference main.py:154-175:
``train_log.csv`` with ``epoch,loss`` and an eval CSV) while fixing its
header/content mismatch quirk (header promised ``wer1,wer2,average_wer`` but
rows carried ``eval_loss,eval_wer`` — SURVEY.md §7 quirks list): here headers
match rows, and WER per speaker, CER, and throughput are first-class columns.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Any


class CsvLogger:
    def __init__(self, path: str, fieldnames: list[str], resume: bool = False):
        self.path = path
        self.fieldnames = fieldnames
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        mode = "a" if (resume and os.path.exists(path)) else "w"
        self._f = open(mode=mode, file=path, newline="")
        self._w = csv.DictWriter(self._f, fieldnames=fieldnames)
        if mode == "w":
            self._w.writeheader()
            self._f.flush()

    def log(self, **row: Any) -> None:
        self._w.writerow({k: row.get(k, "") for k in self.fieldnames})
        self._f.flush()

    def close(self) -> None:
        self._f.close()


class TensorBoardLogger:
    """Optional TensorBoard event writing (observability beyond the
    reference's print+CSV).  Gated on ``tensorboardX`` being importable; a
    missing dependency degrades to a no-op rather than failing training.
    Enable with ``train.tensorboard_dir=<dir>``."""

    def __init__(self, log_dir: str):
        self._w = None
        if not log_dir:
            return
        try:
            from tensorboardX import SummaryWriter

            self._w = SummaryWriter(log_dir)
        except ImportError:
            pass

    @property
    def active(self) -> bool:
        return self._w is not None

    def scalars(self, step: int, **values: float) -> None:
        if self._w is None:
            return
        for k, v in values.items():
            try:
                self._w.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def close(self) -> None:
        if self._w is not None:
            self._w.close()


class StepTimer:
    """Throughput / RTF accounting for the train loop (utterances/sec and
    realtime-factor are the project's headline metrics, BASELINE.md)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self.steps = 0
        self.utterances = 0
        self.audio_seconds = 0.0

    def tick(self, batch_size: int, audio_seconds: float = 0.0):
        self.steps += 1
        self.utterances += batch_size
        self.audio_seconds += audio_seconds

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def summary(self) -> dict[str, float]:
        el = max(self.elapsed, 1e-9)
        return {
            "steps_per_sec": self.steps / el,
            "utterances_per_sec": self.utterances / el,
            "rtf": (self.audio_seconds / el) if self.audio_seconds else 0.0,
        }
