"""Run logging with the reference's artifact layout.

``checkpoint/<name>/log_<MM_DD_HH_MM>.txt``, buffered and flushed on save
epochs (trainNetwork.py:74-77,150-152,194-197), plus stdout echo.
"""

from __future__ import annotations

import os
import time
from typing import List


class RunLogger:
    def __init__(self, checkpoint_path: str):
        self.checkpoint_path = checkpoint_path
        os.makedirs(checkpoint_path, exist_ok=True)
        os.makedirs(os.path.join(checkpoint_path, "images"), exist_ok=True)
        timestamp = time.strftime("%m_%d_%H_%M")
        self.log_file = os.path.join(checkpoint_path, f"log_{timestamp}.txt")
        self._buffer: List[str] = []

    @property
    def images_dir(self) -> str:
        return os.path.join(self.checkpoint_path, "images")

    def log(self, line: str) -> None:
        print(line)
        self._buffer.append(line)

    def metrics(self, record: dict) -> None:
        """Append a structured record to ``metrics.jsonl`` (machine-readable
        counterpart of the text log; the reference has prints only)."""
        import json

        path = os.path.join(self.checkpoint_path, "metrics.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def flush(self) -> None:
        if not self._buffer:
            return
        with open(self.log_file, "a") as f:
            f.writelines(f"{line}\n" for line in self._buffer)
        self._buffer = []
