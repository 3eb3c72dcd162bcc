"""Append-only CSV training log (reference utils.py:18-34 semantics:
header written once on first append)."""

from __future__ import annotations

import os
from typing import Dict


class CSVLog:
    def __init__(self, filepath: str):
        self._filepath = filepath
        self._header_written = os.path.exists(filepath) and os.path.getsize(filepath) > 0

    def log(self, items: Dict) -> None:
        keys = list(items.keys())
        with open(self._filepath, "a") as f:
            if not self._header_written:
                f.write(",".join(str(k) for k in keys) + "\n")
                self._header_written = True
            f.write(",".join(str(items[k]) for k in keys) + "\n")
