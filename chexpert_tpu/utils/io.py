"""JSON IO helpers (reference chexpert.py:81-88)."""

from __future__ import annotations

import json
import os
from typing import Any


def save_json(data: Any, filename: str, output_dir: str) -> str:
    path = os.path.join(output_dir, filename + ".json")
    with open(path, "w") as f:
        json.dump(data, f, indent=4)
    return path


def load_json(file_path: str) -> Any:
    with open(file_path) as f:
        return json.load(f)
