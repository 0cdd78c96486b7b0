"""Artifact I/O: the on-disk contract (pickles, JSON, PNG) is the interface
between pipeline stages and with the reference's artifacts (SURVEY §1)."""

from __future__ import annotations

import json
import os
import pickle
from typing import Any

import numpy as np


def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pickle(obj: Any, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_json(path: str) -> Any:
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def save_json(obj: Any, path: str, indent: int = 2) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(obj, f, ensure_ascii=False, indent=indent)


def read_image(path: str, gray: bool = False) -> np.ndarray:
    import cv2  # noqa: PLC0415

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"cannot read image: {path}")
    return img


def write_image(path: str, img: np.ndarray) -> None:
    import cv2  # noqa: PLC0415

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if not cv2.imwrite(path, np.asarray(img)):
        raise IOError(f"cannot write image: {path}")
