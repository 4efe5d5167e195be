"""Canonical object-label vocabulary and per-label numbering.

Parity: /root/reference/utils/labels.py (the taxonomy results.json uses —
button, photo, design element, text, logo, cta).
"""

from __future__ import annotations

from typing import List

ALLOWED_LABELS: List[str] = [
    "button",
    "photo",
    "design element",
    "text",
    "logo",
    "cta",
]


def normalize_label(value: str) -> str:
    """Canonical lowercase, trimmed form."""
    return (value or "").strip().lower()


def is_allowed_label(value: str) -> bool:
    return normalize_label(value) in ALLOWED_LABELS


def compute_per_label_numbers(labels: List[str]) -> List[int]:
    """Contiguous per-label numbering, e.g. [photo, text, photo] -> [1, 1, 2]."""
    counters: dict = {}
    numbers: List[int] = []
    for lab in labels:
        key = normalize_label(lab)
        counters[key] = counters.get(key, 0) + 1
        numbers.append(counters[key])
    return numbers
