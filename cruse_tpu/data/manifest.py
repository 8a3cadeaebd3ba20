"""Manifest handling: txt file lists, offset/limit, SNR ranges.

Mirrors BaseDataset helpers (dataset/dataset.py:23-46, train_base/dataset/
base_dataset.py) and the corpus-curation flow of preprocess_dataset.py.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import List, Sequence


def load_manifest(path: str) -> List[str]:
    """One file path per line."""
    p = os.path.abspath(os.path.expanduser(path))
    with open(p) as f:
        return [line.rstrip("\n") for line in f if line.strip()]


def offset_and_limit(items: Sequence, offset: int = 0, limit: int | None = None):
    items = list(items)[offset:]
    if limit:
        items = items[:limit]
    return items


def parse_snr_range(snr_range) -> List[int]:
    assert len(snr_range) == 2, f"The range of snr should be [low, high], not {snr_range}"
    low, high = snr_range
    assert low <= high, "The low snr should not be larger than high snr"
    return list(range(int(low), int(high) + 1))


def write_manifest(paths: Sequence[str], out_path: str) -> None:
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as f:
        for p in paths:
            f.write(f"{p}\n")


def merge_manifests(manifest_paths: Sequence[str], out_path: str) -> List[str]:
    """Concatenate several txt manifests (preprocess_dataset.py:66-75)."""
    merged: List[str] = []
    for mp in manifest_paths:
        merged.extend(load_manifest(mp))
    write_manifest(merged, out_path)
    return merged
