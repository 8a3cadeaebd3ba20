"""Small utilities mirroring the reference's grab-bag helpers.

train_base/utils.py: check_nan, print_tensor_info, expand_path, basename;
utils/utils_base.py: str2bool, pad helpers, get_mask_from_lengths, file/dir
helpers; utils/utils.py: csv writer, as_windowed.
"""
from __future__ import annotations

import csv
import os
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.utils.logger import log


def check_nan(tree, key: str = "") -> bool:
    """Log + return True if any leaf contains NaN (train_base/utils.py:48)."""
    found = False
    for leaf in jax.tree_util.tree_leaves(tree):
        if bool(jnp.isnan(jnp.asarray(leaf)).any()):
            log(f"Found NaN in {key}")
            found = True
            break
    return found


def print_tensor_info(x, flag: str = "Tensor") -> None:
    x = np.asarray(x)
    log(
        f"{flag}\n\tmax: {x.max():.4f}, min: {x.min():.4f}, "
        f"mean: {x.mean():.4f}, std: {x.std():.4f}"
    )


def expand_path(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def basename(path: str):
    filename, ext = os.path.splitext(os.path.basename(path))
    return filename, ext


def prepare_empty_dir(dirs: Sequence, resume: bool = False) -> None:
    from pathlib import Path

    for d in dirs:
        d = Path(d)
        if resume:
            assert d.exists(), "In resume mode, the old experiment dir must exist."
        else:
            d.mkdir(parents=True, exist_ok=True)


def str2bool(value) -> bool:
    if isinstance(value, bool):
        return value
    if value.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if value.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise ValueError(f"Boolean value expected, got {value!r}")


def write_csv_row(path: str, row: Sequence) -> None:
    """Append a row to a csv log (utils/utils.py:222-231)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "a", newline="") as f:
        csv.writer(f).writerow(row)


def as_windowed(x: np.ndarray, win_len: int, hop_len: int = 1, axis: int = -1) -> np.ndarray:
    """Zero-copy sliding windows (utils/utils.py:44-56 as_strided)."""
    from numpy.lib.stride_tricks import sliding_window_view

    view = sliding_window_view(x, win_len, axis=axis)
    return view[(slice(None),) * (axis % x.ndim) + (slice(None, None, hop_len),)]


# ---- batch pad/mask helpers (utils/utils_base.py:108-171) ----


def pad_1d(inputs: Sequence[np.ndarray], pad_value: float = 0.0) -> np.ndarray:
    max_len = max(len(x) for x in inputs)
    return np.stack([
        np.pad(x, (0, max_len - len(x)), constant_values=pad_value) for x in inputs
    ])


def pad_2d(inputs: Sequence[np.ndarray], pad_value: float = 0.0) -> np.ndarray:
    max_len = max(x.shape[0] for x in inputs)
    return np.stack([
        np.pad(x, ((0, max_len - x.shape[0]), (0, 0)), constant_values=pad_value)
        for x in inputs
    ])


def get_mask_from_lengths(lengths: jax.Array, max_len: int | None = None) -> jax.Array:
    """True where valid: [B] -> [B, T]."""
    if max_len is None:
        max_len = int(jnp.max(lengths))
    ids = jnp.arange(max_len)
    return ids[None, :] < lengths[:, None]


def device_info() -> dict:
    """prepare_device analogue: report the accelerator fleet."""
    devs = jax.devices()
    return {
        "platform": devs[0].platform,
        "num_devices": len(devs),
        "kinds": sorted({d.device_kind for d in devs}),
    }
