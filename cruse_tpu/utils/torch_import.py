"""Import PyTorch CRUSE checkpoints into cruse_tpu flax variables.

Reference users carry torch checkpoints in the reference's formats
(`latest_model.tar` full-state with a "model" key, or per-epoch
`model_NNNN.pth` weights-only -- base_trainer.py:199-232). This module maps
a repaired-CRUSE torch state_dict onto `CruseNet`'s parameter pytree so
those checkpoints keep working after the switch.

The canonical torch layout accepted here is the *repaired* unet_2
architecture (SURVEY.md §2.9: the as-written reference model has broken
layer wiring) with module names:

    enc.{i}.weight/.bias            Conv2d (2,3) stride (1,2) pad (0,1)
    enc_bn.{i}.weight/.bias/.running_mean/.running_var
    skips.{i}.weight                Conv2d (1,3) pad (0,1), no bias
    gru1.{i}./gru2.{i}. weight_ih_l0/weight_hh_l0/bias_ih_l0/bias_hh_l0
    ln1./ln2. weight/.bias          LayerNorm over the bottleneck dim
    dec.{i}.weight/.bias            ConvTranspose2d (2,3) stride (1,2) pad (0,1)
    dec_bn.{i}.weight/.bias/.running_mean/.running_var

which is exactly the mirror the end-to-end parity suite pins at 1e-4
waveform max-abs (tests/test_e2e_parity.py). "module."-prefixed keys (DDP
wrapping) are stripped.

torch is imported lazily: this module works in torch-free environments as
long as the checkpoint was already converted to numpy.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference-format checkpoint: full-state ``.tar`` ({"model":
    state_dict, ...}) or weights-only ``.pth``; returns numpy arrays with
    any DDP "module." prefix stripped."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("model", blob) if isinstance(blob, dict) else blob
    if hasattr(state, "state_dict"):  # a whole module was pickled
        state = state.state_dict()
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _require(state: Mapping[str, np.ndarray], key: str) -> np.ndarray:
    if key not in state:
        raise KeyError(
            f"torch checkpoint is missing '{key}' -- expected the repaired "
            f"unet_2 layout (see cruse_tpu.utils.torch_import docstring); "
            f"available keys: {sorted(state)[:8]}..."
        )
    return np.asarray(state[key], np.float32)


def cruse_variables_from_torch(
    state: Mapping[str, np.ndarray], config, template_variables: Dict[str, Any]
) -> Dict[str, Any]:
    """Map a repaired-CRUSE torch state_dict onto CruseNet variables.

    `template_variables` comes from `model.init(...)` and provides the
    target tree structure (and any leaves the torch model does not carry).
    Returns {"params": ..., "batch_stats": ...}; inverse of the
    flax->torch `sync_weights` mapping in tests/test_e2e_parity.py:87.
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, template_variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, template_variables.get("batch_stats", {}))
    params = jax.device_get(params)
    chs = [1] + list(config.channels)
    n_levels = len(config.channels)

    for li in range(n_levels):
        w = _require(state, f"enc.{li}.weight")  # [O, cin, 2, 3]
        cin, o = chs[li], chs[li + 1]
        kt = w.shape[2]
        k = np.zeros((1, w.shape[3], cin * kt, o), np.float32)
        for ti in range(kt):
            # stacked tap channels: [tap0 (older) | tap1 (current)]
            k[0, :, ti * cin : (ti + 1) * cin, :] = np.transpose(w[:, :, ti, :], (2, 1, 0))
        params[f"enc_{li}"]["conv"]["kernel"] = k
        params[f"enc_{li}"]["conv"]["bias"] = _require(state, f"enc.{li}.bias")
        params[f"enc_{li}"]["bn"]["scale"] = _require(state, f"enc_bn.{li}.weight")
        params[f"enc_{li}"]["bn"]["bias"] = _require(state, f"enc_bn.{li}.bias")
        stats[f"enc_{li}"]["bn"]["mean"] = _require(state, f"enc_bn.{li}.running_mean")
        stats[f"enc_{li}"]["bn"]["var"] = _require(state, f"enc_bn.{li}.running_var")
        if config.skip_convs:
            ws = _require(state, f"skips.{li}.weight")  # [c, c, 1, 3]
            params[f"skip_{li}"]["kernel"] = np.transpose(ws, (2, 3, 1, 0))

    g = config.rnn_groups
    for name, tname in (("bank1", "gru1"), ("bank2", "gru2")):
        bank = params["ggru"][name]
        for key in ("w_ih", "w_hh", "b_ih", "b_hh"):
            tkey = {"w_ih": "weight_ih_l0", "w_hh": "weight_hh_l0",
                    "b_ih": "bias_ih_l0", "b_hh": "bias_hh_l0"}[key]
            bank[key] = np.stack(
                [_require(state, f"{tname}.{gi}.{tkey}") for gi in range(g)]
            )
    params["ggru"]["ln1"]["scale"] = _require(state, "ln1.weight")
    params["ggru"]["ln1"]["bias"] = _require(state, "ln1.bias")
    params["ggru"]["ln2"]["scale"] = _require(state, "ln2.weight")
    params["ggru"]["ln2"]["bias"] = _require(state, "ln2.bias")

    for li in range(n_levels):
        w = _require(state, f"dec.{li}.weight")  # [cin, cout, 2, 3]
        # flax ConvTranspose kernel [2, 3, cin, cout], taps flipped
        params[f"dec_{li}"]["conv"]["kernel"] = np.ascontiguousarray(
            np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
        )
        params[f"dec_{li}"]["conv"]["bias"] = _require(state, f"dec.{li}.bias")
        if li < n_levels - 1:
            params[f"dec_{li}"]["bn"]["scale"] = _require(state, f"dec_bn.{li}.weight")
            params[f"dec_{li}"]["bn"]["bias"] = _require(state, f"dec_bn.{li}.bias")
            stats[f"dec_{li}"]["bn"]["mean"] = _require(state, f"dec_bn.{li}.running_mean")
            stats[f"dec_{li}"]["bn"]["var"] = _require(state, f"dec_bn.{li}.running_var")
    return {"params": params, "batch_stats": stats}
