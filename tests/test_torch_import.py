"""Torch checkpoint importer: round-trip parity with the torch mirror.

Builds the repaired-CRUSE torch mirror (the same one the 1e-4 waveform
parity suite uses), gives it distinctive weights AND BatchNorm running
stats, saves it in both reference checkpoint formats
(base_trainer.py:199-232), imports each, and checks the flax model's
eval-mode mask matches the torch eval output at 1e-5 -- which exercises
the running-stats path the importer must carry over.
"""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from cruse_tpu.models import CruseNet, CruseConfig
from cruse_tpu.utils.torch_import import (
    cruse_variables_from_torch,
    load_torch_state_dict,
)
from tests.test_e2e_parity import TorchCruse


def _distinctive_torch_model(cfg, seed=0):
    torch.manual_seed(seed)
    tm = TorchCruse(cfg)
    with torch.no_grad():
        for bn in list(tm.enc_bn) + list(tm.dec_bn):
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 2.0)
    return tm.eval()


def _check_import(tm, cfg, ckpt_path, rng):
    model = CruseNet(cfg)
    mag = np.abs(rng.standard_normal((2, 30, cfg.in_freq))).astype(np.float32)
    feat = model.compress(jnp.asarray(mag))
    template = jax.jit(model.init)(jax.random.PRNGKey(1), feat)

    state = load_torch_state_dict(str(ckpt_path))
    variables = cruse_variables_from_torch(state, cfg, template)

    ours, _ = jax.jit(model.apply)(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}, feat
    )
    with torch.no_grad():
        ref = tm(torch.from_numpy(mag)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_import_full_state_tar(tmp_path, rng):
    """Reference latest_model.tar format: {"model": state_dict, ...}."""
    cfg = CruseConfig(in_freq=161, channels=(4, 8, 8, 16), rnn_groups=4)
    tm = _distinctive_torch_model(cfg)
    path = tmp_path / "latest_model.tar"
    torch.save({"epoch": 7, "best_score": 0.5, "model": tm.state_dict()}, path)
    _check_import(tm, cfg, path, rng)


def test_import_weights_only_pth_with_ddp_prefix(tmp_path, rng):
    """Per-epoch model_NNNN.pth format, with DDP "module." prefixes."""
    cfg = CruseConfig(in_freq=161, channels=(4, 8, 8, 16), rnn_groups=4)
    tm = _distinctive_torch_model(cfg, seed=3)
    path = tmp_path / "model_0007.pth"
    torch.save({f"module.{k}": v for k, v in tm.state_dict().items()}, path)
    _check_import(tm, cfg, path, rng)


def test_imported_checkpoint_loads_through_preload_variables(tmp_path, rng):
    """The written orbax checkpoint round-trips through the CLI loader and
    keeps the imported BN running stats (not the fresh 0/1 init)."""
    import orbax.checkpoint as ocp
    from cruse_tpu.train.checkpoint import preload_variables

    cfg = CruseConfig(in_freq=161, channels=(4, 8), rnn_groups=2)
    tm = _distinctive_torch_model(cfg, seed=5)
    model = CruseNet(cfg)
    feat = model.compress(jnp.asarray(np.abs(rng.standard_normal((1, 10, 161))).astype(np.float32)))
    template = model.init(jax.random.PRNGKey(0), feat)
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = cruse_variables_from_torch(state, cfg, template)

    ocp.PyTreeCheckpointer().save(tmp_path / "imported", variables, force=True)
    loaded = preload_variables(tmp_path / "imported", template)
    np.testing.assert_allclose(
        loaded["batch_stats"]["enc_0"]["bn"]["mean"],
        tm.enc_bn[0].running_mean.numpy(),
        atol=1e-7,
    )
    got, _ = model.apply(
        {"params": loaded["params"], "batch_stats": loaded["batch_stats"]}, feat
    )
    want, _ = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}, feat
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-7)
