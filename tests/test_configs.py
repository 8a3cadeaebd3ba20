"""Every shipped tiny config resolves to a constructible, trainable model.

The reference's configs are only validated by running the full CLI
(tools/train_stand.py:137-142); here each `configs/tiny_*.toml` [model]
section is resolved through the same reflection path the CLI uses and must
produce a finite forward pass -- so a broken config file fails in CI, not
at launch time. The two newest families (DFSMN, CRUSE+DF) additionally run
one real train step through their forward adapters.
"""
import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cruse_tpu.dsp.stft import StftConfig, stft, mc_stft
from cruse_tpu.models import build_from_config, features_for_model
from cruse_tpu.models.mc_cruse import McCruseNet
from cruse_tpu.utils.config import load_config, initialize_module

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*.toml")))
TINY_CONFIGS = [p for p in ALL_CONFIGS if os.path.basename(p).startswith("tiny_")]


def _model_and_feat(path, rng, seconds=0.35):
    config = load_config(path)
    ac = config["acoustics"]
    scfg = StftConfig(n_fft=int(ac["n_fft"]), hop_length=int(ac["hop_length"]))
    model_cfg = initialize_module(config["model"]["path"], config["model"].get("args"))
    model = build_from_config(model_cfg)
    n = int(seconds * int(ac.get("sr", 16000)))
    if isinstance(model, McCruseNet):
        wav = rng.standard_normal((1, model.config.num_mics, n)).astype(np.float32) * 0.1
        spec = mc_stft(jnp.asarray(wav), scfg)
    else:
        wav = rng.standard_normal((1, n)).astype(np.float32) * 0.1
        spec = stft(jnp.asarray(wav), scfg)
    return model, features_for_model(model, spec), scfg


def test_tiny_configs_exist():
    names = {os.path.basename(p) for p in TINY_CONFIGS}
    # one config per zoo family through the one CLI
    for family in ("tiny_cruse.toml", "tiny_cruse_df.toml", "tiny_dfsmn.toml",
                   "tiny_mtfaa.toml", "tiny_bsrnn.toml", "tiny_bsrnn_gan.toml",
                   "tiny_fullsubnet.toml", "tiny_mc.toml"):
        assert family in names, f"missing CLI config {family}"


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=[os.path.basename(p) for p in ALL_CONFIGS])
def test_tiny_config_builds_and_runs(path, rng):
    model, feat, _ = _model_and_feat(path, rng)
    variables = model.init(jax.random.PRNGKey(0), feat)
    out = model.apply(variables, feat)
    leaves = jax.tree_util.tree_leaves(out)
    assert leaves, "model returned no outputs"
    for leaf in leaves:
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize("name", ["tiny_dfsmn.toml", "tiny_cruse_df.toml"])
def test_new_family_configs_train_one_step(name, rng):
    from cruse_tpu.train.step import (StepConfig, init_train_state,
                                      make_train_step, forward_for_model)

    path = os.path.join(REPO, "configs", name)
    model, feat, scfg = _model_and_feat(path, rng)
    n = 4096
    clean = rng.standard_normal((1, n)).astype(np.float32) * 0.1
    noise = rng.standard_normal((1, n)).astype(np.float32) * 0.1
    batch = {"noisy": jnp.asarray(clean + noise), "clean": jnp.asarray(clean)}
    cfg = StepConfig(stft=scfg, learning_rate=1e-3)
    feat_b = features_for_model(model, stft(batch["noisy"], scfg))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat_b)
    step = jax.jit(make_train_step(model, cfg, forward=forward_for_model(model)))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss_si_snr"]))
