"""Model zoo (L2): CRUSE (flagship), DFSMN, deep-filter head, MTFAA, BSRNN.

All models consume time-major spectral features [B, T, F(, C)] and emit
masks/filters applied to the noisy STFT. Every model exposes:
  - ``__call__(features, state=None, train=False) -> (out, state)`` where a
    ``None`` state means "fresh utterance"; passing T=1 chunks with carried
    state is the streaming path and is bit-exact with the batch path.
"""

from cruse_tpu.models.cruse import CruseNet, CruseConfig  # noqa: F401
from cruse_tpu.models.dfsmn import DfsmnNet, DfsmnBlock  # noqa: F401
from cruse_tpu.models.deep_filter import DeepFilterHead, deep_filter_apply  # noqa: F401
from cruse_tpu.models.mtfaa import MtfaaNet, MtfaaConfig  # noqa: F401
from cruse_tpu.models.bsrnn import BSRNN, Discriminator  # noqa: F401
from cruse_tpu.models.fullsubnet import FullSubNet, FullSubNetConfig  # noqa: F401
from cruse_tpu.models.mc_cruse import McCruseNet, McCruseConfig  # noqa: F401

MODEL_REGISTRY = {
    "cruse": CruseNet,
    "dfsmn": DfsmnNet,
    "mtfaa": MtfaaNet,
    "bsrnn": BSRNN,
    "fullsubnet": FullSubNet,
    "mc_cruse": McCruseNet,
}


def build_from_config(model_cfg):
    """Config dataclass (or ready module) -> model module.

    The CLI reflection path resolves [model].path to a config dataclass;
    this maps it onto its network class (CruseConfig -> CruseNet, etc.).
    """
    from cruse_tpu.models.cruse_df import CruseDfNet

    mapping = {
        "CruseConfig": CruseNet,
        "MtfaaConfig": MtfaaNet,
        "CruseDfConfig": CruseDfNet,
        "FullSubNetConfig": FullSubNet,
        "McCruseConfig": McCruseNet,
    }
    cls = mapping.get(type(model_cfg).__name__)
    return cls(model_cfg) if cls is not None else model_cfg


def features_for_model(model, spec):
    """Model-appropriate network input from a complex spectrum [B, T, F]
    (or [B, M, T, F] for multi-channel models)."""
    import jax.numpy as jnp
    from cruse_tpu.models.mtfaa import MtfaaNet as _M
    from cruse_tpu.models.bsrnn import BSRNN as _B

    if isinstance(model, (_M, _B)):
        return jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    if isinstance(model, McCruseNet):
        from cruse_tpu.dsp.features import directional_features_from_ri

        c = model.config
        if spec.ndim == 3:  # single-channel example (CLI init): tile mics
            spec = jnp.repeat(spec[:, None], c.num_mics, axis=1)
        ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
        return directional_features_from_ri(
            ri, c.mic_pairs, c.reference_channel, c.use_sin_ipd
        )
    return model.compress(jnp.abs(spec))
