"""Plot suite smoke tests (figures build and close without a display)."""
import numpy as np

from cruse_tpu.utils import plot


def test_spectrogram_figures(rng):
    wav = rng.standard_normal(16000).astype(np.float32) * 0.2
    fig = plot.plot_spectrogram(wav, title="demo")
    assert fig is not None
    fig2 = plot.plot_spectrograms([wav, wav * 0.5], labels=["noisy", "enhanced"])
    assert len(fig2.axes) >= 2


def test_other_plots(rng):
    wav = rng.standard_normal(8000).astype(np.float32)
    assert plot.plot_waveforms([wav, wav * 0.3], labels=["a", "b"]) is not None
    assert plot.plot_heatmap(rng.random((20, 30)), title="align") is not None
    assert plot.plot_lines({"loss": np.linspace(1, 0.1, 50)}, xlabel="step") is not None
    assert plot.plot_mask(rng.random((100, 161))) is not None


def test_random_coef_filter(rng):
    import jax
    import jax.numpy as jnp
    from cruse_tpu.dsp.biquad import random_coef_filter

    x = jnp.asarray(rng.standard_normal((2, 2000)).astype(np.float32) * 0.1)
    y = random_coef_filter(jax.random.PRNGKey(0), x)
    assert np.isfinite(np.asarray(y)).all()
    y2 = random_coef_filter(jax.random.PRNGKey(1), x)
    assert np.abs(np.asarray(y) - np.asarray(y2)).max() > 1e-6
