"""Frame-by-frame streaming enhancement (low-latency causal path).

The per-hop step carries:
- the last ``n_fft - hop`` input samples (analysis frame assembly)
- the model's streaming state (conv histories + GRU hidden)
- the overlap-add tail of the synthesis frames

Each step does: assemble frame -> windowed DFT (one small matmul) -> model
T=1 step -> mask -> windowed iDFT -> OLA -> emit ``hop`` samples normalized
by the steady-state window envelope. Matches the offline ``center=False``
batch path after the OLA warmup (tested), which is the reference's streaming
conv-STFT contract (feature.py:272-398).

`run()` drives a whole utterance under `lax.scan` (throughput measurement);
`step()` is the real-time API (per-frame RTF, base_inferencer.py:188-190).
"""
from __future__ import annotations

import time
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cruse_tpu.dsp.stft import StftConfig, _analysis_kernel, _synthesis_kernel, _padded_window

# The carry type (and its jax.export serialization registration) lives in
# artifact.py so the artifact loader alone can deserialize streaming
# containers — a standalone consumer needs only jax + that one file.
from cruse_tpu.infer.artifact import StreamState


def _steady_envelope(cfg: StftConfig) -> np.ndarray:
    """Steady-state OLA of the squared window, periodic over one hop."""
    w2 = _padded_window(cfg) ** 2
    n, hop = cfg.n_fft, cfg.hop_length
    env = np.zeros(hop)
    for j in range(hop):
        env[j] = w2[j::hop].sum()
    return np.where(env > 1e-11, env, 1.0).astype(np.float32)


class StreamingEnhancer:
    """Drives any causal zoo model frame-by-frame. Magnitude-mask models
    (CRUSE, DFSMN) apply the mask per frame; CruseDfNet additionally runs the
    complex deep-filter head over a rolling masked-spectrum history
    (benchmark config 3's streaming-causal path); complex-spectrum models
    (MtfaaNet with a finite ``attention_window`` -- the deployable windowed
    configuration) enhance the RI spectrum directly through their own
    carried state (conv/TFCM histories, rolling ASA K/V, deep-filter
    taps); the multi-mic McCruseNet streams [B, M, hop] frames through the
    per-frame LPS+IPD front-end (frame-local math) and emits the enhanced
    reference mic."""

    def __init__(self, model, variables, cfg: StftConfig):
        assert not cfg.center, "streaming path uses center=False configs"
        from cruse_tpu.models.cruse_df import CruseDfNet
        from cruse_tpu.models.mtfaa import MtfaaNet
        from cruse_tpu.models.mc_cruse import McCruseNet
        from cruse_tpu.models.fullsubnet import FullSubNet
        from cruse_tpu.models.bsrnn import BSRNN

        self.model = model
        self.variables = variables
        self.cfg = cfg
        f = cfg.num_bins
        self._ana = jnp.asarray(np.asarray(_analysis_kernel(cfg))[:, 0, :].T)  # [N, 2F]
        self._syn = jnp.asarray(np.asarray(_synthesis_kernel(cfg))[:, 0, :])  # [2F, N]
        self._env_hop = jnp.asarray(_steady_envelope(cfg))
        self._num_bins = f
        self._is_df = isinstance(model, CruseDfNet)
        self._is_complex = isinstance(model, MtfaaNet)
        self._is_mc = isinstance(model, McCruseNet)  # [B, M, hop] in, ref-mic out
        self._is_cirm = isinstance(model, FullSubNet)  # complex-mask head
        self._is_bsrnn = isinstance(model, BSRNN)  # complex in/out, band split
        if self._is_bsrnn:
            assert model.causal, (
                "BSRNN streaming needs causal=True (the offline variant's "
                "GroupNorm(1, C) layers read the whole time axis)")
            from cruse_tpu.models.bsrnn import BAND_WIDTHS

            assert f == sum(BAND_WIDTHS), (
                f"BSRNN's band table covers {sum(BAND_WIDTHS)} bins; "
                f"stft config has {f} (use n_fft={2 * (sum(BAND_WIDTHS) - 1)})")
        if self._is_complex:
            assert model.config.attention_window is not None, (
                "MTFAA streaming needs a finite attention_window "
                "(the full-causal configuration cannot carry ASA state)")
        if self._is_cirm:
            assert model.config.norm == "cumulative_laplace_norm", (
                "FullSubNet streaming needs norm='cumulative_laplace_norm' "
                "(the offline norms read the whole utterance by construction)")
            assert model.config.look_ahead == 0, (
                "FullSubNet streaming needs look_ahead=0 (the look-ahead "
                "variant delays the output by future frames)")
        self._step_jit = jax.jit(self._step_impl)

    def init_state(self, batch_size: int) -> StreamState:
        n, hop = self.cfg.n_fft, self.cfg.hop_length
        model_state = self.model.init_state(batch_size)
        if self._is_df:
            from cruse_tpu.models.cruse_df import df_stream_init

            model_state = (model_state, df_stream_init(batch_size, self.model.config))
        tail_shape = (
            (batch_size, self.model.config.num_mics, n - hop)
            if self._is_mc else (batch_size, n - hop)
        )
        return StreamState(
            input_tail=jnp.zeros(tail_shape),
            ola_tail=jnp.zeros((batch_size, n - hop)),
            model_state=model_state,
        )

    def prime(self, state: StreamState, samples: jax.Array) -> StreamState:
        """Pre-fill the analysis buffer with the utterance's first
        ``n_fft - hop`` samples. After priming, step-by-step output is
        bit-identical to the offline center=False batch path (without
        priming, the stream starts from a zero buffer and output is delayed
        by one hop -- the usual real-time behavior)."""
        n, hop = self.cfg.n_fft, self.cfg.hop_length
        assert samples.shape[-1] == n - hop, (samples.shape, n - hop)
        return state._replace(input_tail=samples.astype(state.input_tail.dtype))

    def _step_impl(self, state: StreamState, hop_samples: jax.Array):
        from cruse_tpu.nn.quantize import dequantize_tree

        # identity on fp weights; on int8-quantized variables the convert+
        # scale is traced here so the jitted step keeps int8 constants
        variables = dequantize_tree(self.variables)
        hop, f = self.cfg.hop_length, self._num_bins
        frame = jnp.concatenate([state.input_tail, hop_samples], axis=-1)  # [B(, M), n]
        ri = frame @ self._ana  # [B(, M), 2F] windowed DFT
        if self._is_mc:
            from cruse_tpu.dsp.features import directional_features_from_ri

            cfg = self.model.config
            # [B, M, 1, F, 2] single-frame RI stack -> per-frame LPS+IPD
            # (frame-local math: layer norm is over frequency, so streaming
            # features equal the offline computer's frame t column)
            ri5 = jnp.stack([ri[..., :f], ri[..., f:]], axis=-1)[:, :, None]
            feats = directional_features_from_ri(
                ri5, cfg.mic_pairs, cfg.reference_channel, cfg.use_sin_ipd
            )  # [B, 1, D]
            mask, model_state = self.model.apply(variables, feats, state.model_state)
            m = mask[:, 0, :]
            ref = ri[:, cfg.reference_channel]
            enh_ri = jnp.concatenate([ref[:, :f] * m, ref[:, f:] * m], axis=-1)
            return self._finish(state, frame, enh_ri, model_state)
        real, imag = ri[:, :f], ri[:, f:]
        if self._is_complex:
            cspec = jnp.stack([real, imag], axis=-1)[:, None]  # [B, 1, F, 2]
            (enh, _mask), model_state = self.model.apply(
                variables, cspec, state.model_state
            )
            enh_ri = jnp.concatenate(
                [jnp.real(enh[:, 0]), jnp.imag(enh[:, 0])], axis=-1
            )
            return self._finish(state, frame, enh_ri, model_state)
        if self._is_bsrnn:
            cspec = jnp.stack([real, imag], axis=-1)[:, None]  # [B, 1, F, 2]
            enh, model_state = self.model.apply(variables, cspec, state.model_state)
            enh_ri = jnp.concatenate(
                [jnp.real(enh[:, 0]), jnp.imag(enh[:, 0])], axis=-1
            )
            return self._finish(state, frame, enh_ri, model_state)
        mag = jnp.sqrt(real**2 + imag**2 + 1e-12)
        feat = self.model.compress(mag)[:, None, :]  # [B, 1, F]
        if self._is_cirm:
            from cruse_tpu.dsp.mask import decompress_cirm, complex_mul

            crm, model_state = self.model.apply(variables, feat, state.model_state)
            crm = decompress_cirm(crm)[:, 0]  # [B, F, 2]
            r, i = complex_mul(real, imag, crm[..., 0], crm[..., 1])
            enh_ri = jnp.concatenate([r, i], axis=-1)
            return self._finish(state, frame, enh_ri, model_state)
        if self._is_df:
            from cruse_tpu.models.cruse_df import apply_cruse_df_streaming

            net_state, df_state = state.model_state
            (mask, coefs), net_state = self.model.apply(variables, feat, net_state)
            enh, df_state = apply_cruse_df_streaming(
                df_state, jax.lax.complex(real, imag),
                mask[:, 0, :], coefs[:, 0], self.model.config,
            )
            enh_ri = jnp.concatenate([jnp.real(enh), jnp.imag(enh)], axis=-1)
            model_state = (net_state, df_state)
        else:
            mask, model_state = self.model.apply(variables, feat, state.model_state)
            m = mask[:, 0, :]
            enh_ri = jnp.concatenate([real * m, imag * m], axis=-1)  # [B, 2F]
        return self._finish(state, frame, enh_ri, model_state)

    def _finish(self, state, frame, enh_ri, model_state):
        """Shared synthesis tail: windowed inverse frame + overlap-add.
        frame is [B, n] (or [B, M, n] multi-channel); the enhanced frame and
        OLA tail are always single-channel [B, ...]."""
        hop = self.cfg.hop_length
        synth = enh_ri @ self._syn  # [B, n] windowed inverse frame
        ola = jnp.concatenate(
            [state.ola_tail, jnp.zeros((synth.shape[0], hop), synth.dtype)], axis=-1
        ) + synth
        out = ola[:, :hop] / self._env_hop
        return out, StreamState(
            input_tail=frame[..., hop:],
            ola_tail=ola[:, hop:],
            model_state=model_state,
        )

    def step(self, state: StreamState, hop_samples: jax.Array):
        """One real-time hop. hop_samples: [B, hop] ([B, M, hop] for the
        multi-mic model) -> ([B, hop], new state)."""
        return self._step_jit(state, hop_samples)

    def _multi_impl(self, state: StreamState, samples: jax.Array, k: int):
        b = samples.shape[0]
        hop = self.cfg.hop_length
        # [B(, M), k*hop] -> [k, B(, M), hop]
        hops = jnp.moveaxis(samples.reshape(*samples.shape[:-1], k, hop), -2, 0)

        def scan_step(carry, x):
            out, new_carry = self._step_impl(carry, x)
            return new_carry, out

        new_state, outs = lax.scan(scan_step, state, hops)
        return outs.transpose(1, 0, 2).reshape(b, k * hop), new_state

    def step_multi(self, state: StreamState, samples: jax.Array):
        """Process k consecutive hops in ONE device dispatch.

        samples: [B, k*hop] -> ([B, k*hop], new state). Bit-identical to k
        `step` calls (tested); per-hop wall cost drops because the ~50 us
        host->device dispatch amortizes over k hops, at +(k-1)*hop/sr
        seconds of algorithmic latency -- the k=1 path stays the
        lowest-latency default. One compiled program per distinct k."""
        hop = self.cfg.hop_length
        assert samples.shape[-1] % hop == 0, (samples.shape, hop)
        k = samples.shape[-1] // hop
        if not hasattr(self, "_multi_jit"):
            self._multi_jit = {}
        if k not in self._multi_jit:
            import functools

            self._multi_jit[k] = jax.jit(functools.partial(self._multi_impl, k=k))
        return self._multi_jit[k](state, samples)

    def run(self, wav: jax.Array) -> jax.Array:
        """Enhance a whole utterance with the streaming path under lax.scan.

        Primed with the first ``n_fft - hop`` samples so the output aligns
        exactly with the offline center=False batch path. wav: [B, L]
        ([B, M, L] for the multi-mic model; output is the reference mic);
        returns [B, hop * num_frames] (= L - (n_fft - hop), rounded to hop).
        """
        b = wav.shape[0]
        n, hop = self.cfg.n_fft, self.cfg.hop_length
        state = self.prime(self.init_state(b), wav[..., : n - hop])
        rest = wav[..., n - hop :]
        num_hops = rest.shape[-1] // hop
        hops = jnp.moveaxis(
            rest[..., : num_hops * hop].reshape(*rest.shape[:-1], num_hops, hop), -2, 0
        )

        def scan_step(carry, x):
            out, new_carry = self._step_impl(carry, x)
            return new_carry, out

        _, outs = lax.scan(scan_step, state, hops)
        return outs.transpose(1, 0, 2).reshape(b, num_hops * hop)

    def measure_rtf(self, wav: np.ndarray, sr: int = 16000, num_frames: int = 50) -> float:
        """Per-frame real-time factor of the jitted streaming step (reference
        RTF semantics: processing time / audio time; < 1 means real-time)."""
        b = wav.shape[0]
        hop = self.cfg.hop_length
        state = self.init_state(b)
        out, state = self.step(state, jnp.asarray(wav[..., :hop]))  # compile
        jax.block_until_ready(out)
        num = min(num_frames, wav.shape[-1] // hop - 1)
        t0 = time.perf_counter()
        for i in range(1, num + 1):
            out, state = self.step(state, jnp.asarray(wav[..., i * hop : (i + 1) * hop]))
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        return (dt / num) / (hop / sr)
