"""MTFAA bottleneck probes: where does the config-5 train step lose time?

Hypotheses probed on the real chip:
  H1 batch scaling    -- if throughput grows with B, the step is
                         overhead/latency bound at B=16, not compute bound.
  H2 lane padding     -- activations are [B,T,K,C] with C=24..48 on the
                         minor (lane) axis; XLA tiles the minor dim to 128,
                         so tiny C wastes most of each VREG/HBM tile. A
                         C=128 stack costs ~the same wall time if true.
  H3 depthwise conv   -- the (3,3) time-dilated depthwise conv
                         (feature_group_count=C) may lower poorly; a
                         shift-MAC formulation (9 shifted elementwise MACs)
                         is pure VPU work that fuses with the BN/PReLU
                         neighbors.
Timing rules as in profile_mtfaa.py: fresh inputs per rep + sequential
dependence inside an on-device fori_loop.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# profiling sweeps recompile many variants; persist compiled executables
_cache = os.environ.get("CRUSE_TPU_TEST_CACHE", "/root/.cache/cruse_tpu_jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
from jax import lax
import flax.linen as nn

B, T, K, ITERS = 16, 626, 64, 8


def _time3(loop, *args):
    float(loop(*args))
    times = []
    for rep in range(3):
        fresh = (args[0] * (1.0 + 1e-4 * (rep + 1)),) + args[1:]
        float(fresh[0].ravel()[0])
        t0 = time.perf_counter()
        float(loop(*fresh))
        times.append(time.perf_counter() - t0)
    return min(times)


class TFCMBlockShiftMac(nn.Module):
    """TFCMBlock with the depthwise (3,3) dilated conv expressed as 9
    shifted elementwise MACs (VPU-friendly, fuses with BN/PReLU)."""

    channels: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        inp = x
        x = nn.Conv(self.channels, (1, 1), name="pconv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(x)
        x = nn.PReLU()(x)
        w = self.param("dw_kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.channels))
        bias = self.param("dw_bias", nn.initializers.zeros, (self.channels,))
        d = self.dilation
        xp = jnp.pad(x, ((0, 0), (2 * d, 0), (1, 1), (0, 0)))
        tlen, flen = x.shape[1], x.shape[2]
        acc = None
        for it in range(3):
            for jf in range(3):
                sl = xp[:, it * d : it * d + tlen, jf : jf + flen, :] * w[it, jf]
                acc = sl if acc is None else acc + sl
        x = acc + bias
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(x)
        x = nn.PReLU()(x)
        x = nn.Conv(self.channels, (1, 1), name="pconv2")(x)
        return x + inp


class TFCMBlockTMinor(nn.Module):
    """TFCMBlock on [B, K, C, T] activations (time on the minor/lane axis).

    fp32 tiles are (8,128): T=626 pads to 640 (2% waste) and C=24 is an
    exact sublane multiple -- versus C-minor layout where 24 pads to 128
    (5.3x traffic). Depthwise conv = shift-MAC (layout-preserving
    elementwise); 1x1 convs = einsum contracting C; BN stats reduce over
    (B,K,T) per channel exactly as before.
    """

    channels: int
    dilation: int = 1

    def _bn(self, x, name, train):
        # x: [B, K, C, T]; normalize per channel (axis 2)
        ra_mean = self.variable("batch_stats", f"{name}_mean",
                                lambda: jnp.zeros((self.channels,), jnp.float32))
        ra_var = self.variable("batch_stats", f"{name}_var",
                               lambda: jnp.ones((self.channels,), jnp.float32))
        scale = self.param(f"{name}_scale", nn.initializers.ones, (self.channels,))
        bias = self.param(f"{name}_bias", nn.initializers.zeros, (self.channels,))
        if train:
            mean = jnp.mean(x, axis=(0, 1, 3))
            var = jnp.mean(x * x, axis=(0, 1, 3)) - mean * mean
            if not self.is_initializing():
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean.astype(jnp.float32)
                ra_var.value = 0.9 * ra_var.value + 0.1 * var.astype(jnp.float32)
        else:
            mean, var = ra_mean.value.astype(x.dtype), ra_var.value.astype(x.dtype)
        inv = jax.lax.rsqrt(var + 1e-5) * scale
        return (x - mean[:, None]) * inv[:, None] + bias[:, None]

    @nn.compact
    def __call__(self, x, train=False):
        c = self.channels
        inp = x
        w1 = self.param("pconv1_kernel", nn.initializers.lecun_normal(), (c, c))
        b1 = self.param("pconv1_bias", nn.initializers.zeros, (c,))
        x = jnp.einsum("oc,bkct->bkot", w1, x) + b1[:, None]
        x = self._bn(x, "bn1", train)
        a1 = self.param("prelu1", nn.initializers.constant(0.01), ())
        x = jnp.where(x >= 0, x, a1 * x)
        wd = self.param("dw_kernel", nn.initializers.lecun_normal(), (3, 3, c))
        bd = self.param("dw_bias", nn.initializers.zeros, (c,))
        d = self.dilation
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (2 * d, 0)))
        tlen, klen = x.shape[3], x.shape[1]
        acc = None
        for it in range(3):  # time taps (causal: offsets -2d, -d, 0)
            for jf in range(3):  # freq taps (symmetric)
                sl = xp[:, jf : jf + klen, :, it * d : it * d + tlen] * wd[it, jf][:, None]
                acc = sl if acc is None else acc + sl
        x = acc + bd[:, None]
        x = self._bn(x, "bn2", train)
        a2 = self.param("prelu2", nn.initializers.constant(0.01), ())
        x = jnp.where(x >= 0, x, a2 * x)
        w2 = self.param("pconv2_kernel", nn.initializers.lecun_normal(), (c, c))
        b2 = self.param("pconv2_bias", nn.initializers.zeros, (c,))
        x = jnp.einsum("oc,bkct->bkot", w2, x) + b2[:, None]
        return x + inp


class StackTMinor(nn.Module):
    channels: int
    layers: int = 4

    @nn.compact
    def __call__(self, x, train=False):
        for idx in range(self.layers):
            x = TFCMBlockTMinor(self.channels, 2**idx, name=f"b{idx}")(x, train=train)
        return x


def bench_stack_tminor(name, channels, dtype=jnp.float32, train=True):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K, channels, T)).astype(np.float32)).astype(dtype)
    model = StackTMinor(channels)
    variables = model.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), variables["params"])
    stats = variables.get("batch_stats", {})

    @jax.jit
    def loop(x, params, stats):
        def body(i, carry):
            acc, xx = carry
            if train:
                out, _ = model.apply({"params": params, "batch_stats": stats}, xx,
                                     True, mutable=["batch_stats"])
            else:
                out = model.apply({"params": params, "batch_stats": stats}, xx)
            return acc + out[0, 0, 0, 0].astype(jnp.float32), xx + 1e-6 * out
        acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), x))
        return acc

    dt = _time3(loop, x, params, stats)
    bytes_pass = B * T * K * channels * x.dtype.itemsize
    print(f"{name:46s} {dt / ITERS * 1e3:8.2f} ms/pass   ({bytes_pass / 2**20:6.1f} MiB act)",
          flush=True)


class Stack(nn.Module):
    channels: int
    layers: int = 4
    shift_mac: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        from cruse_tpu.models.mtfaa import TFCMBlock

        for idx in range(self.layers):
            if self.shift_mac:
                x = TFCMBlockShiftMac(self.channels, 2**idx, name=f"b{idx}")(x, train=train)
            else:
                x, _ = TFCMBlock(self.channels, 2**idx, name=f"b{idx}")(None if False else x, None, train=train)
        return x


def bench_stack(name, channels, shift_mac=False, dtype=jnp.float32, train=True):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, K, channels)).astype(np.float32)).astype(dtype)
    model = Stack(channels, shift_mac=shift_mac)
    variables = model.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), variables["params"])
    stats = jax.tree_util.tree_map(lambda a: a.astype(dtype), variables.get("batch_stats", {}))

    @jax.jit
    def loop(x, params, stats):
        def body(i, carry):
            acc, xx = carry
            if train:
                out, _ = model.apply({"params": params, "batch_stats": stats}, xx,
                                     True, mutable=["batch_stats"])
            else:
                out = model.apply({"params": params, "batch_stats": stats}, xx)
            return acc + out[0, 0, 0, 0].astype(jnp.float32), xx + 1e-6 * out
        acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), x))
        return acc

    dt = _time3(loop, x, params, stats)
    bytes_pass = B * T * K * channels * x.dtype.itemsize
    print(f"{name:46s} {dt / ITERS * 1e3:8.2f} ms/pass   ({bytes_pass / 2**20:6.1f} MiB act)",
          flush=True)


def bench_forward_batch(b):
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import MtfaaNet
    from cruse_tpu.models.mtfaa import MtfaaConfig
    from cruse_tpu.train.step import StepConfig, init_train_state, forward_for_model

    scfg = StftConfig(n_fft=512, hop_length=256)
    model = MtfaaNet(MtfaaConfig())
    rng = np.random.default_rng(0)
    noisy = jnp.asarray(rng.standard_normal((b, 160000)).astype(np.float32) * 0.05)
    spec = stft(noisy, scfg)
    feat = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    state = init_train_state(model, StepConfig(stft=scfg), jax.random.PRNGKey(0), feat)
    fwd = forward_for_model(model)

    @jax.jit
    def loop(feat, params, stats):
        def body(i, carry):
            acc, x = carry
            out, _ = fwd(params, stats, x, train=False)
            return acc + out[0, 0, 0, 0], x + 1e-6 * out
        acc, _ = lax.fori_loop(0, 4, body, (jnp.float32(0.0), feat))
        return acc

    dt = _time3(loop, feat, state.params, state.batch_stats)
    print(f"forward B={b:<3d}                                  "
          f"{b * 10 * 4 / dt:10.0f}x RT  ({dt / 4 * 1e3:7.1f} ms/fwd)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "batch"):
        for b in (16, 32, 64):
            bench_forward_batch(b)
    if which in ("all", "stack"):
        for c in (24, 48, 128):
            bench_stack(f"TFCM stack grouped-conv C={c} fp32", c)
        for c in (24, 48, 128):
            bench_stack(f"TFCM stack grouped-conv C={c} bf16", c, dtype=jnp.bfloat16)
        for c in (24, 48):
            bench_stack(f"TFCM stack shift-MAC   C={c} fp32", c, shift_mac=True)
        for c in (24, 48):
            bench_stack(f"TFCM stack shift-MAC   C={c} bf16", c, shift_mac=True, dtype=jnp.bfloat16)
    if which in ("all", "tminor"):
        for c in (24, 48):
            bench_stack_tminor(f"TFCM stack T-minor     C={c} fp32", c)
        for c in (24, 48):
            bench_stack_tminor(f"TFCM stack T-minor     C={c} bf16", c, dtype=jnp.bfloat16)
