"""Quality gate for bf16 in-kernel accumulation of the TFCM stencil.

Round-3 VERDICT: "bf16 in-kernel accumulation measured -18% [isolated
stencil time] and was rejected on principle without a quality measurement"
-- this script supplies the measurement, with the same structure as the
int8 export gates:

  grads  gradient fidelity at bench shapes: full windowed-MTFAA train-step
         gradients with tfcm_dw_impl="pallas" under CRUSE_DW_ACC=bfloat16,
         compared leaf-by-leaf against the fp32-accumulation XLA path
         (cosine similarity + SNR per leaf class, worst-leaf reported).
  step   in-step timing: the windowed train step, pallas-bf16accum vs the
         production XLA path, on the real chip.
  train  20-epoch tiny-corpus A/B: tools/train.py -C configs/tiny_mtfaa.toml
         twice (CRUSE_DW_ACC set/unset), compare final validation SI-SDR /
         WB_PESQ. Run on a corpus host: `python scripts/dw_acc_gate.py train`.

The accumulation dtype is a process-level env knob (CRUSE_DW_ACC, read at
cruse_tpu.ops.dw_kernel import), so each arm runs in a subprocess.

Usage: python scripts/dw_acc_gate.py [grads|step|train]
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np, jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("CRUSE_TPU_TEST_CACHE", "/root/.cache/cruse_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from cruse_tpu.models import MtfaaNet
from cruse_tpu.models.mtfaa import MtfaaConfig
from cruse_tpu.train.step import StepConfig, init_train_state, make_train_step, forward_for_model
from cruse_tpu.dsp.stft import stft, StftConfig

mode = %(mode)r
impl = %(impl)r
B, SECONDS, SR = 16, 10, 16000
mcfg = MtfaaConfig(attention_window=126, tfcm_dw_impl=impl)
scfg = StftConfig(n_fft=512, hop_length=256)
cfg = StepConfig(stft=scfg, compute_dtype="bfloat16")
model = MtfaaNet(mcfg)
rng = np.random.default_rng(0)
noisy = jnp.asarray(rng.standard_normal((B, SECONDS * SR)), jnp.float32) * 0.05
clean = jnp.asarray(rng.standard_normal((B, SECONDS * SR)), jnp.float32) * 0.05
spec = stft(noisy, scfg)
feat = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
step = make_train_step(model, cfg, forward=forward_for_model(model))

if mode == "grads":
    # one un-jitted-loop step, return the full gradient tree by finite
    # differencing of params? No: expose grads by a single optimizer-free
    # value_and_grad identical to profile_step_anatomy's loss.
    from cruse_tpu.train.step import cast_forward
    fwd = cast_forward(forward_for_model(model), jnp.bfloat16)
    cs = stft(clean, scfg)
    clean_spec = jnp.stack([jnp.real(cs), jnp.imag(cs)], axis=-1)

    def loss_fn(params):
        out, _ = fwd(params, state.batch_stats, feat, train=True)
        enh = jax.lax.complex(out[..., 0], out[..., 1])
        ref = jax.lax.complex(clean_spec[..., 0], clean_spec[..., 1])
        return jnp.mean(jnp.square(jnp.abs(enh - ref)))

    g = jax.jit(jax.grad(loss_fn))(state.params)
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    out = {"/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v).tolist()
           if np.asarray(v).size <= 4 else None for path, v in flat}
    np.savez(%(out)r, **{
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v, np.float64)
        for path, v in flat})
    print("GRADS_SAVED")
else:  # step timing
    jstep = jax.jit(step)
    ITERS = 4
    @jax.jit
    def loop(state, noisy, clean):
        def body(i, carry):
            st, acc = carry
            st, m = jstep(st, {"noisy": noisy + 1e-6 * acc, "clean": clean})
            return st, m["grad_norm"]
        _, acc = lax.fori_loop(0, ITERS, body, (state, jnp.float32(0.0)))
        return acc
    float(loop(state, noisy, clean))
    times = []
    for rep in range(3):
        fresh = noisy * (1.0 + 1e-4 * (rep + 1))
        float(fresh.ravel()[0])
        t0 = time.perf_counter()
        float(loop(state, fresh, clean))
        times.append(time.perf_counter() - t0)
    dt = min(times) / ITERS
    print(f"STEP impl={impl} acc={os.environ.get('CRUSE_DW_ACC','float32')} "
          f"{dt*1e3:.1f} ms/step {B*SECONDS/dt:.0f}x RT")
"""


def run_child(mode, impl, acc, out=None, timeout=580):
    env = dict(os.environ)
    if acc:
        env["CRUSE_DW_ACC"] = acc
    else:
        env.pop("CRUSE_DW_ACC", None)
    code = _CHILD % {"repo": REPO, "mode": mode, "impl": impl, "out": out or ""}
    r = subprocess.run([sys.executable, "-c", code], env=env, timeout=timeout,
                       capture_output=True, text=True)
    sys.stdout.write(r.stdout)
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        raise SystemExit(f"child failed ({mode}, {impl}, {acc})")
    return r.stdout


def gate_grads():
    import numpy as np

    ref_path, test_path = "/tmp/dw_gate_ref.npz", "/tmp/dw_gate_bf16.npz"
    run_child("grads", "xla", None, ref_path)
    run_child("grads", "pallas", "bfloat16", test_path)
    ref, test = np.load(ref_path), np.load(test_path)
    worst = (1.0, None)
    classes = {}
    for k in ref.files:
        a, b = ref[k].ravel(), test[k].ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        cos = float(a @ b / denom) if denom > 0 else 1.0
        err = np.linalg.norm(a - b)
        snr = 20 * np.log10(np.linalg.norm(a) / err) if err > 0 else np.inf
        cls = k.split("/")[-1]
        c = classes.setdefault(cls, [1.0, np.inf])
        c[0] = min(c[0], cos)
        c[1] = min(c[1], snr)
        if cos < worst[0]:
            worst = (cos, k, snr)
    print(f"{'leaf class':28s} {'min cos':>8s} {'min SNR dB':>10s}")
    for cls, (cos, snr) in sorted(classes.items()):
        print(f"{cls:28s} {cos:8.5f} {snr:10.1f}")
    print(f"worst leaf: {worst[1]} cos={worst[0]:.6f} snr={worst[2]:.1f} dB")
    ok = worst[0] > 0.999
    print("GRAD GATE " + ("PASSED (all cosines > 0.999)" if ok else "FAILED"))
    return ok


def gate_step():
    run_child("step", "xla", None)
    run_child("step", "fused_fold", None)  # round-5 production default
    run_child("step", "pallas", None)
    run_child("step", "pallas", "bfloat16")


def gate_train():
    base = open(os.path.join(REPO, "configs", "tiny_mtfaa.toml")).read()
    for acc in (None, "bfloat16"):
        tag = acc or "fp32"
        env = dict(os.environ)
        cfg_path = f"/tmp/dw_gate_{tag}.toml"
        cfg = base.replace('experiment_name = "mtfaa"',
                           f'experiment_name = "dwgate_{tag}"')
        if acc:
            env["CRUSE_DW_ACC"] = acc
            cfg = cfg.replace(
                "use_deep_filter = false",
                'use_deep_filter = false\ntfcm_dw_impl = "pallas"')
        cfg_path_f = open(cfg_path, "w")
        cfg_path_f.write(cfg)
        cfg_path_f.close()
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "train.py"),
             "-C", cfg_path], env=env, check=True)
        print(f"train arm {tag} done -- compare validation tables above")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "grads"
    {"grads": gate_grads, "step": gate_step, "train": gate_train}[which]()
