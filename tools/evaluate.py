#!/usr/bin/env python
"""Standalone evaluation CLI: score enhanced (or raw noisy) audio against
clean references with the full metric suite.

The reference computed objective metrics only inside the trainer's
validation loop (base_trainer.py:328-376); this tool scores arbitrary
paired directories/manifests offline -- model-free A/B of two enhancement
systems, regression checks on released checkpoints, corpus triage.

Two modes:
  # score existing enhanced wavs against clean references (no model)
  python tools/evaluate.py -E enhanced/ -R clean/ [--sr 16000]

  # enhance noisy wavs with a checkpoint first, then score
  python tools/evaluate.py -C cfg.toml -M ckpt/model_0010 -I noisy/ -R clean/

Files pair by stem. Emits per-metric noisy->enhanced means (same
formatting as the trainer's validation log), the composite best-model
score (STOI + (WB_PESQ+0.5)/5)/2 (base_trainer.py:370-376), and an
optional per-file CSV (--csv).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _collect(path: str):
    p = Path(path)
    if p.is_file():  # manifest
        from cruse_tpu.data.manifest import load_manifest

        files = load_manifest(str(p))
    else:
        files = sorted(str(q) for q in p.glob("*.wav"))
    return {Path(f).stem: f for f in files}


def main():
    parser = argparse.ArgumentParser(description="cruse_tpu offline metric evaluation")
    parser.add_argument("-R", "--reference", required=True, help="Clean wavs (dir or manifest).")
    parser.add_argument("-E", "--enhanced", default=None, help="Enhanced wavs to score (dir or manifest).")
    parser.add_argument("-I", "--input", default=None, help="Noisy wavs (scored as the baseline; with -C/-M also enhanced).")
    parser.add_argument("-C", "--configuration", default=None, help="Config (*.toml) -- required with -M.")
    parser.add_argument("-M", "--model_checkpoint_path", default=None, help="Checkpoint to enhance -I with.")
    parser.add_argument("--metrics", default="STOI,SI_SDR,WB_PESQ,PMOS", help="Comma list from the registry.")
    parser.add_argument("--sr", type=int, default=None, help="Sample rate (default: config acoustics.sr or 16000).")
    parser.add_argument("--csv", default=None, help="Write per-file metric rows to this CSV.")
    parser.add_argument("--ci", type=int, default=0, metavar="N",
                        help="Bootstrap resamples for a 95%% CI on each mean "
                             "(0 = off). A/B claims should quote the interval, "
                             "not just the mean.")
    parser.add_argument("--versus", default=None, metavar="DIR",
                        help="Second system's enhanced wavs (dir or manifest): "
                             "paired per-file deltas (-E minus this) with a "
                             "bootstrap CI and win rate per metric.")
    args = parser.parse_args()
    from cruse_tpu.utils.cache import maybe_enable_compile_cache

    maybe_enable_compile_cache()  # CRUSE_TPU_COMPILE_CACHE=1 opt-in

    import numpy as np

    from cruse_tpu.data.wavio import read_wav
    from cruse_tpu.metrics.registry import (
        REGISTERED_METRICS,
        available_metrics,
        composite_score,
    )
    from cruse_tpu.utils.logger import log

    sr = args.sr
    clean = _collect(args.reference)
    candidates = {}
    noisy = {}
    if args.input:
        noisy = _collect(args.input)

    if args.model_checkpoint_path:
        assert args.configuration and args.input, "-M needs -C and -I"
        import jax
        import jax.numpy as jnp

        from cruse_tpu.dsp.stft import StftConfig, stft
        from cruse_tpu.infer.batch import BatchInferencer, InferencerConfig
        from cruse_tpu.models import build_from_config, features_for_model
        from cruse_tpu.train.checkpoint import preload_variables
        from cruse_tpu.utils.config import load_config, initialize_module

        config = load_config(args.configuration)
        ac = config["acoustics"]
        sr = sr or int(ac.get("sr", 16000))
        scfg = StftConfig(n_fft=int(ac["n_fft"]), hop_length=int(ac["hop_length"]))
        model = build_from_config(
            initialize_module(config["model"]["path"], config["model"].get("args"))
        )
        ex_spec = stft(jnp.zeros((1, 8 * scfg.hop_length)), scfg)
        variables = model.init(jax.random.PRNGKey(0), features_for_model(model, ex_spec))
        variables = preload_variables(args.model_checkpoint_path, variables)
        inf = BatchInferencer(model, variables, InferencerConfig(sr=sr, stft=scfg))
        for stem, f in noisy.items():
            wav, _ = read_wav(f, sr=sr)
            candidates[stem] = np.asarray(inf.auto(jnp.asarray(wav[None])))[0]
        log(f"enhanced {len(candidates)} files with {args.model_checkpoint_path}")
    elif args.enhanced:
        candidates = dict(_collect(args.enhanced))  # paths; lazy-read below
    else:
        raise SystemExit("provide -E (pre-enhanced wavs) or -C/-M/-I (enhance first)")

    sr = sr or 16000
    stems = sorted(set(clean) & set(candidates))
    assert stems, f"no paired stems between {args.reference} and the candidates"
    versus = None
    if args.versus:
        versus = dict(_collect(args.versus))
        stems = sorted(set(stems) & set(versus))
        assert stems, f"no paired stems shared with {args.versus}"
    missing = sorted(set(candidates) - set(clean))
    if missing:
        log(f"warning: {len(missing)} candidate files lack a clean reference (skipped)")

    names = [m.strip() for m in args.metrics.split(",") if m.strip()]
    avail = available_metrics()
    names = [m for m in names if avail.get(m, False)]

    def load(x):
        if isinstance(x, str):
            w, _ = read_wav(x, sr=sr)
            return w
        return x

    # read each wav ONCE per stem and score all metrics on it (per-metric
    # loops would re-decode + resample the whole corpus per metric)
    per_metric = {m: {"vals": [], "nvals": [], "bvals": []} for m in names}
    for stem in stems:
        ref = load(clean[stem])
        est = load(candidates[stem])
        nz = load(noisy[stem]) if stem in noisy else None
        bst = load(versus[stem]) if versus is not None else None
        for m in names:
            fn = REGISTERED_METRICS[m]
            acc = per_metric[m]
            n = min(len(ref), len(est))
            acc["vals"].append(float(fn(ref[:n], est[:n], sr=sr)))
            if nz is not None:
                k = min(len(ref), len(nz))
                acc["nvals"].append(float(fn(ref[:k], nz[:k], sr=sr)))
            if bst is not None:
                k = min(len(ref), len(bst))
                acc["bvals"].append(float(fn(ref[:k], bst[:k], sr=sr)))

    rows = []
    means = {}
    noisy_means = {}
    for m in names:
        fn = REGISTERED_METRICS[m]
        vals, nvals = per_metric[m]["vals"], per_metric[m]["nvals"]
        means[m] = float(np.mean(vals))

        def ci95(v):
            # percentile bootstrap over files: the utterance sample, not the
            # metric noise, dominates the uncertainty of corpus means
            if args.ci <= 0 or len(v) < 2:
                return ""
            rng = np.random.default_rng(0)
            idx = rng.integers(0, len(v), size=(args.ci, len(v)))
            bm = np.sort(np.mean(np.asarray(v)[idx], axis=1))
            lo, hi = bm[int(0.025 * args.ci)], bm[min(int(0.975 * args.ci), args.ci - 1)]
            return f" [95% CI {lo:.4f}, {hi:.4f}]"

        if nvals:
            noisy_means[m] = float(np.mean(nvals))
            log(f"  {m}: noisy {noisy_means[m]:.4f} -> enhanced {means[m]:.4f}{ci95(vals)}")
        else:
            log(f"  {m}: enhanced {means[m]:.4f}{ci95(vals)}")
        if versus is not None:
            # paired deltas: same utterance, A (-E) minus B (--versus).
            # Pairing removes the utterance variance that dominates corpus
            # means, so far fewer files resolve a real difference.
            deltas = np.asarray(vals) - np.asarray(per_metric[m]["bvals"])
            wins = float(np.mean(deltas > 0)) * 100.0
            reps = args.ci if args.ci > 0 else 1000
            rng_b = np.random.default_rng(0)
            idx = rng_b.integers(0, len(deltas), size=(reps, len(deltas)))
            bm = np.sort(np.mean(deltas[idx], axis=1))
            lo, hi = bm[int(0.025 * reps)], bm[min(int(0.975 * reps), reps - 1)]
            verdict = ("A>B" if lo > 0 else "B>A" if hi < 0 else "not significant")
            log(f"  {m} paired A-B: mean {np.mean(deltas):+.4f} "
                f"[95% CI {lo:+.4f}, {hi:+.4f}], A wins {wins:.0f}% -> {verdict}")
        rows.append((m, vals))

    try:
        log(f"composite score (STOI + (WB_PESQ+0.5)/5)/2 = {composite_score(means):.4f}")
    except (KeyError, AssertionError):
        log("composite score unavailable (needs STOI and WB_PESQ in --metrics)")

    if args.csv:
        import csv

        with open(args.csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["file"] + [m for m, _ in rows])
            for i, stem in enumerate(stems):
                w.writerow([stem] + [f"{vals[i]:.6f}" for _, vals in rows])
        log(f"per-file metrics -> {args.csv}")


if __name__ == "__main__":
    main()
