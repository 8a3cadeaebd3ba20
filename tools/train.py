#!/usr/bin/env python
"""Training CLI -- config-driven, the reference's tools/train_stand.py
equivalent (argparse flags -C/-R/-V/-P preserved; -N num-GPUs becomes the
device mesh shape since SPMD replaces mp.spawn-per-GPU).

Config layout (TOML, see configs/cruse_base.toml):
  [meta] seed, save_dir, experiment_name
  [acoustics] n_fft, hop_length, win_length, sr
  [model] path + args           (dotted path, reflection)
  [train_dataset] / [validation_dataset]  args for SynMixConfig
  [optimizer] lr, beta1, beta2, weight_decay (AdamW), freeze (path
               substrings pinned for fine-tuning), schedule
               (constant|cosine), warmup_steps, decay_steps, final_lr_scale
  [trainer.train] epochs, steps_per_epoch, save_checkpoint_interval, clip_grad_norm_value
  [trainer.validation] validation_interval, save_max_metric_score
  [loss] weights table
"""
from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="cruse_tpu trainer")
    parser.add_argument("-C", "--configuration", required=True, type=str, help="Configuration (*.toml).")
    parser.add_argument("-R", "--resume", action="store_true", help="Resume the experiment from latest checkpoint.")
    parser.add_argument("-V", "--only_validation", action="store_true", help="Only run validation (debug).")
    parser.add_argument("-N", "--num_devices", type=int, default=0, help="Devices for the mesh (0 = all).")
    parser.add_argument("-M", "--model_parallel", type=int, default=1,
                        help="Devices on the 'model' axis (grouped-weight TP); data axis = N / M.")
    parser.add_argument("-P", "--preloaded_model_path", type=str, default=None, help="Warm-start params path.")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from cruse_tpu.utils.cache import maybe_enable_compile_cache

    maybe_enable_compile_cache()  # CRUSE_TPU_COMPILE_CACHE=1 opt-in

    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.data.dataset import SynMixDataset, SynMixConfig
    from cruse_tpu.data.prefetch import PrefetchingLoader
    from cruse_tpu.train.step import StepConfig
    from cruse_tpu.train.trainer import Trainer, TrainerConfig
    from cruse_tpu.utils.config import load_config, initialize_module
    from cruse_tpu.utils.logger import init as log_init, log

    config = load_config(args.configuration)
    exp_name = config["meta"].get(
        "experiment_name", os.path.splitext(os.path.basename(args.configuration))[0]
    )
    config["meta"]["experiment_name"] = exp_name

    seed = int(config["meta"].get("seed", 0))
    random.seed(seed)
    np.random.seed(seed)

    save_dir = os.path.join(os.path.expanduser(config["meta"].get("save_dir", "runs")), exp_name)
    os.makedirs(save_dir, exist_ok=True)
    log_init(os.path.join(save_dir, "train.log"))

    # -N devices -> SPMD mesh (the reference spawns one process per GPU and
    # wraps in DDP, tools/train_stand.py:151-155; here one process jits the
    # step over a ("data","model") mesh and XLA inserts the gradient psum).
    from cruse_tpu.parallel.distributed import initialize_distributed
    from cruse_tpu.parallel.mesh import make_mesh

    initialize_distributed()
    devices = jax.devices()
    log(f"devices: {devices}")
    n = args.num_devices or len(devices)
    if n > len(devices):
        raise SystemExit(
            f"-N {n} requested but only {len(devices)} devices visible; "
            f"for a virtual CPU mesh set JAX_PLATFORMS=cpu "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n}"
        )
    mp = max(args.model_parallel, 1)
    if n % mp != 0:
        raise SystemExit(f"-N {n} not divisible by -M {mp}")
    num_slices = max(getattr(d, "slice_index", 0) for d in devices) + 1
    if n > 1 and num_slices > 1 and n == len(devices):
        # multi-slice pod: hosts over DCN outermost, ICI within a slice --
        # batch shards over (dcn, data), gradient psum stays on ICI with
        # only per-slice partials crossing DCN (parallel/distributed.py)
        from cruse_tpu.parallel.distributed import make_pod_mesh

        mesh = make_pod_mesh(ici_model=mp, devices=devices)
    else:
        mesh = (
            make_mesh(n_data=n // mp, n_model=mp, devices=devices[:n])
            if n > 1 else None
        )
    if mesh is not None:
        log(f"mesh: {dict(mesh.shape)}")

    ac = config["acoustics"]
    scfg = StftConfig(
        n_fft=int(ac["n_fft"]), hop_length=int(ac["hop_length"]), win_length=int(ac.get("win_length", ac["n_fft"]))
    )

    model_cfg = initialize_module(config["model"]["path"], config["model"].get("args"))
    from cruse_tpu.models import build_from_config

    model = build_from_config(model_cfg)

    opt = config.get("optimizer", {})
    tr = config.get("trainer", {}).get("train", {})
    va = config.get("trainer", {}).get("validation", {})
    loss_weights = tuple(config.get("loss", {}).get("weights", {"si_snr": 1.0, "spec": 1.0}).items())
    step_cfg = StepConfig(
        stft=scfg,
        learning_rate=float(opt.get("lr", 5e-4)),
        beta1=float(opt.get("beta1", 0.9)),
        beta2=float(opt.get("beta2", 0.999)),
        weight_decay=float(opt.get("weight_decay", 0.0)),
        # a bare string would iterate per character and pin everything
        freeze=((opt["freeze"],) if isinstance(opt.get("freeze"), str)
                else tuple(opt.get("freeze", ()))),
        clip_grad_norm=float(tr.get("clip_grad_norm_value", 10.0)),
        loss_weights=loss_weights,
        # beyond the reference (which runs fixed-LR Adam): optional linear
        # warmup + cosine decay, [optimizer] schedule/warmup_steps/decay_steps
        lr_schedule=opt.get("schedule"),
        warmup_steps=int(opt.get("warmup_steps", 0)),
        decay_steps=(int(opt["decay_steps"]) if "decay_steps" in opt
                     else int(tr.get("epochs", 100)) * int(tr.get("steps_per_epoch", 100))
                     if opt.get("schedule") == "cosine" else None),
        final_lr_scale=float(opt.get("final_lr_scale", 0.0)),
        ema_decay=(float(opt["ema_decay"]) if "ema_decay" in opt else None),
        grad_accum_steps=int(tr.get("grad_accum_steps", 1)),
        # kernel-count knob: ravel the param leaves into one flat vector for
        # clip+Adam (changes the opt_state checkpoint layout; resume needs
        # the same setting)
        flatten_optimizer=bool(opt.get("flatten_optimizer", False)),
        sr=int(ac.get("sr", 16000)),
        # the reference's AMP switch (meta.use_amp -> CUDA GradScaler,
        # base_trainer.py:41-42) maps to bf16 mixed precision here: bf16
        # fwd/bwd, fp32 masters, no loss scaling needed on TPU
        compute_dtype="bfloat16" if bool(config["meta"].get("use_amp", False)) else None,
    )

    train_ds = SynMixDataset(SynMixConfig(**config["train_dataset"]["args"]))
    valid_ds = SynMixDataset(SynMixConfig(**{**config["validation_dataset"]["args"], "valid_mode": True}))

    tcfg = TrainerConfig(
        epochs=int(tr.get("epochs", 100)),
        steps_per_epoch=int(tr.get("steps_per_epoch", 100)),
        save_checkpoint_interval=int(tr.get("save_checkpoint_interval", 1)),
        validation_interval=int(va.get("validation_interval", 1)),
        save_max_metric_score=bool(va.get("save_max_metric_score", True)),
        patience=int(va.get("patience", 0)),
        sr=int(ac.get("sr", 16000)),
        save_dir=config["meta"].get("save_dir", "runs"),
        experiment_name=exp_name,
        only_validation=args.only_validation,
        # [trainer.adversarial] switches the epoch loop to the full
        # MetricGAN+ alternation (replay + D pretraining + D checkpoints)
        adversarial=config.get("trainer", {}).get("adversarial"),
        # [trainer.profiling] captures a jax.profiler trace over a window of
        # train steps (epoch/start_step/num_steps/trace_dir), viewable in
        # TensorBoard's profile plugin
        profiling=config.get("trainer", {}).get("profiling"),
    )

    example = next(iter(train_ds.batches(num_batches=1)))
    from cruse_tpu.models import features_for_model

    noisy_ex = example["noisy"]
    if noisy_ex.ndim == 3:  # multi-channel [B, M, L]
        from cruse_tpu.dsp.stft import mc_stft

        spec = mc_stft(noisy_ex, scfg)
    else:
        spec = stft(noisy_ex, scfg)
    feat = features_for_model(model, spec)

    # [trainer.distillation]: config = teacher TOML, checkpoint = trained
    # teacher weights. The teacher runs frozen inside the train step and the
    # 'distill' entry in [loss.weights] pulls the student toward its output.
    teacher = None
    dist_cfg = config.get("trainer", {}).get("distillation")
    if dist_cfg:
        from cruse_tpu.train.checkpoint import preload_variables

        t_config = load_config(dist_cfg["config"])
        t_model_cfg = initialize_module(
            t_config["model"]["path"], t_config["model"].get("args"))
        t_model = build_from_config(t_model_cfg)
        t_feat = features_for_model(t_model, spec)
        t_vars = t_model.init(jax.random.PRNGKey(0), t_feat)
        t_vars = preload_variables(dist_cfg["checkpoint"], t_vars)
        teacher = (t_model, t_vars)
        log(f"distillation teacher: {t_config['model']['path']} "
            f"from {dist_cfg['checkpoint']}")

    # [train_dataset.curriculum]: per-epoch SNR annealing — snr_start (e.g.
    # [15, 25], easy) interpolates linearly to snr_end (default: the
    # configured snr_range) over `epochs` (default: the whole run).
    cur = config.get("train_dataset", {}).get("curriculum")
    if cur:
        s0 = tuple(float(v) for v in cur["snr_start"])
        s1 = tuple(float(v) for v in cur.get(
            "snr_end", config["train_dataset"]["args"].get("snr_range", (-5, 20))))
        horizon = max(int(cur.get("epochs", tcfg.epochs)), 1)

        def make_train_batches(epoch: int = 1):
            t = min(max(epoch - 1, 0) / max(horizon - 1, 1), 1.0)
            lo = round(s0[0] + t * (s1[0] - s0[0]))
            hi = round(s0[1] + t * (s1[1] - s0[1]))
            train_ds.set_snr_range((lo, hi))
            log(f"curriculum: epoch {epoch} SNR range [{lo}, {hi}] dB")
            return train_ds.batches(num_batches=tcfg.steps_per_epoch)
    else:
        def make_train_batches():
            return train_ds.batches(num_batches=tcfg.steps_per_epoch)

    trainer = Trainer(
        model,
        step_cfg,
        tcfg,
        train_batches=PrefetchingLoader(make_train_batches, size=2),
        validation_batches=list(valid_ds.batches(num_batches=2)),
        resume=args.resume,
        preload_path=args.preloaded_model_path,
        example_feat=feat,
        rng=jax.random.PRNGKey(seed),
        mesh=mesh,
        teacher=teacher,
    )
    trainer.train()


if __name__ == "__main__":
    main()
