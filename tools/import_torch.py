"""Import a PyTorch CRUSE checkpoint into a cruse_tpu (orbax) checkpoint.

Bridges reference users' existing torch artifacts (`latest_model.tar`
full-state or `model_NNNN.pth` weights-only, base_trainer.py:199-232) into
this framework: the output directory is directly consumable by
`tools/infer.py -M`, `tools/export.py -M`, and `tools/train.py -P`
(warm-start preload).

    python tools/import_torch.py -C configs/my_cruse.toml \
        -M /path/latest_model.tar -O /path/imported_ckpt

The torch layout accepted is the repaired unet_2 architecture documented
in cruse_tpu/utils/torch_import.py (the as-written reference model is
broken, SURVEY.md §2.9; the repaired mirror is what the end-to-end parity
suite pins at 1e-4 waveform max-abs).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser(description="torch -> cruse_tpu checkpoint importer")
    parser.add_argument("-C", "--configuration", required=True,
                        help="Config (*.toml) defining the model (must be a CRUSE family config).")
    parser.add_argument("-M", "--torch_checkpoint", required=True,
                        help="Torch checkpoint: .tar full-state or .pth state_dict.")
    parser.add_argument("-O", "--output_dir", required=True,
                        help="Output orbax checkpoint dir (written as <out>/imported).")
    args = parser.parse_args()
    from cruse_tpu.utils.cache import maybe_enable_compile_cache

    maybe_enable_compile_cache()  # CRUSE_TPU_COMPILE_CACHE=1 opt-in

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import CruseNet, build_from_config, features_for_model
    from cruse_tpu.utils.config import load_config, initialize_module
    from cruse_tpu.utils.logger import log
    from cruse_tpu.utils.torch_import import (
        cruse_variables_from_torch,
        load_torch_state_dict,
    )

    config = load_config(args.configuration)
    ac = config["acoustics"]
    model_cfg = initialize_module(config["model"]["path"], config["model"].get("args"))
    model = build_from_config(model_cfg)
    assert isinstance(model, CruseNet), (
        "the torch importer covers the CRUSE family (the reference's only "
        f"complete trained-model family); got {type(model).__name__}"
    )

    ex_spec = stft(jnp.zeros((1, 8 * int(ac["hop_length"]))),
                   StftConfig(n_fft=int(ac["n_fft"]), hop_length=int(ac["hop_length"])))
    template = model.init(jax.random.PRNGKey(0), features_for_model(model, ex_spec))

    state = load_torch_state_dict(args.torch_checkpoint)
    variables = cruse_variables_from_torch(state, model.config, template)

    out = Path(args.output_dir).expanduser().absolute()
    out.mkdir(parents=True, exist_ok=True)
    ocp.PyTreeCheckpointer().save(out / "imported", variables, force=True)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    log(f"imported {n_params / 1e6:.3f}M params -> {out / 'imported'}")
    log(f"use: tools/infer.py -C {args.configuration} -M {out / 'imported'} ...")


if __name__ == "__main__":
    main()
