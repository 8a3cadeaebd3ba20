"""END-TO-END PARITY: enhanced waveforms vs a torch reference at 1e-4 max-abs.

BASELINE.md target: "enhanced waveforms within 1e-4 max-abs error of the
(repaired) PyTorch reference". The torch mirror implements the repaired
CRUSE architecture (SURVEY.md §2.9) with identical layer semantics; weights
are copied from the flax model, then the COMPLETE pipeline
(stft -> compress -> model -> mask -> istft) runs in both frameworks on the
same noisy waveform.
"""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from cruse_tpu.dsp.stft import StftConfig, stft, istft
from cruse_tpu.models import CruseNet, CruseConfig


class TorchCruse(torch.nn.Module):
    """Repaired-CRUSE mirror in torch, matching CruseNet layer-for-layer.

    Layout: [B, T, F] mag in; internal NCHW [B, C, T, F].
    """

    def __init__(self, cfg: CruseConfig):
        super().__init__()
        self.cfg = cfg
        chs = [1] + list(cfg.channels)
        self.enc = torch.nn.ModuleList(
            [torch.nn.Conv2d(chs[i], chs[i + 1], (2, 3), stride=(1, 2), padding=(0, 1))
             for i in range(len(cfg.channels))]
        )
        self.enc_bn = torch.nn.ModuleList(
            [torch.nn.BatchNorm2d(c, eps=1e-5) for c in cfg.channels]
        )
        self.skips = torch.nn.ModuleList(
            [torch.nn.Conv2d(c, c, (1, 3), padding=(0, 1), bias=False) for c in cfg.channels]
        )
        g = cfg.rnn_groups
        d = cfg.bottleneck_dim
        self.gru1 = torch.nn.ModuleList(
            [torch.nn.GRU(d // g, d // g, batch_first=True) for _ in range(g)]
        )
        self.gru2 = torch.nn.ModuleList(
            [torch.nn.GRU(d // g, d // g, batch_first=True) for _ in range(g)]
        )
        self.ln1 = torch.nn.LayerNorm(d)
        self.ln2 = torch.nn.LayerNorm(d)
        dec_out = list(cfg.channels[:-1][::-1]) + [1]
        dec_in = list(cfg.channels[::-1])
        self.dec = torch.nn.ModuleList(
            [torch.nn.ConvTranspose2d(dec_in[i], dec_out[i], (2, 3), stride=(1, 2), padding=(0, 1))
             for i in range(len(dec_out))]
        )
        self.dec_bn = torch.nn.ModuleList(
            [torch.nn.BatchNorm2d(c, eps=1e-5) for c in dec_out[:-1]]
        )

    def forward(self, mag, return_features=False):
        x = torch.pow(torch.clamp(mag, min=1e-12), self.cfg.compression_exponent)
        x = x[:, None]  # [B, 1, T, F]
        skips = []
        for conv, bn, skip in zip(self.enc, self.enc_bn, self.skips):
            x = torch.nn.functional.pad(x, (0, 0, 1, 0))  # causal T pad
            x = torch.relu(bn(conv(x)))
            skips.append(skip(x))
        b, c, t, f = x.shape
        # flatten (F, C) f-major to match the flax [B, T, F, C] reshape
        z = x.permute(0, 2, 3, 1).reshape(b, t, f * c)
        g = self.cfg.rnn_groups
        chunks = torch.chunk(z, g, dim=-1)
        out = torch.stack([self.gru1[i](chunks[i])[0] for i in range(g)], dim=-1)
        out = torch.flatten(out, -2, -1)
        out = self.ln1(out)
        chunks = torch.chunk(out, g, dim=-1)
        out = torch.cat([self.gru2[i](chunks[i])[0] for i in range(g)], dim=-1)
        out = self.ln2(out)
        feats = out  # bottleneck output (CruseNet's emit_features tap)
        x = out.reshape(b, t, f, c).permute(0, 3, 1, 2)
        for li, conv in enumerate(self.dec):
            x = x + skips[len(skips) - 1 - li]
            x = conv(x)[:, :, :-1, :]  # causal trim
            if li < len(self.dec) - 1:
                x = torch.relu(self.dec_bn[li](x))
        mask = torch.sigmoid(x[:, 0])  # [B, T, F]
        if return_features:
            return mask, feats
        return mask


def sync_weights(variables, tm: TorchCruse, cfg: CruseConfig):
    p = variables["params"]
    with torch.no_grad():
        chs = [1] + list(cfg.channels)
        for li in range(len(cfg.channels)):
            k = np.asarray(p[f"enc_{li}"]["conv"]["kernel"])  # [1, 3, cin*2, out]
            cin = chs[li]
            w = np.zeros((cfg.channels[li], cin, 2, 3), np.float32)
            for ti in range(2):
                # stacked tap channels: [tap0 (older) | tap1 (current)]
                w[:, :, ti, :] = np.transpose(k[0, :, ti * cin : (ti + 1) * cin, :], (2, 1, 0))
            tm.enc[li].weight.copy_(torch.from_numpy(w))
            tm.enc[li].bias.copy_(torch.from_numpy(np.asarray(p[f"enc_{li}"]["conv"]["bias"])))
            tm.enc_bn[li].weight.copy_(torch.from_numpy(np.asarray(p[f"enc_{li}"]["bn"]["scale"])))
            tm.enc_bn[li].bias.copy_(torch.from_numpy(np.asarray(p[f"enc_{li}"]["bn"]["bias"])))
            ks = np.asarray(p[f"skip_{li}"]["kernel"])  # [1, 3, c, c]
            tm.skips[li].weight.copy_(torch.from_numpy(np.transpose(ks, (3, 2, 0, 1))))
        for name, bank in (("bank1", tm.gru1), ("bank2", tm.gru2)):
            q = p["ggru"][name]
            for gi, tg in enumerate(bank):
                tg.weight_ih_l0.copy_(torch.from_numpy(np.asarray(q["w_ih"][gi])))
                tg.weight_hh_l0.copy_(torch.from_numpy(np.asarray(q["w_hh"][gi])))
                tg.bias_ih_l0.copy_(torch.from_numpy(np.asarray(q["b_ih"][gi])))
                tg.bias_hh_l0.copy_(torch.from_numpy(np.asarray(q["b_hh"][gi])))
        tm.ln1.weight.copy_(torch.from_numpy(np.asarray(p["ggru"]["ln1"]["scale"])))
        tm.ln1.bias.copy_(torch.from_numpy(np.asarray(p["ggru"]["ln1"]["bias"])))
        tm.ln2.weight.copy_(torch.from_numpy(np.asarray(p["ggru"]["ln2"]["scale"])))
        tm.ln2.bias.copy_(torch.from_numpy(np.asarray(p["ggru"]["ln2"]["bias"])))
        for li in range(len(tm.dec)):
            k = np.asarray(p[f"dec_{li}"]["conv"]["kernel"])[::-1, ::-1].copy()  # flip
            tm.dec[li].weight.copy_(torch.from_numpy(np.transpose(k, (2, 3, 0, 1))))
            tm.dec[li].bias.copy_(torch.from_numpy(np.asarray(p[f"dec_{li}"]["conv"]["bias"])))
            if li < len(tm.dec) - 1:
                tm.dec_bn[li].weight.copy_(torch.from_numpy(np.asarray(p[f"dec_{li}"]["bn"]["scale"])))
                tm.dec_bn[li].bias.copy_(torch.from_numpy(np.asarray(p[f"dec_{li}"]["bn"]["bias"])))


def test_model_parity(rng):
    """Mask outputs match at 1e-5 with synced weights."""
    cfg = CruseConfig(in_freq=161, channels=(4, 8, 8, 16), rnn_groups=4)
    model = CruseNet(cfg)
    mag = np.abs(rng.standard_normal((2, 30, 161))).astype(np.float32)
    feat = model.compress(jnp.asarray(mag))
    variables = jax.jit(model.init)(jax.random.PRNGKey(3), feat)
    tm = TorchCruse(cfg).eval()
    sync_weights(variables, tm, cfg)

    ours, _ = jax.jit(model.apply)(variables, feat)
    with torch.no_grad():
        ref = tm(torch.from_numpy(mag)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def _torch_stft(noisy: np.ndarray, n_fft: int, hop: int):
    win = torch.hann_window(n_fft)
    return torch.stft(torch.from_numpy(noisy), n_fft, hop, n_fft, window=win,
                      return_complex=True, center=True)  # [B, F, T]


def _torch_istft(spec, n_fft: int, hop: int, length: int) -> np.ndarray:
    win = torch.hann_window(n_fft)
    return torch.istft(spec, n_fft, hop, n_fft, window=win,
                       length=length).numpy()


def test_dfsmn_full_pipeline_waveform_parity(rng):
    """BASELINE config 4 (DFSMN) end-to-end: noisy wav -> STFT -> model ->
    iSTFT matches a torch mirror at 1e-4 max-abs on the enhanced waveform,
    and the frame-by-frame streaming model path reproduces the SAME
    waveform (round-4 VERDICT item 3)."""
    from cruse_tpu.models.dfsmn import DfsmnNet

    from tests.test_dfsmn import _TorchDfsmn

    n_fft, hop, length = 320, 160, 16000
    scfg = StftConfig(n_fft=n_fft, hop_length=hop)
    model = DfsmnNet(in_freq=161, hidden_dim=24, num_blocks=3,
                     left_frames=2, left_dilation=1, right_frames=0)
    noisy = (rng.standard_normal((1, length)) * 0.1).astype(np.float32)

    spec = stft(jnp.asarray(noisy), scfg)
    feat = model.compress(jnp.abs(spec))
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), feat)
    mask, _ = jax.jit(model.apply)(variables, feat)
    ours = np.asarray(istft(spec * mask, scfg, length=length))

    # torch mirror: Linear+relu -> 3 causal DFSMN blocks (skip chain from
    # block 1 on, exactly DfsmnNet's wiring) -> Linear+sigmoid mask head
    p = variables["params"]
    blocks = []
    with torch.no_grad():
        proj_in = torch.nn.Linear(161, 24)
        proj_in.weight.copy_(torch.from_numpy(np.asarray(p["proj_in"]["kernel"]).T))
        proj_in.bias.copy_(torch.from_numpy(np.asarray(p["proj_in"]["bias"])))
        for i in range(3):
            q = p[f"block_{i}"]
            tb = _TorchDfsmn(24, 24, 24, 2, 1, 0, 1)
            tb.in_conv.weight.copy_(torch.from_numpy(np.asarray(q["in_conv"]["kernel"]).T[:, :, None]))
            tb.in_conv.bias.copy_(torch.from_numpy(np.asarray(q["in_conv"]["bias"])))
            tb.left_conv[1].weight.copy_(
                torch.from_numpy(np.transpose(np.asarray(q["left_kernel"]), (2, 1, 0))))
            tb.out_conv.weight.copy_(torch.from_numpy(np.asarray(q["out_conv"]["kernel"]).T[:, :, None]))
            tb.out_conv.bias.copy_(torch.from_numpy(np.asarray(q["out_conv"]["bias"])))
            if i > 0:
                tb.weight.copy_(torch.from_numpy(np.asarray(q["skip_weight"])[None]))
            blocks.append(tb)
        mask_head = torch.nn.Linear(24, 161)
        mask_head.weight.copy_(torch.from_numpy(np.asarray(p["mask_head"]["kernel"]).T))
        mask_head.bias.copy_(torch.from_numpy(np.asarray(p["mask_head"]["bias"])))

        tspec = _torch_stft(noisy, n_fft, hop)
        tmag = tspec.abs().transpose(1, 2)  # [B, T, F]
        x = torch.relu(proj_in(torch.pow(torch.clamp(tmag, min=1e-12), 0.3)))
        x = x.transpose(1, 2)  # Conv1d layout [B, D, T]
        hidden = None
        for tb in blocks:
            x, hidden = tb(x, hidden)
        tmask = torch.sigmoid(mask_head(x.transpose(1, 2)))
        ref = _torch_istft(tspec * tmask.transpose(1, 2), n_fft, hop, length)

    err = np.abs(ours - ref).max()
    assert err < 1e-4, f"DFSMN waveform parity {err} >= 1e-4"

    # streaming: per-frame state-carried masks rebuild the same waveform
    step = jax.jit(model.apply)
    state = model.init_state(1)
    masks = []
    for t in range(feat.shape[1]):
        m, state = step(variables, feat[:, t : t + 1], state)
        masks.append(np.asarray(m))
    mask_s = jnp.asarray(np.concatenate(masks, axis=1))
    ours_s = np.asarray(istft(spec * mask_s, scfg, length=length))
    err_s = np.abs(ours_s - ref).max()
    assert err_s < 1e-4, f"DFSMN streaming-vs-torch parity {err_s} >= 1e-4"


def test_cruse_df_full_pipeline_waveform_parity(rng):
    """BASELINE config 3 (CRUSE + deep filter) end-to-end vs a torch
    mirror: mask everywhere + causal complex multi-frame filtering on the
    low bins, 1e-4 max-abs on the enhanced waveform; the streaming DF
    application (rolling masked-spectrum history) reproduces the same
    waveform (round-4 VERDICT item 3)."""
    from cruse_tpu.models.cruse_df import (
        CruseDfConfig, CruseDfNet, apply_cruse_df, apply_cruse_df_streaming,
        df_stream_init,
    )
    from cruse_tpu.models.deep_filter import tap_offsets

    n_fft, hop, length = 320, 160, 16000
    scfg = StftConfig(n_fft=n_fft, hop_length=hop)
    ccfg = CruseConfig(in_freq=161, channels=(4, 8), rnn_groups=2,
                       emit_features=True)
    cfg = CruseDfConfig(cruse=ccfg, df_bins=48, df_taps_t=2, df_taps_f=1)
    model = CruseDfNet(cfg)
    noisy = (rng.standard_normal((1, length)) * 0.1).astype(np.float32)

    spec = stft(jnp.asarray(noisy), scfg)
    feat = model.compress(jnp.abs(spec))
    variables = jax.jit(model.init)(jax.random.PRNGKey(2), feat)
    (mask, coefs), _ = jax.jit(model.apply)(variables, feat)
    ours = np.asarray(istft(apply_cruse_df(spec, mask, coefs, cfg), scfg,
                            length=length))

    # torch mirror: the proven TorchCruse trunk (emitting the bottleneck)
    # + a Linear DF head + an explicit per-tap complex MAC
    p = variables["params"]
    tm = TorchCruse(ccfg).eval()
    sync_weights({"params": p["cruse"]}, tm, ccfg)
    with torch.no_grad():
        k = cfg.num_taps
        df_head = torch.nn.Linear(tm.ln2.weight.shape[0], cfg.df_bins * k * 2)
        df_head.weight.copy_(torch.from_numpy(np.asarray(p["df_head"]["kernel"]).T))
        df_head.bias.copy_(torch.from_numpy(np.asarray(p["df_head"]["bias"])))

        tspec = _torch_stft(noisy, n_fft, hop)
        tmag = tspec.abs().transpose(1, 2)
        tmask, tfeats = tm(tmag, return_features=True)
        tcoefs = df_head(tfeats).reshape(1, -1, cfg.df_bins, k, 2) / k
        masked = tspec.transpose(1, 2) * tmask  # [B, T, F]
        low = masked[:, :, : cfg.df_bins]
        out = torch.zeros_like(low)
        cc = torch.complex(tcoefs[..., 0], tcoefs[..., 1])
        t_len = low.shape[1]
        for ki, (dt, df) in enumerate(tap_offsets(cfg.df_taps_t, cfg.df_taps_f,
                                                  causal=True)):
            src = low
            if dt > 0:  # past frames only (causal layout)
                src = torch.nn.functional.pad(src, (0, 0, dt, 0))[:, :t_len]
            if df > 0:
                src = torch.nn.functional.pad(src, (df, 0))[:, :, : low.shape[-1]]
            elif df < 0:
                src = torch.nn.functional.pad(src, (0, -df))[:, :, -df:]
            out = out + src * cc[..., ki]
        refined = torch.cat([out, masked[:, :, cfg.df_bins :]], dim=2)
        ref = _torch_istft(refined.transpose(1, 2), n_fft, hop, length)

    err = np.abs(ours - ref).max()
    assert err < 1e-4, f"CRUSE+DF waveform parity {err} >= 1e-4"

    # streaming: per-frame model + rolling-history DF application rebuild
    # the same waveform
    step = jax.jit(model.apply)
    mstate, dstate = None, df_stream_init(1, cfg)
    frames = []
    for t in range(feat.shape[1]):
        (m, c), mstate = step(variables, feat[:, t : t + 1], mstate)
        frame, dstate = apply_cruse_df_streaming(
            dstate, spec[:, t], m[:, 0], c[:, 0], cfg)
        frames.append(np.asarray(frame))
    spec_s = jnp.asarray(np.stack(frames, axis=1))
    ours_s = np.asarray(istft(spec_s, scfg, length=length))
    err_s = np.abs(ours_s - ref).max()
    assert err_s < 1e-4, f"CRUSE+DF streaming-vs-torch parity {err_s} >= 1e-4"


def test_full_pipeline_waveform_parity(rng):
    """BASELINE.md headline: enhanced waveforms within 1e-4 max-abs."""
    scfg = StftConfig(n_fft=320, hop_length=160)
    cfg = CruseConfig(in_freq=161)
    model = CruseNet(cfg)
    noisy = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)

    spec = stft(jnp.asarray(noisy), scfg)
    feat = model.compress(jnp.abs(spec))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), feat)
    mask, _ = jax.jit(model.apply)(variables, feat)
    ours = np.asarray(istft(spec * mask, scfg, length=16000))

    tm = TorchCruse(cfg).eval()
    sync_weights(variables, tm, cfg)
    with torch.no_grad():
        win = torch.hann_window(320)
        tspec = torch.stft(torch.from_numpy(noisy), 320, 160, 320, window=win,
                           return_complex=True, center=True)  # [B, F, T]
        tmag = tspec.abs().transpose(1, 2)  # [B, T, F]
        tmask = tm(tmag)
        enhanced = tspec * tmask.transpose(1, 2)
        ref = torch.istft(enhanced, 320, 160, 320, window=win, length=16000).numpy()

    err = np.abs(ours - ref).max()
    assert err < 1e-4, f"waveform parity {err} >= 1e-4"
