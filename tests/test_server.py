"""Streaming server: concurrent sessions multiplexed into one device step
must be bit-identical to independent single-stream runs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cruse_tpu.dsp.stft import StftConfig
from cruse_tpu.infer.server import StreamingServer
from cruse_tpu.infer.streaming import StreamingEnhancer
from cruse_tpu.models import CruseNet, CruseConfig


@pytest.fixture
def setup(rng):
    cfg = StftConfig(n_fft=320, hop_length=160, center=False)
    model = CruseNet(CruseConfig(in_freq=161, channels=(4, 8, 8, 16), rnn_groups=4))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 161)))
    return model, variables, cfg


def test_interleaved_sessions_match_single_stream(setup, rng):
    model, variables, cfg = setup
    server = StreamingServer(model, variables, cfg, max_streams=4)
    wav_a = rng.standard_normal(3200).astype(np.float32) * 0.1
    wav_b = rng.standard_normal(4800).astype(np.float32) * 0.1

    # interleave: open both, feed in different-sized chunks, step together
    a = server.open()
    b = server.open()
    server.feed(a, wav_a[:1000])
    server.feed(b, wav_b[:2500])
    outs = {a: [], b: []}
    server.feed(a, wav_a[1000:])
    server.feed(b, wav_b[2500:])
    while server.ready(a) or server.ready(b):
        for sid, hop in server.step().items():
            outs[sid].append(hop)
    got_a = np.concatenate(outs[a])
    got_b = np.concatenate(outs[b])
    server.close(a)
    server.close(b)

    # reference: independent single-stream runs (unprimed, hop-by-hop)
    def single(wav):
        enh = StreamingEnhancer(model, variables, cfg)
        state = enh.init_state(1)
        res = []
        n = len(wav) // cfg.hop_length
        for t in range(n):
            out, state = enh.step(
                state, jnp.asarray(wav[None, t * 160 : (t + 1) * 160])
            )
            res.append(np.asarray(out)[0])
        return np.concatenate(res)

    np.testing.assert_allclose(got_a, single(wav_a), atol=1e-6)
    np.testing.assert_allclose(got_b, single(wav_b), atol=1e-6)


def test_slot_reuse_is_clean(setup, rng):
    model, variables, cfg = setup
    server = StreamingServer(model, variables, cfg, max_streams=2)
    wav = rng.standard_normal(1600).astype(np.float32) * 0.1

    first = server.run_session(wav)
    # dirty the slot with a different signal, close, reopen
    sid = server.open()
    server.feed(sid, rng.standard_normal(1600).astype(np.float32))
    while server.ready(sid):
        server.step()
    server.close(sid)
    second = server.run_session(wav)  # fresh slot must reproduce exactly
    np.testing.assert_allclose(first, second, atol=0)


def test_capacity_and_errors(setup, rng):
    model, variables, cfg = setup
    server = StreamingServer(model, variables, cfg, max_streams=2)
    s1, s2 = server.open(), server.open()
    with pytest.raises(RuntimeError):
        server.open()
    server.close(s1)
    s3 = server.open()  # freed slot is reusable
    assert s3 == s1
    server.close(s2)
    with pytest.raises(AssertionError):
        server.feed(s2, np.zeros(160))  # closed session rejects input
    assert server.step() == {}  # nothing buffered -> no work
