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


def test_drain_flushes_partial_input(setup, rng):
    """drain() returns enhanced samples for exactly the pending input (final
    hop zero-padded), leaves other sessions' queues untouched, and matches
    the single-stream result on the zero-padded signal."""
    model, variables, cfg = setup
    hop = cfg.hop_length
    server = StreamingServer(model, variables, cfg, max_streams=4)
    wav = rng.standard_normal(2 * hop + 37).astype(np.float32) * 0.1

    a = server.open()
    b = server.open()
    server.feed(a, wav)
    server.feed(b, np.ones(3 * hop, np.float32) * 0.05)
    got = server.drain(a)
    assert got.shape == (len(wav),)
    # b's queue is untouched by a's drain
    assert len(server._buffers[b]) == 3 * hop
    assert server.drain(a).shape == (0,)  # nothing pending now

    # reference: hop-by-hop single stream on the zero-padded signal
    enh = StreamingEnhancer(model, variables, cfg)
    state = enh.init_state(1)
    padded = np.concatenate([wav, np.zeros((-len(wav)) % hop, np.float32)])
    ref = []
    for t in range(len(padded) // hop):
        out, state = enh.step(state, jnp.asarray(padded[None, t * hop : (t + 1) * hop]))
        ref.append(np.asarray(out)[0])
    np.testing.assert_allclose(got, np.concatenate(ref)[: len(wav)], atol=1e-6)


@pytest.mark.slow
def test_multi_model_priority_dispatch(setup, rng):
    """MultiModelServer: per-session model selection, strict priority when
    dispatches are rationed, round-robin fairness on ties, and outputs
    bit-identical to each pool's own single-stream run."""
    from cruse_tpu.infer.server import MultiModelServer
    from cruse_tpu.models import CruseNet, CruseConfig

    model_a, variables_a, cfg = setup
    model_b = CruseNet(CruseConfig(in_freq=161, channels=(2, 4, 4, 8), rnn_groups=2))
    variables_b = model_b.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 161)))
    hop = cfg.hop_length

    srv = MultiModelServer()
    srv.add_model("big", model_a, variables_a, cfg, max_streams=2)
    srv.add_model("small", model_b, variables_b, cfg, max_streams=2)
    assert srv.models == ["big", "small"]

    wav = rng.standard_normal(2 * hop).astype(np.float32) * 0.1
    low = srv.open("big", priority=0)
    high = srv.open("small", priority=5)
    srv.feed(low, wav)
    srv.feed(high, wav[:hop])

    # rationed to one dispatch: the high-priority session's pool goes first
    out1 = srv.step(max_dispatches=1)
    assert set(out1) == {high}
    out2 = srv.step(max_dispatches=1)  # high has no more input -> low's turn
    assert set(out2) == {low}

    # equal priorities round-robin via least-recently-served
    srv.close(low); srv.close(high)
    s1 = srv.open("big", priority=1)
    s2 = srv.open("small", priority=1)
    srv.feed(s1, wav)
    srv.feed(s2, wav)
    first = srv.step(max_dispatches=1)
    second = srv.step(max_dispatches=1)
    assert {next(iter(first))[0], next(iter(second))[0]} == {"big", "small"}

    # unrationed step serves everything ready, and outputs match the pool's
    # own single-stream result
    srv.close(s1); srv.close(s2)
    sa = srv.open("big")
    sb = srv.open("small")
    srv.feed(sa, wav)
    srv.feed(sb, wav)
    outs = {sa: [], sb: []}
    while srv.ready(sa) or srv.ready(sb):
        for h, hop_out in srv.step().items():
            outs[h].append(hop_out)
    ref_a = StreamingServer(model_a, variables_a, cfg, max_streams=1).run_session(wav)
    ref_b = StreamingServer(model_b, variables_b, cfg, max_streams=1).run_session(wav)
    np.testing.assert_allclose(np.concatenate(outs[sa]), ref_a, atol=1e-6)
    np.testing.assert_allclose(np.concatenate(outs[sb]), ref_b, atol=1e-6)


def test_server_streams_windowed_mtfaa(rng):
    """The server multiplexes the windowed MTFAA (complex-spectrum model)
    through the same step; a server session matches the single-stream
    enhancer output."""
    from cruse_tpu.models.mtfaa import MtfaaConfig, MtfaaNet

    cfg = StftConfig(n_fft=256, hop_length=128, center=False)
    model = MtfaaNet(MtfaaConfig(n_fft=256, n_bands=32, channels=(4, 6, 8),
                                 tfcm_layers=2, attention_window=8))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 129, 2)),
                           train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    server = StreamingServer(model, variables, cfg, max_streams=2)
    wav = rng.standard_normal(2560).astype(np.float32) * 0.1

    sid = server.open()
    server.feed(sid, wav)
    outs = []
    while server.ready(sid):
        outs.extend(server.step().values())
    got = np.concatenate(outs)
    server.close(sid)

    enh = StreamingEnhancer(model, variables, cfg)
    state = enh.init_state(1)
    ref = []
    for t in range(len(wav) // cfg.hop_length):
        out, state = enh.step(
            state, jnp.asarray(wav[None, t * 128 : (t + 1) * 128]))
        ref.append(np.asarray(out)[0])
    np.testing.assert_allclose(got, np.concatenate(ref), atol=1e-5)


def test_mesh_sharded_server_matches_single_device(setup, rng):
    """Stream slots sharded over the mesh's data axis (`tools/serve.py -N`)
    serve the same audio as the single-device server: sharding the slot
    dimension must not change any sample or break slot open/close reuse."""
    from cruse_tpu.parallel.mesh import make_mesh

    model, variables, cfg = setup
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    sharded = StreamingServer(model, variables, cfg, max_streams=8, mesh=mesh)
    plain = StreamingServer(model, variables, cfg, max_streams=8)

    wavs = [rng.standard_normal(n).astype(np.float32) * 0.1
            for n in (3200, 4800, 1600)]
    for wav in wavs:
        a = np.asarray(sharded.run_session(wav))
        b = np.asarray(plain.run_session(wav))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-5)

    # slot count must divide over the data axis
    with pytest.raises(AssertionError):
        StreamingServer(model, variables, cfg, max_streams=6, mesh=mesh)


def test_server_streams_multi_mic(rng):
    """Multi-mic sessions multiplex through the same server: [M, k] feeds,
    reference-mic output matching the standalone streaming run."""
    from cruse_tpu.models.mc_cruse import McCruseConfig, McCruseNet

    cfg = StftConfig(n_fft=320, hop_length=160, center=False)
    mcfg = McCruseConfig(
        mic_pairs=((0, 1), (0, 2)),
        cruse=CruseConfig(in_freq=161, channels=(4, 8), rnn_groups=4),
    )
    model = McCruseNet(mcfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, mcfg.feature_dim)))
    server = StreamingServer(model, variables, cfg, max_streams=2)
    wav = rng.standard_normal((3, 4800)).astype(np.float32) * 0.1

    got = server.run_session(wav)
    solo = StreamingEnhancer(model, variables, cfg)
    # server feeds unprimed per-hop; reproduce with the raw step loop
    state = solo.init_state(1)
    outs = []
    for i in range(wav.shape[-1] // 160):
        o, state = solo.step(state, jnp.asarray(wav[None, :, i * 160 : (i + 1) * 160]))
        outs.append(np.asarray(o)[0])
    np.testing.assert_allclose(got, np.concatenate(outs), atol=1e-5)

    # wrong channel count fails loudly
    sid = server.open()
    with pytest.raises(AssertionError):
        server.feed(sid, rng.standard_normal(160).astype(np.float32))


def test_server_streams_fullsubnet(rng):
    """FullSubNet state leaves fold the F sub-band units into the slot axis
    ([slots*F, hidden]); the server's idle-state mask and slot reset must
    expand by that factor, and a reused slot must start clean."""
    from cruse_tpu.models.fullsubnet import FullSubNet, FullSubNetConfig

    cfg = StftConfig(n_fft=64, hop_length=32, center=False)
    model = FullSubNet(FullSubNetConfig(
        num_freqs=33, num_neighbors=1, fb_hidden=8, fb_layers=1,
        sb_hidden=6, sb_layers=1, norm="cumulative_laplace_norm"))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 33)))
    server = StreamingServer(model, variables, cfg, max_streams=2)
    wav = rng.standard_normal(32 * 8).astype(np.float32) * 0.1

    got = server.run_session(wav)
    assert got.shape == (32 * 8,) and np.isfinite(got).all()

    # slot reuse: a second identical session must produce identical output
    # (stale sub-band GRU / cumulative-norm carries would change it)
    again = server.run_session(wav)
    np.testing.assert_allclose(again, got, atol=1e-6)

    # and a session that ran alongside other traffic matches a solo run
    a, b = server.open(), server.open()
    server.feed(a, wav)
    server.feed(b, wav[::-1].copy())
    outs = []
    while server.ready(a):
        res = server.step()
        outs.append(res[a])
    server.close(a), server.close(b)
    np.testing.assert_allclose(np.concatenate(outs), got, atol=1e-5)


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return float(line.split()[1]) / 1024.0
    return float("nan")


@pytest.mark.slow
def test_serving_soak_stable_memory_and_churn(rng):
    """Sustained serving soak (round-4 VERDICT item 7): >= 30 minutes of
    SIMULATED aggregate audio through one server with continuously churning
    sessions (open -> serve a few seconds -> close -> slot reused by a new
    session). Asserts the properties a long-lived deployment needs:

      - steady-state host memory (RSS growth over the second half of the
        soak bounded -- catches leaked buffers/arrays/sessions)
      - every enhanced hop finite, every fed hop eventually served
      - slot accounting stays exact across hundreds of open/close cycles

    Wall-clock latency is NOT asserted here (a contended 1-core CPU host
    would flake); the on-chip soak numbers live in scripts/soak_serve.py
    and STATUS.md. Ref: RTF as the headline serving metric,
    /root/reference/train_base/inferencer/base_inferencer.py:188-190."""
    cfg = StftConfig(n_fft=320, hop_length=160, center=False)
    model = CruseNet(CruseConfig(in_freq=161, channels=(2, 4), rnn_groups=2))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 161)))
    n_streams = 8
    server = StreamingServer(model, variables, cfg, max_streams=n_streams)

    sr, hop = 16000, cfg.hop_length
    target_audio_s = 1800.0  # >= 30 min aggregate across concurrent streams
    session_hops = rng.integers(150, 450, size=4096)  # 1.5-4.5 s lifetimes
    chunk = rng.standard_normal(hop * 16).astype(np.float32) * 0.1

    sessions = {}  # sid -> [hops_remaining, hops_served]
    served_hops = 0
    fed_hops = 0
    opened = 0
    closed = 0
    audio_s = 0.0
    rss_trace = []
    next_len = iter(session_hops)
    while audio_s < target_audio_s:
        # keep all slots occupied (continuous churn)
        while len(sessions) < n_streams:
            sid = server.open()
            assert sid not in sessions
            sessions[sid] = [int(next(next_len)), 0]
            opened += 1
        # feed each session up to 16 hops of audio, bounded by its lifetime
        for sid, acc in sessions.items():
            feed = min(16, acc[0] - acc[1] - (server._buffers[sid].shape[-1] // hop))
            if feed > 0:
                server.feed(sid, chunk[: feed * hop])
                fed_hops += feed
        # run the multiplexed step until nobody has a full hop buffered
        while server.ready_sessions():
            for sid, out in server.step().items():
                assert np.isfinite(out).all()
                sessions[sid][1] += 1
                served_hops += 1
                audio_s += hop / sr
        # retire finished sessions (slots go back to the pool)
        for sid in [s for s, acc in sessions.items() if acc[1] >= acc[0]]:
            server.close(sid)
            del sessions[sid]
            closed += 1
        if opened % 16 == 0:
            rss_trace.append(_rss_mb())

    assert served_hops == fed_hops, (served_hops, fed_hops)
    assert closed > 200, f"churn too weak to mean anything: {closed} sessions"
    assert audio_s >= target_audio_s
    # steady-state memory: second half of the soak must not drift upward
    # by more than a noise allowance (jit caches/warmup live in the first)
    half = len(rss_trace) // 2
    late = rss_trace[half:]
    growth = max(late) - min(late)
    assert growth < 64.0, f"RSS drifted {growth:.1f} MB over the soak tail"
