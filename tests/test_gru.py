"""Grouped-GRU parity vs torch.nn.GRU goldens + streaming equivalence."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from cruse_tpu.nn.gru import GRU, GroupedGRULayer, GroupedGRU, GGRUBottleneck, channel_shuffle


def _sync_gru_params(variables, tg: torch.nn.GRU, group: int = 0):
    """Copy torch GRU weights into our param dict for one group slot."""
    p = {k: v.detach().numpy() for k, v in tg.named_parameters()}
    params = variables["params"]
    tgt = params[next(iter(params))] if "w_ih" not in params else params
    tgt["w_ih"] = tgt["w_ih"].at[group].set(jnp.asarray(p["weight_ih_l0"]))
    tgt["w_hh"] = tgt["w_hh"].at[group].set(jnp.asarray(p["weight_hh_l0"]))
    tgt["b_ih"] = tgt["b_ih"].at[group].set(jnp.asarray(p["bias_ih_l0"]))
    tgt["b_hh"] = tgt["b_hh"].at[group].set(jnp.asarray(p["bias_hh_l0"]))
    return variables


def test_single_gru_matches_torch(rng):
    b, t, i, h = 3, 20, 8, 16
    x = rng.standard_normal((b, t, i)).astype(np.float32)
    tg = torch.nn.GRU(i, h, 1, batch_first=True)
    with torch.no_grad():
        ref, ref_h = tg(torch.from_numpy(x))

    model = GRU(hidden_size=h)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    params = variables["params"]["layer"]
    p = {k: v.detach().numpy() for k, v in tg.named_parameters()}
    params["w_ih"] = jnp.asarray(p["weight_ih_l0"])[None]
    params["w_hh"] = jnp.asarray(p["weight_hh_l0"])[None]
    params["b_ih"] = jnp.asarray(p["bias_ih_l0"])[None]
    params["b_hh"] = jnp.asarray(p["bias_hh_l0"])[None]

    y, h_last = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), ref_h.numpy()[0], atol=1e-5)


def test_grouped_gru_layer_matches_torch_groups(rng):
    """Each group must equal an independent torch GRU on its feature slice."""
    b, t, i_total, h_total, g = 2, 12, 8, 12, 2
    x = rng.standard_normal((b, t, i_total)).astype(np.float32)
    torch_grus = [torch.nn.GRU(i_total // g, h_total // g, batch_first=True) for _ in range(g)]

    model = GroupedGRULayer(hidden_size=h_total, groups=g)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = variables["params"]
    for gi, tg in enumerate(torch_grus):
        p = {k: v.detach().numpy() for k, v in tg.named_parameters()}
        params["w_ih"] = params["w_ih"].at[gi].set(jnp.asarray(p["weight_ih_l0"]))
        params["w_hh"] = params["w_hh"].at[gi].set(jnp.asarray(p["weight_hh_l0"]))
        params["b_ih"] = params["b_ih"].at[gi].set(jnp.asarray(p["bias_ih_l0"]))
        params["b_hh"] = params["b_hh"].at[gi].set(jnp.asarray(p["bias_hh_l0"]))

    y, h = model.apply(variables, jnp.asarray(x))
    refs = []
    for gi, tg in enumerate(torch_grus):
        with torch.no_grad():
            o, _ = tg(torch.from_numpy(x[..., gi * (i_total // g) : (gi + 1) * (i_total // g)]))
        refs.append(o.numpy())
    ref = np.concatenate(refs, axis=-1)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)


def test_streaming_equals_batch(rng):
    """Feeding frames one at a time with carried state == full-sequence run."""
    b, t, d, g = 2, 16, 12, 3
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    model = GroupedGRULayer(hidden_size=d, groups=g)
    variables = model.init(jax.random.PRNGKey(0), x)
    y_full, h_full = model.apply(variables, x)

    h = None
    outs = []
    for ti in range(t):
        y, h = model.apply(variables, x[:, ti : ti + 1], h)
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_full), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_full), atol=1e-6)


def test_multi_layer_grouped_gru_shapes(rng):
    b, t, d = 2, 10, 16
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    model = GroupedGRU(hidden_size=d, num_layers=3, groups=4, shuffle=True)
    variables = model.init(jax.random.PRNGKey(0), x)
    y, state = model.apply(variables, x)
    assert y.shape == (b, t, d)
    assert state.shape == (b, 3, 4, 4)


def test_channel_shuffle_is_interleave():
    x = jnp.arange(12).reshape(1, 1, 12)  # concat layout [g0:0-5, g1:6-11], G=2
    out = np.asarray(channel_shuffle(x, 2))[0, 0]
    np.testing.assert_array_equal(out, [0, 6, 1, 7, 2, 8, 3, 9, 4, 10, 5, 11])


def test_ggru_bottleneck_matches_torch_reference(rng):
    """Full repaired-GGRU parity: grouped banks + interleave + LayerNorm."""
    b, t, d, g = 2, 8, 8, 2
    x = rng.standard_normal((b, t, d)).astype(np.float32)

    torch_b1 = [torch.nn.GRU(d // g, d // g, batch_first=True) for _ in range(g)]
    torch_b2 = [torch.nn.GRU(d // g, d // g, batch_first=True) for _ in range(g)]
    ln1, ln2 = torch.nn.LayerNorm(d), torch.nn.LayerNorm(d)
    with torch.no_grad():
        xt = torch.from_numpy(x)
        chunks = torch.chunk(xt, g, dim=-1)
        out = torch.stack([torch_b1[i](chunks[i])[0] for i in range(g)], dim=-1)
        out = torch.flatten(out, -2, -1)
        out = ln1(out)
        chunks = torch.chunk(out, g, dim=-1)
        out = torch.cat([torch_b2[i](chunks[i])[0] for i in range(g)], dim=-1)
        ref = ln2(out).numpy()

    model = GGRUBottleneck(groups=g)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = variables["params"]
    for name, bank in (("bank1", torch_b1), ("bank2", torch_b2)):
        for gi, tg in enumerate(bank):
            p = {k: v.detach().numpy() for k, v in tg.named_parameters()}
            params[name]["w_ih"] = params[name]["w_ih"].at[gi].set(jnp.asarray(p["weight_ih_l0"]))
            params[name]["w_hh"] = params[name]["w_hh"].at[gi].set(jnp.asarray(p["weight_hh_l0"]))
            params[name]["b_ih"] = params[name]["b_ih"].at[gi].set(jnp.asarray(p["bias_ih_l0"]))
            params[name]["b_hh"] = params[name]["b_hh"].at[gi].set(jnp.asarray(p["bias_hh_l0"]))

    y, _ = model.apply(variables, jnp.asarray(x))
    # torch stack(dim=-1)+flatten on [B,T,H,G] gives index h*G+g == our
    # channel_shuffle of the concat layout
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)
