"""Balancer invariants -- the reference's own self-test, reproduced exactly
(loss_func/balancer.py:140-158), plus EMA/state behavior."""
import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.losses.balancer import Balancer


def _loss_fns():
    one = jnp.ones(1)
    return {
        "1": lambda x: jnp.mean(jnp.abs(x - one)),
        "2": lambda x: 100.0 * jnp.mean(jnp.abs(x + one)),
    }


def test_plain_weights_grad_is_99():
    """rescale_grads=False: d/dx [|x-1| + 100|x+1|] at 0 = -1 + 100 = 99."""
    balancer = Balancer.make({"1": 1.0, "2": 1.0}, rescale_grads=False)
    x = jnp.zeros(1)
    out_grad, losses, state, _ = balancer.output_cotangent(
        _loss_fns(), x, balancer.init_state()
    )
    np.testing.assert_allclose(np.asarray(out_grad), [99.0], atol=1e-6)


def test_rescaled_grads_cancel():
    """rescale_grads=True with equal weights: the two unit-normed opposing
    grads cancel to 0 (reference assert)."""
    balancer = Balancer.make({"1": 1.0, "2": 1.0}, rescale_grads=True)
    x = jnp.zeros(1)
    out_grad, _, _, _ = balancer.output_cotangent(_loss_fns(), x, balancer.init_state())
    np.testing.assert_allclose(np.asarray(out_grad), [0.0], atol=1e-6)


def test_backward_through_model():
    """backward(): grads flow to params through one vjp."""
    balancer = Balancer.make({"a": 1.0, "b": 3.0}, rescale_grads=True, total_norm=2.0)
    params = {"w": jnp.asarray([2.0]), "b": jnp.asarray([0.5])}
    x = jnp.linspace(-1, 1, 16)[None, :]

    def model_fn(p, x):
        return p["w"] * x + p["b"]

    loss_fns = {
        "a": lambda out: jnp.mean(jnp.square(out)),
        "b": lambda out: jnp.mean(jnp.abs(out - 1.0)),
    }
    grads, losses, state, metrics = balancer.backward(
        model_fn, params, loss_fns, balancer.init_state(), None, x
    )
    assert set(grads) == {"w", "b"}
    assert np.isfinite(np.asarray(grads["w"])).all()
    assert float(state.fix["a"]) == 1.0  # one EMA update happened
    assert "loss_a" in metrics and "loss_b" in metrics


def test_ema_state_accumulates():
    balancer = Balancer.make({"1": 1.0, "2": 1.0}, ema_decay=0.5)
    state = balancer.init_state()
    x = jnp.zeros(1)
    for i in range(3):
        _, _, state, _ = balancer.output_cotangent(_loss_fns(), x, state)
    # fix = 0.5^2 + 0.5 + 1 = 1.75
    np.testing.assert_allclose(float(state.fix["1"]), 1.75, atol=1e-6)


def test_monitor_ratios_sum_to_one():
    balancer = Balancer.make({"1": 1.0, "2": 1.0}, monitor=True)
    x = jnp.zeros(1)
    _, _, _, metrics = balancer.output_cotangent(_loss_fns(), x, balancer.init_state())
    total = float(metrics["ratio_1"]) + float(metrics["ratio_2"])
    np.testing.assert_allclose(total, 1.0, atol=1e-5)


def test_state_is_pytree():
    balancer = Balancer.make({"x": 1.0})
    state = balancer.init_state()
    leaves = jax.tree_util.tree_leaves(state)
    assert len(leaves) == 2
    rebuilt = jax.tree_util.tree_map(lambda x: x + 1, state)
    assert float(rebuilt.fix["x"]) == 1.0
