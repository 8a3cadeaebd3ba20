"""Gradient-norm loss balancer (Encodec-style), functional JAX redesign.

The reference (loss_func/balancer.py:48-137) takes K per-loss gradients
w.r.t. the model *output* via `autograd.grad(retain_graph=True)`, EMA-averages
their norms, rescales each to `ratio_k * total_norm / avg_norm_k`, sums, and
backprops once.

JAX shape of the same computation (SURVEY.md §7.2): the train step runs the
model forward once to `output`, computes all K losses *from the output only*,
pulls one `jax.grad` per loss through the loss-side graph (cheap -- the model
is not re-traversed), combines with EMA-rescaled weights, then a single
`jax.vjp` through the model propagates the combined cotangent to the params.
Cross-worker norm averaging -- disabled in the reference (balancer.py:117,
distrib.py:132) -- is a `lax.pmean` over the data axis, on by default here.

State (EMA numerator/denominator per loss) is an explicit pytree carried in
the train state; `beta=1` degrades to plain averaging like the reference's
`averager`.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BalancerState:
    """EMA accumulators keyed by loss name (order-stable dicts)."""

    total: Dict[str, jax.Array]
    fix: Dict[str, jax.Array]

    def tree_flatten(self):
        keys = tuple(sorted(self.total))
        leaves = tuple(self.total[k] for k in keys) + tuple(self.fix[k] for k in keys)
        return leaves, keys

    @classmethod
    def tree_unflatten(cls, keys, leaves):
        n = len(keys)
        return cls(
            total=dict(zip(keys, leaves[:n])),
            fix=dict(zip(keys, leaves[n:])),
        )


@dataclasses.dataclass(frozen=True)
class Balancer:
    """Weights and hyperparameters; all methods are pure functions."""

    weights: Tuple[Tuple[str, float], ...]  # ordered (name, weight)
    rescale_grads: bool = True
    total_norm: float = 1.0
    ema_decay: float = 0.999
    per_batch_item: bool = True
    epsilon: float = 1e-12
    monitor: bool = False

    @staticmethod
    def make(weights: Dict[str, float], **kw) -> "Balancer":
        return Balancer(weights=tuple(sorted(weights.items())), **kw)

    def init_state(self) -> BalancerState:
        names = [k for k, _ in self.weights]
        # distinct arrays per slot (shared buffers break argument donation)
        return BalancerState(
            total={k: jnp.zeros(()) for k in names},
            fix={k: jnp.zeros(()) for k in names},
        )

    def output_cotangent(
        self,
        loss_fns: Dict[str, Callable[[jax.Array], jax.Array]],
        output: jax.Array,
        state: BalancerState,
        axis_name: str | None = None,
    ):
        """Compute the combined cotangent w.r.t. the model output.

        Returns (out_grad, losses, new_state, metrics). Feed `out_grad` into
        the model-side vjp. `axis_name` enables cross-worker norm averaging.
        """
        names = [k for k, _ in self.weights]
        w = dict(self.weights)
        grads, losses, norms = {}, {}, {}
        for name in names:
            loss_val, grad = jax.value_and_grad(loss_fns[name])(output)
            losses[name] = loss_val
            grads[name] = grad
            if self.per_batch_item:
                dims = tuple(range(1, grad.ndim))
                norms[name] = jnp.mean(
                    jnp.sqrt(jnp.sum(jnp.square(grad), axis=dims))
                )
            else:
                norms[name] = jnp.sqrt(jnp.sum(jnp.square(grad)))

        if axis_name is not None:
            # the cross-worker averaging the reference left disabled
            norms = {k: jax.lax.pmean(v, axis_name) for k, v in norms.items()}

        # EMA update (averager(), balancer.py:26-45)
        new_total = {
            k: state.total[k] * self.ema_decay + norms[k] for k in names
        }
        new_fix = {k: state.fix[k] * self.ema_decay + 1.0 for k in names}
        avg_norms = {k: new_total[k] / new_fix[k] for k in names}

        total_weight = sum(w[k] for k in names)
        ratios = {k: w[k] / total_weight for k in names}

        out_grad = jnp.zeros_like(output)
        for name in names:
            if self.rescale_grads:
                scale = ratios[name] * self.total_norm / (self.epsilon + avg_norms[name])
            else:
                scale = w[name]
            out_grad = out_grad + scale * grads[name]

        metrics = {f"loss_{k}": losses[k] for k in names}
        if self.monitor:
            total = sum(avg_norms.values())
            for k in names:
                metrics[f"ratio_{k}"] = avg_norms[k] / (total + self.epsilon)
        return out_grad, losses, BalancerState(new_total, new_fix), metrics

    def backward(
        self,
        model_fn: Callable[..., jax.Array],
        params,
        loss_fns: Dict[str, Callable[[jax.Array], jax.Array]],
        state: BalancerState,
        axis_name: str | None = None,
        *model_args,
    ):
        """One-forward + K output-pulls + one model vjp.

        model_fn(params, *model_args) -> output. Returns
        (param_grads, losses, new_state, metrics).
        """
        output, vjp_fn = jax.vjp(lambda p: model_fn(p, *model_args), params)
        out_grad, losses, new_state, metrics = self.output_cotangent(
            loss_fns, output, state, axis_name
        )
        (param_grads,) = vjp_fn(out_grad)
        return param_grads, losses, new_state, metrics
