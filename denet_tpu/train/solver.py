"""Solvers with reference-exact update math (denet/model/model_cnn.py:282-331).

Three modes selected by string:

* ``sgd``      — m = rho*m + (1-rho)*g ; p -= lr*m          (rho gated to 0 at it=0)
* ``torch``/``nesterov`` — m = rho*m + g ; p -= lr*(g + mom*m)
* ``adam``     — standard Adam with bias correction using (iteration+1)

L2 decay is added to the *gradient* of weight-role parameters only (biases
too when ``bias_decay``); momentum gating at iteration 0 matches the
reference's ``tensor.switch(iteration > 0, momentum, 0)``.
"""
import jax
import jax.numpy as jnp


def init_slots(params, solver_mode):
    zeros = lambda p: jax.tree_util.tree_map(jnp.zeros_like, p)
    if solver_mode == "adam":
        return {"m": zeros(params), "v": zeros(params)}
    return {"m": zeros(params)}


def apply_updates(solver_mode, params, grads, slots, roles, lr, momentum,
                  decay, iteration, bias_decay=False, update_mask=None):
    """Pure solver update.  ``roles`` is a pytree of "weight"/"bias" strings
    matching params; ``update_mask`` an optional pytree of python bools (False
    freezes the parameter — used for --skip-layer-updates)."""
    momentum = jnp.asarray(momentum, dtype=jnp.float32)
    lr = jnp.float32(lr)
    decay = jnp.float32(decay)
    it = jnp.float32(iteration)

    rho_gated = jnp.where(it > 0, momentum[0], 0.0)

    def leaf_update(p, g, m, v, role, enabled):
        if not enabled:
            return p, m, v
        if role == "weight" or bias_decay:
            g = g + decay * p
        if solver_mode == "adam":
            eps = 1e-8
            m_new = momentum[0] * m + (1.0 - momentum[0]) * g
            v_new = momentum[1] * v + (1.0 - momentum[1]) * (g * g)
            m_hat = m_new / (1.0 - jnp.power(momentum[0], it + 1))
            v_hat = v_new / (1.0 - jnp.power(momentum[1], it + 1))
            p_new = p - lr * m_hat / (jnp.sqrt(v_hat) + eps)
            return p_new, m_new, v_new
        if solver_mode in ("torch", "nesterov"):
            m_new = rho_gated * m + g
            p_new = p - lr * (g + momentum[0] * m_new)
            return p_new, m_new, v
        # sgd
        m_new = rho_gated * m + (1.0 - rho_gated) * g
        p_new = p - lr * m_new
        return p_new, m_new, v

    leaves_p, treedef = jax.tree_util.tree_flatten(params)
    leaves_g = treedef.flatten_up_to(grads)
    leaves_m = treedef.flatten_up_to(slots["m"])
    leaves_v = treedef.flatten_up_to(slots["v"]) if "v" in slots else [None] * len(leaves_p)
    leaves_r = treedef.flatten_up_to(roles)
    leaves_e = (treedef.flatten_up_to(update_mask) if update_mask is not None
                else [True] * len(leaves_p))

    new_p, new_m, new_v = [], [], []
    for p, g, m, v, r, e in zip(leaves_p, leaves_g, leaves_m, leaves_v,
                                leaves_r, leaves_e):
        pn, mn, vn = leaf_update(p, g, m, v, r, e)
        new_p.append(pn)
        new_m.append(mn)
        new_v.append(vn)

    params_new = jax.tree_util.tree_unflatten(treedef, new_p)
    slots_new = {"m": jax.tree_util.tree_unflatten(treedef, new_m)}
    if "v" in slots:
        slots_new["v"] = jax.tree_util.tree_unflatten(treedef, new_v)
    return params_new, slots_new
