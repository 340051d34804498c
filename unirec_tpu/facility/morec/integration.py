"""MoRec ↔ Trainer integration: jitted multi-objective train step and the
device-side validation sweeps that feed the data sampler's signals.

The reference computes per-objective gradients with k repeated
``backward(retain_graph=True)`` passes (trainer.py:484-496); here a single
jitted program evaluates the per-block loss vector and, when the controller
is gradient-based (MGDA/ParetoMTL/EPO), ``jax.jacrev`` over that vector —
the per-objective gradients never leave the device: only their k×k Gram
matrix is pulled to host for the tiny Frank-Wolfe/LP solve.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unirec_tpu.constants import NINF_SCORE


# ----------------------------------------------------------- train stepping
def _block_losses(per_row: jnp.ndarray, weight: jnp.ndarray, n_blocks: int):
    """Mean per-row loss of each equal-size block (trainer.py:331-336
    tensor_split semantics; blocks are equal by construction here)."""
    pr = per_row.reshape(n_blocks, -1)
    w = weight.reshape(n_blocks, -1)
    return (pr * w).sum(-1) / jnp.maximum(w.sum(-1), 1.0)


def _pi_update(state, acc_loss, cfg):
    """Device-side PI controller step (the exact arithmetic of
    controllers.PIController.control); state = {beta, integral, t}."""
    e = cfg["expect_loss"] - acc_loss
    P = cfg["K_p"] / (1.0 + jnp.exp(e))
    in_range = (state["beta"] >= cfg["beta_min"]) & \
        (state["beta"] <= cfg["beta_max"])
    I_new = jnp.where(in_range, state["integral"] - cfg["K_i"] * e,
                      state["integral"])
    beta_new = jnp.clip(P + I_new + cfg["beta_min"],
                        cfg["beta_min"], cfg["beta_max"])
    active = state["t"] < cfg["max_iter"]
    new_state = {
        "beta": jnp.where(active, beta_new, state["beta"]),
        "integral": jnp.where(active, I_new, state["integral"]),
        "t": state["t"] + active.astype(state["t"].dtype),
    }
    return jnp.minimum(new_state["beta"], cfg["beta_max"]), new_state


def _ensure_compiled(trainer, n_blocks: int):
    if getattr(trainer, "_morec_fns", None) is not None:
        return trainer._morec_fns
    model, tx = trainer.model, trainer.tx
    constants = trainer.constants

    def variables(p):
        v = {"params": p}
        if constants:
            v["constants"] = constants
        return v

    def loss_vec_fn(params, batch, rng):
        _, per_row = model.apply(variables(params), batch, train=True,
                                 rngs={"dropout": rng})
        return _block_losses(per_row, batch["weight"], n_blocks)

    @jax.jit
    def eval_loss_vec(params, batch, rng):
        return loss_vec_fn(params, batch, rng)

    @jax.jit
    def eval_gram(params, batch, rng):
        jac = jax.jacrev(loss_vec_fn)(params, batch, rng)
        flat = jnp.concatenate(
            [jnp.reshape(leaf, (n_blocks, -1))
             for leaf in jax.tree_util.tree_leaves(jac)], axis=1)
        return flat @ flat.T  # [k, k] Gram

    def _apply_update(params, opt_state, grads, loss):
        is_finite = jnp.isfinite(loss)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        params_out = jax.tree_util.tree_map(
            lambda new, old: jnp.where(is_finite, new, old), new_params, params)
        opt_out = jax.tree_util.tree_map(
            lambda new, old: jnp.where(is_finite, new, old)
            if new.shape == old.shape else new, new_opt, opt_state)
        return params_out, opt_out

    def weighted_step(params, opt_state, batch, rng, weights):
        def loss_fn(p):
            vec = loss_vec_fn(p, batch, rng)
            return jnp.sum(weights * vec), vec

        (loss, vec), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params_out, opt_out = _apply_update(params, opt_state, grads, loss)
        return params_out, opt_out, loss, vec

    def pi_step(params, opt_state, batch, rng, inner_w, pi_state, pi_cfg, lam):
        """PI(X with static inner) fused into ONE forward+backward: beta is
        computed on device from the current accuracy-block loss, treated as
        a constant for the gradient (the reference detaches it,
        trainer.py:506-508)."""

        def loss_fn(p):
            vec = loss_vec_fn(p, batch, rng)
            beta, new_state = _pi_update(pi_state,
                                         jax.lax.stop_gradient(vec[-1]),
                                         pi_cfg)
            loss = lam * jnp.sum(inner_w * vec[:-1]) + \
                jax.lax.stop_gradient(beta) * vec[-1]
            return loss, (vec, new_state)

        (loss, (vec, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        params_out, opt_out = _apply_update(params, opt_state, grads, loss)
        return params_out, opt_out, loss, vec, new_state

    step = jax.jit(weighted_step, donate_argnums=(0, 1))
    pstep = jax.jit(pi_step, donate_argnums=(0, 1))
    trainer._morec_fns = (eval_loss_vec, eval_gram, step, pstep)
    return trainer._morec_fns


def morec_train_step(trainer, batch, rng):
    """One multi-objective step (trainer._objective_control semantics,
    trainer.py:461-538). Returns (loss, params, opt_state)."""
    controller = trainer.objective_controller
    sampler = trainer._morec_sampler
    n_blocks = sampler.n_blocks
    n_rows = int(batch["weight"].shape[0])
    if n_rows % n_blocks:
        raise ValueError(
            f"MoRec batch has {n_rows} rows, not divisible into {n_blocks} "
            f"objective blocks — batch padding must not split blocks (use a "
            f"batch_size that is a multiple of the mesh data-axis size)")
    lam = float(trainer.config.get("morec_lambda", 0.2))
    eval_loss_vec, eval_gram, step, pi_step = _ensure_compiled(trainer, n_blocks)

    name = controller.__class__.__name__
    needs_grads = getattr(controller, "needs_grads", False)
    if (name == "PIXController" or name == "PIController") and not needs_grads:
        # common path (PID default wiring): PI beta + static inner weights
        # fuse into one forward+backward on device
        if getattr(trainer, "_morec_pi_state", None) is None:
            trainer._morec_pi_state = {
                "beta": jnp.asarray(0.0), "integral": jnp.asarray(0.0),
                "t": jnp.asarray(0, jnp.int32)}
            trainer._morec_pi_cfg = {
                "expect_loss": jnp.asarray(controller.expect_loss),
                "beta_min": jnp.asarray(controller.beta_min),
                "beta_max": jnp.asarray(controller.beta_max),
                "K_p": jnp.asarray(controller.K_p),
                "K_i": jnp.asarray(controller.K_i),
                "max_iter": jnp.asarray(controller._max_iter, jnp.int32)}
        if name == "PIXController":
            inner_w = np.asarray(
                controller.pareto_solve(None, np.zeros(n_blocks - 1)),
                np.float32)
        else:
            inner_w = np.full(n_blocks - 1, 1.0 / (n_blocks - 1), np.float32)
        params, opt_state, loss, _, trainer._morec_pi_state = pi_step(
            trainer.params, trainer.opt_state, batch, rng,
            jnp.asarray(inner_w), trainer._morec_pi_state,
            trainer._morec_pi_cfg, lam)
        trainer.params, trainer.opt_state = params, opt_state
        return loss, params, opt_state

    if name.endswith("Solver"):
        if needs_grads:
            gram = np.asarray(eval_gram(trainer.params, batch, rng))
            vec = np.asarray(eval_loss_vec(trainer.params, batch, rng))
            weights = np.asarray(controller.solve(gram, vec), np.float32)
        else:  # static weights need no device round-trip at all
            weights = np.asarray(
                controller.solve(None, np.zeros(n_blocks)), np.float32)
    elif name == "PIXController":  # gradient-based inner (MGDA)
        vec = np.asarray(eval_loss_vec(trainer.params, batch, rng))
        beta = controller.control(vec[-1])
        gram = np.asarray(eval_gram(trainer.params, batch, rng))[:-1, :-1]
        w = np.asarray(controller.pareto_solve(gram, vec[:-1]), np.float64)
        weights = np.concatenate([lam * w, [beta]]).astype(np.float32)
    else:
        raise ValueError(f"unsupported controller {name}")

    params, opt_state, loss, _ = step(trainer.params, trainer.opt_state, batch,
                                      rng, jnp.asarray(weights))
    trainer.params, trainer.opt_state = params, opt_state
    return loss, params, opt_state


# -------------------------------------------------------- validation sweeps
def gather_topk(trainer, valid_batcher, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k item ids over the full catalog for every validation row, history
    masked except the row's own positive (morec_data_sampler.py:307-327)."""
    model = trainer.model
    constants = trainer.constants
    history = trainer.user_history

    def variables(p):
        v = {"params": p}
        if constants:
            v["constants"] = constants
        return v

    tau = float(trainer.config.get("tau", 1.0))

    @jax.jit
    def topk_fn(params, batch, item_emb, hist_items, hist_len, pos):
        from unirec_tpu.ops.topk import full_catalog_scores
        # tau/bias handling matches model.topk (recommender.py:149-197)
        scores = full_catalog_scores(model, variables(params), batch,
                                     item_emb, tau)
        B = scores.shape[0]
        rows = jnp.arange(B)
        cap = hist_items.shape[1]
        valid_h = jnp.arange(cap)[None, :] < hist_len[:, None]
        hcols = jnp.where(valid_h & (hist_items != pos[:, None]), hist_items, 0)
        masked = scores.at[rows[:, None], hcols].set(NINF_SCORE)
        masked = masked.at[:, 0].set(NINF_SCORE)
        return jax.lax.top_k(masked, k)[1]

    @jax.jit
    def item_table(params):
        return model.apply(variables(params), method="all_item_emb")

    item_emb = item_table(trainer.params)
    all_topk, all_pos = [], []
    for batch in valid_batcher:
        keep = batch["weight"] > 0
        jb = {kk: jnp.asarray(v) for kk, v in batch.items()}
        pos = batch["item_id"][:, 0] if batch["item_id"].ndim == 2 \
            else batch["item_id"]
        hist_items, hist_len = history.gather(batch["user_id"])
        ids = topk_fn(trainer.params, jb, item_emb, jnp.asarray(hist_items),
                      jnp.asarray(hist_len), jnp.asarray(pos))
        all_topk.append(np.asarray(ids)[keep])
        all_pos.append(np.asarray(pos)[keep])
    return np.concatenate(all_topk), np.concatenate(all_pos)


def gather_per_row_loss(trainer, valid_batcher) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row training loss over the validation sweep + positive item ids
    (used for the fairness worst-group signal)."""
    model = trainer.model
    constants = trainer.constants

    def variables(p):
        v = {"params": p}
        if constants:
            v["constants"] = constants
        return v

    @jax.jit
    def loss_fn(params, batch, rng):
        _, per_row = model.apply(variables(params), batch, train=True,
                                 rngs={"dropout": rng})
        return per_row

    rng = jax.random.PRNGKey(int(trainer.config.get("seed", 2022)) + 77)
    losses, items = [], []
    for i, batch in enumerate(valid_batcher):
        keep = batch["weight"] > 0
        jb = {kk: jnp.asarray(v) for kk, v in batch.items()}
        pr = np.asarray(loss_fn(trainer.params, jb, jax.random.fold_in(rng, i)))
        pos = batch["item_id"][:, 0] if batch["item_id"].ndim == 2 \
            else batch["item_id"]
        losses.append(pr[keep])
        items.append(np.asarray(pos)[keep])
    return np.concatenate(losses), np.concatenate(items)
