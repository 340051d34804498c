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

    def weighted_step(params, opt_state, batch, rng, weights):
        def loss_fn(p):
            vec = loss_vec_fn(p, batch, rng)
            return jnp.sum(weights * vec), vec

        (loss, vec), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        is_finite = jnp.isfinite(loss)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        params_out = jax.tree_util.tree_map(
            lambda new, old: jnp.where(is_finite, new, old), new_params, params)
        opt_out = jax.tree_util.tree_map(
            lambda new, old: jnp.where(is_finite, new, old)
            if new.shape == old.shape else new, new_opt, opt_state)
        return params_out, opt_out, loss, vec

    step = jax.jit(weighted_step, donate_argnums=(0, 1))
    trainer._morec_fns = (eval_loss_vec, eval_gram, step)
    return trainer._morec_fns


def morec_train_step(trainer, batch, rng):
    """One multi-objective step (trainer._objective_control semantics,
    trainer.py:461-538). Returns (loss, params, opt_state)."""
    controller = trainer.objective_controller
    sampler = trainer._morec_sampler
    n_blocks = sampler.n_blocks
    lam = float(trainer.config.get("morec_lambda", 0.2))
    eval_loss_vec, eval_gram, step = _ensure_compiled(trainer, n_blocks)

    name = controller.__class__.__name__
    if name.endswith("Solver"):
        gram = None
        if controller.needs_grads:
            gram = np.asarray(eval_gram(trainer.params, batch, rng))
        vec = np.asarray(eval_loss_vec(trainer.params, batch, rng))
        weights = np.asarray(controller.solve(gram, vec), np.float32)
    elif name == "PIXController":
        vec = np.asarray(eval_loss_vec(trainer.params, batch, rng))
        beta = controller.control(vec[-1])
        if controller.needs_grads:
            gram = np.asarray(eval_gram(trainer.params, batch, rng))[:-1, :-1]
        else:
            gram = None
        w = np.asarray(controller.pareto_solve(gram, vec[:-1]), np.float64)
        weights = np.concatenate([lam * w, [beta]]).astype(np.float32)
    elif name == "PIController":
        vec = np.asarray(eval_loss_vec(trainer.params, batch, rng))
        beta = controller.control(vec[-1])
        weights = np.full(n_blocks, lam / (n_blocks - 1), np.float32)
        weights[-1] = beta
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

    @jax.jit
    def topk_fn(params, batch, item_emb, hist_items, hist_len, pos):
        user_emb = model.apply(variables(params), batch, method="user_emb")
        scores = user_emb @ item_emb.T
        ub, ib = model.apply(variables(params), method="bias_terms")
        if ib is not None:
            scores = scores + ib[None, :]
        if ub is not None:
            scores = scores + ub[batch["user_id"]][:, None]
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
