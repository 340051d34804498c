"""Row-sharded embedding-table stress run (scaled-down stand-in for the
100M-item multi-host config in BASELINE.json).

Demonstrates the full sharded training path at whatever scale the local
devices allow: the item/user tables are row-sharded over the mesh 'model'
axis, batches shard over 'data', negative sampling + history windows run
on-device, and GSPMD inserts the ID->shard all-to-all. Per-device table
memory is table_bytes / n_model — on a v4/v5 pod slice with 64 GB/chip and
model=16, a 100M x 64 fp32 table costs ~1.6 GB/chip.

Run on any host (CPU works):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/stress_sharded_table.py --n_items 1000000 --steps 5
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_items", type=int, default=1_000_000)
    ap.add_argument("--n_users", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--mesh_model", type=int, default=0,
                    help="0 = half the devices")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from unirec_tpu import config as config_mod
    from unirec_tpu.core.mesh import create_mesh
    from unirec_tpu.core.optim import build_optimizer
    from unirec_tpu.data.device_pipeline import DeviceAugmenter
    from unirec_tpu.data.history import UserHistory
    from unirec_tpu.utils.registry import get_model_class

    n_dev = len(jax.devices())
    n_model = args.mesh_model or max(n_dev // 2, 1)
    mesh = create_mesh(data=n_dev // n_model, model=n_model)
    print(f"mesh: data={mesh.n_data} model={mesh.n_model} "
          f"({jax.default_backend()})")

    n_items = args.n_items - (args.n_items % n_model)  # divisible rows
    cfg = config_mod.parse_arguments({
        "model": "MF", "n_users": args.n_users, "n_items": n_items,
        "embedding_size": args.dim, "loss_type": "bpr", "has_user_emb": True,
        "n_sample_neg_train": 9, "learning_rate": 1e-3, "group_size": -1,
        "dataloader": "BaseDataset",
    }, argv=[])
    model = get_model_class("MF")(cfg=cfg)
    tx = build_optimizer(cfg)

    rng = np.random.default_rng(0)
    cap = 32
    lens = rng.integers(1, cap, size=args.n_users).astype(np.int32)
    hist = np.zeros((args.n_users, cap), np.int32)
    m = np.arange(cap)[None, :] < lens[:, None]
    hist[m] = rng.integers(1, n_items, size=int(m.sum()))
    aug = DeviceAugmenter(cfg, UserHistory(hist, lens))

    raw = {"user_id": rng.integers(1, args.n_users, size=args.batch).astype(np.int32),
           "item_id": rng.integers(1, n_items, size=args.batch).astype(np.int32),
           "weight": np.ones(args.batch, np.float32)}
    full0 = aug.augment(aug.with_state({k: jnp.asarray(v) for k, v in raw.items()}),
                        jax.random.PRNGKey(0))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, full0,
                           train=False)
    params = mesh.shard_params(variables["params"], min_rows=n_model)
    table = params["item_embedding"]["embedding"]
    print(f"item table: {table.shape} = "
          f"{table.size * 4 / 1e9:.2f} GB total, sharding {table.sharding.spec}")
    opt = jax.jit(tx.init)(params)

    def step(params, opt, batch, rng):
        rng, k = jax.random.split(rng)
        full = aug.augment(batch, k)

        def loss_fn(p):
            loss, _ = model.apply({"params": p}, full, train=True,
                                  rngs={"dropout": rng})
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return jax.tree_util.tree_map(lambda a, b: a + b, params, updates), opt, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    batch = aug.with_state(mesh.shard_batch(raw))
    key = jax.random.PRNGKey(3)
    with mesh.mesh:
        params, opt, loss = jstep(params, opt, batch, jax.random.fold_in(key, 0))
        loss.block_until_ready()
        t0 = time.perf_counter()
        for i in range(args.steps):
            params, opt, loss = jstep(params, opt, batch,
                                      jax.random.fold_in(key, 1 + i))
        loss.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"{args.steps} steps: {dt / args.steps * 1e3:.1f} ms/step, "
          f"loss={float(loss):.4f}")


if __name__ == "__main__":
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    sys.exit(main())
