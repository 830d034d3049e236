"""Full-train-step attribution that SUMS (round-2 VERDICT weakness #4).

Round 2's PROFILE.md table mixed measurements from different protocols
(model 54.5 + estep/loss 4.8 + "optimizer ~+17" vs a measured 59.5 ms
macro step — pieces summed to ~76). This probe measures a strict
ladder of prefixes of the SAME computation under the SAME protocol
(lax.scan of K iterations inside one jit, rbg dropout RNG, bf16, batch
6, donated carry, scalar fetched once), so consecutive differences ARE
the stage costs:

    fwd            : model forward (train=True, rbg dropout)
    +estep_loss    : + on-device E-step + CE + wd L2
    +bwd           : + full parameter backward (grads summed into carry
                     so XLA cannot DCE any of them)
    +optimizer     : + MultiSteps(accum 5) SGD-momentum update — this is
                     the production train step (== bench.py's macro body)

Optionally (--scan-accum) also times a scan-carry gradient-accumulation
variant: grads accumulate in the scan carry and the SGD update applies
once per K microsteps via lax.cond — semantically MultiSteps at
K=accum, measuring whether optax's MultiSteps state shuffling costs
anything over the minimal formulation.

Prints one JSON line per rung. Usage:
    python tools/profile_step.py [--iters 10] [--batch 6]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--scan-accum", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")

    from em_adapt_tpu.config import (
        EStepConfig,
        ExperimentConfig,
        MeshConfig,
        ModelConfig,
        OptimConfig,
        TrainConfig,
    )
    from em_adapt_tpu.train import Trainer
    from em_adapt_tpu.train.trainer import loss_fn

    cfg = ExperimentConfig(
        model=ModelConfig(compute_dtype="bfloat16"),
        estep=EStepConfig(),
        optim=OptimConfig(),
        train=TrainConfig(batch_size=args.batch, rng_impl="rbg",
                          donate_state=False),
        mesh=MeshConfig(axes=(("data", 1), ("space", 1))),
    )
    trainer = Trainer(cfg, steps_per_epoch=100)
    state = trainer.init_state()
    model = trainer.model

    g = np.random.default_rng(0)
    batch = trainer.plan.shard_batch({
        "image": (g.normal(size=(args.batch, 321, 321, 3)) * 40).astype(np.float32),
        "label": g.integers(0, 21, size=(args.batch, 321, 321, 1)).astype(np.float32),
    })
    K = args.iters

    def timed(name, fn, *xs):
        jf = jax.jit(fn)
        float(jf(*xs))  # compile + warm
        t0 = time.perf_counter()
        float(jf(*xs))
        dt = (time.perf_counter() - t0) / K
        print(json.dumps({"stage": name, "ms_per_step": round(dt * 1e3, 2)}),
              flush=True)
        return dt

    def rngs(state):
        # the production per-step rng folding
        def at(i):
            r, _ = jax.random.split(jax.random.fold_in(state.rng, state.step + i))
            return r
        return at

    # --- rung 1: forward only -------------------------------------------
    def fwd_only(state, batch):
        at = rngs(state)

        def body(c, i):
            logits = model.apply(
                state.params, batch["image"] + c * 0, train=True, rng=at(i))
            return jnp.sum(logits).astype(jnp.float32) * 1e-20, None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return out

    t_fwd = timed("fwd", fwd_only, state, batch)

    # --- rung 2: + estep + loss -----------------------------------------
    def fwd_loss(state, batch):
        at = rngs(state)

        def body(c, i):
            b = dict(batch)
            b["image"] = b["image"] + c * 0
            total, _ = loss_fn(state.params, b, at(i), model, cfg, trainer.plan)
            return total.astype(jnp.float32) * 1e-20, None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return out

    t_loss = timed("fwd+estep_loss", fwd_loss, state, batch)

    # --- rung 3: + backward (all grad leaves summed) --------------------
    def fwd_bwd(state, batch):
        at = rngs(state)
        gfn = jax.grad(lambda p, b, r: loss_fn(p, b, r, model, cfg, trainer.plan)[0])

        def body(c, i):
            b = dict(batch)
            b["image"] = b["image"] + c * 0
            grads = gfn(state.params, b, at(i))
            s = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))
            return s * 1e-20, None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return out

    t_bwd = timed("fwd+bwd", fwd_bwd, state, batch)

    # --- rung 4: + optimizer == the production macro step ---------------
    def full(state, batch):
        # the real (unjitted) production step inside the same scan shape
        from em_adapt_tpu.train.trainer import _step_fn

        step = _step_fn(model, cfg, trainer.tx, trainer.plan)

        def body(s, _):
            s2, m = step(s, batch)
            return s2, m["loss"]

        s, losses = jax.lax.scan(body, state, None, length=K)
        return jnp.sum(losses)

    t_full = timed("fwd+bwd+optimizer (production)", full, state, batch)

    print(json.dumps({
        "stage": "attribution",
        "fwd_ms": round(t_fwd * 1e3, 2),
        "estep_loss_ms": round((t_loss - t_fwd) * 1e3, 2),
        "bwd_ms": round((t_bwd - t_loss) * 1e3, 2),
        "optimizer_ms": round((t_full - t_bwd) * 1e3, 2),
        "total_ms": round(t_full * 1e3, 2),
        "images_per_sec": round(args.batch / t_full, 1),
    }), flush=True)

    if not args.scan_accum:
        return

    # --- variant: grad accumulation in the scan carry -------------------
    accum = cfg.optim.accum_steps
    inner = optax.chain(
        optax.trace(decay=cfg.optim.momentum),
        optax.scale_by_learning_rate(
            lambda step: trainer.sched(step * accum)  # LR at emit points
        ),
    )

    def scan_accum(state, batch):
        zeros = jax.tree.map(jnp.zeros_like, state.params)
        opt_state = inner.init(state.params)
        gfn = jax.grad(lambda p, b, r: loss_fn(p, b, r, model, cfg, trainer.plan)[0])

        def body(carry, i):
            params, acc, opt_state = carry
            r, _ = jax.random.split(jax.random.fold_in(state.rng, state.step + i))
            grads = gfn(params, batch, r)
            acc = jax.tree.map(jnp.add, acc, grads)

            def emit(args):
                params, acc, opt_state = args
                mean = jax.tree.map(lambda a: a / accum, acc)
                upd, opt_state = inner.update(mean, opt_state, params)
                params = optax.apply_updates(params, upd)
                return params, jax.tree.map(jnp.zeros_like, acc), opt_state

            params, acc, opt_state = jax.lax.cond(
                (i + 1) % accum == 0, emit, lambda a: a,
                (params, acc, opt_state))
            return (params, acc, opt_state), None

        (params, _, _), _ = jax.lax.scan(
            body, (state.params, zeros, opt_state), jnp.arange(K))
        return sum(jnp.sum(p.astype(jnp.float32)) for p in jax.tree.leaves(params)) * 1e-20

    timed("scan-carry accumulation variant", scan_accum, state, batch)


if __name__ == "__main__":
    main()
