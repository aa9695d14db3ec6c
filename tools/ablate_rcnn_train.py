"""Decompose the FasterRCNN train step cost by ablation.

Builds a ladder of partial train steps (each fwd+bwd+adamw, jitted, timed
on the real chip) so per-stage cost = difference between adjacent rungs:

  A backbone+neck fwd/bwd          (conv tail only)
  B + RPN head fwd/bwd
  C + RPN loss (assignment+sampling+gathers)
  D + proposal generation (top-k + per-level NMS, stop-grad forward)
  E + box-target assignment (IoU + sampling)
  F + RoIAlign + box head + loss   (= the full step)

Usage: python tools/ablate_rcnn_train.py [batch] [img] [stages]
Run from repo root (axon plugin).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run from anywhere)
import sys, time
import numpy as np, jax, jax.numpy as jnp
from heltondetection_tpu.models import faster_rcnn as FR
from heltondetection_tpu.models.faster_rcnn import (FasterRCNN, RCNNConfig,
                                                    init_faster_rcnn)
from heltondetection_tpu.train.schedule import make_optimizer
from heltondetection_tpu.train.trainer import TrainState

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
S = int(sys.argv[2]) if len(sys.argv) > 2 else 832
ONLY = sys.argv[3] if len(sys.argv) > 3 else "ABCDEF"
M = 64
cfg = RCNNConfig(num_classes=80, img_size=S)
model = FasterRCNN(cfg, dtype=jnp.bfloat16)
v = init_faster_rcnn(model, jax.random.PRNGKey(0), S)
tx = make_optimizer(1e-3, total_steps=1000, warmup_steps=10)
state = TrainState(v["params"], v["batch_stats"], tx.init(v["params"]),
                   jnp.zeros((), jnp.int32), v["params"])
rng = np.random.default_rng(0)
x1 = rng.uniform(0, S - 80, (B, M, 2)); wh = rng.uniform(16, 80, (B, M, 2))
batch = {
    "image": jnp.asarray(rng.integers(0, 255, (B, S, S, 3)).astype(np.uint8)),  # production contract: u8 batches, /255 fused in-step
    "gt_boxes_xyxy": jnp.asarray(
        np.concatenate([x1, x1 + wh], -1).astype(np.float32)),
    "gt_cls": jnp.asarray(rng.integers(0, 80, (B, M)).astype(np.int32)),
    "gt_mask": jnp.asarray(rng.uniform(0, 1, (B, M)) < 0.5),
}
key = jax.random.PRNGKey(1)


def partial_loss(stage):
    anchors, counts = FR.pyramid_anchors(cfg.img_size)

    def loss_fn(params, batch_stats, batch, rng):
        images = batch["image"]
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0  # fused normalize
        variables = {"params": params, "batch_stats": batch_stats}
        if stage == "A":
            pyr, new_vars = model.apply(
                variables, images, True, mutable=["batch_stats"],
                method=FasterRCNN.features)
            total = sum(jnp.mean(p.astype(jnp.float32) ** 2) for p in pyr)
            return total, ({"total": total}, new_vars["batch_stats"])
        (pyr, obj, deltas), new_vars = model.apply(
            variables, images, True, mutable=["batch_stats"],
            method=FasterRCNN.__call__)
        if stage == "B":
            total = jnp.mean(obj ** 2) + jnp.mean(deltas ** 2)
            return total, ({"total": total}, new_vars["batch_stats"])
        b = images.shape[0]
        rngs = jax.random.split(rng, 2 * b)
        # production path (faster_rcnn_loss): sparse patch-recompute RPN
        # loss + stop-gradient dense maps (r5)
        level_hw = tuple((p.shape[1], p.shape[2]) for p in pyr)
        l_obj, l_reg = jax.vmap(
            lambda p, g, m, r: FR.rpn_loss_sparse(
                params["rpn"], p, anchors, g, m, cfg, r, level_hw,
                dtype=model.dtype)
        )([p for p in pyr], batch["gt_boxes_xyxy"], batch["gt_mask"],
          rngs[:b])
        if stage == "C":
            total = l_obj.mean() + l_reg.mean()
            return total, ({"total": total}, new_vars["batch_stats"])
        props, pscores, pvalid = jax.vmap(
            lambda o, d: FR.generate_proposals(o, d, anchors, counts,
                                               cfg.img_size, cfg))(
            jax.lax.stop_gradient(obj), jax.lax.stop_gradient(deltas))
        if stage == "D":
            total = (l_obj.mean() + l_reg.mean() +
                     jnp.mean(jax.lax.stop_gradient(props)) * 0.0 +
                     jnp.mean(pscores) * 0.0)
            return total, ({"total": total}, new_vars["batch_stats"])
        rois, labels, reg_t, is_fg, valid = jax.vmap(
            lambda p, pv, g, c, m, r: FR.assign_box_targets(
                jax.lax.stop_gradient(p), pv, g, c, m, cfg, r)
        )(props, pvalid, batch["gt_boxes_xyxy"], batch["gt_cls"],
          batch["gt_mask"], rngs[b:])
        if stage == "E":
            total = (l_obj.mean() + l_reg.mean() + jnp.sum(rois) * 0.0 +
                     jnp.sum(reg_t) * 0.0)
            return total, ({"total": total}, new_vars["batch_stats"])
        scores, head_deltas = model.apply(
            variables, [p for p in pyr], rois, True,
            method=FasterRCNN.run_box_head)
        l_cls, l_box = jax.vmap(FR.box_head_loss)(
            scores, head_deltas, labels, reg_t, is_fg, valid)
        total = l_obj.mean() + l_reg.mean() + l_cls.mean() + l_box.mean()
        return total, ({"total": total}, new_vars["batch_stats"])

    return loss_fn


def make_step(stage):
    import optax
    loss_fn = partial_loss(stage)

    def train_step(state, batch, rng):
        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_stats, new_opt, state.step + 1,
                          state.ema_params), metrics

    return jax.jit(train_step)


for stage in ONLY:
    step = make_step(stage)
    t0 = time.perf_counter()
    s2, m = step(state, batch, key)
    float(m["total"])
    compile_s = time.perf_counter() - t0
    for _ in range(3):
        s2, m = step(state, batch, key)
    float(m["total"])
    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        s2, m = step(state, batch, key)
    float(m["total"])
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"stage {stage}: {dt:7.1f} ms/step   (compile {compile_s:.0f}s)",
          flush=True)
