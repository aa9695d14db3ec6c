"""Train engine: TrainState, jitted train step, EMA — rebuild target C3.

The reference's Runner owns the epoch/step loops with AMP-optional fwd/bwd,
AdamW, warmup+cosine, periodic eval + ckpt (README.md:13,29,61; SURVEY.md
§3.1). TPU-first differences:

* ONE pure train_step compiled once; single-chip and multi-chip share it —
  data parallelism comes from sharding the batch over a Mesh (see
  parallel/mesh.py), with XLA inserting the gradient all-reduce over ICI
  (replacing DDP/NCCL, SURVEY.md §2c). BatchNorm stats average the GLOBAL
  batch under jit — effectively free SyncBN, which the reference's DDP rows
  (README.md:88-89) lack.
* EMA of params (Ultralytics-style decay ramp) carried in the state.
* bf16 compute / f32 params via the model's dtype setting; the loss is f32.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from heltondetection_tpu.train.yolo_loss import (YoloLossConfig, yolo_loss, yolo_loss_packed)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    ema_params: Any


def create_train_state(model, rng, img_size: int, tx,
                       use_ema: bool = True, batch_size: int = 2) -> TrainState:
    x = jnp.zeros((batch_size, img_size, img_size, 3), jnp.float32)
    # jit the init: eager init pays per-op dispatch latency (~30 ms RTT
    # through the axon tunnel), turning a 1 s init into minutes
    variables = jax.jit(functools.partial(model.init, train=True))(rng, x)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        ema_params=params if use_ema else None,
    )


def ema_decay_schedule(step, base: float = 0.9999, tau: float = 2000.0):
    """Ultralytics ModelEMA ramp: d = base * (1 - exp(-step/tau))."""
    return base * (1.0 - jnp.exp(-step.astype(jnp.float32) / tau))


def _overlay_stats(old, new):
    """Overlay mutated batch_stats onto the previous tree. On current flax
    (0.12) ``mutable=['batch_stats']`` returns the FULL collection even
    when backbone_norm_eval leaves the backbone BNs untouched, so this is
    a structural no-op today — kept as a defensive merge in case a future
    flax / partial-apply path returns only the mutated subtree (replacing
    the whole tree would then drop the backbone's running stats)."""
    if new is None:
        return old
    if not isinstance(new, dict) or not isinstance(old, dict):
        return new
    if not new:
        return old
    out = dict(old)
    for k, v in new.items():
        out[k] = _overlay_stats(old.get(k), v)
    return out


def _accum_grads(loss_fn, params, batch_stats, batch, aux_of_micro,
                 accum_steps: int, loss_is_batch_scaled: bool):
    """Micro-batch gradient accumulation via lax.scan (one jit program).

    Splits the batch's leading dim into ``accum_steps`` micro-batches and
    scans value_and_grad over them, combining gradients so the result
    reproduces the monolithic full-batch gradient:

    * ``loss_is_batch_scaled=True`` (yolo_loss: Ultralytics ``loss * bs``
      semantics — the total scales with batch size): micro-batch losses
      SUM to the full-batch loss, so gradients are summed and the summed
      "total" metric matches the full-batch total.
    * ``loss_is_batch_scaled=False`` (faster_rcnn_loss: a batch MEAN):
      the full-batch loss is the mean of micro-batch losses, so gradients
      and every metric are averaged over the micro-batches.

    Either way equality is exact only up to per-micro-batch normalization
    internals (positive counts, sampling) — the same envelope as the
    reference's per-GPU DDP loss. Peak activation memory drops to one
    micro-batch's: the TPU lever for batch sizes past HBM on one chip.
    BN stats chain through the scan carry (each micro-batch updates the
    running stats, exactly like ``accum_steps`` real small-batch steps).

    Micro-batch i takes the INTERLEAVED rows ``i::accum_steps`` (not a
    contiguous block): under a data mesh the batch is sharded contiguously
    over its leading dim, so a contiguous block would live on only
    1/accum_steps of the devices and GSPMD would all-to-all the whole
    batch every step; strided rows keep every micro-batch evenly sharded
    with only a device-local transpose.
    """
    def body(carry, inp):
        stats, gacc, lacc = carry
        mb, i = inp
        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, stats, mb, aux_of_micro(i))
        gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
        lacc = {k: lacc[k] + metrics[k] for k in lacc}
        return (new_stats, gacc, lacc), None

    micro = jax.tree_util.tree_map(
        lambda x: jnp.moveaxis(
            x.reshape(x.shape[0] // accum_steps, accum_steps,
                      *x.shape[1:]), 1, 0), batch)
    # trace one micro-batch to learn the metrics keys (shapes are static)
    mb0 = jax.tree_util.tree_map(lambda x: x[0], micro)
    _, (m0, _) = jax.eval_shape(
        lambda p, s: loss_fn(p, s, mb0, aux_of_micro(jnp.zeros((), jnp.int32))),
        params, batch_stats)
    zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
    zero_m = {k: jnp.zeros(()) for k in m0}
    (new_stats, grads, msum), _ = jax.lax.scan(
        body, (batch_stats, zero_g, zero_m),
        (micro, jnp.arange(accum_steps)))
    if loss_is_batch_scaled:
        # per-term metrics are per-element means → micro-batch mean;
        # "total" is batch-size-scaled → the sum matches the full batch
        metrics = {k: (v if k == "total" else v / accum_steps)
                   for k, v in msum.items()}
    else:
        # mean-loss convention: average gradients and every metric
        grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
        metrics = {k: v / accum_steps for k, v in msum.items()}
    return metrics, new_stats, grads


def multiscale_sizes(img_size: int, factors, stride: int = 32
                     ) -> Tuple[int, ...]:
    """Multi-scale bucket sizes: each factor maps ``img_size`` to the
    nearest multiple of the coarsest head stride (so every pyramid level
    keeps integer dims). Factors must be in (0, 1] — the host pipelines
    render at ``img_size``, so upscaling past it would fabricate pixels;
    set img_size to the LARGEST wanted scale instead."""
    sizes = []
    for f in factors:
        if not 0.0 < f <= 1.0:
            raise ValueError(
                f"multi_scale factor {f} out of (0, 1]: the host renders "
                "at img_size — raise model.img_size to the largest scale "
                "and express the rest as fractions of it")
        s = max(int(round(img_size * f / stride)) * stride, stride)
        if s not in sizes:
            sizes.append(s)
    if not sizes:
        raise ValueError("multi_scale needs at least one factor")
    return tuple(sorted(sizes))


def resize_batch_to(batch: Dict, size: int) -> Dict:
    """Resize a train batch's images to ``size``² on device (bilinear) and
    scale the gt boxes to match — the inside-jit half of multi-scale
    training (``size`` is static: one compiled program per bucket). A
    same-size call only applies the u8 passthrough (the step's fused
    normalize handles dtype), so factor-1.0 buckets stay bit-identical to
    single-scale training."""
    img = batch["image"]
    s0 = img.shape[1]
    if size == s0:
        return batch
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    r = size / s0
    img = jax.image.resize(
        img, (img.shape[0], size, int(round(img.shape[2] * r)),
              img.shape[3]), "bilinear")
    out = dict(batch)
    out["image"] = img
    out["gt_boxes"] = batch["gt_boxes"] * r      # cxcywh pixels: linear
    return out


def make_rcnn_train_step(model, tx, rcnn_cfg, use_ema: bool = True,
                         accum_steps: int = 1) -> Callable:
    """Two-stage FasterRCNN train step (same TrainState contract as the
    YOLO step). batch adds nothing new: gt boxes arrive as xyxy pixels
    in ``gt_boxes_xyxy``; a PRNG key drives proposal subsampling.
    ``accum_steps`` > 1 scans micro-batches and accumulates gradients
    before the single optimizer/EMA update (see :func:`_accum_grads`)."""
    from heltondetection_tpu.models.faster_rcnn import faster_rcnn_loss

    def loss_fn(params, batch_stats, batch, rng):
        img = batch["image"]
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0  # fused normalize
        loss, metrics, new_stats = faster_rcnn_loss(
            model, {"params": params, "batch_stats": batch_stats},
            img, batch["gt_boxes_xyxy"], batch["gt_cls"],
            batch["gt_mask"], rcnn_cfg, rng, train=True)
        return loss, (metrics, new_stats)

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        if accum_steps > 1:
            metrics, new_stats, grads = _accum_grads(
                loss_fn, state.params, state.batch_stats, batch,
                lambda i: jax.random.fold_in(rng, i), accum_steps,
                loss_is_batch_scaled=False)  # faster_rcnn_loss: batch mean
        else:
            (loss, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats,
                                       batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if use_ema and state.ema_params is not None:
            d = ema_decay_schedule(state.step)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1.0 - d),
                state.ema_params, new_params)
        else:
            new_ema = state.ema_params
        new_state = TrainState(new_params,
                               _overlay_stats(state.batch_stats, new_stats),
                               new_opt, state.step + 1, new_ema)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_train_step(model, tx, loss_cfg: YoloLossConfig,
                    use_ema: bool = True, accum_steps: int = 1) -> Callable:
    """Returns jittable ``train_step(state, batch) -> (state, metrics)``.

    batch: dict with ``image`` (B,S,S,3) float in [0,1], ``gt_boxes``
    (B,M,4) cxcywh pixels, ``gt_cls`` (B,M) int, ``gt_mask`` (B,M) bool.
    ``accum_steps`` > 1 scans micro-batches and accumulates gradients
    before the single optimizer/EMA update (see :func:`_accum_grads`).
    """

    base_key = jax.random.PRNGKey(0)

    def loss_fn(params, batch_stats, batch, step):
        img = batch["image"]
        if img.dtype == jnp.uint8:
            # normalization fused INTO the step: an eager u8→f32 pass
            # outside jit costs a dispatch + a (B,S,S,3) f32 HBM round-trip
            img = img.astype(jnp.float32) / 255.0
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            img, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(base_key, step)})
        # packed train head (models/yolov5._PackedDetect) emits per-level
        # tuples; the standard head emits arrays — same math either way
        loss_impl = (yolo_loss_packed if isinstance(outs[0], (tuple, list))
                     else yolo_loss)
        loss, metrics = loss_impl(outs, batch["gt_boxes"], batch["gt_cls"],
                                  batch["gt_mask"], loss_cfg)
        return loss, (metrics, mutated["batch_stats"])

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        if accum_steps > 1:
            # per-micro-batch dropout keys; they enumerate the same integer
            # stream as the k=1 path (fold_in(base_key, n)) — fine, since
            # only one of the two paths runs in a given training run
            metrics, new_stats, grads = _accum_grads(
                loss_fn, state.params, state.batch_stats, batch,
                lambda i: state.step * accum_steps + i, accum_steps,
                loss_is_batch_scaled=True)  # yolo_loss: loss * bs
        else:
            (loss, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats,
                                       batch, state.step)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if use_ema and state.ema_params is not None:
            d = ema_decay_schedule(state.step)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1.0 - d),
                state.ema_params, new_params)
        else:
            new_ema = state.ema_params
        new_state = TrainState(new_params, new_stats, new_opt,
                               state.step + 1, new_ema)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step
