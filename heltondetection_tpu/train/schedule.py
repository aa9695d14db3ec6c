"""LR schedule + optimizer factory: AdamW with linear-warmup + cosine decay.

Rebuild of the reference's training recipe (README.md:13 "学习率衰减策略(warmup+cos
衰减)"; optimizer=adamw in every experiment table row, README.md:73-154).
optax chain with weight-decay masking (BN scales and biases excluded, the
Ultralytics/mmdet convention the reference lineage uses).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def warmup_cosine(base_lr: float, total_steps: int, warmup_steps: int,
                  final_lr_frac: float = 0.1, warmup_init_frac: float = 0.0):
    """Linear warmup → cosine decay to base_lr * final_lr_frac."""
    warmup_steps = max(int(warmup_steps), 1)
    decay_steps = max(int(total_steps) - warmup_steps, 1)
    return optax.join_schedules([
        optax.linear_schedule(base_lr * warmup_init_frac, base_lr,
                              warmup_steps),
        optax.cosine_decay_schedule(base_lr, decay_steps,
                                    alpha=final_lr_frac),
    ], [warmup_steps])


def _decay_mask(params):
    """Apply weight decay only to rank≥2 kernels (convs/dense), not to
    biases or BN scale/bias."""
    import jax
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def make_optimizer(base_lr: float = 1e-3, *, total_steps: int = 10000,
                   warmup_steps: int = 500, weight_decay: float = 5e-4,
                   final_lr_frac: float = 0.1, grad_clip: Optional[float] = 10.0,
                   b1: float = 0.9, b2: float = 0.999,
                   frozen_prefixes: tuple = ()
                   ) -> optax.GradientTransformation:
    """``frozen_prefixes``: string prefixes of the "/"-joined param path to
    freeze — updates (incl. AdamW weight decay) are zeroed. ("backbone",)
    freezes the whole backbone (the reference's frozeBackbone ablation,
    README.md:132); ("backbone/stem_", "backbone/layer1_") freezes
    stem+layer1 (torchvision trainable_backbone_layers=3 / mmdet
    frozen_stages=1 — pair with RCNNConfig.backbone_frozen_stages, which
    stop-gradients the same stages so their backward is skipped)."""
    sched = warmup_cosine(base_lr, total_steps, warmup_steps, final_lr_frac)
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(optax.adamw(sched, b1=b1, b2=b2,
                             weight_decay=weight_decay, mask=_decay_mask))
    if frozen_prefixes:
        import jax.tree_util as jtu

        def label(params):
            def lab(path, _):
                joined = "/".join(getattr(p, "key", str(p)) for p in path)
                return ("frozen" if any(joined.startswith(pref)
                                        for pref in frozen_prefixes)
                        else "train")
            return jtu.tree_map_with_path(lab, params)
        return optax.multi_transform(
            {"train": optax.chain(*parts), "frozen": optax.set_to_zero()},
            label)
    return optax.chain(*parts)
