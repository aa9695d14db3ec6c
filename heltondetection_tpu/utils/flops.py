"""FLOPs + Params reporting (rebuild of README.md:24 "支持模型评估时显示FLOPs和
Params"): XLA's own cost model via jitted-computation cost_analysis replaces
the reference's thop/ptflops-style torch hooks."""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import numpy as np


def count_params(params) -> int:
    return int(sum(np.prod(p.shape)
                   for p in jax.tree_util.tree_leaves(params)))


def flops_of(fn: Callable, *args) -> float:
    """FLOPs of one call of ``fn(*args)`` per XLA cost analysis (compiled
    for the current default backend)."""
    return compiled_flops(jax.jit(fn).lower(*args).compile())


V5E_BF16_PEAK_TFLOPS = 197.0  # public TPU v5e spec (bf16, per chip)


def compiled_flops(compiled) -> float:
    """FLOPs of an already-compiled computation per XLA's cost model."""
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns per-device list
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def mfu_of(compiled, seconds_per_call: float,
           peak_tflops: float = V5E_BF16_PEAK_TFLOPS
           ) -> Tuple[float, float]:
    """(achieved TFLOP/s, % of peak) for a compiled computation measured at
    ``seconds_per_call`` — the %-of-peak figure that turns a "bound by op X"
    profiling verdict into a number (VERDICT r2 item 5)."""
    achieved = compiled_flops(compiled) / seconds_per_call / 1e12
    return achieved, 100.0 * achieved / peak_tflops


def model_complexity(model, variables, img_size: int,
                     batch_size: int = 1) -> Dict[str, float]:
    """(GFLOPs/img, MParams) for a detector forward at the given size."""
    import jax.numpy as jnp
    x = jnp.zeros((batch_size, img_size, img_size, 3), jnp.float32)
    fl = flops_of(lambda v, im: model.apply(v, im, train=False), variables, x)
    return {
        "gflops_per_image": fl / batch_size / 1e9,
        "mparams": count_params(variables.get("params", variables)) / 1e6,
    }
