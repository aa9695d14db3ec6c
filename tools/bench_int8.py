"""Microbenchmark: int8 vs bf16 conv throughput on the TPU chip.

Decides whether a W8A8 quantized serving path is worth building: TPU v5e's
MXU has a 2x int8 peak (394 TOPS vs 197 bf16 TFLOPs). Measures a chained
conv (each iteration consumes the previous output) inside ONE jitted
fori_loop, so the axon relay's dispatch caching and tunnel latency cannot
distort the numbers — the loop runs device-side. The int8 chain includes
the full serving-path overhead (requantize + dequant + silu per layer).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

N_INNER = 50


def timeit(fn, x, *rest, iters=5):
    # Chain the output back in as the next input: the axon relay memoizes
    # (executable, input buffers) pairs, so identical repeat dispatches
    # return cached results and time nothing.
    out = fn(x, *rest)       # compile
    float(jnp.max(out.astype(jnp.float32)))  # host transfer = real barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out, *rest)
    float(jnp.max(out.astype(jnp.float32)))  # (block_until_ready returns
    # early through the relay; a host readback of live data does not)
    return (time.perf_counter() - t0) / (iters * N_INNER) * 1e3


def main():
    cases = [
        # (B, H, C, k) — YOLOv5-representative square convs (C==C so the
        # chain composes)
        (128, 80, 128, 3),
        (128, 40, 256, 3),
        (128, 20, 512, 3),
        (8, 160, 256, 3),
    ]
    rng = np.random.default_rng(0)
    for (b, h, c, k) in cases:
        dn = jax.lax.conv_dimension_numbers((b, h, h, c), (k, k, c, c),
                                            ("NHWC", "HWIO", "NHWC"))
        x = jnp.asarray(rng.standard_normal((b, h, h, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, k, c, c)) * 0.02,
                        jnp.bfloat16)
        wq = jnp.asarray(rng.integers(-127, 128, (k, k, c, c)), jnp.int8)
        scale = jnp.full((c,), 1e-4, jnp.float32)

        @jax.jit
        def f_bf16(x, w):
            def body(_, v):
                y = jax.lax.conv_general_dilated(
                    v, w, (1, 1), [(k // 2, k // 2)] * 2,
                    dimension_numbers=dn)
                return jax.nn.silu(y)
            return jax.lax.fori_loop(0, N_INNER, body, x)

        @jax.jit
        def f_int8(x, wq, scale):
            def body(_, v):
                q = jnp.clip(jnp.round(v.astype(jnp.float32) * 16.0),
                             -127, 127).astype(jnp.int8)
                y = jax.lax.conv_general_dilated(
                    q, wq, (1, 1), [(k // 2, k // 2)] * 2,
                    dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                y = (y.astype(jnp.float32) * scale).astype(jnp.bfloat16)
                return jax.nn.silu(y)
            return jax.lax.fori_loop(0, N_INNER, body, x)

        try:
            t_bf = timeit(f_bf16, x, w)
            t_q = timeit(f_int8, x, wq, scale)
            tflop = 2 * b * h * h * c * k * k * c / 1e12
            print(f"B{b} {h}x{h}x{c} k{k}: "
                  f"bf16 {t_bf:.3f} ms/conv ({tflop / (t_bf / 1e3):.1f} TF/s)"
                  f"  int8+qdq+silu {t_q:.3f} ms/conv "
                  f"({tflop / (t_q / 1e3):.1f} TOP/s)  "
                  f"speedup {t_bf / t_q:.2f}x")
        except Exception as e:  # noqa: BLE001 — report per-case lowering gaps
            print(f"B{b} {h}x{h}x{c}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
