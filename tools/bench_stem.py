"""Microbench: v6.1 stem (6x6/s2/p2 conv from u8 RGB) vs an exact
space-to-depth rewrite (2x2 s2d -> 3x3/s1/p1 conv on 12 channels).

The two are the SAME linear map (Focus<->conv equivalence): for output
pixel y and kernel tap i in 0..5, the input row is 2y+i-2 = 2(y-1+j)+p
with i = 2j+p, so a (6,6,3,F) kernel relayouts to (3,3,12,F) over the
s2d image whose channel (p,q,c) holds pixel (2a+p, 2b+q, c); zero-pad 2
on the 640 grid == zero-pad 1 on the 320 s2d grid. This script measures
whether the rewrite beats XLA's own lowering of the 3-channel 6x6 conv
(serve-profile fusion: ~3.8 ms/b128 incl. normalize + the down1 conv).

Run from the repo root on the chip.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

B, S, F = 128, 640, 32
ITERS, WARM = 30, 5

rng = np.random.default_rng(0)
img = rng.integers(0, 255, (B, S, S, 3)).astype(np.uint8)
k6 = (rng.standard_normal((6, 6, 3, F)) * 0.05).astype(np.float32)
k_d1 = (rng.standard_normal((3, 3, F, 2 * F)) * 0.05).astype(np.float32)

dn = jax.lax.conv_dimension_numbers((B, S, S, 3), (6, 6, 3, F),
                                    ("NHWC", "HWIO", "NHWC"))


def stem_ref(u8, k):
    x = u8.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
    return jax.lax.conv_general_dilated(
        x, k.astype(jnp.bfloat16), (2, 2), ((2, 2), (2, 2)),
        dimension_numbers=dn)


def stem_s2d(u8, k):
    b, h, w, c = u8.shape
    xs = u8.reshape(b, h // 2, 2, w // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    x = xs.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
    k2 = k.reshape(3, 2, 3, 2, c, F).transpose(0, 2, 1, 3, 4, 5)
    k2 = k2.reshape(3, 3, 4 * c, F).astype(jnp.bfloat16)
    dn2 = jax.lax.conv_dimension_numbers(x.shape, k2.shape,
                                         ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, k2, (1, 1), ((1, 1), (1, 1)),
                                        dimension_numbers=dn2)


def down1(y, k):
    dn3 = jax.lax.conv_dimension_numbers(y.shape, k.shape,
                                         ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(y, k.astype(jnp.bfloat16), (2, 2),
                                        ((1, 1), (1, 1)),
                                        dimension_numbers=dn3)


def bench(fn, *args):
    g = jax.jit(fn)
    o = g(*args)
    jax.block_until_ready(o)
    for _ in range(WARM):
        o = g(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        o = g(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    u8 = jax.device_put(img)
    kk = jax.device_put(k6)
    kd = jax.device_put(k_d1)

    # numerical equivalence first (f32 compute for the check)
    a = jax.jit(lambda u, k: jax.lax.conv_general_dilated(
        u.astype(jnp.float32) / 255.0, k, (2, 2), ((2, 2), (2, 2)),
        dimension_numbers=dn))(u8[:2], kk)
    def s2d_f32(u, k):
        b, h, w, c = u.shape
        xs = u.reshape(b, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = xs.astype(jnp.float32) / 255.0
        k2 = k.reshape(3, 2, 3, 2, c, F).transpose(0, 2, 1, 3, 4, 5)
        k2 = k2.reshape(3, 3, 4 * c, F)
        dn2 = jax.lax.conv_dimension_numbers(x.shape, k2.shape,
                                             ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(x, k2, (1, 1), ((1, 1), (1, 1)),
                                            dimension_numbers=dn2)
    bb = jax.jit(s2d_f32)(u8[:2], kk)
    err = float(jnp.max(jnp.abs(a - bb)))
    print(f"max |ref - s2d| (f32, b2): {err:.3e}")
    assert err < 1e-3, "s2d rewrite is not equivalent"

    t_ref = bench(lambda u: stem_ref(u, kk), u8)
    t_s2d = bench(lambda u: stem_s2d(u, kk), u8)
    print(f"stem alone      b{B} {S}^2: ref {t_ref:7.2f} ms   s2d {t_s2d:7.2f} ms")

    # with the down1 conv chained (what the serve fusion actually covers)
    t_ref2 = bench(lambda u: down1(jax.nn.silu(stem_ref(u, kk)), kd), u8)
    t_s2d2 = bench(lambda u: down1(jax.nn.silu(stem_s2d(u, kk)), kd), u8)
    print(f"stem+silu+down1 b{B} {S}^2: ref {t_ref2:7.2f} ms   s2d {t_s2d2:7.2f} ms")


if __name__ == "__main__":
    main()
