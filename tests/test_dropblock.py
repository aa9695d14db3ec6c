import numpy as np
import jax
import jax.numpy as jnp

from heltondetection_tpu.models.dropblock import DropBlock, drop_block


def test_noop_when_deterministic():
    x = jnp.ones((2, 16, 16, 8))
    m = DropBlock(0.5)
    out = m.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_drops_contiguous_blocks():
    x = jnp.ones((4, 32, 32, 4))
    out = drop_block(x, jax.random.PRNGKey(0), 0.3, block_size=5)
    out = np.asarray(out)
    dropped = (out == 0)
    frac = dropped.mean()
    assert 0.1 < frac < 0.55, frac       # roughly the target rate
    # kept values are rescaled above 1
    kept = out[out > 0]
    assert (kept > 1.0 - 1e-6).all()
    # blocks are contiguous: a dropped pixel usually has dropped neighbors
    d0 = dropped[0, :, :, 0]
    if d0.any():
        ys, xs = np.nonzero(d0)
        y, x_ = ys[len(ys) // 2], xs[len(xs) // 2]
        neigh = d0[max(y - 1, 0):y + 2, max(x_ - 1, 0):x_ + 2]
        assert neigh.sum() >= 2


def test_preserves_expectation_roughly():
    x = jnp.ones((8, 32, 32, 8))
    out = drop_block(x, jax.random.PRNGKey(1), 0.2, block_size=3)
    assert abs(float(out.mean()) - 1.0) < 0.05


def test_jittable():
    f = jax.jit(lambda x, k: drop_block(x, k, 0.3, 5))
    out = f(jnp.ones((1, 16, 16, 2)), jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(out)).all()
