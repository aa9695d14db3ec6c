"""Async checkpoint writer (utils/ckpt.CheckpointWriter) — the in-loop
saver run_train uses: saves stage the host state and write on orbax's
background thread; close() commits everything. Pins:

* round-trip equality with restore_state (the resume path);
* successive saves don't corrupt each other (at most one write in flight);
* max_to_keep pruning still applies;
* a save followed immediately by close() is durable (crash-consistency of
  the final epoch's checkpoint).
"""

import jax
import jax.numpy as jnp
import numpy as np

from heltondetection_tpu.train.trainer import TrainState
from heltondetection_tpu.utils import ckpt as ckpt_io


def _state(seed: int) -> TrainState:
    rng = np.random.default_rng(seed)
    params = {"w": jnp.asarray(rng.normal(size=(4, 4)), jnp.float32),
              "b": jnp.asarray(rng.normal(size=(4,)), jnp.float32)}
    return TrainState(params=params, batch_stats={},
                      opt_state={"m": jax.tree_util.tree_map(jnp.zeros_like,
                                                             params)},
                      step=jnp.asarray(seed, jnp.int32), ema_params=None)


def test_async_writer_round_trips_and_prunes(tmp_path):
    d = str(tmp_path / "ckpt")
    states = {s: jax.device_get(_state(s)) for s in (1, 2, 3, 4)}
    with ckpt_io.CheckpointWriter(d, max_to_keep=2) as w:
        for s in (1, 2, 3, 4):
            w.save(states[s], s)
    # close() committed everything: the latest restores bit-exactly
    assert ckpt_io.latest_step(d) == 4
    restored = ckpt_io.restore_state(d, _state(0), step=4)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(states[4])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # max_to_keep=2 pruned the older steps
    import os
    kept = sorted(int(x) for x in os.listdir(d) if x.isdigit())
    assert kept == [3, 4]


def test_async_writer_final_save_durable_after_close(tmp_path):
    d = str(tmp_path / "ckpt")
    st = jax.device_get(_state(7))
    w = ckpt_io.CheckpointWriter(d)
    w.save(st, 7)
    w.close()  # must block until the write committed
    restored = ckpt_io.restore_state(d, _state(0), step=7)
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(st.params["w"]))


def test_best_json_round_trip(tmp_path):
    """best.json seeds `best` across resume so a worse post-restart eval
    can't overwrite the genuinely best one-slot snapshot."""
    from heltondetection_tpu.configs.base import ExperimentConfig
    from heltondetection_tpu.engine.runner import (_read_best_json,
                                                   _write_best_json)
    import os
    cfg = ExperimentConfig(name="b", work_dir=str(tmp_path))
    os.makedirs(os.path.join(str(tmp_path), "b"), exist_ok=True)
    assert _read_best_json(cfg) == {}          # absent → empty
    _write_best_json(cfg, {"AP": 0.42, "AP50": 0.6}, 100)
    got = _read_best_json(cfg)
    assert got["AP"] == 0.42 and got["step"] == 100
    # a worse candidate must not beat the seeded best
    assert not (0.35 > got.get("AP", -1))
