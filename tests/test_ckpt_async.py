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
import pytest

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


@pytest.mark.smoke   # ckpt round-trip across optimizer layouts
def test_eval_restore_ignores_optimizer_layout(tmp_path):
    """Eval/test/export restore must work on checkpoints trained under ANY
    freeze/grad_clip/ema combination: _load_eval_variables is donor-free
    (restore_eval_variables never reconstructs the train-time optimizer
    tree), so a checkpoint whose opt_state was masked by freeze prefixes or
    wrapped by grad-clip chains restores even when the eval-side config
    would have built a different optimizer. Round-2 regression class: the
    donor path crashed orbax with Source <dict> / Target <list> on any
    layout mismatch."""
    from heltondetection_tpu.configs.base import ExperimentConfig
    from heltondetection_tpu.engine.runner import _load_eval_variables
    from heltondetection_tpu.train.schedule import make_optimizer

    params = {"backbone": {"w": jnp.ones((3, 3))},
              "head": {"w": jnp.full((2,), 2.0)}}
    bstats = {"bn": {"mean": jnp.full((3,), 0.5)}}
    layouts = [
        ("plain", (), None, False),                 # bare AdamW, no clip
        ("clip", (), 10.0, True),                   # clip chain + EMA
        ("frozen", ("backbone",), 10.0, False),     # multi_transform mask
        ("frozen_noclip", ("backbone",), None, True),
    ]
    for name, frozen, clip, ema in layouts:
        tx = make_optimizer(1e-3, total_steps=10, warmup_steps=1,
                            grad_clip=clip, frozen_prefixes=frozen)
        ema_params = (jax.tree_util.tree_map(lambda x: x * 3.0, params)
                      if ema else None)
        st = TrainState(params, bstats, tx.init(params),
                        jnp.asarray(5, jnp.int32), ema_params)
        cfg = ExperimentConfig(name=f"layout_{name}", work_dir=str(tmp_path))
        ckpt_io.save_state(cfg.ckpt_dir, jax.device_get(st), 1)
        v = _load_eval_variables(cfg)
        expect = ema_params if ema else params
        np.testing.assert_array_equal(np.asarray(v["params"]["head"]["w"]),
                                      np.asarray(expect["head"]["w"]))
        np.testing.assert_array_equal(
            np.asarray(v["batch_stats"]["bn"]["mean"]),
            np.asarray(bstats["bn"]["mean"]))


def test_restore_paths_never_create_dirs(tmp_path):
    """Restore/query functions must FAIL on a mistyped path, not create an
    empty ckpt tree as a side effect (which would make later isdir guards
    pass) — round-3 review finding."""
    import os
    missing = str(tmp_path / "typo" / "ckpt")
    with pytest.raises(FileNotFoundError):
        ckpt_io.restore_eval_variables(missing)
    with pytest.raises(FileNotFoundError):
        ckpt_io.restore_state(missing, _state(0))
    with pytest.raises(FileNotFoundError):
        ckpt_io.load_params_for_transfer(missing, _state(0).params)
    assert not os.path.exists(missing)
    # an existing-but-empty dir raises the same clear error everywhere
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(FileNotFoundError):
        ckpt_io.load_params_for_transfer(empty, _state(0).params)
    assert ckpt_io.latest_step(missing) is None   # query stays a no-op


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
