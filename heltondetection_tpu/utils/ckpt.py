"""Checkpoint I/O (rebuild target C25): orbax-backed pytree save/restore of
the full TrainState (params + batch_stats + opt state + step + EMA), plus a
params-only loader for transfer learning — the reference's COCO-pretrain
workflow (README.md:79) and backbone-frozen fine-tune (README.md:132)
load weights across experiments the same way.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _mp_options():
    """Scope every CheckpointManager to the CALLING process. Our multi-host
    contract is rank-0-only saving of device_get host arrays (runner.py) and
    per-process local restores of a shared dir — orbax's default multi-host
    coordination instead assumes ALL processes enter every save/restore and
    barriers on it, so a rank-0-only save would deadlock waiting for ranks
    that never call save. With active_processes == {this process} orbax
    skips every cross-process sync (multihost.should_skip_process_sync)."""
    if jax.process_count() <= 1:
        return ocp.options.MultiprocessingOptions()  # orbax default
    pid = jax.process_index()
    return ocp.options.MultiprocessingOptions(primary_host=pid,
                                              active_processes={pid})


def _root_dir_and_create(ckpt_dir: str, want_create: bool = True):
    """orbax forbids create=True together with a custom active_processes
    set — under multi-process we create the root ourselves instead.
    ``want_create=False`` is the RESTORE/query contract: never create the
    directory as a side effect (a mistyped eval path must fail, not leave
    an empty ckpt tree that makes later isdir guards pass)."""
    path = os.path.abspath(ckpt_dir)
    mp = _mp_options()
    if not want_create:
        if not os.path.isdir(path):
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        return path, mp, False
    if mp.active_processes is None:
        return path, mp, True
    os.makedirs(path, exist_ok=True)
    return path, mp, False


def _mgr(ckpt_dir: str, max_to_keep: int = 3,
         create: bool = True) -> ocp.CheckpointManager:
    path, mp, create = _root_dir_and_create(ckpt_dir, create)
    return ocp.CheckpointManager(
        path,
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=create,
            multiprocessing_options=mp))


def save_state(ckpt_dir: str, state: Any, step: int,
               max_to_keep: int = 3) -> None:
    with _mgr(ckpt_dir, max_to_keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


class CheckpointWriter:
    """Async checkpoint writer for the training loop: ONE persistent
    CheckpointManager whose saves return once the host pytree is staged —
    the directory write proceeds on orbax's background thread while the
    next epochs train. ``save_state`` above opens/syncs/closes a manager
    per call (right for one-shot tools); a periodic in-loop save would
    stall the step loop for the full write each time. The next ``save``
    (or ``close``) blocks until the previous write committed, so at most
    one write is in flight and crash-consistency matches the sync path
    (orbax commits atomically via tmp-dir rename either way).
    """

    def __init__(self, ckpt_dir: str, max_to_keep: int = 3):
        path, mp, create = _root_dir_and_create(ckpt_dir)
        self._mgr = ocp.CheckpointManager(
            path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=create,
                enable_async_checkpointing=True,
                multiprocessing_options=mp))

    def save(self, state: Any, step: int) -> None:
        """Stage ``state`` (host arrays) for step ``step`` and return;
        blocks first if an earlier save is still writing."""
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        """Block until any in-flight write committed, then release."""
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self) -> "CheckpointWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    with _mgr(ckpt_dir, create=False) as mgr:
        return mgr.latest_step()


def restore_state(ckpt_dir: str, template: Any,
                  step: Optional[int] = None) -> Any:
    """Restore into the structure/shardings of ``template`` (an abstract or
    concrete TrainState). Enables resume-after-restart (SURVEY.md §5
    checkpoint/resume)."""
    with _mgr(ckpt_dir, create=False) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          template)
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))


def restore_eval_variables(ckpt_dir: str,
                           step: Optional[int] = None) -> dict:
    """Donor-free restore of only the inference-relevant fields of a saved
    TrainState. Eval/test/export need ``params`` + ``batch_stats`` (and
    ``ema_params`` when training kept an EMA) — never ``opt_state``.
    Restoring through a TrainState-shaped donor would require
    bit-reconstructing the train-time optimizer tree (freeze prefixes ×
    grad_clip arity × ema), so evaluating a checkpoint trained under
    different freeze/clip settings than the eval config would crash orbax.
    Restoring the raw saved tree (a dict keyed by TrainState field — no
    target structure) sidesteps the optimizer entirely; the reference's
    eval loads bare weights the same way (SURVEY.md §3.2).
    """
    with _mgr(ckpt_dir, create=False) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        restored = mgr.restore(step)
    if not isinstance(restored, dict):  # older orbax: NamedTuple → sequence
        restored = {"params": restored[0], "batch_stats": restored[1],
                    "step": restored[3],
                    "ema_params": restored[4] if len(restored) > 4 else None}
    return {"params": restored["params"],
            "batch_stats": restored.get("batch_stats") or {},
            "ema_params": restored.get("ema_params"),
            "step": restored.get("step")}


def load_params_for_transfer(ckpt_dir: str, template_params: Any,
                             step: Optional[int] = None,
                             skip_prefixes: tuple = ()) -> Any:
    """Load only matching params (by tree path + shape) from a checkpointed
    TrainState into ``template_params`` — mismatched heads (e.g. different
    num_classes, the COCOPretrain→VOC transfer of README.md:79) keep their
    fresh init. Raises FileNotFoundError on a missing/empty checkpoint dir
    (like its sibling restore functions) instead of a cryptic orbax error."""
    import numpy as np

    with _mgr(ckpt_dir, create=False) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        restored = mgr.restore(step)
    src = restored["params"] if isinstance(restored, dict) and \
        "params" in restored else restored[0]

    flat_src = dict(jax.tree_util.tree_flatten_with_path(src)[0])

    def merge(path, tgt_leaf):
        key = tuple(path)
        if key in flat_src:
            s = flat_src[key]
            if tuple(np.shape(s)) == tuple(np.shape(tgt_leaf)):
                name = "/".join(getattr(p, "key", str(p)) for p in path)
                if not any(name.startswith(pref) for pref in skip_prefixes):
                    return jax.numpy.asarray(s)
        return tgt_leaf

    return jax.tree_util.tree_map_with_path(merge, template_params)
