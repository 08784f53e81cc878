"""Checkpointing: orbax save/restore of the functional train state, with
iteration-interval and best-metric tracking (reference mmcv
checkpoint_config + save_best, configs/refine_models/scflow.py:132-141)."""

import json
import os
from typing import Any, Dict, Optional

def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    def __init__(self, work_dir: str, max_to_keep: int = 5,
                 async_save: bool = True):
        self.work_dir = os.path.abspath(work_dir)
        os.makedirs(self.work_dir, exist_ok=True)
        ocp = _ocp()
        if max_to_keep is not None and max_to_keep <= 0:
            # mmcv's max_keep_ckpts=-1 means "keep all"; orbax spells
            # that None and rejects negatives
            max_to_keep = None
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.work_dir, "checkpoints"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best_path = os.path.join(self.work_dir, "best.json")
        self.async_save = async_save

    def save(self, step: int, state, extra: Optional[Dict[str, Any]] = None):
        """Write a full-train-state checkpoint.  async_save (default): the
        orbax background commit overlaps with training (SURVEY.md §5 —
        preemption recovery without stalling the step loop); orbax
        serializes concurrent saves internally and `wait()` / the next
        restore provide the barrier."""
        ocp = _ocp()
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if state.batch_stats is not None:
            payload["batch_stats"] = state.batch_stats
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if not self.async_save:
            self._mgr.wait_until_finished()

    def wait(self):
        """Block until any in-flight async save commits (call before
        process exit and before reading checkpoints back)."""
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, state, step: Optional[int] = None):
        ocp = _ocp()
        self._mgr.wait_until_finished()
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return state, 0
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if state.batch_stats is not None:
            template["batch_stats"] = state.batch_stats
        restored = self._mgr.restore(step, args=_ocp().args.StandardRestore(template))
        new_state = state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
            batch_stats=restored.get("batch_stats", state.batch_stats),
        )
        return new_state, int(step)

    def maybe_save_best(self, step: int, state, metric_name: str, value: float,
                        rule: str = "greater") -> bool:
        best = None
        if os.path.exists(self._best_path):
            with open(self._best_path) as f:
                best = json.load(f)
        better = (
            best is None
            or (rule == "greater" and value > best["value"])
            or (rule == "less" and value < best["value"])
        )
        if better:
            ocp = _ocp()
            path = os.path.join(self.work_dir, "best_ckpt")
            ckptr = ocp.StandardCheckpointer()
            payload = {"params": state.params}
            if state.batch_stats is not None:
                payload["batch_stats"] = state.batch_stats
            if os.path.exists(path):
                import shutil

                shutil.rmtree(path)
            ckptr.save(path, payload)
            ckptr.wait_until_finished()
            with open(self._best_path, "w") as f:
                json.dump({"metric": metric_name, "value": value, "step": step}, f)
        return better


def save_params(path: str, params, batch_stats=None):
    ocp = _ocp()
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if batch_stats is not None:
        payload["batch_stats"] = batch_stats
    ckptr.save(os.path.abspath(path), payload)
    ckptr.wait_until_finished()


def load_params(path: str, template=None):
    ocp = _ocp()
    path = os.path.abspath(path)
    # CheckpointManager step dirs keep the payload under the 'default' item
    if os.path.isdir(os.path.join(path, "default")):
        path = os.path.join(path, "default")
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        # non-strict: allows restoring a params-only template from a full
        # train-state checkpoint (extra keys in storage are ignored)
        try:
            return ckptr.restore(path, target=template, strict=False)
        except BaseException:
            full = ckptr.restore(path)
            return {k: full[k] for k in template}
    return ckptr.restore(path)
