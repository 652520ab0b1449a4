"""Orbax checkpointing of the full training state.

Parity with the reference's richest subsystem (SURVEY §5.4, train.py:54-123):
the checkpoint carries epoch, model params+batch stats, optimizer state and
step counter, EMA shadow + update count, best mIoU/loss, and the early-stop
state, so `resume=true` restarts bit-exact. Three artifact kinds are kept:

  - ``checkpoint_last`` — full state, written every epoch,
  - ``<name>_best`` — EMA variables only, written on mIoU improvement,
  - final ``<model_save_name>`` — EMA variables only.

EMA-variable checkpoints can also be exported as torch state dicts
(utils/torch_convert.flax_to_torch) for reference-tool compatibility.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax
import numpy as np
import orbax.checkpoint as ocp

from cabinet_tpu.core.exceptions import ModelLoadError


def _saveable(tree: Any) -> Any:
    """jax.Arrays pass through UNGATHERED — orbax writes each shard from
    its owning host/device, which is the multi-host/SPMD-correct pattern
    (a tree_map(np.asarray, ...) gather would fail on non-addressable
    shards and double peak host memory on big states). Python scalars and
    lists become numpy so the pytree is serializable."""
    return jax.tree_util.tree_map(
        lambda x: x if isinstance(x, jax.Array) else np.asarray(x), tree)


class CheckpointManager:
    """Thin wrapper over orbax PyTree checkpointing with metadata sidecar."""

    def __init__(self, directory: Union[str, Path]):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # ---------------------------------------------------------------- full
    def save_full(self, name: str, state: Any, epoch: int,
                  best_miou: float, best_loss: float,
                  stopper_state: Dict[str, Any]) -> Path:
        path = self.directory / name
        tree = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "micro_step": state.micro_step,
            "accum_grads": state.accum_grads,
            "ema_variables": state.ema.variables,
            "ema_updates": state.ema.updates,
        }
        self._ckptr.save(path, _saveable(tree), force=True)
        self._ckptr.wait_until_finished()  # StandardCheckpointer is async
        meta = {
            "epoch": int(epoch),
            "best_miou": float(best_miou),
            "best_loss": float(best_loss),
            "early_stop_best_fitness": float(stopper_state["best_fitness"]),
            "early_stop_best_epoch": int(stopper_state["best_epoch"]),
        }
        (self.directory / f"{name}.meta.json").write_text(json.dumps(meta))
        return path

    def restore_full(self, name: str, state_template: Any
                     ) -> Optional[Dict[str, Any]]:
        """Restore into the template TrainState; returns None if absent."""
        path = self.directory / name
        meta_path = self.directory / f"{name}.meta.json"
        if not path.exists():
            return None
        template = {
            "params": state_template.params,
            "batch_stats": state_template.batch_stats,
            "opt_state": state_template.opt_state,
            "step": state_template.step,
            "micro_step": state_template.micro_step,
            "accum_grads": state_template.accum_grads,
            "ema_variables": state_template.ema.variables,
            "ema_updates": state_template.ema.updates,
        }
        tree = self._ckptr.restore(path, template)
        meta = (json.loads(meta_path.read_text()) if meta_path.exists()
                else {"epoch": 0, "best_miou": 0.0, "best_loss": float("inf"),
                      "early_stop_best_fitness": 0.0, "early_stop_best_epoch": 0})
        state = state_template.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            step=tree["step"],
            micro_step=tree["micro_step"],
            accum_grads=tree["accum_grads"],
            ema=state_template.ema.replace(variables=tree["ema_variables"],
                                           updates=tree["ema_updates"]),
        )
        return {"state": state, **meta}

    # ------------------------------------------------------------- pipeline
    @staticmethod
    def _stage_tree(s: Any) -> Dict[str, Any]:
        return {
            "params": s.params,
            "batch_stats": s.batch_stats,
            "opt_state": s.opt_state,
            "step": s.step,
            "ema_variables": s.ema.variables,
            "ema_updates": s.ema.updates,
        }

    def save_pipeline_full(self, name: str, states: Any, epoch: int,
                           best_miou: float, best_loss: float,
                           stopper_state: Dict[str, Any]) -> Path:
        """Full checkpoint of a pipeline-parallel run (train/pipeline.py):
        one sub-tree per StageState, same metadata sidecar as save_full.
        Shards are written ungathered from each stage's own sub-mesh."""
        path = self.directory / name
        tree = {"stages": [self._stage_tree(s) for s in states]}
        self._ckptr.save(path, _saveable(tree), force=True)
        self._ckptr.wait_until_finished()
        meta = {
            "epoch": int(epoch),
            "best_miou": float(best_miou),
            "best_loss": float(best_loss),
            "early_stop_best_fitness": float(stopper_state["best_fitness"]),
            "early_stop_best_epoch": int(stopper_state["best_epoch"]),
            "pipeline_stages": len(states),
        }
        (self.directory / f"{name}.meta.json").write_text(json.dumps(meta))
        return path

    def restore_pipeline_full(self, name: str, states_template: Any
                              ) -> Optional[Dict[str, Any]]:
        """Restore per-stage states into live-sharded templates (the
        templates carry each stage's sub-mesh placement); None if absent."""
        path = self.directory / name
        meta_path = self.directory / f"{name}.meta.json"
        if not path.exists():
            return None
        template = {"stages": [self._stage_tree(s) for s in states_template]}
        tree = self._ckptr.restore(path, template)
        states = [
            s.replace(params=t["params"], batch_stats=t["batch_stats"],
                      opt_state=t["opt_state"], step=t["step"],
                      ema=s.ema.replace(variables=t["ema_variables"],
                                        updates=t["ema_updates"]))
            for s, t in zip(states_template, tree["stages"])
        ]
        meta = (json.loads(meta_path.read_text()) if meta_path.exists()
                else {"epoch": 0, "best_miou": 0.0, "best_loss": float("inf"),
                      "early_stop_best_fitness": 0.0,
                      "early_stop_best_epoch": 0})
        return {"states": states, **meta}

    # ------------------------------------------------------------ variables
    def save_variables(self, name: str, variables: Any) -> Path:
        path = self.directory / name
        self._ckptr.save(path, _saveable(variables), force=True)
        self._ckptr.wait_until_finished()
        return path

    def restore_variables(self, name: str, template: Any) -> Any:
        path = self.directory / name
        if not path.exists():
            raise ModelLoadError(f"Checkpoint not found: {path}")
        return self._ckptr.restore(path, template)


def _variables_restore_template(meta_tree: Any) -> Any:
    """Shape-dtype template covering ONLY the model-variable subtrees of a
    full train checkpoint (params/batch_stats, per stage for pipeline
    checkpoints). Restoring a full checkpoint through a whole-tree zeros
    template would materialize opt_state + accum_grads + the EMA shadow
    (~3-4x the model size) on host just to throw them away; orbax partial
    restore reads only the requested leaves."""
    def keep(st: Any) -> Dict[str, Any]:
        return {coll: jax.tree_util.tree_map(
                    lambda m: jax.ShapeDtypeStruct(m.shape, np.dtype(m.dtype)),
                    st[coll])
                for coll in ("params", "batch_stats") if coll in st}

    if isinstance(meta_tree, dict) and "stages" in meta_tree:
        return {"stages": [keep(st) for st in meta_tree["stages"]]}
    return keep(meta_tree)


def load_any_checkpoint(path: Union[str, Path], template: Any) -> Any:
    """Load MODEL VARIABLES from an orbax dir or a torch .pth. Like the
    reference's consumers (evaluate.py:259-267), orbax dirs may be either a
    plain variables artifact (best/final) or a FULL train checkpoint —
    ``checkpoint_last`` from the fused trainer (raw params/batch_stats
    extracted, matching the reference's ``model_state`` preference) or from
    the pipeline trainer (per-stage sub-trees merged)."""
    path = Path(path)
    if path.is_dir():
        ckptr = ocp.StandardCheckpointer()
        meta_tree = ckptr.metadata(path.resolve()).item_metadata.tree
        top = set(meta_tree) if isinstance(meta_tree, dict) else set()
        if "stages" in top or "opt_state" in top:
            ptree = ocp.Checkpointer(ocp.PyTreeCheckpointHandler()).restore(
                path.resolve(),
                args=ocp.args.PyTreeRestore(
                    item=_variables_restore_template(meta_tree),
                    partial_restore=True))
            stages = ptree["stages"] if "stages" in top else [ptree]
            merged: Dict[str, Any] = {}
            for st in stages:
                for coll in ("params", "batch_stats"):
                    merged.setdefault(coll, {}).update(st[coll])
            return merged
        return ckptr.restore(path.resolve(), template)
    if path.suffix in (".pth", ".pt"):
        from cabinet_tpu.models.mobilenetv3 import default_cfgs
        from cabinet_tpu.utils.torch_convert import load_torch_checkpoint, torch_to_flax

        sd = load_torch_checkpoint(path)
        n_feat = max(
            v.shape[0] for k, v in sd.items()
            if k.startswith("mobile.conv.0") and hasattr(v, "shape")
        ) if any(k.startswith("mobile.conv.0") for k in sd) else None
        mode = "large" if n_feat == 960 else "small"
        return torch_to_flax(sd, default_cfgs(mode), strict=False)
    raise ModelLoadError(f"Unrecognized checkpoint: {path}")
