"""Pipeline-parallel training: CABiNet split into device-resident stages.

The reference has no pipeline parallelism (SURVEY §2.6: "TP / PP / SP / EP —
none"); this module goes beyond it so the framework's parallelism story is
complete for models that outgrow one chip (the deep YOLO-sem variants, or
CABiNet at video batch sizes where activations dominate HBM).

TPU-first design — why this is NOT a GSPMD sharding:
  GSPMD (the mesh layer in core/mesh.py) shards every op over ALL mesh
  devices; true pipeline parallelism needs device-DISJOINT placement of
  heterogeneous stages, which a single jitted SPMD program cannot express.
  The JAX-native construction is multi-program placement + async dispatch:
  each stage is its own jitted program whose operands live on that stage's
  (sub-)mesh, inter-stage activations move with `jax.device_put` (an ICI
  copy), and the GPipe schedule is simply the host's DISPATCH ORDER — JAX
  enqueues work per device in FIFO order, so dispatching
  F0(0), F0(1), B0(0), F0(2), B0(1), ... gives the classic
  one-forward-one-backward interleave with no scheduler code: stage 1
  consumes microbatch m while stage 0 already runs microbatch m+1.

Numeric contract (tests/unit/test_pipeline.py): one pipeline step over M
microbatches is equivalent to the fused trainer (train/trainer.py) run with
`accum_steps=M` over the same microbatches — same per-microbatch OHEM
selection (reference train.py:429-435 semantics), same 1/M loss scaling,
same GLOBAL-norm clip across ALL stages' gradients (train.py:411-427),
same once-per-window optimizer/EMA advance, same chained BatchNorm-stat
updates. Non-loss-stage activations are rematerialized in their backwards
(standard GPipe checkpointing) — gradients are bit-identical in exact
arithmetic and agree to float tolerance with the fused single-program
step. The engine is N-stage (the equivalence test runs 2-stage CABiNet /
YOLO and 3-stage YOLO); CABiNet itself pins at 2 because stage_keys
partition TOP-LEVEL modules and its backbone is the single "mobile"
module.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from cabinet_tpu.core.mesh import (
    batch_sharding,
    make_mesh,
    shard_model_parallel,
)
from cabinet_tpu.train.ema import EmaState, ema_init, ema_update
from cabinet_tpu.train.losses import ohem_cross_entropy

# Stage partition of CABiNet's top-level modules (models/cabinet.py setup):
# stage 0 = the MobileNetV3 backbone (the deep sequential trunk), stage 1 =
# everything that consumes its /32 features (spatial branch reads the raw
# image, so the image rides along to stage 1 as data, not activations).
CABINET_STAGE_KEYS: Tuple[Tuple[str, ...], ...] = (
    ("mobile",),
    ("sb", "ab", "ffm", "conv_out"),
)

# Stage partition of YOLO-sem (models/yolosem.py setup): CSP trunk | PAN-FPN
# neck + heads. The inter-stage activation is the (P3, P4, P5) pyramid; the
# raw image rides to the loss stage as data (decode reads only its H, W).
YOLOSEM_STAGE_KEYS: Tuple[Tuple[str, ...], ...] = (
    ("stem", "down2", "c2f_2", "down3", "c2f_3", "down4", "c2f_4",
     "down5", "c2f_5", "sppf"),
    ("fpn_4", "fpn_3", "head0", "head1", "head2", "classifier",
     "aux1", "aux_classifier"),
)

# 3-stage partition: trunk front (image -> P3) | trunk back (P3 -> pyramid)
# | neck + heads. The deep YOLO26 variants (x: d=1.0 -> 9 c2f_5 bottlenecks)
# split their sequential trunk naturally here; CABiNet cannot go past 2 —
# stage_keys partition TOP-LEVEL modules and its whole backbone is the
# single "mobile" module (models/cabinet.py setup).
YOLOSEM_STAGE_KEYS_3: Tuple[Tuple[str, ...], ...] = (
    ("stem", "down2", "c2f_2", "down3", "c2f_3"),
    ("down4", "c2f_4", "down5", "c2f_5", "sppf"),
    ("fpn_4", "fpn_3", "head0", "head1", "head2", "classifier",
     "aux1", "aux_classifier"),
)


def split_variables(variables: Dict[str, Any],
                    stage_keys: Sequence[Sequence[str]]) -> List[Dict[str, Any]]:
    """Partition a Flax variable dict by top-level module name per stage."""
    parts: List[Dict[str, Any]] = []
    for keys in stage_keys:
        part: Dict[str, Any] = {}
        for coll, tree in variables.items():
            sub = {k: tree[k] for k in keys if k in tree}
            if sub:
                part[coll] = sub
        parts.append(part)
    seen = [k for keys in stage_keys for k in keys]
    missing = sorted({f"{coll}/{k}" for coll, tree in variables.items()
                      for k in tree if k not in seen})
    if missing:
        raise ValueError(f"stage_keys do not cover modules: {missing}")
    return parts


def merge_variables(parts: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    """Inverse of split_variables (host copies — for eval/checkpointing)."""
    merged: Dict[str, Any] = {}
    for part in parts:
        for coll, tree in part.items():
            merged.setdefault(coll, {}).update(
                {k: jax.device_get(v) for k, v in tree.items()})
    return merged


def make_pipeline_meshes(n_stages: int = 2, dp: int = 1, tp: int = 1,
                         devices: Optional[Sequence[jax.Device]] = None,
                         ) -> List[Any]:
    """Contiguous device groups, one (dp, tp) mesh per pipeline stage.

    tp > 1 composes pipeline with per-stage TENSOR parallelism: each
    stage's wide channels shard over its own model axis (init_state places
    them by core/mesh.py tensor_parallel_spec) and GSPMD partitions that
    stage's program — PP x TP x DP from one mesh list, no engine changes
    (the per-stage jits infer everything from operand shardings)."""
    devices = list(devices if devices is not None else jax.devices())
    per = dp * tp
    need = n_stages * per
    if len(devices) < need:
        raise ValueError(f"pipeline needs {need} devices, have {len(devices)}")
    return [make_mesh(n_data=dp, n_model=tp,
                      devices=devices[i * per:(i + 1) * per])
            for i in range(n_stages)]


@flax.struct.dataclass
class StageState:
    """Per-stage slice of the train state, resident on that stage's mesh."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    ema: EmaState


def _backbone_method(module, x, train):
    return module.mobile(x, train)


def _decode_method(module, x, feat, train):
    # CABiNet._decode is the post-backbone graph (models/cabinet.py:182-197);
    # invoking it via apply(method=...) reuses the exact module tree, so the
    # pipeline has zero duplicated model code and zero parity risk.
    return module._decode(x, feat, train)


def _yolosem_backbone_method(module, x, train):
    return module.backbone(x, train)


def _yolosem_decode_method(module, x, feat, train):
    return module.decode(x, feat, train)


def _yolosem_front_method(module, x, train):
    return module.backbone_front(x, train)


def _yolosem_back_method(module, feat, train):
    # middle-stage signature: (module, feat_in, train) -> feat_out
    return module.backbone_back(feat, train)


YOLOSEM_STAGE_METHODS = (_yolosem_backbone_method, _yolosem_decode_method)
YOLOSEM_STAGE_METHODS_3 = (_yolosem_front_method, _yolosem_back_method,
                           _yolosem_decode_method)


def _put_batch(tree: Any, mesh: Any) -> Any:
    """device_put every leaf batch-sharded on its own ndim (inter-stage
    activations may be pytrees, e.g. YOLO's (P3, P4, P5) pyramid)."""
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, batch_sharding(mesh, a.ndim)), tree)


class CabinetPipeline:
    """N-stage GPipe trainer over device-disjoint meshes.

    Stages are (stage_keys, stage_methods) pairs: the FIRST method maps
    (module, image, train) -> activation pytree, MIDDLE methods map
    (module, feat_in, train) -> feat_out, and the LAST maps
    (module, image, feat, train) -> (final, aux) logits — the image rides
    to the loss stage as data. Defaults to CABiNet's natural 2-way split
    (backbone | decode — its whole backbone is the single top-level
    "mobile" module, so 2 is its ceiling); deep sequential trunks go
    further (YOLOSEM_STAGE_KEYS_3 / YOLOSEM_STAGE_METHODS_3 cut the CSP
    trunk at P3 for 3 stages).

    tx_factory(params_subtree) must build the stage's optimizer WITHOUT
    gradient clipping (pass max_grad_norm=None to train.optimizer helpers);
    the pipeline applies the reference's GLOBAL-norm clip itself across all
    stages' gradients so semantics match the single-program trainer.
    """

    def __init__(
        self,
        model: Any,
        tx_factory: Callable[[Any], Any],
        n_min: int,
        num_microbatches: int,
        meshes: Sequence[Any],
        thresh: float = 0.7,
        ignore_label: int = 255,
        class_weights: Optional[jnp.ndarray] = None,
        aux_weight: float = 1.0,
        loss_type: str = "ohem",
        ohem_method: str = "bisect",
        compute_dtype: Any = jnp.float32,
        max_grad_norm: Optional[float] = None,
        ema_decay: float = 0.9999,
        ema_tau: float = 2000.0,
        stage_keys: Sequence[Sequence[str]] = CABINET_STAGE_KEYS,
        stage_methods: Optional[Sequence[Callable]] = None,
        aug_fn: Optional[Callable] = None,
    ) -> None:
        n_stages = len(meshes)
        if n_stages < 2:
            raise ValueError(f"pipeline needs >= 2 meshes, got {n_stages}")
        self.model = model
        self.stage_keys = tuple(tuple(k) for k in stage_keys)
        if len(self.stage_keys) != n_stages:
            raise ValueError(f"{n_stages} meshes but "
                             f"{len(self.stage_keys)} stage_keys entries")
        if stage_methods is None:
            if n_stages != 2:
                raise ValueError(
                    "stage_methods is required for n_stages != 2; the "
                    "default is CABiNet's backbone | decode split, and "
                    "CABiNet cannot split deeper (stage_keys partition "
                    "top-level modules; its backbone is one module)")
            methods: Tuple[Callable, ...] = (_backbone_method, _decode_method)
        else:
            methods = tuple(stage_methods)
            if len(methods) != n_stages:
                raise ValueError(f"{n_stages} meshes but "
                                 f"{len(methods)} stage_methods")
        self.tx_factory = tx_factory
        self.meshes = list(meshes)
        self.M = int(num_microbatches)
        # On-device augmentation composed with the pipeline (VERDICT r4 #2):
        # aug_fn(*raw_microbatch, key) -> (images, labels), jit-compiled,
        # executed on STAGE 0's sub-mesh (its inputs are device_put there);
        # the warped batch feeds stage 0 directly and rides to stage 1 as
        # data alongside the labels (one ICI hop, same as the activations).
        self.aug_fn = aug_fn
        self.max_grad_norm = max_grad_norm
        self.ema_decay, self.ema_tau = ema_decay, ema_tau
        self._txs: List[Any] = []
        self._update_fns: List[Callable] = []
        cw = None if class_weights is None else jnp.asarray(class_weights)

        def seg_loss(logits, labels):
            if loss_type == "ohem":
                return ohem_cross_entropy(logits, labels, n_min, thresh,
                                          ignore_label, cw,
                                          method=ohem_method)
            from cabinet_tpu.train.losses import cross_entropy_mean

            return cross_entropy_mean(logits, labels, ignore_label, cw)

        M = self.M

        def run_stage(method, first, params, stats, a):
            x = a.astype(compute_dtype) if first else a
            out, mut = model.apply(
                {"params": params, "batch_stats": stats}, x,
                train=True, method=method, mutable=["batch_stats"])
            return out, mut["batch_stats"]

        def make_fwd(method, first):
            return jax.jit(lambda params, stats, a:
                           run_stage(method, first, params, stats, a))

        def make_bwd(method, first):
            # Non-loss-stage backward rematerializes its forward (GPipe
            # activation checkpointing): only (params, input, cotangent)
            # cross the program boundary, never vjp residuals. BN
            # train-mode outputs do not depend on the running stats, so
            # any stats snapshot is valid. Stage 0 differentiates only its
            # params (the image is data); middle stages also return the
            # cotangent of their activation input to continue the chain.
            if first:
                def bwd(params, stats, a, cot):
                    _, vjp = jax.vjp(
                        lambda p: run_stage(method, True, p, stats, a)[0],
                        params)
                    return vjp(cot)[0]
            else:
                def bwd(params, stats, a, cot):
                    _, vjp = jax.vjp(
                        lambda p, ai: run_stage(method, False, p, stats,
                                                ai)[0],
                        params, a)
                    return vjp(cot)  # (g_params, g_feat_in)
            return jax.jit(bwd)

        def loss_last(params, stats, x, feat, labels):
            (final, aux), mut = model.apply(
                {"params": params, "batch_stats": stats},
                x.astype(compute_dtype), feat, train=True,
                method=methods[-1], mutable=["batch_stats"])
            loss = seg_loss(final, labels) + aux_weight * seg_loss(aux, labels)
            return loss / M, mut["batch_stats"]

        self._fwds = [make_fwd(m, i == 0)
                      for i, m in enumerate(methods[:-1])]
        self._bwds = [make_bwd(m, i == 0)
                      for i, m in enumerate(methods[:-1])]
        self._vg_last = jax.jit(
            jax.value_and_grad(loss_last, argnums=(0, 3), has_aux=True))
        self._acc = jax.jit(
            lambda acc, g: jax.tree_util.tree_map(jnp.add, acc, g),
            donate_argnums=(0,))
        self._sqnorm = jax.jit(lambda g: sum(
            jnp.sum(jnp.square(leaf.astype(jnp.float32)))
            for leaf in jax.tree_util.tree_leaves(g)))
        self._zeros = jax.jit(
            lambda p: jax.tree_util.tree_map(jnp.zeros_like, p))

    # -- state ------------------------------------------------------------

    def init_state(self, variables: Dict[str, Any],
                   tp_min_features: int = 256) -> List[StageState]:
        """Split full-model variables into per-stage states on their meshes
        and build each stage's optimizer + jitted update program.

        On meshes with a model axis > 1 (make_pipeline_meshes tp > 1) the
        stage state is physically TP-sharded (core/mesh.py
        shard_model_parallel trailing-feature rule; optimizer/EMA mirrors
        follow the same shape rule); GSPMD then partitions every per-stage
        program from the operand shardings alone. A size-1 model axis is
        exactly replicate."""
        parts = split_variables(variables, self.stage_keys)
        self._txs, self._update_fns, states = [], [], []
        for part, mesh in zip(parts, self.meshes):
            params = part["params"]
            stats = part.get("batch_stats", {})
            tx = self.tx_factory(params)
            state = StageState(
                params=params, batch_stats=stats, opt_state=tx.init(params),
                step=jnp.zeros((), jnp.int32),
                ema=ema_init({"params": params, "batch_stats": stats},
                             decay=self.ema_decay, tau=self.ema_tau))
            states.append(shard_model_parallel(state, mesh,
                                               min_features=tp_min_features))
            self._txs.append(tx)
            self._update_fns.append(self._make_update(tx))
        return states

    def _make_update(self, tx) -> Callable:
        max_norm = self.max_grad_norm

        def update(state: StageState, grads, own_sq, other_sq) -> StageState:
            if max_norm:
                # Same formulation as optax.clip_by_global_norm, with the
                # norm taken over BOTH stages' gradients (reference clips
                # the global norm, train.py:411-427).
                g_norm = jnp.sqrt(own_sq + other_sq)
                trig = g_norm < max_norm
                grads = jax.tree_util.tree_map(
                    lambda t: jax.lax.select(
                        trig, t, (t / g_norm.astype(t.dtype)) * max_norm),
                    grads)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_ema = ema_update(state.ema, {"params": new_params,
                                             "batch_stats": state.batch_stats})
            return state.replace(params=new_params, opt_state=new_opt,
                                 step=state.step + 1, ema=new_ema)

        # Donate only the state: grads share no output buffers (the params
        # update aliases the state tree), so donating them just warns.
        return jax.jit(update, donate_argnums=(0,))

    # -- the step ----------------------------------------------------------

    def train_step(self, states: List[StageState], images: np.ndarray,
                   labels: np.ndarray, n_micro: Optional[int] = None
                   ) -> Tuple[List[StageState], jnp.ndarray]:
        """One optimizer step: M microbatches through the stage pipeline.

        n_micro overrides the window length for a TRAILING PARTIAL window
        (reference train.py:479-480 flush): the per-microbatch loss scale
        stays 1/M — matching the fused trainer, whose flush applies the
        1/accum-scaled partial sum — and the microbatch SHAPE is unchanged
        (B = n_micro * (full-window mb)), so no program recompiles.
        """
        M = self.M if n_micro is None else int(n_micro)
        B = images.shape[0]
        if B % M != 0:
            raise ValueError(f"batch {B} not divisible by {M} microbatches")
        mb = B // M
        micro = [(images[m * mb:(m + 1) * mb], labels[m * mb:(m + 1) * mb])
                 for m in range(M)]
        return self.train_step_micro(states, micro)

    def train_step_micro(self, states: List[StageState],
                         microbatches: Sequence[Tuple],
                         ) -> Tuple[List[StageState], jnp.ndarray]:
        """One optimizer step over an explicit list of microbatches.

        Each element is (images, labels) host/device arrays — or, when the
        pipeline was built with aug_fn, the RAW augmentation operands plus a
        PRNG key (e.g. (canvas, label_canvas, hw, key) for the on-device
        geometric recipe, ops/geometric.py): the operands are device_put
        batch-sharded onto stage 0's mesh and aug_fn runs there, so the
        host ships undecoded canvases exactly like the fused trainer's
        device-aug path (cli/train.py) and the pipeline never concatenates
        loader batches (the list IS the window).

        All device work is dispatched asynchronously; the only host sync is
        JAX's own dispatch. Stage i's backward for microbatch m is
        dispatched after stage i's forward for m + (n_stages-1-i) — deeper
        stages drain sooner, each stage runs one forward + one backward per
        iteration in steady state, and no device FIFO ever stalls on
        another (the 1F1B interleave; see module docstring).
        """
        n = len(self.meshes)
        params = [s.params for s in states]
        stats = [s.batch_stats for s in states]
        accs = [self._zeros(p) for p in params]
        losses = []
        # per non-loss stage: forward inputs awaiting their remat backward,
        # and output-cotangents ready to consume (both keyed by microbatch)
        inputs: List[Dict[int, Any]] = [{} for _ in range(n - 1)]
        cots: List[List[Tuple[int, Any]]] = [[] for _ in range(n - 1)]

        def drain(i: int) -> None:
            m_, cot = cots[i].pop(0)
            a_in = inputs[i].pop(m_)
            if i == 0:
                g = self._bwds[0](params[0], stats[0], a_in, cot)
            else:
                g, g_in = self._bwds[i](params[i], stats[i], a_in, cot)
                cots[i - 1].append((m_, _put_batch(g_in, self.meshes[i - 1])))
            accs[i] = self._acc(accs[i], g)

        for m, batch in enumerate(microbatches):
            if self.aug_fn is not None:
                *raw, key = batch
                staged = [jax.device_put(a, batch_sharding(
                    self.meshes[0], np.ndim(a))) for a in raw]
                x0_m, y0_m = self.aug_fn(*staged, key)
                # warped batch rides to the loss stage as data (spatial
                # branch / decode read the image; the loss reads labels)
                x_last = jax.device_put(
                    x0_m, batch_sharding(self.meshes[-1], x0_m.ndim))
                y_m = jax.device_put(
                    y0_m, batch_sharding(self.meshes[-1], y0_m.ndim))
            else:
                x_m, lb_m = batch
                x0_m = jax.device_put(
                    x_m, batch_sharding(self.meshes[0], np.ndim(x_m)))
                x_last = jax.device_put(
                    x_m, batch_sharding(self.meshes[-1], np.ndim(x_m)))
                y_m = jax.device_put(
                    lb_m, batch_sharding(self.meshes[-1], np.ndim(lb_m)))

            prev: Any = x0_m
            inputs[0][m] = x0_m
            for i in range(n - 1):
                if i > 0:
                    prev = _put_batch(prev, self.meshes[i])
                    inputs[i][m] = prev
                prev, stats[i] = self._fwds[i](params[i], stats[i], prev)
            feat_last = _put_batch(prev, self.meshes[-1])
            (loss_m, stats[-1]), (g_last, g_feat) = self._vg_last(
                params[-1], stats[-1], x_last, feat_last, y_m)
            accs[-1] = self._acc(accs[-1], g_last)
            losses.append(loss_m)
            cots[n - 2].append((m, _put_batch(g_feat, self.meshes[n - 2])))
            for i in range(n - 2, -1, -1):
                while cots[i] and cots[i][0][0] <= m - (n - 1 - i):
                    drain(i)
        # pipeline flush: ONE reverse-order pass drains everything (stage
        # i's drain feeds stage i-1's queue before the pass reaches it)
        for i in range(n - 2, -1, -1):
            while cots[i]:
                drain(i)
        assert not any(inputs), "pipeline flush left undrained backwards"

        # Global-norm clip needs the SUM of every stage's squared norm on
        # every stage's mesh: exchange n-1 scalars per stage over ICI (no
        # host round trip), then update each stage in place.
        sqs = [self._sqnorm(a) for a in accs]
        out: List[StageState] = []
        for j in range(n):
            other = None
            for i in range(n):
                if i == j:
                    continue
                s = jax.device_put(sqs[i], NamedSharding(self.meshes[j], P()))
                other = s if other is None else other + s
            out.append(self._update_fns[j](
                states[j].replace(batch_stats=stats[j]), accs[j],
                sqs[j], other))
        # Reported loss matches the fused trainer: mean UNSCALED microbatch
        # loss = mean(loss_m * M) = sum of the 1/M-scaled microbatch losses.
        loss = sum(losses)
        return out, loss

    # -- eval / checkpoint surface ------------------------------------------

    def merged_variables(self, states: Sequence[StageState]) -> Dict[str, Any]:
        return merge_variables([{"params": s.params,
                                 "batch_stats": s.batch_stats}
                                for s in states])

    def merged_ema_variables(self, states: Sequence[StageState]
                             ) -> Dict[str, Any]:
        return merge_variables([s.ema.variables for s in states])

    def merged_variables_on(self, states: Sequence[StageState], mesh: Any,
                            ema: bool = False, tp_min_features: int = 0,
                            ) -> Dict[str, Any]:
        """Merge stage variables ONTO a device mesh — device-to-device
        (ICI) transfers straight to the target sharding, never a host
        gather (merge_variables jax.device_get's every leaf; for the
        models PP exists for, the merged tree may not even fit one
        device's HBM, let alone make the per-epoch host round trip).

        tp_min_features > 0 places each leaf by core/mesh.py
        tensor_parallel_spec (model-axis channel sharding) so per-epoch
        eval runs TENSOR-PARALLEL on `mesh`; 0 replicates.
        """
        from jax.sharding import NamedSharding

        from cabinet_tpu.core.mesh import MODEL_AXIS, tensor_parallel_spec

        n_model = dict(mesh.shape).get(MODEL_AXIS, 1)

        def place(leaf):
            if tp_min_features and n_model > 1:
                spec = tensor_parallel_spec(np.shape(leaf), n_model,
                                            tp_min_features)
            else:
                spec = P()
            return jax.device_put(leaf, NamedSharding(mesh, spec))

        merged: Dict[str, Any] = {}
        for s in states:
            part = s.ema.variables if ema else {"params": s.params,
                                                "batch_stats": s.batch_stats}
            for coll, tree in part.items():
                merged.setdefault(coll, {}).update(
                    {k: jax.tree_util.tree_map(place, v)
                     for k, v in tree.items()})
        return merged


class PipelineTrainLoop:
    """Loader-batch adapter over CabinetPipeline for the train CLI.

    Contract match with the fused trainer's accumulation loop: one loader
    batch = one microbatch; ``feed`` buffers microbatches (as a LIST — no
    concatenate/re-slice round trip) and runs a pipeline step once
    ``pipe.M`` have arrived (returning the window's mean unscaled
    microbatch loss, comparable to the fused step's per-microbatch loss),
    else returns None; ``flush`` applies a trailing partial window with the
    1/M loss scale kept, exactly like make_flush_step (reference
    train.py:479-480).

    When the pipeline carries an aug_fn (on-device augmentation), ``feed``
    takes the loader's RAW batch tuple (e.g. (canvas, label_canvas, hw))
    and appends a per-microbatch PRNG key — folded from ``aug_key`` by a
    monotone microbatch counter, so every microbatch in a window draws
    fresh augmentation parameters.
    """

    def __init__(self, pipe: CabinetPipeline, states: List[StageState],
                 aug_key: Optional[jax.Array] = None) -> None:
        self.pipe = pipe
        self.states = states
        self.aug_key = aug_key
        self._micro: List[Tuple] = []
        self._mb_seen = 0

    def feed(self, *batch: Any) -> Optional[float]:
        if self.pipe.aug_fn is not None:
            if self.aug_key is None:
                raise ValueError("pipeline has aug_fn but no aug_key was "
                                 "given to PipelineTrainLoop")
            key = jax.random.fold_in(self.aug_key, self._mb_seen)
            self._micro.append(tuple(np.asarray(a) for a in batch) + (key,))
        else:
            self._micro.append((np.asarray(batch[0]), np.asarray(batch[1])))
        self._mb_seen += 1
        if len(self._micro) < self.pipe.M:
            return None
        return self._run_window()

    def flush(self) -> Optional[float]:
        if not self._micro:
            return None
        return self._run_window()

    def _run_window(self) -> float:
        micro, self._micro = self._micro, []
        self.states, loss = self.pipe.train_step_micro(self.states, micro)
        # train_step returns the sum of 1/M-scaled microbatch losses; the
        # mean UNSCALED microbatch loss (what the fused step logs) is x M/n.
        return float(loss) * self.pipe.M / len(micro)

    # Surfaces the train CLI reads off the fused TrainState.
    @property
    def variables(self) -> Dict[str, Any]:
        return self.pipe.merged_variables(self.states)

    @property
    def ema_variables(self) -> Dict[str, Any]:
        return self.pipe.merged_ema_variables(self.states)

    @property
    def step(self) -> int:
        return int(self.states[0].step)
