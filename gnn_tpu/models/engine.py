"""Host-side training engine: epoch loop, early stopping, history, metrics,
test reporting, LKO cross-validation, scalar/event logging.

Mirrors the reference BaseClass (GNN/GNN_BaseClass.py:17-459):
* train (:192-335): per-epoch batch loop, update_freq-gated Tr/Va evaluation,
  early stopping on any observed metric with min/max policy + best-weights
  snapshot/restore, history bookkeeping with 'Fail' / 'Best <metric> Va'.
* evaluate (:165-189): concatenated targets/outputs across batches, sklearn
  extra-metrics, mean iteration count and loss.
* test (:338-359): metrics + optional ROC / PRISOFS artifact export.
* LKO (:362-402): fresh copy per fold, train+test, metric collection.
* printHistory/saveHistory_csv/txt (:140-157).
* Scalar logging: reference TensorBoard writers (:428-459) become JSONL event
  files (host-side, dependency-free) with the same pretty metric names and
  namescope grouping; weight histograms become per-layer
  mean/std/min/max summaries.

Device work (forward/backward) lives in models/core.py; everything here is
orchestration and never enters jit.
"""

from __future__ import annotations

import json
import os
import shutil
from abc import ABC, abstractmethod
from typing import Optional

import jax
import numpy as np

from gnn_tpu import metrics as mt
from gnn_tpu.graphs.batch import GraphBatch
from gnn_tpu.graphs.graph import Graph

_PRETTY = {"Acc": "Accuracy", "Bacc": "Balanced Accuracy", "Ck": "Cohen's Kappa",
           "Js": "Jaccard Score", "Fs": "F1-Score", "Prec": "Precision Score",
           "Rec": "Recall Score", "Tpr": "TPR", "Tnr": "TNR", "Fpr": "FPR",
           "Fnr": "FNR", "Loss": "Loss", "It": "Iteration @ Convergence"}

_NAMESCOPES = {**{i: "Accuracy & Loss" for i in ["Acc", "Bacc", "It", "Loss"]},
               **{i: "F-Score, Precision and Recall" for i in ["Fs", "Prec", "Rec"]},
               **{i: "Positive and Negative Rates" for i in ["Tpr", "Tnr", "Fpr", "Fnr"]},
               **{i: "Other Scores" for i in ["Ck", "Js"]}}


class ScalarWriter:
    """Scalar/weight event writer with two backends (GNN_BaseClass.py:428-459):

    * JSONL (always on): one file per writer, one JSON object per event —
      the dependency-free machine-readable log.
    * TensorBoard event files (default on, `tb=False` to disable): real
      `events.out.tfevents.*` records in a run directory next to the JSONL
      file, so `tensorboard --logdir writer` shows the same scalars and
      per-layer weight/bias histograms the reference's README documents
      (README.md:95-98). Written by the pure-Python encoder in
      training/tb_events.py — no TF dependency.
    """

    def __init__(self, path: str, tb: bool = True):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self.tb = None
        if tb:
            from gnn_tpu.training.tb_events import TBEventFile
            rundir = path[:-6] if path.endswith(".jsonl") else path + ".tb"
            self.tb = TBEventFile(rundir)

    def write_scalars(self, metrics: dict, step: int) -> None:
        if not isinstance(metrics, dict):
            raise TypeError("type of param <metrics> must be dict")
        with open(self.path, "a") as f:
            for k, v in metrics.items():
                f.write(json.dumps({"step": step, "scope": _NAMESCOPES.get(k, "Other Scores"),
                                    "name": _PRETTY.get(k, k), "value": float(v)}) + "\n")
        if self.tb is not None:
            for k, v in metrics.items():
                scope = _NAMESCOPES.get(k, "Other Scores")
                self.tb.scalar(f"{scope}/{_PRETTY.get(k, k)}", float(v), step)
            self.tb.flush()

    def write_weights(self, namespace: str, net_name: str, leaves: list, step: int) -> None:
        """Per-layer weight summaries: JSONL moments + TB histograms, scoped
        '<namespace>: Weights|Biases / <net> <layer>' like the reference's
        name_scope layout (GNN_BaseClass.py:448-459)."""
        with open(self.path, "a") as f:
            for name, arr in leaves:
                a = np.asarray(arr)
                f.write(json.dumps({
                    "step": step, "scope": f"{namespace}: {net_name}", "name": name,
                    "mean": float(a.mean()), "std": float(a.std()),
                    "min": float(a.min()), "max": float(a.max())}) + "\n")
        if self.tb is not None:
            kinds = (("['w']", "Weights"), ("['gamma']", "Weights"),
                     ("['b']", "Biases"), ("['beta']", "Biases"))
            for name, arr in leaves:
                for suffix, kind in kinds:
                    if name.endswith(suffix):
                        scope = f"{namespace}: {kind}"
                        stem = name[:-len(suffix)]
                        break
                else:
                    scope, stem = f"{namespace}: Params", name
                layer = stem.replace("']['", "/").strip("[]'") or net_name
                self.tb.histogram(f"{scope}/{net_name} {layer}", np.asarray(arr), step)
            self.tb.flush()

    def close(self) -> None:
        if self.tb is not None:
            self.tb.close()


class BaseModel(ABC):
    """Abstract engine; concrete models define the device computation."""

    def __init__(self, optimizer, loss_function, loss_arguments: Optional[dict],
                 addressed_problem: str, extra_metrics: Optional[dict] = None,
                 extra_metrics_arguments: Optional[dict] = None,
                 path_writer: str = "writer/", namespace: str = "GNN") -> None:
        from gnn_tpu.training.optimizers import optimizer_config
        if addressed_problem not in ("c", "r"):
            raise ValueError("param <addressed_problem> not in ['c','r']")
        if not isinstance(extra_metrics, (dict, type(None))):
            raise TypeError("type of param <extra_metrics> must be None or dict")

        if isinstance(optimizer, str):
            optimizer = optimizer_config(optimizer)
        self.optimizer_config = optimizer
        self.loss_function = loss_function
        self.loss_args = dict() if loss_arguments is None else dict(loss_arguments)
        self.addressed_problem = addressed_problem
        self.extra_metrics = dict() if extra_metrics is None else extra_metrics
        self.mt_args = dict() if extra_metrics_arguments is None else extra_metrics_arguments

        if path_writer[-1] != "/":
            path_writer += "/"
        if not isinstance(namespace, list):
            namespace = [namespace]
        if os.path.exists(path_writer):
            shutil.rmtree(path_writer)
        self.path_writer = path_writer
        self.namespace = namespace
        self.history = dict()

    # ------------------------------------------------------------- abstract
    @abstractmethod
    def copy(self, *, path_writer: str = "", namespace: str = "", copy_weights: bool = True):
        ...

    @abstractmethod
    def save(self, path: str) -> None:
        ...

    @classmethod
    @abstractmethod
    def load(cls, path: str, path_writer: Optional[str] = None,
             namespace: Optional[str] = None, extra_metrics: Optional[dict] = None,
             extra_metrics_arguments: Optional[dict] = None):
        ...

    @abstractmethod
    def get_weights(self):
        """(weights_state, weights_output) — lists with one entry per layer."""
        ...

    @abstractmethod
    def set_weights(self, weights_state, weights_output) -> None:
        ...

    @abstractmethod
    def evaluate_single_graph(self, gb: GraphBatch, training: bool) -> tuple:
        """Returns (iters, loss, targets_sel, out_sel) with host numpy rows
        already filtered to selected (real) targets."""
        ...

    @abstractmethod
    def training_step(self, gb: GraphBatch, mean: bool) -> None:
        ...

    def training_step_dp(self, batches, mean: bool, mesh, axis: str = "data") -> None:
        """One data-parallel optimizer step over len(batches) == mesh[axis]
        equal-shape GraphBatches (train(mesh=...) entry point)."""
        raise NotImplementedError(
            f"{type(self).__name__} does not implement data-parallel training")

    def _shard_for(self, gb: GraphBatch, mesh, axis: str, strategy: str):
        """Place one batch for sharded-propagation training
        (train(mesh=..., mesh_strategy='edge'|'node')). GNN* and LGNN both
        override with edge- and node-sharded placements."""
        raise NotImplementedError(
            f"{type(self).__name__} does not implement {strategy}-sharded "
            f"training")

    def training_step_sharded(self, gb_sharded, mean: bool, mesh, axis: str,
                              strategy: str) -> None:
        raise NotImplementedError(
            f"{type(self).__name__} does not implement {strategy}-sharded "
            f"training")

    @abstractmethod
    def _weight_summaries(self):
        """[(namespace, net_name, [(leaf_name, array), ...]) ...] for logging."""
        ...

    # ------------------------------------------------------------- history
    def printHistory(self) -> None:
        from pandas import DataFrame
        print("\n", DataFrame(self.history), end="\n\n")

    def saveHistory_csv(self, path: str) -> None:
        from pandas import DataFrame
        if path[-4:] != ".csv":
            path += ".csv"
        DataFrame(self.history).to_csv(path, index=False)

    def saveHistory_txt(self, path: str) -> None:
        from pandas import DataFrame
        if path[-4:] != ".txt":
            path += ".txt"
        with open(path, "w") as txt:
            txt.write(DataFrame(self.history).to_string(index=False))

    # ------------------------------------------------------------ checktype
    def checktype(self, elem) -> Optional[list]:
        """Coerce Graph/GraphBatch or list thereof to list[GraphBatch]
        (reference GNN_BaseClass.py:413-425). Batch lists are re-padded onto a
        common shape bucket so the training step compiles once."""
        if elem is None:
            return None
        if isinstance(elem, GraphBatch):
            return [elem]
        if isinstance(elem, Graph):
            return [self.to_batch(elem)]
        if isinstance(elem, (list, tuple)) and all(isinstance(g, (Graph, GraphBatch)) for g in elem):
            out = [self.to_batch(g) if isinstance(g, Graph) else g for g in elem]
            if (len(out) > 1 and len({b.pad_shapes() for b in out}) > 1
                    and all(b.adj_blocks is None for b in out)):
                # blocked batches are fixed-shape (harmonise at build time via
                # from_graphs_blocked(min_blocks=..., edge_pad=..., target_pad=...))
                np_, ep_, tp_ = (max(s) for s in zip(*(b.pad_shapes() for b in out)))
                out = [b.repad(np_, ep_, tp_) for b in out]
            return out
        raise TypeError("Error - <gTr> and/or <gVa> are not Graph/GraphBatch or "
                        "LIST/TUPLE of Graphs/GraphBatches")

    def to_batch(self, g: Graph) -> GraphBatch:
        return GraphBatch.from_graph(g)

    # ------------------------------------------------------------- evaluate
    def evaluate(self, g) -> tuple:
        """Metrics over a graph list (GNN_BaseClass.py:165-189)."""
        g = self.checktype(g)
        iters, losses, targets, outs = zip(
            *[self.evaluate_single_graph(b, training=False) for b in g])
        # flatten per-layer iteration lists (LGNN) before averaging
        flat_iters = []
        for it in iters:
            flat_iters.extend(it if isinstance(it, (list, tuple)) else [it])
        targets = np.concatenate(targets, axis=0)
        y_score = np.concatenate(outs, axis=0)
        if self.addressed_problem == "c":
            y_true = np.argmax(targets, axis=1)
            y_pred = np.argmax(y_score, axis=1)
        else:
            y_true, y_pred = targets, y_score
        metrics = {k: self.extra_metrics[k](y_true, y_pred, **self.mt_args.get(k, dict()))
                   for k in self.extra_metrics}
        metrics = {k: float(np.mean(metrics[k])) for k in metrics}
        metrics["It"] = int(np.mean(flat_iters))
        metrics["Loss"] = float(np.mean(losses))
        return metrics, y_true, y_pred, targets, y_score

    # ---------------------------------------------------------------- train
    def train(self, gTr, epochs: int, gVa=None, update_freq: int = 10,
              max_fails: int = 10, observed_metric: str = "Loss", policy: str = "min",
              *, mean: bool = True, verbose: int = 3,
              profile_dir: Optional[str] = None,
              nan_policy: str = "none", mesh=None,
              mesh_axis: Optional[str] = None,
              mesh_strategy: str = "data") -> None:
        """:param profile_dir: when set, capture a jax.profiler trace of the
        first epoch's batch loop into this directory (SURVEY.md §5 tracing).
        :param nan_policy: divergence guard, checked at every update_freq
        evaluation (free — no extra device work). 'none' keeps the
        reference's behavior (NaNs propagate); 'raise' raises
        FloatingPointError on a non-finite training loss; 'restore' stops
        training and restores the last good weights (best-validation
        weights when gVa is given, else the pre-training snapshot).
        :param mesh: jax.sharding.Mesh — train across mesh[mesh_axis] using
        mesh_strategy:
          'data' (default axis 'data'): each step consumes that many batches
          (one per device), per-replica grads are pmean-ed over ICI and one
          replicated update applies (the synchronous-large-batch analogue of
          the sequential per-batch updates); len(gTr) must divide evenly.
          'edge' / 'node' (default axis 'graph'): the reference's sequential
          per-batch updates, but each batch's propagation is sharded across
          the devices (per-iteration partial-aggregation psum / all_gather
          owner-computes — parallel/edge_shard.py, node_shard.py; for graphs
          too large for one chip). All strategies' steps are exactness-tested
          vs the single-device step. Evaluation stays single-device."""
        if verbose not in range(4):
            raise ValueError("param <verbose> not in [0,1,2,3]")
        if nan_policy not in ("none", "raise", "restore"):
            raise ValueError("param <nan_policy> not in ['none', 'raise', 'restore']")
        if mesh_strategy not in ("data", "edge", "node"):
            raise ValueError("param <mesh_strategy> not in ['data', 'edge', 'node']")
        mesh_axis = mesh_axis or ("data" if mesh_strategy == "data" else "graph")

        def update_history(name, val):
            if name not in ("Tr", "Va"):
                raise TypeError("param <name> must be 'Tr' or 'Va'")
            for key in val:
                self.history[f"{key} {name}"].append(val[key])

        def reset_validation(new_best):
            wst, wout = self.get_weights()
            return new_best, 0, wst, wout

        from gnn_tpu.graphs.generator import (GraphDataGenerator,
                                              SingleGraphDataGenerator)
        generator = None
        if isinstance(gTr, (GraphDataGenerator, SingleGraphDataGenerator)):
            generator = gTr          # re-iterated each epoch (fresh shuffle)
            gTr = self.checktype(list(generator))
        else:
            gTr = self.checktype(gTr)
        gVa = self.checktype(gVa)

        from gnn_tpu.config import warmup_transfers
        warmup_transfers(verbose=verbose > 0)

        if not self.history:
            keys = ["Epoch"] + [i + j for i in ["It", "Loss"] + list(self.extra_metrics)
                                for j in ([" Tr", " Va"] if gVa else [" Tr"])]
            if gVa:
                keys += ["Fail", f"Best {observed_metric} Va"]
            self.history.update({i: list() for i in keys})
            os.makedirs(self.path_writer, exist_ok=True)

        netS_writer = ScalarWriter(f"{self.path_writer}Net - State.jsonl")
        netO_writer = ScalarWriter(f"{self.path_writer}Net - Output.jsonl")
        training_writer = ScalarWriter(f"{self.path_writer}Training.jsonl")
        if gVa:
            assert policy in ("min", "max")
            best_valid_key = f"Best {observed_metric} Va"
            policy_function, valid_new = (np.less, 1e30) if policy == "min" else (np.greater, -1e30)
            if self.history.get(best_valid_key):
                valid_new = self.history[best_valid_key][-1]
            valid_best, valid_fails, ws, wo = reset_validation(valid_new)
            validation_writer = ScalarWriter(f"{self.path_writer}Validation.jsonl")

        if nan_policy == "restore" and not gVa:
            guard_ws, guard_wo = self.get_weights()

        initial_epoch = self.history["Epoch"][-1] + 1 if self.history["Epoch"] else 0
        epochs += initial_epoch

        import time as _time
        edges_per_epoch = sum(int(b.n_real[1]) for b in gTr)

        e = initial_epoch
        gTr_sh = None
        try:
          for e in range(initial_epoch, epochs):
              profiling = profile_dir and e == initial_epoch
              if profiling:
                  import jax.profiler
                  jax.profiler.start_trace(profile_dir)
              if generator is not None and e > initial_epoch:
                  gTr = self.checktype(list(generator))
                  gTr_sh = None
              _t0 = _time.perf_counter()
              if mesh is not None and mesh_strategy in ("edge", "node"):
                  # reference's sequential per-batch updates, each batch's
                  # propagation sharded across the mesh; the sharded
                  # placements are built once and reused every epoch
                  if gTr_sh is None:
                      gTr_sh = [self._shard_for(b, mesh, mesh_axis,
                                                mesh_strategy) for b in gTr]
                  for i, elem in enumerate(gTr_sh):
                      self.training_step_sharded(elem, mean=mean, mesh=mesh,
                                                 axis=mesh_axis,
                                                 strategy=mesh_strategy)
                      if verbose > 2:
                          print(f" > Epoch {e:4d}/{epochs} \t\t> Batch "
                                f"{i + 1:4d}/{len(gTr)}", end="\r")
              elif mesh is not None:
                  n_dev = mesh.shape[mesh_axis]
                  if len(gTr) % n_dev:
                      raise ValueError(
                          f"data-parallel training needs len(gTr) divisible by "
                          f"mesh[{mesh_axis!r}]={n_dev}, got {len(gTr)} batches "
                          f"— regroup with utils.getbatches or drop the tail")
                  for i in range(0, len(gTr), n_dev):
                      self.training_step_dp(gTr[i:i + n_dev], mean=mean,
                                            mesh=mesh, axis=mesh_axis)
                      if verbose > 2:
                          print(f" > Epoch {e:4d}/{epochs} \t\t> Batch "
                                f"{i + n_dev:4d}/{len(gTr)}", end="\r")
              else:
                  for i, elem in enumerate(gTr):
                      self.training_step(elem, mean=mean)
                      if verbose > 2:
                          print(f" > Epoch {e:4d}/{epochs} \t\t> Batch {i + 1:4d}/{len(gTr)}", end="\r")
              _dt = _time.perf_counter() - _t0
              # per-epoch throughput counter (BASELINE.md north-star metric)
              training_writer.write_scalars(
                  {"EpochSeconds": _dt, "EdgesPerSecond": edges_per_epoch / max(_dt, 1e-9)}, e)
              if profiling:
                  import jax.profiler
                  jax.profiler.stop_trace()

              if e % update_freq == 0:
                  metricsTr, *_ = self.evaluate(gTr)
                  self.history["Epoch"].append(e)
                  update_history("Tr", metricsTr)
                  training_writer.write_scalars(metricsTr, e)
                  for ns, net, leaves in self._weight_summaries():
                      (netS_writer if net == "N1" else netO_writer).write_weights(ns, net, leaves, e)
                  tr_nonfinite = not np.isfinite(metricsTr["Loss"])

              if (e % update_freq == 0) and gVa:
                  metricsVa, *_ = self.evaluate(gVa)
                  valid_new = metricsVa[observed_metric]
                  if policy_function(valid_new, valid_best):
                      valid_best, valid_fails, ws, wo = reset_validation(valid_new)
                  else:
                      valid_fails += 1
                  self.history[best_valid_key].append(valid_best)
                  self.history["Fail"].append(valid_fails)
                  update_history("Va", metricsVa)
                  validation_writer.write_scalars(metricsVa, e)
                  if valid_fails >= max_fails:
                      if verbose in (1, 3):
                          self.printHistory()
                      print("\r Validation Stop")
                      break

              # divergence guard — checked AFTER the validation block so a
              # stop/raise never leaves history lists with unequal lengths
              if (e % update_freq == 0) and nan_policy != "none" and tr_nonfinite:
                  msg = f"non-finite training loss at epoch {e}"
                  if nan_policy == "raise":
                      raise FloatingPointError(msg)
                  if not gVa:   # with gVa the post-loop best-restore runs
                      self.set_weights(guard_ws, guard_wo)
                  if verbose > 0:
                      which = ("best-validation" if gVa else "pre-training")
                      print(f"\r Divergence Stop ({msg}; {which} weights "
                            f"restored)")
                  break

              if (e % update_freq == 0) and verbose in (1, 3):
                  self.printHistory()
          else:
              if verbose > 0:
                  print("\r End of Epochs Stop")

          if gVa:
              self.set_weights(ws, wo)

          for ns, net, leaves in self._weight_summaries():
              (netS_writer if net == "N1" else netO_writer).write_weights(ns, net, leaves, e)
        finally:
            # close the TB event files even when a device error / interrupt
            # aborts the epoch loop (handles otherwise leak until GC)
            for w in (netS_writer, netO_writer, training_writer):
                w.close()
            if gVa:
                validation_writer.close()

    # ----------------------------------------------------------------- test
    def test(self, gTe, *, rocdir: str = "", micro_and_macro: bool = False,
             prisofsdir: str = "", pos_label=0) -> dict:
        gTe = self.checktype(gTe)
        metricsTe, y_true, y_pred, targets, y_score = self.evaluate(gTe)
        if rocdir:
            mt.ROC(targets, y_score, rocdir, micro_and_macro, pos_label=pos_label)
        if prisofsdir:
            mt.PRISOFS(targets, y_score, prisofsdir, pos_label=pos_label)
        return metricsTe

    # ------------------------------------------------------------ checkpoint
    def save_checkpoint(self, path: str) -> None:
        """Full training-state checkpoint: params + BN + optimizer slots +
        history + rng (training/checkpoint.py). Unlike save(), training resumes
        bit-exactly (optimizer momentum preserved)."""
        from gnn_tpu.training.checkpoint import save_checkpoint
        save_checkpoint(path, params=self._ckpt_params(), bn=self._ckpt_bn(),
                        opt_state=self.opt_state, history=self.history,
                        rng=self._rng)

    def load_checkpoint(self, path: str) -> None:
        """Restore a save_checkpoint folder into this model in place."""
        from gnn_tpu.training.checkpoint import load_checkpoint
        params, bn, opt_state, history, rng, _ = load_checkpoint(
            path, params_like=self._ckpt_params(), bn_like=self._ckpt_bn(),
            opt_state_like=self.opt_state)
        self._ckpt_restore(params, bn)
        self.opt_state = opt_state
        self.history = history
        if rng is not None:
            self._rng = rng

    def _ckpt_params(self):
        return self.params

    def _ckpt_bn(self):
        return self.bn

    def _ckpt_restore(self, params, bn) -> None:
        self.params, self.bn = params, bn

    # ------------------------------------------------------------------ LKO
    def LKO(self, batches, epochs: int = 500, training_mode=None, update_freq: int = 10,
            max_fails: int = 10, observed_metric: str = "Loss", policy: str = "min",
            mean: bool = True, verbose: int = 3) -> dict:
        metrics = {i: list() for i in list(self.extra_metrics) + ["It", "Loss"]}
        kwargs = dict()
        if training_mode:
            kwargs["training_mode"] = training_mode

        number_of_batches = len(batches[0])
        for i, (gTr, gTe, gVa) in enumerate(zip(*batches)):
            print(f"\nBATCH K-OUT {i + 1}/{number_of_batches}")
            temp = self.copy(copy_weights=False, path_writer=f"{self.path_writer}{i}",
                             namespace=f"Batch {i + 1}-{number_of_batches}")
            temp.train(gTr, epochs, gVa, update_freq, max_fails, observed_metric,
                       policy, mean=mean, verbose=verbose, **kwargs)
            res = temp.test(gTe)
            for m in res:
                metrics[m].append(res[m])
            if verbose > 1:
                from pandas import DataFrame
                print(f"\nRESULTS BATCH {i + 1}/{number_of_batches}\n",
                      DataFrame(res, index=["res"]).transpose())
        return metrics


# -------------------------------------------------------------- param (de)ser
def tree_to_npz(path: str, tree) -> None:
    """Save a pytree of arrays as one .npz (keys = tree paths)."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_leaves_with_path(tree):
        flat[jax.tree_util.keystr(kp)] = np.asarray(leaf)
    np.savez(path, **flat)


def tree_from_npz(path: str, like):
    """Load a pytree saved with tree_to_npz, shaped like `like`."""
    data = np.load(path)
    leaves_kp = jax.tree_util.tree_leaves_with_path(like)
    new_leaves = [data[jax.tree_util.keystr(kp)] for kp, _ in leaves_kp]
    treedef = jax.tree_util.tree_structure(like)
    import jax.numpy as jnp
    return jax.tree_util.tree_unflatten(treedef, [jnp.asarray(x) for x in new_leaves])
