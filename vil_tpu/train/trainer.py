"""Experiment orchestration (reference /root/reference/src/run_experiment.py
+ engine.py loops), TPU-native.

One ``Trainer`` builds data/model/criterion/optimizer/mesh from a config and
runs the epoch loop with the reference's training-strategy details:

* VIL random-shift mode until ``VIL_MODE_SWITCH · EPOCHS``, then full mode
  (run_experiment.py:223-230) — realized as two cached jit programs;
* performer feature redraw every ``1 + 5·epoch`` steps
  (run_experiment.py:217-221);
* plateau LR drop for sgd/qhm when OPTIM.VAL and no improvement
  (run_experiment.py:253-260) — an lr-scale multiplier held in the optimizer
  state;
* best-checkpoint tracking + final best-ckpt eval (run_experiment.py:264-279).
"""
from __future__ import annotations

import logging
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import parallel
from ..parallel import collectives
from ..data import make_epoch_data_loader, mixup_from_cfg
from ..models import build_model
from ..utils.checkpoint import Checkpointer
from ..utils.metric_logger import TensorboardLogger
from ..utils.misc import mkdir, save_config, set_seed
from . import engine
from .loss import get_criterion
from .optim import get_opt
from .redraw import RedrawSchedule, redraw_projections
from .schedulers import get_lr_schedule

logger = logging.getLogger(__name__)


def lr_scalable(tx: optax.GradientTransformation) -> optax.GradientTransformation:
    """Wrap an optimizer with a runtime lr multiplier (plateau drops)."""

    def init(params):
        return {"inner": tx.init(params), "lr_scale": jnp.float32(1.0)}

    def update(grads, state, params=None):
        updates, inner = tx.update(grads, state["inner"], params)
        scale = state["lr_scale"]
        updates = jax.tree_util.tree_map(lambda u: u * scale, updates)
        return updates, {"inner": inner, "lr_scale": scale}

    return optax.GradientTransformation(init, update)


def _host_rows(arr) -> np.ndarray:
    """Rows of a batch-sharded device array owned by THIS host, in local
    order (multi-host eval: each host keeps only its own per-image scores —
    no cross-host replication; reference gathers all results to rank 0 via
    pickled ByteTensors, comm.py:47-140)."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    shards = sorted(
        arr.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards])


def drop_lr(state: engine.TrainState, factor: float) -> engine.TrainState:
    opt_state = dict(state.opt_state)
    opt_state["lr_scale"] = opt_state["lr_scale"] / factor
    return state.replace(opt_state=opt_state)


class Trainer:
    def __init__(self, cfg, mesh=None):
        self.cfg = cfg
        set_seed(cfg.TPU.SEED, jax.process_index())
        if cfg.SOLVER.DETECT_ANOMALY:
            # reference: torch.autograd.set_detect_anomaly
            # (run_experiment.py:233); TPU equivalent: nan-checking jit
            jax.config.update("jax_debug_nans", True)
        self.mesh = mesh if mesh is not None else parallel.mesh_from_cfg(cfg)
        self.model = build_model(cfg, mesh=self.mesh)
        self.mixup_fn = mixup_from_cfg(cfg)
        self.criterion = get_criterion(cfg, train=True)
        self.criterion_eval = get_criterion(cfg, train=False)

        # data: shard the dataset across hosts in multi-host runs
        is_distributed = jax.process_count() > 1
        self.testloaders = make_epoch_data_loader(
            cfg, is_train=False, drop_last=False, is_distributed=is_distributed
        )
        self.trainloader = None
        if not cfg.EVALUATE:
            # the batch is sharded over the 'data' axis only (model/spatial
            # axes replicate or split other dims), so divisibility is
            # against that axis — not the full device count
            axes = dict(self.mesh.shape)
            n_data = int(axes.get("data", self.mesh.devices.size))
            if cfg.DATALOADER.BSZ % n_data != 0:
                raise ValueError(
                    f"DATALOADER.BSZ ({cfg.DATALOADER.BSZ}) must be divisible "
                    f"by the 'data' mesh axis size ({n_data}) for training "
                    f"(eval pads ragged batches; the train loop does not)"
                )
            self.trainloader = make_epoch_data_loader(
                cfg, is_train=True, is_distributed=is_distributed
            )
            if cfg.SOLVER.STEPS_PER_EPOCH == 0:
                was_frozen = cfg.is_frozen()
                if was_frozen:
                    cfg.defrost()
                cfg.SOLVER.STEPS_PER_EPOCH = len(self.trainloader)
                cfg.SOLVER.MAX_ITER = len(self.trainloader) * cfg.OPTIM.EPOCHS
                if was_frozen:
                    cfg.freeze()

        # model state
        rng = jax.random.PRNGKey(cfg.TPU.SEED)
        sample = jnp.zeros(
            (1, cfg.INPUT.IMAGE_SIZE, cfg.INPUT.IMAGE_SIZE, 3), jnp.float32
        )
        init_state = engine.create_train_state(
            self.model, optax.identity(), rng, sample
        )
        self.lr_schedule = get_lr_schedule(cfg) or cfg.OPTIM.LR
        self.tx = lr_scalable(get_opt(cfg, init_state.params, lr=self.lr_schedule))
        self.state = init_state.replace(opt_state=self.tx.init(init_state.params))
        if cfg.TPU.PARAM_SHARDING == "fsdp":
            self.state_shardings = parallel.fsdp_sharding(self.mesh, self.state)
            self.state = parallel.shard_like(self.state, self.state_shardings)
        elif cfg.TPU.PARAM_SHARDING == "tp":
            # Megatron-style tensor parallelism over the 'model' mesh axis
            # (TPU.MESH_AXES must declare one): QKV/fc1 column-sharded,
            # proj/fc2 row-sharded, one GSPMD all-reduce per block.
            if "model" not in dict(self.mesh.shape):
                raise ValueError(
                    "PARAM_SHARDING 'tp' needs a 'model' axis in TPU.MESH_AXES"
                )
            self.state_shardings = parallel.tp_sharding(self.mesh, self.state)
            self.state = parallel.shard_like(self.state, self.state_shardings)
        else:
            self.state_shardings = None
            self.state = parallel.replicate(self.mesh, self.state)

        # checkpointing
        self.checkpointer = Checkpointer(
            save_dir=cfg.OUTPUT_DIR,
            arch=cfg.MODEL.VIT.MSVIT.ARCH,
            only_save_last=bool(cfg.ONLY_SAVE_LAST),
            is_test=cfg.EVALUATE,
            data_dir=cfg.DATA.DATA_DIR,
            backend=cfg.CKPT_BACKEND,
        )
        self.state, header = self.checkpointer.load(
            self.state, cfg.MODEL.MODEL_PATH, resume=not cfg.EVALUATE
        )
        self.start_epoch = int(header.get("epoch", 0))
        self.best_acc = float(header.get("best_acc", 0.0))

        # jitted steps (built lazily, cached per random_shift flag)
        self._train_steps: dict[bool, Any] = {}
        self._eval_step = None
        self.redraw_schedule = RedrawSchedule()
        self._step_rng = jax.random.PRNGKey(cfg.TPU.SEED + 1)

    # ------------------------------------------------------------------
    def _get_train_step(self, random_shift: bool):
        if random_shift not in self._train_steps:
            step = engine.make_train_step(
                self.model, self.criterion, self.tx,
                random_shift=random_shift, mixup_fn=self.mixup_fn,
                per_layer_modes=bool(self.cfg.TPU.MODE_PER_LAYER),
            )
            self._train_steps[random_shift] = parallel.mesh.lockstep_compile(
                parallel.jit_train_step(
                    step, self.mesh, donate_state=False,
                    state_shardings=self.state_shardings,
                )
            )
        return self._train_steps[random_shift]

    def _get_eval_step(self):
        if self._eval_step is None:
            target_valid = overlap = None
            if self.cfg.DATA.TARGETMAP:
                import json

                with open(self.cfg.DATA.TARGETMAP) as f:
                    raw = json.load(f)
                tmap = {int(k): [int(c) for c in v] for k, v in raw.items()}
                target_valid, overlap = engine.build_target_map_arrays(
                    tmap, max(tmap) + 1, self.cfg.DATA.NUM_CLASSES
                )
            from .loss import get_per_sample_criterion

            estep = engine.make_eval_step(
                self.model, self.criterion_eval, target_valid, overlap,
                return_scores=bool(self.cfg.EVALUATE)
                or bool(self.cfg.OUTPUT_PERCLASS_ACC),
                per_sample_criterion=get_per_sample_criterion(self.cfg),
                # per-image predictions for results_*.npz (reference
                # results.pth, engine.py:264-268)
                pred_topk=5 if self.cfg.EVALUATE else 0,
            )
            # keep tp/fsdp param shardings at eval time (don't all-gather
            # the model to every chip)
            var_shardings = None
            if self.state_shardings is not None:
                var_shardings = {"params": self.state_shardings.params}
                if self.state.buffers:
                    var_shardings.update(self.state_shardings.buffers)
            self._eval_step = parallel.mesh.lockstep_compile(
                parallel.jit_eval_step(
                    estep, self.mesh, variables_shardings=var_shardings
                )
            )
        return self._eval_step

    def _random_shift_active(self, epoch: int) -> bool:
        cfg = self.cfg
        if cfg.MODEL.VIT.MSVIT.ATTN_TYPE.startswith("longformer"):
            switch = cfg.MODEL.VIT.MSVIT.VIL_MODE_SWITCH * cfg.OPTIM.EPOCHS
            return cfg.MODEL.VIT.MSVIT.MODE > 0 and epoch < switch
        return False

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int, meters: Optional[TensorboardLogger] = None):
        cfg = self.cfg
        self.trainloader.sampler.set_epoch(epoch)
        train_step = self._get_train_step(self._random_shift_active(epoch))
        is_performer = cfg.MODEL.VIT.MSVIT.ATTN_TYPE == "performer"
        if is_performer:
            self.redraw_schedule.set_epoch(epoch)
        log_freq = max(1, cfg.LOG_FREQ)
        t_end = time.time()
        for i, (images, targets) in enumerate(self.trainloader):
            data_time = time.time() - t_end
            if is_performer and self.redraw_schedule.should_redraw():
                self._step_rng, sub = jax.random.split(self._step_rng)
                self.state = self.state.replace(
                    buffers=redraw_projections(self.state.buffers, sub)
                )
            # images take the image sharding (height over a 'spatial' axis
            # when the mesh declares one); labels stay batch-sharded
            images = parallel.shard_batch(
                self.mesh, jnp.asarray(images),
                sharding=parallel.mesh.image_sharding(self.mesh),
            )
            targets = parallel.shard_batch(self.mesh, jnp.asarray(targets))
            self.state, metrics = train_step(
                self.state, images, targets, self._step_rng
            )
            batch_time = time.time() - t_end
            t_end = time.time()
            if i % log_freq == 0:
                host = {k: float(v) for k, v in metrics.items()}
                lr = (
                    float(self.lr_schedule(int(self.state.step)))
                    if callable(self.lr_schedule) else self.lr_schedule
                )
                if meters is not None:
                    meters.update(
                        int(self.state.step), data_time=data_time,
                        batch_time=batch_time, learning_rate=lr, **host,
                    )
                logger.info(
                    "epoch %d it %d/%d loss %.4f lr %.2e %s",
                    epoch, i, len(self.trainloader), host.get("loss", 0), lr,
                    " ".join(f"{k} {v:.2f}" for k, v in host.items() if k != "loss"),
                )

    def validate(self, loader, meters=None, global_step: int = 0,
                 save_results: Optional[str] = None) -> float:
        eval_step = self._get_eval_step()
        variables = self.state.variables()
        totals = {"loss": 0.0, "top1_sum": 0.0, "top5_sum": 0.0, "count": 0.0}
        nbatch = 0
        collect = bool(self.cfg.EVALUATE) or bool(self.cfg.OUTPUT_PERCLASS_ACC)
        all_scores, all_targets = [], []
        all_idxs, all_pred_ids, all_pred_scores = [], [], []
        n_dev = int(self.mesh.devices.size)
        # per-image results need each sample's dataset index; our DataLoader
        # can yield them directly, otherwise fall back to a running offset
        # (sequential eval order)
        if collect and hasattr(loader, "return_indices"):
            loader.return_indices = True
        offset = 0
        for batch in loader:
            if len(batch) == 3:
                images, targets_np, idxs_np = batch
            else:
                images, targets_np = batch
                idxs_np = np.arange(offset, offset + len(targets_np))
            offset += len(targets_np)
            nreal = len(targets_np)
            (images, targets_pad), valid = parallel.mesh.pad_batch(
                [images, targets_np], n_dev
            )
            images = parallel.shard_batch(
                self.mesh, jnp.asarray(images),
                sharding=parallel.mesh.image_sharding(self.mesh),
            )
            targets = parallel.shard_batch(self.mesh, jnp.asarray(targets_pad))
            valid = parallel.shard_batch(self.mesh, jnp.asarray(valid))
            m = eval_step(variables, images, targets, valid)
            for k in totals:
                totals[k] += float(m[k])
            nbatch += 1
            if collect and "scores" in m:
                all_scores.append(_host_rows(m["scores"])[:nreal])
                all_targets.append(np.asarray(targets_np))
                all_idxs.append(np.asarray(idxs_np))
                if "pred_ids" in m:
                    all_pred_ids.append(_host_rows(m["pred_ids"])[:nreal])
                    all_pred_scores.append(_host_rows(m["pred_scores"])[:nreal])
        top1 = 100.0 * totals["top1_sum"] / max(totals["count"], 1)
        top5 = 100.0 * totals["top5_sum"] / max(totals["count"], 1)
        loss = totals["loss"] / max(nbatch, 1)
        from ..utils.profiling import peak_memory_mb

        logger.info(
            "eval: top1 %.3f top5 %.3f loss %.4f (%d images, peak HBM %.0f MB)",
            top1, top5, loss, int(totals["count"]), peak_memory_mb(),
        )
        if collect and all_scores:
            scores = np.concatenate(all_scores)
            targets_cat = np.concatenate(all_targets)
            indices = np.concatenate(all_idxs) if all_idxs else None
            pred_ids = np.concatenate(all_pred_ids) if all_pred_ids else None
            pred_scores = (
                np.concatenate(all_pred_scores) if all_pred_scores else None
            )
            if jax.process_count() > 1:
                # multi-host: every host holds only its own sampler shard's
                # rows — gather them on the master and dedupe the
                # DistributedSampler padding, matching the reference's
                # pickled gather_on_master of results_dict
                # (engine.py:264-268, comm.py:90-140). ALL hosts must enter
                # the collective; non-masters are done afterwards.
                merged = collectives.gather_on_master(
                    {
                        "scores": scores, "targets": targets_cat,
                        "indices": indices, "pred_ids": pred_ids,
                        "pred_scores": pred_scores,
                    }
                )
                if merged is None:  # non-master host
                    if meters is not None:
                        meters.update(global_step, top1=top1, top5=top5,
                                      loss=loss)
                    return top1
                cat = {
                    k: np.concatenate([d[k] for d in merged])
                    for k in merged[0]
                    if merged[0][k] is not None
                }
                if "indices" in cat:
                    # keep one row per dataset index (shards are padded by
                    # wrapping, so duplicates are identical rows)
                    _, first = np.unique(cat["indices"], return_index=True)
                    cat = {k: v[first] for k, v in cat.items()}
                scores = cat["scores"]
                targets_cat = cat["targets"]
                indices = cat.get("indices")
                pred_ids = cat.get("pred_ids")
                pred_scores = cat.get("pred_scores")
            if self.cfg.OUTPUT_PERCLASS_ACC:
                # reference output_metrics per-class path (engine.py:47-56)
                for label in range(int(targets_cat.max()) + 1):
                    sel = scores[targets_cat == label]
                    if len(sel):
                        logger.info(
                            "class %d: top1 %.2f top5 %.2f (n=%d)", label,
                            100 * sel[:, 0].mean(), 100 * sel[:, 1].mean(), len(sel),
                        )
            if save_results:
                # per-image results keyed by dataset index / img key
                # (reference saves results.pth keyed by get_img_key,
                # engine.py:264-268, :323-325)
                extra = {}
                if indices is not None:
                    extra["indices"] = indices
                    get_key = getattr(loader.dataset, "get_img_key", None)
                    if get_key is not None:
                        extra["img_keys"] = np.asarray(
                            [str(get_key(int(i))) for i in indices]
                        )
                if pred_ids is not None:
                    extra["pred_ids"] = pred_ids
                    extra["pred_scores"] = pred_scores
                np.savez(
                    save_results, scores=scores, targets=targets_cat,
                    top1=top1, top5=top5, **extra,
                )
                logger.info("Saved per-image eval results to %s", save_results)
        if meters is not None:
            meters.update(global_step, top1=top1, top5=top5, loss=loss)
        return top1

    # ------------------------------------------------------------------
    def fit(self, train_meters=None, test_meters=None):
        cfg = self.cfg
        if cfg.EVALUATE:
            return [
                self.validate(
                    l, save_results=f"{cfg.OUTPUT_DIR}/results_{i}.npz"
                    if cfg.OUTPUT_DIR else None,
                )
                for i, l in enumerate(self.testloaders)
            ]

        for epoch in range(self.start_epoch, cfg.OPTIM.EPOCHS):
            logger.info("PROGRESS: %.1f%%", 100 * epoch / cfg.OPTIM.EPOCHS)
            self.train_epoch(epoch, train_meters)
            accs = [
                self.validate(
                    l,
                    test_meters[i] if test_meters else None,
                    (epoch + 1) * len(self.trainloader),
                )
                for i, l in enumerate(self.testloaders)
            ]
            is_best = accs[0] > self.best_acc
            if is_best:
                self.best_acc = accs[0]
            elif cfg.OPTIM.VAL and cfg.OPTIM.OPT in ("sgd", "qhm"):
                logger.info("DROPPING LEARNING RATE")
                self.state = drop_lr(self.state, cfg.OPTIM.DROP_FACTOR)
            self.checkpointer.save(
                epoch + 1, self.state, best_acc=self.best_acc, is_best=is_best
            )

        # final: evaluate the best checkpoint (run_experiment.py:264-279)
        import os.path as op

        best = op.join(cfg.OUTPUT_DIR, "model_best.ckpt")
        has_best = op.isfile(best)
        if jax.process_count() > 1:
            # every host must make the SAME final-eval decision (its jitted
            # eval steps are global collectives) — and non-master hosts can
            # race past this point before host 0 finishes writing the file.
            # The object gather is also the barrier: host 0 only answers
            # after its last save completed, so its view is authoritative.
            has_best = bool(collectives.all_gather(has_best)[0])
        if has_best:
            logger.info("Evaluating the best checkpoint: %s", best)
            self.checkpointer.is_test = True
            self.state, _ = self.checkpointer.load(self.state, best, resume=False)
            return [self.validate(l) for l in self.testloaders]
        return []


def run_experiment(cfg):
    """Full experiment entry (CLI body). Host-0 owns the shared-filesystem
    artifacts (config snapshot, TB event files) — the reference's
    is_main_process() convention (utils/comm.py:26-29)."""
    mkdir(cfg.OUTPUT_DIR)
    is_main = collectives.is_main_process()
    if is_main:
        save_config(cfg, f"{cfg.OUTPUT_DIR}/config.yaml")
    trainer = Trainer(cfg)
    train_meters = test_meters = None
    if is_main:
        train_meters = TensorboardLogger(f"{cfg.OUTPUT_DIR}/tb_logs/train")
        test_meters = [
            TensorboardLogger(f"{cfg.OUTPUT_DIR}/tb_logs/{name}_{i}")
            for i, name in enumerate(cfg.DATA.TEST)
        ]
    try:
        return trainer.fit(train_meters, test_meters)
    finally:
        if train_meters is not None:
            train_meters.close()
        for m in test_meters or ():
            m.close()
