"""Detection trainer — the full training loop, TPU-native.

Rebuild of the reference's ``BaseTrainer`` (engine/trainer.py:475) +
``DetectionTrainer`` (models/yolo/detect/train.py:19):

- one jitted train step over the GLOBAL batch: normalize uint8 batch on
  device, forward (train mode, BN stat updates), TAL+loss, grads, optimizer,
  EMA — compiled once, sharded over the mesh 'data' axis (the reference's
  DDP subprocess spawn + NCCL allreduce becomes SPMD partitioning);
- warmup LR/momentum interpolation, linear/cosine schedule, grad
  accumulation (nbs-scaled), grad clipping at norm 10;
- EMA of params + BN stats; per-epoch validation on the EMA model;
  best/last checkpoints; early stopping; close_mosaic; resume;
- 'AMP' is a bf16 compute policy (no GradScaler needed on TPU).

State is one pytree (TrainState) so checkpoints and the multi-chip dry run
are trivial.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from experiment_yolo_tpu.cfg import get_cfg
from experiment_yolo_tpu.data import DataLoader, build_yolo_dataset, check_det_dataset
from experiment_yolo_tpu.engine.checkpoint import save_checkpoint
from experiment_yolo_tpu.optim.builders import build_optimizer
from experiment_yolo_tpu.parallel import mesh as meshlib
from experiment_yolo_tpu.utils import LOGGER, colorstr, increment_path
from experiment_yolo_tpu.utils.callbacks import Callbacks
from experiment_yolo_tpu.utils.ema import ema_update
from experiment_yolo_tpu.utils.loss import LossConfig, detection_loss


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any
    iou_mean: jnp.ndarray  # Wise-IoU running state
    step: jnp.ndarray  # int32 optimizer steps taken
    ema_updates: jnp.ndarray


class EarlyStopping:
    """Stop when fitness hasn't improved for `patience` epochs
    (reference utils/torch_utils.py:568)."""

    def __init__(self, patience: int = 50):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: Optional[float]) -> bool:
        if fitness is None:
            return False
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        return (epoch - self.best_epoch) >= self.patience


class DetectionTrainer:
    """Trains a DetectionModel on a YOLO-format dataset."""

    def __init__(self, model, variables, overrides: Optional[Dict] = None):
        self.args = get_cfg(overrides=overrides or {})
        self.args.task = getattr(model, "task", "detect")
        self.model = model
        self.variables = variables
        self.callbacks = Callbacks()
        self.best_variables: Optional[Dict] = None
        self.metrics: Dict[str, float] = {}
        self.save_dir = self._get_save_dir()
        self.dtype = jnp.bfloat16 if self.args.amp else jnp.float32
        if self.args.amp and getattr(model, "yaml", None):
            # rebuild the graph with bf16 compute (params stay fp32 and are
            # name/shape-identical, so the caller's variables plug in) —
            # flax modules pin their compute dtype at construction
            self.model = type(model)(
                {k: v for k, v in model.yaml.items() if k != "yaml_file"}, dtype=jnp.bfloat16
            )
            self.model.names = model.names
        if int(self.args.batch) == -1:
            # HBM-aware batch search (reference autobatch.py via batch=-1)
            from experiment_yolo_tpu.utils.autobatch import autobatch

            self.args.batch = autobatch(
                self.model, imgsz=int(self.args.imgsz),
                max_labels=int(getattr(self.args, "max_labels", 128) or 128),
                dtype=self.dtype,
            )
        # loss config depends only on args + model.nc, so build it here: callers
        # that drive _make_train_step directly (bench.py, tests) get the same
        # args-coupled config as the full train() loop
        args = self.args
        self.loss_cfg = LossConfig(
            nc=self.model.nc,
            box=args.box,
            cls=args.cls,
            dfl=args.dfl,
            use_wiseiou=args.use_wiseiou,
            wiou_ltype=args.wiou_ltype,
            nwd=args.nwd,
            iou_ratio=args.iou_ratio,
            iou_type=getattr(args, "iou_type", "CIoU") or "CIoU",
            inner_iou=bool(getattr(args, "inner_iou", False)),
            focaler_iou=bool(getattr(args, "focaler_iou", False)),
            # loss rematerialization follows model rematerialization: if the
            # model needs remat to fit HBM, so does the loss; when it
            # doesn't, skipping the loss recompute is ~2% step time.
            # (remat=0 is a valid "remat all layers" threshold, so test
            # identity against False/None, not truthiness or == — int 0
            # compares equal to False)
            checkpoint_loss=(getattr(args, "remat", False) is not False
                             and getattr(args, "remat", None) is not None),
            packed_decode=getattr(args, "packed_decode", "off") or "off",
            # pass through verbatim: False/'off' disable, True/'on' enable
            # both fused forms, 'decode'/'loss' select one (LossConfig)
            fused_dfl=getattr(args, "fused_dfl", False),
        )

    def _get_save_dir(self) -> Path:
        project = self.args.project or "runs/detect"
        name = self.args.name or "train"
        return increment_path(Path(project) / name, exist_ok=self.args.exist_ok)

    # ------------------------------------------------------------------
    def _setup_mesh(self) -> None:
        """Build the device mesh: 1-D data-parallel, or 2-D data x fsdp when
        ``fsdp: N`` (> 1) is set — ZeRO-3-style parameter/optimizer/EMA
        sharding over the inner axis (parallel/mesh.py:make_mesh2d)."""
        args = self.args
        self.fsdp = int(getattr(args, "fsdp", 0) or 0)
        n_req = getattr(args, "n_devices", None)
        if self.fsdp > 1:
            n_total = int(n_req) if n_req else len(jax.devices())
            if n_total % self.fsdp:
                raise ValueError(
                    f"fsdp={self.fsdp} must divide the device count {n_total}"
                )
            self.mesh = meshlib.make_mesh2d(n_total // self.fsdp, self.fsdp)
        else:
            self.mesh = meshlib.make_mesh(n_req)

    def _place_state(self, state):
        """Place the train state on the mesh: fully replicated (DP), or
        params/opt/EMA sharded over 'fsdp' with BN stats and scalars
        replicated (GSPMD inserts the all-gathers/reduce-scatters)."""
        if getattr(self, "fsdp", 0) > 1:
            return state.replace(
                params=meshlib.fsdp_shard(state.params, self.mesh),
                opt_state=meshlib.fsdp_shard(state.opt_state, self.mesh),
                ema_params=meshlib.fsdp_shard(state.ema_params, self.mesh),
                batch_stats=meshlib.replicate(state.batch_stats, self.mesh),
                ema_batch_stats=meshlib.replicate(state.ema_batch_stats, self.mesh),
                iou_mean=meshlib.replicate(state.iou_mean, self.mesh),
                step=meshlib.replicate(state.step, self.mesh),
                ema_updates=meshlib.replicate(state.ema_updates, self.mesh),
            )
        return meshlib.replicate(state, self.mesh)

    # ------------------------------------------------------------------
    def train(self) -> Dict[str, float]:
        args = self.args
        from experiment_yolo_tpu.cfg import check_imgsz

        self.callbacks.run("on_pretrain_routine_start", trainer=self)
        args.imgsz = check_imgsz(int(args.imgsz), max(self.model.strides))
        data = check_det_dataset(args.data)
        if data["nc"] != self.model.nc:
            raise ValueError(
                f"dataset nc={data['nc']} but model nc={self.model.nc} — build the model with nc={data['nc']}"
            )
        self.data = data
        if self.args.task == "pose":
            # model kpt_shape follows the DATASET (reference PoseTrainer
            # builds PoseModel with data_kpt_shape and re-inits the head)
            dk = tuple(data.get("kpt_shape", self.model.kpt_shape))
            if dk != tuple(self.model.kpt_shape):
                LOGGER.info(f"rebuilding pose head: model kpt_shape {self.model.kpt_shape} -> dataset {dk}")
                yaml_cfg = {k: v for k, v in self.model.yaml.items() if k != "yaml_file"}
                yaml_cfg["kpt_shape"] = list(dk)
                self.model = type(self.model)(yaml_cfg, dtype=self.dtype)
                self.variables = self.model.init(jax.random.PRNGKey(args.seed))
                self._rebuilt_model = True
        self.model.names = data["names"]

        train_set = build_yolo_dataset(args, data["train"], mode="train", data=data)
        self.train_loader = DataLoader(
            train_set, args.batch, shuffle=True, workers=args.workers, seed=args.seed
        )
        nb = len(self.train_loader)
        if nb == 0:
            raise ValueError(f"training set smaller than batch size {args.batch}")

        # mesh / sharding (multi-host: one process per host, see
        # parallel/mesh.maybe_init_distributed — the reference's DDP spawn)
        rank = meshlib.maybe_init_distributed()
        self.is_main = meshlib.is_main_process()
        self._setup_mesh()
        n_dev = self.mesh.shape["data"]
        if args.batch % n_dev:
            raise ValueError(f"batch={args.batch} must be divisible by {n_dev} devices")

        # optimizer (+ grad accumulation toward nominal batch size)
        accumulate = max(round(args.nbs / args.batch), 1)
        weight_decay = args.weight_decay * args.batch * accumulate / args.nbs
        self.tx = build_optimizer(
            self.variables["params"],
            name=args.optimizer,
            lr0=args.lr0,
            momentum=args.momentum,
            weight_decay=weight_decay,
            nb=nb,
            epochs=args.epochs,
            lrf=args.lrf,
            cos_lr=args.cos_lr,
            warmup_epochs=args.warmup_epochs,
            warmup_bias_lr=args.warmup_bias_lr,
            warmup_momentum=args.warmup_momentum,
            nc=self.model.nc,
            accumulate=accumulate,
        )
        # EMA starts as a COPY of params: sharing buffers would alias two
        # donated arguments in the jitted step ("donate the same buffer twice")
        state = TrainState(
            params=self.variables["params"],
            batch_stats=self.variables["batch_stats"],
            opt_state=self.tx.init(self.variables["params"]),
            ema_params=jax.tree.map(jnp.copy, self.variables["params"]),
            ema_batch_stats=jax.tree.map(jnp.copy, self.variables["batch_stats"]),
            iou_mean=jnp.asarray(1.0, jnp.float32),
            step=jnp.zeros([], jnp.int32),
            ema_updates=jnp.zeros([], jnp.int32),
        )
        start_epoch = 0
        best_fitness = 0.0
        if args.resume:
            state, start_epoch, best_fitness = self._load_resume_state(state)
            LOGGER.info(f"Resuming from epoch {start_epoch + 1} (best_fitness {best_fitness:.4f})")
        if args.amp:
            self._check_amp()
        state = self._place_state(state)
        train_step = self._make_train_step()

        stopper = EarlyStopping(args.patience)
        stopper.best_fitness = best_fitness
        stopper.best_epoch = max(start_epoch - 1, 0)
        LOGGER.info(
            f"{colorstr('train:')} {len(train_set)} images, {nb} batches/epoch, "
            f"{args.epochs} epochs, batch {args.batch} on {n_dev} device(s), "
            f"optimizer={args.optimizer}, amp={args.amp}"
        )

        epoch = start_epoch
        for epoch in range(start_epoch, args.epochs):
            self.epoch = epoch  # callbacks read trainer.epoch (reference trainer.py:781)
            self.callbacks.run("on_train_epoch_start", trainer=self)
            if args.close_mosaic and epoch == args.epochs - args.close_mosaic:
                LOGGER.info("Closing dataloader mosaic")
                self.train_loader.mosaic = False
            self.train_loader.set_epoch(epoch)
            t0 = time.time()
            mean_loss = None
            loss_keys = None
            pending_comps = None
            n_acc = 0
            ms_rng = np.random.default_rng(args.seed + 10_000 + epoch)
            for i, batch in enumerate(self.train_loader):
                if args.multi_scale:
                    batch = self._rescale_batch(batch, ms_rng)
                if args.plots and epoch == start_epoch and i < 3:
                    # train-batch mosaics (reference trainer plot_training_samples)
                    from experiment_yolo_tpu.utils.plotting import plot_images

                    try:
                        plot_images(np.asarray(batch["img"]), np.asarray(batch["bboxes"]),
                                    np.asarray(batch["cls"]), np.asarray(batch["mask"]),
                                    fname=self.save_dir / f"train_batch{i}.jpg",
                                    names=getattr(self.model, "names", None))
                    except Exception as e:  # plotting must never kill training
                        LOGGER.warning(f"train-batch plot failed: {e}")
                batch = meshlib.shard_batch(batch, self.mesh)
                if getattr(self.model, "kw_manager", None) is not None:
                    # temperature anneal (reference trainer.py:795-797)
                    from experiment_yolo_tpu.nn.kernel_warehouse import get_temperature

                    kw_t = get_temperature(i + 1, epoch, len(self.train_loader),
                                           temp_epoch=20, temp_init_value=1.0)
                    state, comps = train_step(state, batch, jnp.float32(kw_t))
                else:
                    state, comps = train_step(state, batch)
                if loss_keys is None:
                    loss_keys = sorted(comps)
                    mean_loss = np.zeros(len(loss_keys))
                # defer the host sync by one step: converting comps to float
                # immediately would block on the step just dispatched and
                # serialize host data prep against device compute
                if pending_comps is not None:
                    vals = np.asarray([float(pending_comps[k]) for k in loss_keys])
                    mean_loss = (mean_loss * n_acc + vals) / (n_acc + 1)
                    n_acc += 1
                pending_comps = comps
            if pending_comps is not None:
                vals = np.asarray([float(pending_comps[k]) for k in loss_keys])
                mean_loss = (mean_loss * n_acc + vals) / (n_acc + 1)
                n_acc += 1
            dt = time.time() - t0
            imgs_s = len(self.train_loader) * args.batch / dt
            loss_str = "  ".join(f"{k} {v:.4f}" for k, v in zip(loss_keys, mean_loss))
            LOGGER.info(f"epoch {epoch + 1}/{args.epochs}  {loss_str}  {imgs_s:.1f} img/s")
            self.loss_items = dict(zip(loss_keys, mean_loss))

            fitness = None
            if args.val:
                fitness = self._validate(state)
            self._save_metrics_csv(epoch)
            self.callbacks.run("on_fit_epoch_end", trainer=self)

            if args.save and self.is_main:  # rank-0-only checkpoints
                # update best_fitness BEFORE writing last/meta.yaml so a
                # resume from `last` restores this epoch's best, not the
                # previous one (reference trainer.py:846-862 updates first)
                improved = fitness is not None and fitness >= best_fitness
                if improved:
                    best_fitness = fitness
                self._save(state, "last", epoch=epoch, best_fitness=best_fitness)
                if improved:
                    self._save(state, "best", epoch=epoch, best_fitness=best_fitness)
                if args.save_period > 0 and (epoch + 1) % args.save_period == 0:
                    self._save(state, f"epoch{epoch + 1}", epoch=epoch, best_fitness=best_fitness)
            if stopper(epoch, fitness):
                LOGGER.info(f"EarlyStopping at epoch {epoch + 1} (best epoch {stopper.best_epoch + 1})")
                break

        self.state = state
        self.variables = {"params": jax.device_get(state.params), "batch_stats": jax.device_get(state.batch_stats)}
        self.ema_variables = {
            "params": jax.device_get(state.ema_params),
            "batch_stats": jax.device_get(state.ema_batch_stats),
        }
        if self.best_variables is None:
            self.best_variables = self.ema_variables
        self.metrics["epochs_run"] = epoch + 1
        self.callbacks.run("on_train_end", trainer=self)
        return self.metrics

    # ------------------------------------------------------------------
    def _check_amp(self) -> None:
        """bf16 sanity check (reference utils/checks.py:check_amp): compare a
        real forward in fp32 vs bf16 and disable AMP on divergence. bf16
        needs no loss scaling, so unlike the GradScaler path this is purely
        a numerical-health check."""
        import jax

        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
        try:
            m32 = type(self.model)({k: v for k, v in self.model.yaml.items() if k != "yaml_file"}, dtype=jnp.float32)
            f32 = m32.apply(self.variables, x)
            f16 = self.model.apply(self.variables, x) if self.dtype == jnp.bfloat16 else f32
            f32_leaves = jax.tree.leaves(f32)
            f16_leaves = jax.tree.leaves(f16)
            # relative L2 per output head, like the reference comparing real
            # detection outputs (utils/checks.py:610-660) rather than a
            # never-trips max-abs bound: bf16 through a deep net lands at a
            # few % relative L2; >10% (or any non-finite) means real damage
            rel = 0.0
            finite = True
            for a, b in zip(f16_leaves, f32_leaves):
                a = a.astype(jnp.float32)
                b = b.astype(jnp.float32)
                finite = finite and bool(jnp.isfinite(a).all())
                rel = max(rel, float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-6)))
            if not finite or rel > 0.1:
                LOGGER.info(f"AMP check failed (rel err {rel:.3f}) — disabling bf16 compute")
                self.dtype = jnp.float32
                # flax modules pin compute dtype at construction, so flipping
                # self.dtype (the input-cast dtype) alone is not enough: swap
                # in the fp32-compute rebuild (params are name/shape-identical)
                m32.names = getattr(self.model, "names", None)
                self.model = m32
            else:
                LOGGER.info(f"AMP check ok (bf16 rel err {rel:.4f})")
        except Exception as e:  # never block training on the health check
            LOGGER.info(f"AMP check skipped ({type(e).__name__})")

    def _rescale_batch(self, batch, rng) -> Dict:
        """Multi-scale training (reference detect/train.py:60-75), TPU-shaped:
        a FIXED bucket set (0.75/0.9/1.0/1.15/1.3 x imgsz, stride-rounded)
        instead of a continuous range so XLA compiles a bounded number of
        step programs. Labels are normalized, so only pixels resize."""
        import cv2

        max_stride = max(self.model.strides)
        buckets = sorted(
            {int(round(self.args.imgsz * s / max_stride) * max_stride) for s in (0.75, 0.9, 1.0, 1.15, 1.3)}
        )
        sz = int(rng.choice(buckets))
        if sz == batch["img"].shape[1]:
            return batch
        imgs = np.stack([cv2.resize(im, (sz, sz), interpolation=cv2.INTER_LINEAR) for im in batch["img"]])
        return {**batch, "img": imgs}

    def _make_train_step(self):
        model, tx, loss_cfg = self.model, self.tx, self.loss_cfg
        strides = model.strides
        dtype = self.dtype
        ema_decay, ema_tau = self.args.ema_decay, self.args.ema_tau
        use_ema = self.args.ema

        is_rtdetr = model.head_type == "RTDETRDecoder"
        task = getattr(model, "task", "detect")
        pose_gain, kobj_gain = float(self.args.pose), float(self.args.kobj)
        kpt_shape = getattr(model, "kpt_shape", (17, 3))

        has_kw = getattr(model, "kw_manager", None) is not None
        use_remat = getattr(self.args, "remat", False)  # bool or int (min H*W)

        def step_fn(state: TrainState, batch, kw_temp=0.0):
            imgs = batch["img"].astype(dtype) / 255.0

            def loss_fn(params):
                kw_kwargs = {"kw_temp": kw_temp} if has_kw else {}
                if is_rtdetr:
                    # contrastive denoising groups, keyed off the step
                    kw_kwargs["dn_gt"] = {"bboxes": batch["bboxes"], "cls": batch["cls"],
                                          "mask": batch["mask"]}
                    kw_kwargs["dn_rng"] = jax.random.fold_in(jax.random.PRNGKey(3407),
                                                             state.step)
                out, upd = model.module.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    imgs,
                    True,
                    mutable=["batch_stats"],
                    remat=use_remat,
                    **kw_kwargs,
                )
                tb = {"bboxes": batch["bboxes"], "cls": batch["cls"], "mask": batch["mask"]}
                if is_rtdetr:
                    from experiment_yolo_tpu.utils.detr_loss import rtdetr_loss

                    out = jax.tree.map(lambda f: f.astype(jnp.float32) if hasattr(f, "astype") else f, out)
                    total, c = rtdetr_loss(out, tb, model.nc)
                    comps = {"box": c["bbox"] + c["giou"], "cls": c["cls"], "dfl": jnp.asarray(0.0)}
                    new_iou = state.iou_mean
                elif task == "segment":
                    from experiment_yolo_tpu.utils.task_losses import segmentation_loss

                    det, coeffs, protos = out
                    feats = [f.astype(jnp.float32) for f in det]
                    total, comps, new_iou = segmentation_loss(
                        feats, coeffs, protos, {**tb, "masks": batch["masks"]},
                        strides, loss_cfg, state.iou_mean,
                    )
                elif task == "pose":
                    from experiment_yolo_tpu.utils.task_losses import pose_loss

                    det, kmaps = out
                    feats = [f.astype(jnp.float32) for f in det]
                    total, comps, new_iou = pose_loss(
                        feats, kmaps, {**tb, "keypoints": batch["keypoints"]},
                        strides, loss_cfg, state.iou_mean,
                        kpt_shape=kpt_shape, pose_gain=pose_gain, kobj_gain=kobj_gain,
                    )
                elif task == "obb":
                    from experiment_yolo_tpu.utils.task_losses import obb_loss

                    det, amaps = out
                    feats = [f.astype(jnp.float32) for f in det]
                    total, comps = obb_loss(feats, amaps, tb, strides, loss_cfg)
                    new_iou = state.iou_mean
                else:
                    # feats stay in compute dtype (bf16 under AMP): the loss
                    # runs mixed-precision — big (B, A, ...) elementwise in
                    # bf16, geometry and every reduction in f32 — halving the
                    # HBM traffic of the loss region (measured 28 ms of the
                    # 150 ms DEAL-P2 b32 train step in f32)
                    feats = list(out)
                    total, comps, new_iou = detection_loss(feats, tb, strides, loss_cfg, state.iou_mean)
                return total, (upd["batch_stats"], comps, new_iou)

            (loss, (new_stats, comps, new_iou)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            if use_ema:
                upd_count = state.ema_updates + 1
                new_ema_p = ema_update(state.ema_params, new_params, upd_count, ema_decay, ema_tau)
                new_ema_s = ema_update(state.ema_batch_stats, new_stats, upd_count, ema_decay, ema_tau)
            else:
                upd_count = state.ema_updates
                new_ema_p, new_ema_s = new_params, new_stats
            new_state = state.replace(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
                ema_params=new_ema_p,
                ema_batch_stats=new_ema_s,
                iou_mean=new_iou,
                step=state.step + 1,
                ema_updates=upd_count,
            )
            return new_state, comps

        return jax.jit(step_fn, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def _validate(self, state: TrainState) -> Optional[float]:
        from experiment_yolo_tpu.engine.validator import DetectionValidator

        task = getattr(self.model, "task", "detect")
        if task in ("segment", "pose", "obb"):
            from experiment_yolo_tpu.engine.validators_extra import TASK_VALIDATORS

            val_cls = TASK_VALIDATORS[task]
        else:
            val_cls = DetectionValidator
        ema_vars = {"params": state.ema_params, "batch_stats": state.ema_batch_stats}
        # one validator for the whole run: its jitted forward+NMS closure and
        # dataset scan are memoized, so per-epoch val costs no re-trace
        cached = getattr(self, "_validator", None)
        if cached is not None:
            stats = cached(model=self.model, variables=ema_vars)
            self.metrics.update(stats)
            return stats.get("fitness")
        validator = val_cls(
            args={
                "data": self.args.data,
                "imgsz": self.args.imgsz,
                "batch": self.args.batch,
                "conf": 0.001,
                "iou": 0.7,
                "max_det": self.args.max_det,
                "workers": self.args.workers,
                "max_labels": self.args.max_labels,
                "split": self.args.split,
                "verbose": False,
            }
        )
        self._validator = validator
        stats = validator(model=self.model, variables=ema_vars)
        self.metrics.update(stats)
        return stats.get("fitness")

    def _save_metrics_csv(self, epoch: int) -> None:
        """Append per-epoch metrics to results.csv (reference
        trainer.py:1021 save_metrics)."""
        import csv

        row = {"epoch": epoch + 1, **{f"train/{k}": round(v, 5) for k, v in self.loss_items.items()}}
        row.update({f"metrics/{k}": round(v, 5) for k, v in self.metrics.items() if isinstance(v, float)})
        self.save_dir.mkdir(parents=True, exist_ok=True)
        path = self.save_dir / "results.csv"
        exists = path.exists()
        with open(path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row))
            if not exists:
                w.writeheader()
            w.writerow(row)

    def _save(self, state: TrainState, name: str, epoch: int = 0, best_fitness: float = 0.0) -> None:
        """Save weights+EMA (inference ckpt) and, for 'last', the FULL train
        state for resume (reference trainer.py:898 save_model contract)."""
        import orbax.checkpoint as ocp

        path = self.save_dir / "weights" / name
        save_checkpoint(
            path,
            self.model,
            {"params": jax.device_get(state.params), "batch_stats": jax.device_get(state.batch_stats)},
            ema_variables={
                "params": jax.device_get(state.ema_params),
                "batch_stats": jax.device_get(state.ema_batch_stats),
            },
            meta={
                "names": self.data["names"],
                "epoch": int(epoch),
                "best_fitness": float(best_fitness),
                "train_args": {k: v for k, v in self.args if v is None or isinstance(v, (int, float, str, bool))},
            },
        )
        if name == "last":  # resume state (optimizer, EMA counters, WIoU mean)
            ckptr = ocp.StandardCheckpointer()
            ckptr.save((path / "train_state").resolve(), jax.device_get(state), force=True)
            ckptr.wait_until_finished()
        if name == "best":
            self.best_variables = {
                "params": jax.device_get(state.ema_params),
                "batch_stats": jax.device_get(state.ema_batch_stats),
            }

    def _load_resume_state(self, template: TrainState):
        """Restore the full TrainState from <resume>/train_state.

        args.resume may be a checkpoint dir (…/weights/last) or True, which
        resolves to this run directory's last checkpoint (reference
        check_resume/get_latest_run, trainer.py:1050).
        """
        import orbax.checkpoint as ocp

        from experiment_yolo_tpu.utils import yaml_load

        if isinstance(self.args.resume, (str, Path)) and str(self.args.resume) not in ("True", "true"):
            ckpt = Path(self.args.resume)
        else:
            # mtime-based, like the reference's get_latest_run (utils/files.py):
            # a lexical sort would pick train10 over train2
            candidates = [
                p for p in Path(self.args.project or "runs/detect").glob("*/weights/last/train_state")
                if p.is_dir() or p.is_file()
            ]
            if not candidates:
                raise FileNotFoundError("resume=True but no previous run with a train_state was found")
            ckpt = max(candidates, key=lambda p: p.stat().st_mtime).parent
        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore((Path(ckpt) / "train_state").resolve(), template)
        meta = yaml_load(Path(ckpt) / "meta.yaml")
        return state, int(meta.get("epoch", -1)) + 1, float(meta.get("best_fitness", 0.0))
