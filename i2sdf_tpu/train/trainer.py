"""Reconstruction training orchestration (host loop around jitted steps).

Capability parity with `/root/reference/model/trainer/recon.py:23-395`
(ReconstructionTrainer): bubble lifecycle (activate at min_bubble_iter →
initialize the point-cloud pdf by rendering every training pixel and
scoring depth/RGB error; deactivate at max_bubble_iter), periodic
validation renders with PSNR/SSIM(/LPIPS when available), artifact dumps
(renderings, depths, normals, light masks, hotmaps, countmaps,
pointcloud HTML), TensorBoard scalars, config snapshot, and periodic
checkpoints.

TPU-first design: the host loop only sequences jitted programs and
writes artifacts — all math (including pdf init renders and pdf updates)
stays on device. Steps are logged in batches to avoid per-step host
syncs (the reference pays a GPU sync per `self.log`).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CfgNode
from ..data.plot import PlotData
from ..data.recon import ReconData
from ..models import renderer
from ..models.losses import LossConfig
from ..utils.imaging import linear_to_srgb, psnr, ssim
from ..utils import profiling
from ..utils.profiling import TraceProfiler
from . import artifacts
from .checkpoint import CheckpointManager
from .state import create_train_state
from .step import make_eval_render_fn, make_train_step


def lpips_fn():
    """LPIPS (parity model/eval/recon.py:17-19,197-203). Tries the
    torch-cpu torchmetrics AlexNet first (bit-exact published metric);
    otherwise the pure-JAX implementation in `eval/lpips.py`, which uses
    vendored real weights when present and a loudly-announced
    deterministic random-feature proxy otherwise. Never silently absent:
    the returned callable carries a `.name` provenance tag."""
    try:
        import torch
        from torchmetrics.image.lpip import (
            LearnedPerceptualImagePatchSimilarity as LPIPS)

        metric = LPIPS(net_type="alex")

        def compute(pred, gt):
            with torch.no_grad():
                p = torch.from_numpy(
                    np.asarray(pred, np.float32).transpose(2, 0, 1))[None]
                g = torch.from_numpy(
                    np.asarray(gt, np.float32).transpose(2, 0, 1))[None]
                return float(metric(p.clamp(0, 1) * 2 - 1,
                                    g.clamp(0, 1) * 2 - 1))

        compute.name = "lpips"
        return compute
    except Exception as exc:
        print(f"[WARN] torchmetrics LPIPS unavailable ({exc!r}); "
              "falling back to the JAX implementation")
        from ..eval.lpips import make_lpips

        return make_lpips()


class ReconstructionTrainer:
    def __init__(self, conf: CfgNode, exp_dir: str, data_root: str = "data",
                 is_val: bool = False, val_mesh: bool = False,
                 fused_sampler: bool | None = None):
        self.conf = conf
        self.exp_dir = exp_dir
        self.val_mesh = val_mesh
        os.makedirs(exp_dir, exist_ok=True)
        os.makedirs(os.path.join(exp_dir, "checkpoints"), exist_ok=True)
        self.plots_dir = os.path.join(exp_dir, "plots")
        os.makedirs(self.plots_dir, exist_ok=True)

        self.loss_cfg = LossConfig.from_cfgnode(conf.loss)
        use_normal = (self.loss_cfg.normal_weight > 0
                      or self.loss_cfg.angular_weight > 0)

        print("[INFO] Loading data ...")
        dataset_conf = dict(conf.dataset)
        self.scan_id = dataset_conf.pop("scan_id", 0)
        self.train_data = ReconData(
            scan_id=self.scan_id, data_root=data_root,
            use_mask=self.loss_cfg.mask_weight > 0,
            use_depth=self.loss_cfg.depth_weight > 0,
            use_normal=use_normal,
            use_bubble=self.loss_cfg.bubble_weight > 0,
            use_lightmask=self.loss_cfg.light_mask_weight > 0,
            **dataset_conf)
        self.is_hdr = dataset_conf.get("is_hdr", False)
        self.device_data = self.train_data.to_device()

        data_handoff = {
            "intrinsics": self.train_data.intrinsics_all,
            "pose": self.train_data.pose_all,
            "rgb": self.train_data.rgb_images,
            "img_res": self.train_data.img_res,
        }
        if self.train_data.use_lightmask:
            data_handoff["light_mask"] = self.train_data.lightmask_images
        self.plot_data = PlotData(
            data=data_handoff,
            downsample=dataset_conf.get("downsample", 1),
            plot_nimgs=conf.plot.get("plot_nimgs", 1), is_val=is_val)

        # model + optimizer
        model_conf = conf.model
        model_conf.use_normal = use_normal
        self.model_cfg = renderer.I2SDFConfig.from_cfgnode(model_conf)
        params = renderer.init(jax.random.PRNGKey(conf.get("seed", 42)),
                               self.model_cfg)

        # multi-chip data parallelism is the default on a multi-device
        # slice: params replicated, ray batches sharded over 'data',
        # gradients psum'd over ICI (SURVEY §2c; the reference is
        # single-GPU only, main_recon.py:56-60)
        self.mesh = None
        n_dev = jax.device_count()
        if n_dev > 1:
            from ..parallel import make_mesh, replicate_params

            if conf.train.batch_size % n_dev != 0:
                raise ValueError(
                    f"train.batch_size={conf.train.batch_size} must be "
                    f"divisible by the {n_dev} devices of this slice")
            self.mesh = make_mesh()
            params = replicate_params(self.mesh, params)
            print(f"[INFO] Data-parallel over {n_dev} "
                  f"{jax.devices()[0].platform} devices")
        self.max_steps = conf.train.get("steps", 200_000)
        n_images = self.train_data.n_images
        # LR decays by decay_rate over the WHOLE run (per optimizer step).
        # The reference computes decay_steps = nepochs * n_images
        # (trainer/recon.py:204-206) but Lightning steps ExponentialLR per
        # EPOCH, so its LR barely moves (0.1^(nepochs/decay_steps) ~ 0.98
        # over 200k steps) — we implement the documented intent instead.
        # strict-parity switch: reproduce the reference's per-epoch
        # ExponentialLR semantics exactly (see make_reference_lr_schedule)
        ref_schedule = None
        if conf.train.get("reference_lr_schedule", False):
            from .state import make_reference_lr_schedule

            ref_schedule = make_reference_lr_schedule(
                conf.train.learning_rate,
                conf.train.get("sched_decay_rate", 0.1),
                n_images=n_images,
                total_pixels=self.train_data.total_pixels,
                batch_size=conf.train.batch_size)
        self.state, self.tx = create_train_state(
            params, learning_rate=conf.train.learning_rate,
            decay_rate=conf.train.get("sched_decay_rate", 0.1),
            decay_steps=max(self.max_steps, 1), schedule=ref_schedule)

        self.batch_size = conf.train.batch_size
        self.bubble_batch_size = conf.train.get("bubble_batch_size",
                                                self.batch_size)
        # K>1 amortizes the in-window bubble draw: one K-batch
        # categorical every K steps (step.py::make_train_step docstring)
        self.bubble_draw_every = int(conf.train.get("bubble_draw_every", 1))
        self.pdf_criterion = conf.train.get("pdf_criterion", "DEPTH")
        assert self.pdf_criterion in ("RGB", "DEPTH")
        self.uniform_bubble = conf.train.get("uniform_bubble", False)
        self.split_n_pixels = conf.train.get("split_n_pixels", 12000)
        self.checkpoint_freq = conf.train.get("checkpoint_freq", 10000)
        # validation cadence: plot_freq in steps; when absent, the
        # reference falls back to epoch cadence (plot_epochs,
        # /root/reference/main_recon.py:104-107) — under on-device
        # batching an "epoch" is one pass over all pixels, so translate
        # epochs -> ceil(n_images * total_pixels / batch_size) steps
        if "plot_freq" in conf.train:
            self.plot_freq = conf.train.plot_freq
        elif "plot_epochs" in conf.train:
            import math as _math

            steps_per_epoch = max(int(_math.ceil(
                n_images * self.train_data.total_pixels
                / conf.train.batch_size)), 1)
            self.plot_freq = conf.train.plot_epochs * steps_per_epoch
            print(f"[INFO] plot_epochs={conf.train.plot_epochs} -> "
                  f"validating every {self.plot_freq} steps")
        else:
            self.plot_freq = 500
        self.trace_bub_idx = conf.train.get("trace_bub_idx", -1)

        if (self.train_data.use_lightmask
                and conf.train.get("flip_light", False)):
            # parity trainer/recon.py:105-107
            self.train_data.lightmask_images = (
                1.0 - self.train_data.lightmask_images)
            if self.plot_data.lightmask_images is not None:
                self.plot_data.lightmask_images = (
                    1.0 - self.plot_data.lightmask_images)
            self.device_data = self.train_data.to_device()

        # Per-ray sampler compaction (ray_sampler.per_ray_exit): the
        # capacity schedule depends on the learned beta, so the trainer
        # owns phase selection — the base cfg keeps it off and
        # _update_per_ray_phase() swaps in phase-specialized steps as
        # beta decays (cached; a handful of recompiles per run).
        self.auto_per_ray = self.model_cfg.sampler.per_ray_exit
        eval_model_cfg = self.model_cfg  # keeps per_ray_exit: the eval
        # renderer picks its own beta-matched phase per image
        # An explicit ray_sampler.per_ray_fracs tuple pins the
        # capacities at every beta; absent (None) = beta-phased ladder.
        self._fixed_per_ray_fracs = self.model_cfg.sampler.per_ray_fracs
        if self.auto_per_ray:
            from .step import cfg_with_fracs

            self.model_cfg = cfg_with_fracs(self.model_cfg, None)
        self._per_ray_fracs = None
        self._per_ray_check_freq = conf.train.get("per_ray_check_freq", 250)
        self._step_cache = {}

        if self.mesh is not None:
            # replicate the device-resident dataset explicitly: on a
            # single host jit would auto-reshard anyway, but multi-host
            # slices cannot reshard host-local arrays (parallel/mesh.py)
            from ..parallel import replicate_params as _rep_data

            self.device_data = _rep_data(self.mesh, self.device_data)

        step_kwargs = dict(
            pdf_prune=self.train_data.pdf_prune,
            pdf_max=self.train_data.pdf_max,
            pdf_criterion=self.pdf_criterion,
            fused_sampler=fused_sampler, mesh=self.mesh,
            angular_reference_bug=self.loss_cfg.angular_reference_bug)
        self._step_kwargs = step_kwargs
        self._step_plain = self._build_step(None, bubble=False)
        self._step_bubble = None  # built lazily at bubble activation
        self.render_image, self._render_chunk = make_eval_render_fn(
            eval_model_cfg, chunk_size=self.split_n_pixels,
            fused_sampler=fused_sampler, mesh=self.mesh)

        # bubble state (device arrays when active)
        self.bubble_activated = False
        self.pdf = None
        self.sample_count = None
        self.bubble_queue = None
        self.queue_pos = None

        # observability
        try:
            from tensorboardX import SummaryWriter

            self.tb = SummaryWriter(os.path.join(exp_dir, "tb"))
        except Exception:
            self.tb = None
        self.lpips = lpips_fn()
        self.ckpt = CheckpointManager(
            os.path.join(exp_dir, "checkpoints", "orbax"))
        # validation artifacts (PNG/EXR/HTML encodes) are pure host IO —
        # write them on a worker thread so the device goes straight back
        # to training after each val render. The pool stays alive for
        # the trainer's lifetime (fit() may be called more than once);
        # _io_drain() waits out pending writes at fit boundaries.
        from concurrent.futures import ThreadPoolExecutor

        self._io_pool = ThreadPoolExecutor(max_workers=2)
        self._io_futures = []

        with open(os.path.join(exp_dir, "config.yml"), "w") as f:
            f.write(conf.dump())
        if self.train_data.use_bubble:
            os.makedirs(os.path.join(exp_dir, "hotmap"), exist_ok=True)
            os.makedirs(os.path.join(exp_dir, "countmap"), exist_ok=True)
            artifacts.write_pointcloud_html(
                self.train_data.pointcloud,
                os.path.join(exp_dir, "pointcloud.html"))
            if self.trace_bub_idx != -1:
                os.makedirs(os.path.join(self.plots_dir, "bubble"),
                            exist_ok=True)
        print(f"[INFO] Finish loading data. Data-set size: {n_images}")

    def _io_submit(self, fn, *args, **kwargs):
        f = self._io_pool.submit(fn, *args, **kwargs)
        self._io_futures.append(f)
        return f

    def _io_drain(self) -> None:
        for f in self._io_futures:
            try:
                f.result()
            except Exception as exc:  # an artifact write must not kill
                print(f"[WARN] artifact write failed: {exc!r}")  # the run
        self._io_futures.clear()

    def _rep(self, tree):
        """Replicate device state across the mesh (no-op single-chip)."""
        if self.mesh is None or tree is None:
            return tree
        from ..parallel import replicate_params

        return replicate_params(self.mesh, tree)

    # -- bubble subsystem ---------------------------------------------------

    def initialize_bubble_pdf(self) -> None:
        """Render every training pixel, score |pred - gt| (depth or RGB),
        scatter into the pdf (parity trainer/recon.py:172-199)."""
        ds = self.train_data
        n_points = len(ds.pointcloud)
        pdf = jnp.zeros((n_points,), jnp.float32)
        data = self.device_data
        use_rgb = self.pdf_criterion == "RGB"
        pdf_max, pdf_prune = ds.pdf_max, ds.pdf_prune

        @jax.jit
        def scatter_err(pdf, pred, gt, links):
            # one program per image instead of ~10 eager dispatches
            if use_rgb:
                err = jnp.mean(jnp.abs(jnp.clip(pred, 0, 1)
                                       - jnp.clip(gt, 0, 1)), axis=-1)
            else:
                err = jnp.abs(pred - gt)
            if pdf_max is not None:
                err = jnp.clip(err, max=pdf_max)
            err = jnp.where(err < pdf_prune, 0.0, err)
            return pdf.at[links].set(err, mode="drop")

        for i in range(ds.n_images):
            out = self.render_image(
                self.state.params, data.uv, data.intrinsics[i], data.pose[i],
                predict_only=True)
            links = data.pointlinks[i * ds.total_pixels:(i + 1)
                                    * ds.total_pixels]
            if use_rgb:
                pdf = scatter_err(pdf, out["rgb_values"], data.rgb[i],
                                  links)
            else:
                pdf = scatter_err(pdf, out["depth_values"], data.depth[i],
                                  links)
        self.pdf = self._rep(pdf)
        self.sample_count = self._rep(jnp.zeros((n_points,), jnp.int32))
        np.save(os.path.join(self.exp_dir, "checkpoints", "pdf.npy"),
                np.asarray(pdf))
        nz = int(jnp.count_nonzero(pdf))
        print(f"[INFO] {nz}/{n_points} points to be sampled")
        self._write_hotmaps()

    def _write_hotmaps(self, sync: bool = False) -> None:
        ds = self.train_data
        step = int(self.state.step)
        trace_dir = os.path.join(self.plots_dir, "bubble")
        pdf_np = np.asarray(self.pdf)  # device pull stays synchronous
        submit = ((lambda fn, *a, **kw: fn(*a, **kw)) if sync
                  else self._io_submit)
        submit(artifacts.write_hotmaps,
               os.path.join(self.exp_dir, "hotmap"), pdf_np,
               ds.pixlinks, ds.n_images, ds.img_res, step=step,
               trace_idx=self.trace_bub_idx, trace_dir=trace_dir)
        if self.sample_count is not None:
            submit(artifacts.write_countmaps,
                   os.path.join(self.exp_dir, "countmap"),
                   np.asarray(self.sample_count), ds.pixlinks, ds.n_images,
                   ds.img_res, step=step, trace_idx=self.trace_bub_idx,
                   trace_dir=trace_dir)

    def _cfg_for_fracs(self, fracs):
        from .step import cfg_with_fracs

        return cfg_with_fracs(self.model_cfg, fracs)

    def _build_step(self, fracs, bubble: bool):
        key = (fracs, bubble)
        if key not in self._step_cache:
            kwargs = dict(self._step_kwargs)
            if bubble:
                kwargs.update(bubble=True,
                              bubble_batch_size=self.bubble_batch_size,
                              bubble_draw_every=self.bubble_draw_every)
            self._step_cache[key] = make_train_step(
                self._cfg_for_fracs(fracs), self.tx, self.batch_size,
                **kwargs)
        return self._step_cache[key]

    def _update_per_ray_phase(self) -> None:
        """Re-specialize the jitted step when the learned beta crosses a
        per-ray compaction phase boundary (step.py PER_RAY_PHASES)."""
        from ..models.density import effective_beta
        from .step import per_ray_fracs_for_beta

        beta = float(effective_beta(self.state.params["beta"],
                                    self.model_cfg.beta_min))
        fracs = (self._fixed_per_ray_fracs
                 if self._fixed_per_ray_fracs is not None
                 else per_ray_fracs_for_beta(beta))
        if fracs == self._per_ray_fracs:
            return
        self._per_ray_fracs = fracs
        self._step_plain = self._build_step(fracs, bubble=False)
        if self._step_bubble is not None:
            self._step_bubble = self._build_step(fracs, bubble=True)
        print(f"[INFO] per-ray sampler phase: beta={beta:.2e} "
              f"fracs={fracs}")

    def _maybe_toggle_bubble(self, step: int) -> None:
        lc = self.loss_cfg
        want = (self.train_data.use_bubble and lc.max_bubble_iter is not None
                and lc.min_bubble_iter <= step < lc.max_bubble_iter)
        if want and not self.bubble_activated:
            self.bubble_activated = True
            if self.pdf is not None:
                # mid-bubble resume: the checkpoint restored the live pdf
                # (the reference silently re-initializes here — SURVEY §5)
                print("[INFO] Bubble pdf restored from checkpoint")
            elif not self.uniform_bubble:
                print(f"[INFO] Initializing pointcloud PDF "
                      f"({self.pdf_criterion})")
                t0 = time.perf_counter()
                with profiling.annotate("bubble_pdf_init"):
                    self.initialize_bubble_pdf()
                print(f"[INFO] pdf init took "
                      f"{time.perf_counter() - t0:.1f}s")
            else:
                n = len(self.train_data.pointcloud)
                print("[INFO] Ablation: uniform bubble sampling")
                self.pdf = self._rep(jnp.ones((n,), jnp.float32))
                self.sample_count = self._rep(jnp.zeros((n,), jnp.int32))
            if self._step_bubble is None:
                self._step_bubble = self._build_step(
                    self._per_ray_fracs, bubble=True)
            if self.bubble_draw_every > 1:
                # queue_pos 0 forces a redraw on the first in-window
                # step (also the mid-window resume path: the queue is
                # not checkpointed, it is re-drawn from the restored pdf)
                k = self.bubble_draw_every * self.bubble_batch_size
                self.bubble_queue = self._rep(jnp.zeros((k,), jnp.int32))
                self.queue_pos = self._rep(jnp.int32(0))
        elif self.bubble_activated and not want:
            self.bubble_activated = False
            self.pdf = None
            self.sample_count = None
            self.bubble_queue = None
            self.queue_pos = None
            print("[INFO] Bubble window closed")

    # -- training loop ------------------------------------------------------

    def fit(self, max_steps: int | None = None, resume: bool = False,
            log_every: int = 50, profile: str | None = None) -> None:
        max_steps = max_steps or self.max_steps
        self._fit_max_steps = max_steps
        prof = TraceProfiler.from_spec(self.exp_dir, profile)
        if resume:
            try:
                bubble_template = None
                if self.train_data.use_bubble:
                    n = len(self.train_data.pointcloud)
                    bubble_template = {
                        "pdf": jnp.zeros((n,), jnp.float32),
                        "sample_count": jnp.zeros((n,), jnp.int32),
                    }
                try:
                    self.state, bubble = self.ckpt.restore(
                        self.state, bubble_template=bubble_template)
                except ValueError:
                    # checkpoint written outside the bubble window has no
                    # bubble entry — restore the bare state
                    self.state, bubble = self.ckpt.restore(self.state)
                if bubble is not None:
                    self.pdf = self._rep(bubble.get("pdf"))
                    self.sample_count = self._rep(bubble.get("sample_count"))
                # restored arrays land on one device; re-replicate for DP
                self.state = self._rep(self.state)
                print(f"[INFO] Resumed from step {int(self.state.step)}")
            except FileNotFoundError:
                print("[INFO] No checkpoint found, starting fresh")

        # per-step keys are folded from (base, step) INSIDE the jitted
        # step (see train/step.py), not split sequentially: a resumed
        # run replays the exact key an uninterrupted run would have used
        # at the same step, so checkpoint/resume is bit-deterministic
        # (the reference's Lightning resume replays its RNG stream from
        # the start)
        base_key = jax.random.PRNGKey(self.conf.get("seed", 42) + 1)
        pending = []
        t0 = time.perf_counter()
        step = int(self.state.step)
        # loss-weight dict cached per milestone signature: rebuilding 8
        # eager device scalars per step costs more host time than the
        # step dispatch itself (losses.py::weights_key)
        w = self.loss_cfg.dynamic_weights(step)
        w_key = self.loss_cfg.weights_key(step)
        while step < max_steps:
            self._maybe_toggle_bubble(step)
            if self.auto_per_ray and step % self._per_ray_check_freq == 0:
                self._update_per_ray_phase()
            sig = self.loss_cfg.weights_key(step)
            if sig != w_key:
                w = self.loss_cfg.dynamic_weights(step)
                w_key = sig
            prof.maybe_start(step)
            with prof.step(step):
                if self.bubble_activated and self.bubble_draw_every > 1:
                    (self.state, metrics, self.pdf, self.sample_count,
                     self.bubble_queue, self.queue_pos) = (
                        self._step_bubble(self.state, self.device_data,
                                          base_key, w, self.pdf,
                                          self.sample_count,
                                          self.bubble_queue,
                                          self.queue_pos))
                elif self.bubble_activated:
                    self.state, metrics, self.pdf, self.sample_count = (
                        self._step_bubble(self.state, self.device_data,
                                          base_key, w,
                                          self.pdf, self.sample_count))
                else:
                    self.state, metrics = self._step_plain(
                        self.state, self.device_data, base_key, w)
            prof.maybe_stop(step, wait_for=self.state.params)
            pending.append((step, metrics))
            step += 1

            if step % log_every == 0 or step == max_steps:
                self._flush_logs(pending, t0)
                pending = []
                t0 = time.perf_counter()
            if step % self.plot_freq == 0 or step == max_steps:
                with profiling.annotate("validation"):
                    self.validate(step)
            if step % self.checkpoint_freq == 0 or step == max_steps:
                self.save_checkpoint(step)
        prof.close(wait_for=self.state.params)
        self.ckpt.wait_until_finished()  # flush the async final save
        self._io_drain()  # flush queued artifact writes
        print("[INFO] Training complete")

    def _flush_logs(self, pending, t0) -> None:
        if not pending:
            return
        step, metrics = pending[-1]
        # one stacked transfer instead of ~15 scalar fetches — each
        # fetch pays a full tunnel round-trip (~33 ms) on this stack
        names = list(metrics)
        stacked = np.asarray(jnp.stack([metrics[k] for k in names]))
        vals = dict(zip(names, stacked.tolist()))
        sps = len(pending) / max(time.perf_counter() - t0, 1e-9)
        # scan id + ETA in the progress line (the reference's
        # RichProgressBarWithScanId column, utils/__init__.py:12-18)
        total = getattr(self, '_fit_max_steps', self.max_steps)
        remain = max(total - (step + 1), 0) / max(sps, 1e-9)
        eta = (f"{remain / 3600:.1f}h" if remain >= 3600
               else f"{remain / 60:.1f}m")
        print(f"[scan{self.scan_id} {step + 1}/{total}] "
              f"loss={vals['loss']:.4f} "
              f"psnr={vals['psnr']:.2f} ({sps:.1f} steps/s, "
              f"{sps * self.batch_size:.0f} rays/s, eta {eta})")
        if self.tb:
            self.tb.add_scalar("train/loss", vals["loss"], step)
            self.tb.add_scalar("train/psnr", vals["psnr"], step)
            self.tb.add_scalar(
                "train/beta", abs(float(self.state.params["beta"])), step)
            for name in ("rgb_loss", "eikonal_loss", "smooth_loss",
                         "mask_loss", "depth_loss", "normal_loss",
                         "angular_loss", "bubble_loss", "light_mask_loss"):
                if vals.get(name, 0.0) > 0:
                    self.tb.add_scalar(f"train/{name}", vals[name], step)

    # -- validation ---------------------------------------------------------

    def validate(self, step: int) -> dict:
        t_val0 = time.perf_counter()
        pd = self.plot_data
        pd.shuffle_plot_index()
        H, W = pd.img_res
        psnrs, ssims, lpipss = [], [], []
        for i in pd.plot_index:
            uv, K, pose, rgb_gt = pd.image_inputs(int(i))
            out = self.render_image(self.state.params, jnp.asarray(uv),
                                    jnp.asarray(K), jnp.asarray(pose))
            pred = np.asarray(out["rgb_values"]).reshape(H, W, 3)
            gt = rgb_gt.reshape(H, W, 3)
            if self.is_hdr:
                pred_disp = np.asarray(linear_to_srgb(np.clip(pred, 0, 1)))
                gt_disp = np.asarray(linear_to_srgb(np.clip(gt, 0, 1)))
                os.makedirs(f"{self.plots_dir}/hdr", exist_ok=True)
                artifacts.write_rgb(
                    f"{self.plots_dir}/hdr/{step}_{i}.npy", pred)
            else:
                pred_disp, gt_disp = pred, gt
            psnrs.append(float(psnr(pred_disp, gt_disp)))
            ssims.append(float(ssim(pred_disp[None], gt_disp[None])))
            if self.lpips:
                lpipss.append(self.lpips(pred_disp, gt_disp))

            os.makedirs(f"{self.plots_dir}/rendering", exist_ok=True)
            os.makedirs(f"{self.plots_dir}/depth", exist_ok=True)
            self._io_submit(
                artifacts.write_pred_gt_grid,
                f"{self.plots_dir}/rendering/{step}_{i}.png", pred_disp,
                gt_disp)
            self._io_submit(
                artifacts.write_depth,
                f"{self.plots_dir}/depth/{step}_{i}.png",
                np.asarray(out["depth_values"]).reshape(H, W))
            if "normal_map" in out:
                os.makedirs(f"{self.plots_dir}/normal", exist_ok=True)
                # world -> camera rotation for display (recon.py:339-346)
                n_world = np.asarray(out["normal_map"]).reshape(H, W, 3)
                R = np.asarray(pose)[:3, :3]
                n_cam = n_world @ R  # R^T applied from the right
                self._io_submit(
                    artifacts.write_normal,
                    f"{self.plots_dir}/normal/{step}_{i}.png", n_cam)
            if "light_mask" in out:
                os.makedirs(f"{self.plots_dir}/light_mask", exist_ok=True)
                self._io_submit(
                    artifacts.write_colormap,
                    f"{self.plots_dir}/light_mask/{step}_{i}.png",
                    np.asarray(out["light_mask"]).reshape(H, W))

        if self.bubble_activated and not self.uniform_bubble:
            self._write_hotmaps()

        if self.val_mesh:
            # parity with --val_mesh (trainer/recon.py:382-395): coarse
            # marching cubes at the plot resolution each validation epoch
            from ..eval.mesh import extract_mesh
            from ..eval.mesh_io import write_ply

            res = self.conf.plot.get("resolution", 100)
            out = extract_mesh(
                self.state.params["implicit"], self.model_cfg.implicit,
                resolution=res,
                grid_boundary=tuple(self.conf.plot.grid_boundary),
                coarse_resolution=min(64, res), fused=None)
            if out is not None:
                os.makedirs(f"{self.plots_dir}/mesh", exist_ok=True)
                write_ply(f"{self.plots_dir}/mesh/{step}.ply", *out)
                # inspect-in-browser parity (plots.py:15-73,188-225):
                # surface + training-camera frusta
                artifacts.write_mesh_html(
                    out[0], out[1], f"{self.plots_dir}/mesh/{step}.html",
                    poses=np.asarray(self.train_data.pose_all),
                    intrinsics=np.asarray(self.train_data.intrinsics_all))

        result = {"psnr": float(np.mean(psnrs)),
                  "ssim": float(np.mean(ssims))}
        if lpipss:
            # self-labeling column: the random-feature proxy logs as
            # "lpips-rf", never as published-comparable "lpips"
            result[getattr(self.lpips, "name", "lpips")] = float(
                np.mean(lpipss))
        if self.tb:
            for k, v in result.items():
                self.tb.add_scalar(f"val/{k}", v, step)
        print(f"[val @{step}] " + " ".join(
            f"{k}={v:.4g}" for k, v in result.items())
            + f" ({time.perf_counter() - t_val0:.1f}s)")
        return result

    def save_checkpoint(self, step: int) -> None:
        bubble = None
        if self.bubble_activated:
            bubble = {"pdf": self.pdf, "sample_count": self.sample_count}
        self.ckpt.save(step, self.state, bubble)
        print(f"[INFO] checkpoint @{step}")
