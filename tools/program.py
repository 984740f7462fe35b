"""Training driver (reference tools/program.py rebuilt TPU-first).

The hot loop is one jitted train step (forward+loss+backward+update fused);
batches stream from the threaded host loader and are sharded over the
mesh's data axis.  Eval / checkpoint / logging policies match the
reference (tools/program.py:160-418): eval_epoch_step gating, HighestAcc /
FixedEpochStep checkpointing, median-smoothed stats windows, rank-0-only
side effects.
"""

import os
import random
import sys
import time

__dir__ = os.path.dirname(os.path.abspath(__file__))
sys.path.append(os.path.abspath(os.path.join(__dir__, "..")))

import numpy as np

import jax
import jax.numpy as jnp

from pytorchocr_tpu.utils import (
    ArgsParser,
    TrainingStats,
    get_logger,
    load_config,
    merge_config,
    print_dict,
    save_config,
)
from pytorchocr_tpu.utils.save_load import save_model
from pytorchocr_tpu.parallel.mesh import create_mesh, shard_batch, shard_or_replicate
from pytorchocr_tpu.trainer import (
    build_input_transform,
    make_eval_step,
    make_train_step,
)

SUPPORTED_ALGS = [
    "DB", "PSE", "PAN", "CRNN", "STARNet", "CLS", "Distillation", "SLANet",
]


def set_random_seed(seed, deterministic=True):
    """Seed python/numpy; JAX PRNG keys are derived from the same seed by
    callers (reference tools/program.py:138-157)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


class TensorboardWriter:
    """Minimal TF-summary writer; no-op if tensorflow is unavailable."""

    def __init__(self, logdir):
        try:
            import tensorflow as tf

            self._tf = tf
            self._writer = tf.summary.create_file_writer(logdir)
        except Exception:
            self._tf = None
            self._writer = None

    def add_scalar(self, tag, value, step):
        if self._writer is None:
            return
        with self._writer.as_default():
            self._tf.summary.scalar(tag, float(value), step=int(step))

    def close(self):
        if self._writer is not None:
            self._writer.close()


def extract_device_normalize(config):
    """Strip host-side ToTensor/Normalize/NormalizeImage from the Train and
    Eval transform lists and record their params in
    Global._device_normalize_spec for trainer.build_input_transform (see
    the Global.device_normalize comment in preprocess())."""
    _NORM_OPS = ("ToTensor", "Normalize", "NormalizeImage")
    specs = {}
    for mode in ("Train", "Eval"):
        tlist = config.get(mode, {}).get("dataset", {}).get("transforms") or []
        names = [next(iter(e)) for e in tlist]
        norm_idx = [i for i, n in enumerate(names) if n in _NORM_OPS]
        if not norm_idx:
            continue
        # Only extract TRAILING norm ops: an image op running after
        # Normalize on the host (e.g. a padding op) would see normalized
        # floats there but raw uint8 here — different semantics.  KeepKeys
        # is not an image op and may follow.
        if any(
            n not in _NORM_OPS and n != "KeepKeys"
            for n in names[norm_idx[0]:]
        ):
            get_logger().warning(
                "device_normalize: %s transforms have image ops after %s — "
                "leaving them on host for this mode", mode, names[norm_idx[0]]
            )
            continue
        config[mode]["dataset"]["transforms"] = [
            e for i, e in enumerate(tlist) if i not in norm_idx
        ]
        specs[mode] = [
            {"op": names[i], "params": tlist[i][names[i]]} for i in norm_idx
        ]
    config["Global"]["_device_normalize_spec"] = specs
    return specs


def preprocess(is_train=False):
    # test/CI hook: force a platform before the backend initializes (the
    # hosted env pins jax_platforms, so a plain env var is not enough)
    platform = os.environ.get("OCR_TPU_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    # persistent XLA compilation cache: repeated CLI invocations (train ->
    # eval -> eval --quant -> infer) skip the multi-minute TPU recompiles.
    # Default on for TPU runs; point elsewhere / disable with
    # OCR_TPU_COMPILE_CACHE=<dir|off>.
    cache_dir = os.environ.get("OCR_TPU_COMPILE_CACHE", "")
    if cache_dir != "off" and platform != "cpu":
        jax.config.update(
            "jax_compilation_cache_dir",
            cache_dir or os.path.expanduser("~/.cache/pytorchocr_tpu_xla"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    args = ArgsParser().parse_args()
    config = load_config(args.config)
    merge_config(config, args.opt)
    # provenance for artifact-of-record JSONs (tools/eval.py metric_json)
    config["Global"]["_config_path"] = args.config

    # set by the host-RSS watchdog before it re-execs a leaking train
    # process (see train()); overrides Global.checkpoints for the resume
    resume = os.environ.pop("OCR_TPU_RESUME", None)
    if resume:
        config["Global"]["checkpoints"] = resume

    if is_train:
        save_model_dir = config["Global"]["save_model_dir"]
        os.makedirs(save_model_dir, exist_ok=True)
        save_config(config, os.path.join(save_model_dir, "config.yml"))
        log_file = "{}/train.log".format(save_model_dir)
    else:
        log_file = None
    logger = get_logger(name="root", log_file=log_file)

    alg = config["Architecture"]["algorithm"]
    assert alg in SUPPORTED_ALGS, "algorithm must be in {}".format(SUPPORTED_ALGS)

    # Global.device_normalize: move host-side ToTensor/Normalize/
    # NormalizeImage onto the device (fused into the jitted step — the
    # training analogue of the deploy uint8 path / the reference's CUDA
    # NormMeanStd kernel).  Strips the ops from the data pipeline and
    # records their params for trainer.build_input_transform; images then
    # cross the wire as uint8 (4x fewer bytes than f32) and the reader
    # skips two full-image float passes per sample.
    if config["Global"].get("device_normalize", False):
        extract_device_normalize(config)

    # multi-host TPU init (single-process is a no-op)
    if config["Global"].get("distributed", False) and (
        "COORDINATOR_ADDRESS" in os.environ or jax.process_count() > 1
    ):
        try:
            jax.distributed.initialize()
        except Exception:
            pass
    config["Global"]["distributed"] = jax.process_count() > 1

    if config["Global"].get("use_tensorboard", False) and jax.process_index() == 0:
        tsb_path = "{}/tensorboard/".format(config["Global"]["save_model_dir"])
        os.makedirs(tsb_path, exist_ok=True)
        tsb_writer = TensorboardWriter(tsb_path)
    else:
        tsb_writer = None

    rng = set_random_seed(config["Global"].get("seed", 2022))
    print_dict(config, logger)
    logger.info(
        "train with jax {} on {} device(s) ({} process(es))".format(
            jax.__version__, jax.device_count(), jax.process_count()
        )
    )
    return config, rng, logger, tsb_writer


def _device_batch(batch, mesh, wire_dtype=None, labels_dtype=None):
    """numpy batch list -> tuple with ndarray fields sharded on device.

    ``wire_dtype``: optional narrower dtype for the float32 IMAGE tensor
    (batch[0]) on the wire (host->device). Under bf16 compute the model
    casts its input down anyway, so shipping f32 over PCIe/tunnel wastes
    2x the bytes — and in this environment every transferred byte is also
    LEAKED host-side by the tunneled PJRT client (measured ~1.0x
    bytes/transfer, see Global.max_host_rss_gb below), so halving wire
    bytes halves the leak.  Float32 LABEL fields (GT maps, regression
    targets) ship at full precision by default — they feed the loss
    directly, where a bf16 cast would silently quantize the training
    targets (e.g. SLANet's normalized bboxes to ~2px granularity); pass
    ``labels_dtype`` (Global.wire_labels_dtype) to narrow them too when a
    run is leak-constrained and its targets tolerate it (binary masks are
    exact in bf16).  The numpy array goes straight to device_put with its
    sharding — a jnp.asarray() would stage an extra full transfer to the
    default device before resharding (1.5x leak, 2x H2D traffic).
    """
    out = []
    for i, item in enumerate(batch):
        if isinstance(item, np.ndarray) and item.dtype != object and item.dtype.kind in "fiub":
            cast = wire_dtype if i == 0 else labels_dtype
            if cast is not None and item.dtype == np.float32:
                item = item.astype(cast)
            out.append(shard_batch(item, mesh))
        else:
            out.append(item)
    return tuple(out)


def _resume_reexec(save_model_dir, logger, reason):
    """Re-exec this process into a checkpoint resume (or exit 75 when no
    checkpoint exists yet).  Shared action of the save-hang, host-RSS and
    stall watchdogs."""
    latest = os.path.abspath(os.path.join(save_model_dir, "latest"))
    logger.error("%s — re-exec'ing with resume from %s", reason, latest)
    sys.stdout.flush()
    sys.stderr.flush()
    for cand in (latest, latest + ".old"):
        if os.path.isdir(cand):
            os.environ["OCR_TPU_RESUME"] = cand
            os.execv(sys.executable, [sys.executable] + sys.argv)
    os._exit(75)  # EX_TEMPFAIL: no checkpoint yet, let a supervisor retry


class StallWatchdog:
    """Detect a wedged train loop and re-exec into a checkpoint resume.

    Failure mode (observed twice in this environment): the tunneled PJRT
    client wedges mid-step — every thread futex-parked, the loop never
    returns from a dispatch/fetch — while a FRESH process can still reach
    the TPU.  No Python signal handler can interrupt the parked C call and,
    unlike checkpoint saves, there is no single call site to wrap, so a
    daemon thread watches a heartbeat the loop beats every train iteration
    and every eval batch.  `timeout_s` must exceed the longest legitimate
    gap between beats (a cold 736px compile through the tunnel is minutes;
    default 1800s).  The reference framework has no failure detection at
    all (SURVEY.md §5); recovery here = the RSS watchdog's exact-resume
    path.  Stop() before saves — they hold the heartbeat for minutes and
    have their own watchdog.
    """

    def __init__(self, timeout_s, save_model_dir, logger, on_stall=None):
        import threading

        self.timeout_s = timeout_s
        self._beat_t = time.monotonic()
        self._stop = threading.Event()
        self._on_stall = on_stall or (
            lambda: _resume_reexec(
                save_model_dir, logger,
                "train loop made no progress for %ds (wedged device "
                "client?)" % timeout_s,
            )
        )
        self._thread = threading.Thread(target=self._watch, daemon=True)

    def beat(self):
        self._beat_t = time.monotonic()

    def start(self):
        if self.timeout_s > 0:
            self._thread.start()
        return self

    def stop(self):
        self._stop.set()

    def _watch(self):
        poll = max(1.0, min(30.0, self.timeout_s / 4.0))
        while not self._stop.wait(poll):
            if time.monotonic() - self._beat_t > self.timeout_s:
                self._on_stall()
                return


def train(
    config,
    mesh,
    train_dataloader,
    valid_dataloader,
    model,
    loss_class,
    tx,
    lr_schedule,
    state,
    global_state,
    post_process_class,
    eval_class,
    logger,
    tsb_writer=None,
):
    global_config = config["Global"]
    cal_metric_during_train = global_config.get("cal_metric_during_train", False)
    log_smooth_window = global_config["log_smooth_window"]
    epoch_num = global_config["epoch_num"]
    print_batch_step = global_config["print_batch_step"]
    eval_epoch_step = global_config["eval_epoch_step"]

    main_indicator = eval_class.main_indicator
    if len(global_state) > 0:
        best_model_dict = global_state["best_model"]
        start_epoch = global_state["start_epoch"]
        global_step = global_state["global_step"]
    else:
        best_model_dict = {main_indicator: 0}
        start_epoch = 0
        global_step = 0

    start_eval_step = 0
    if isinstance(eval_epoch_step, (list, tuple)) and len(eval_epoch_step) >= 2:
        start_eval_step = eval_epoch_step[0]
        eval_epoch_step = eval_epoch_step[1]
        if jax.process_index() == 0:
            if valid_dataloader is None or len(valid_dataloader) == 0:
                logger.info(
                    "No Images in eval dataset, evaluation during training "
                    "will be disabled"
                )
                start_eval_step = 1e111
            logger.info(
                "During the training process, after the {}th epoch, an "
                "evaluation is run every {} epochs".format(
                    start_eval_step, eval_epoch_step
                )
            )

    ckpt_save_type = global_config["ckpt_save_type"]
    save_epoch_step = global_config["save_epoch_step"]
    save_model_dir = global_config["save_model_dir"]
    os.makedirs(save_model_dir, exist_ok=True)
    train_stats = TrainingStats(log_smooth_window, ["lr"])

    model_type = config["Architecture"].get("model_type", None)

    # Global.remat: rematerialize the forward in backward (jax.checkpoint)
    remat = bool(global_config.get("remat", False))
    _dn_spec = global_config.get("_device_normalize_spec", {})
    # Global.freeze_transform_epochs: N — zero the Transform subtree's
    # optimizer updates for the first N epochs (STAR-Net warm start: let
    # the CTC escape the all-blank plateau on unwarped images before the
    # TPS localization starts moving; unfrozen TPS under blank gradients
    # warps inputs into illegibility and the loss never escapes)
    freeze_tf_epochs = int(global_config.get("freeze_transform_epochs", 0))
    frozen = ()
    if freeze_tf_epochs > 0:
        frozen = (("transform", freeze_tf_epochs * len(train_dataloader)),)
        logger.info(
            "Transform params frozen for the first %d epochs (%d steps)",
            freeze_tf_epochs, frozen[0][1],
        )
    train_step = make_train_step(
        model, loss_class, tx, mesh, remat=remat,
        input_transform=build_input_transform(_dn_spec.get("Train")),
        frozen=frozen,
    )
    eval_step = make_eval_step(
        model, mesh, input_transform=build_input_transform(_dn_spec.get("Eval"))
    )

    # multi-step dispatch (Global.steps_per_dispatch > 1): scan k steps per
    # device call — amortizes dispatch overhead (vital behind TPU proxies
    # that round-trip buffers per call; harmless elsewhere)
    steps_per_dispatch = int(global_config.get("steps_per_dispatch", 1))
    multi_step = None
    if steps_per_dispatch > 1:
        from pytorchocr_tpu.trainer import make_multi_train_step, stack_batches

        multi_step = make_multi_train_step(
            model, loss_class, tx, mesh,
            input_transform=build_input_transform(_dn_spec.get("Train")),
            frozen=frozen,
        )

    # tracing/profiling subsystem: Global.use_profiler captures an
    # XLA/jax.profiler trace of steps [profile_start, profile_end) into
    # save_model_dir/profile (viewable in TensorBoard / Perfetto); the
    # reference has no tracer (SURVEY.md §5), only wall-clock counters —
    # those are kept too (reader_cost / batch_cost / ips below).
    use_profiler = global_config.get("use_profiler", False)
    profile_start = global_config.get("profile_start_step", 10)
    profile_end = global_config.get("profile_end_step", 15)
    profiling = False

    def _host_rss_gb():
        """Host anon RSS of this process (GB) — logged every print step so a
        host-memory leak is visible in the train log long before the kernel
        OOM-kills a multi-hour run."""
        try:
            with open("/proc/self/statm") as f:
                return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 2**30
        except Exception:
            return float("nan")

    # wire dtype for train batches (see _device_batch): default bf16 under
    # use_amp (model computes in bf16 anyway), f32 otherwise; override with
    # Global.wire_dtype: bf16|f16|f32.
    wd_cfg = str(
        global_config.get(
            "wire_dtype", "bf16" if global_config.get("use_amp") else "f32"
        )
    )
    def _parse_wire_dtype(name):
        if name in ("bf16", "bfloat16"):
            import ml_dtypes

            return ml_dtypes.bfloat16
        if name in ("f16", "float16"):
            return np.float16
        return None

    wire_dtype = _parse_wire_dtype(wd_cfg)
    # label fields default to full precision (loss targets); narrow with
    # Global.wire_labels_dtype: bf16|f16 for leak-constrained runs.
    labels_dtype = _parse_wire_dtype(
        str(global_config.get("wire_labels_dtype", "f32"))
    )

    # Host-RSS watchdog: the tunneled PJRT client in this environment leaks
    # ~1x every transferred byte in host anon memory (measured; a 60-epoch
    # det run reached 130 GB and was OOM-killed by the kernel).  When RSS
    # crosses the limit at an epoch boundary, the freshly-saved `latest`
    # checkpoint is re-exec'd into a clean process (resume is exact:
    # state/opt_state/global_step round-trip through orbax).  0 disables.
    # default 96 on this 125 GB host (was 64: det distillation runs leaked
    # past it every ~20 epochs, paying a ~5 min re-exec each time; 96
    # halves the re-exec count with >25 GB of kernel headroom)
    max_host_rss_gb = float(global_config.get("max_host_rss_gb", 96))

    # Checkpoint-save hang watchdog: a wedged device client blocks the
    # device_get inside save forever (observed once after ~2h through the
    # tunnel: all threads futex-parked, while fresh processes could still
    # reach the TPU).  A Python signal handler cannot interrupt a
    # futex-parked C call, so a watchdog THREAD re-execs the process into
    # a resume from the last finalized `latest` (save_model stages into
    # latest.staging and swaps, so a save that hangs/crashes mid-write
    # leaves the previous `latest` — or `latest.old` mid-swap — intact).
    # Progress since that save is lost; an infinite hang is not.  0
    # disables.
    save_timeout_s = int(global_config.get("save_timeout_s", 900))

    # Stall watchdog: heartbeat per train iteration / eval batch; see
    # StallWatchdog.  Default 1800s clears a cold 736px tunnel compile
    # with margin.  0 disables; multi-host recovery is out of scope.
    stall_dog = None
    if jax.process_count() == 1:
        stall_dog = StallWatchdog(
            int(global_config.get("stall_timeout_s", 1800)),
            save_model_dir, logger,
        ).start()

    def _save_with_timeout(*args, **kwargs):
        if save_timeout_s <= 0 or jax.process_count() > 1:
            save_model(*args, **kwargs)
            return

        import threading

        done = threading.Event()

        def _watch():
            if done.wait(save_timeout_s):
                return
            _resume_reexec(
                save_model_dir, logger,
                "checkpoint save stuck for %ds (wedged device client?)"
                % save_timeout_s,
            )

        watcher = threading.Thread(target=_watch, daemon=True)
        watcher.start()
        try:
            save_model(*args, **kwargs)
        finally:
            done.set()

    loss_window = []  # deferred device->host loss fetch (see hot loop)

    def _drain_loss_window():
        for losses_dev, lr_val in loss_window:
            stats = {
                k: float(np.asarray(v).mean()) for k, v in losses_dev.items()
            }
            stats["lr"] = lr_val
            train_stats.update(stats)
        loss_window.clear()

    for epoch in range(start_epoch, epoch_num):
        train_dataloader.set_epoch(epoch)
        train_reader_cost = 0.0
        train_run_cost = 0.0
        total_samples = 0
        reader_start = time.time()
        pending = []  # batch accumulator for multi-step dispatch
        for idx, batch_np in enumerate(train_dataloader):
            if multi_step is not None:
                pending.append(batch_np)
                last_iter = idx == len(train_dataloader) - 1
                if len(pending) < steps_per_dispatch and not last_iter:
                    continue
                train_reader_cost += time.time() - reader_start
                lr = float(lr_schedule(global_step))
                train_start = time.time()
                if len(pending) == steps_per_dispatch:
                    from jax.sharding import NamedSharding, PartitionSpec

                    stacked = stack_batches(pending)
                    # axis 0 = steps, axis 1 = per-step batch (data-sharded)
                    stacked_sharding = NamedSharding(
                        mesh, PartitionSpec(None, "data")
                    )
                    # images (field 0) narrow to wire_dtype; label fields
                    # keep f32 unless wire_labels_dtype opts in (same
                    # policy as _device_batch)
                    def _stacked_cast(i, x):
                        cast = wire_dtype if i == 0 else labels_dtype
                        if cast is not None and getattr(x, "dtype", None) == np.float32:
                            return x.astype(cast)
                        return x

                    sdev = tuple(
                        jax.device_put(_stacked_cast(i, x), stacked_sharding)
                        for i, x in enumerate(stacked)
                    )
                    state, losses = multi_step(state, sdev)
                    n_done = steps_per_dispatch
                else:  # epoch tail: per-step dispatch for the remainder
                    for b in pending:
                        state, losses = train_step(
                            state, _device_batch(b, mesh, wire_dtype, labels_dtype)
                        )
                    n_done = len(pending)
                loss_window.append((losses, lr))
                if len(loss_window) > log_smooth_window:
                    loss_window.pop(0)
                train_run_cost += time.time() - train_start
                total_samples += sum(len(b[0]) for b in pending)
                pending = []
                global_step += n_done
                if stall_dog:
                    stall_dog.beat()
                if jax.process_index() == 0 and (
                    global_step % print_batch_step < n_done or last_iter
                ):
                    _drain_loss_window()
                    logs = train_stats.log()
                    logger.info(
                        "epoch: [{}/{}], iter: {}, {}, reader_cost: {:.5f} s, "
                        "batch_cost: {:.5f} s, samples: {}, ips: {:.5f}, "
                        "host_rss: {:.2f} GB".format(
                            epoch + 1, epoch_num, global_step, logs,
                            train_reader_cost / print_batch_step,
                            (train_reader_cost + train_run_cost) / print_batch_step,
                            total_samples,
                            total_samples
                            / (train_reader_cost + train_run_cost + 1e-9),
                            _host_rss_gb(),
                        )
                    )
                    train_reader_cost = 0.0
                    train_run_cost = 0.0
                    total_samples = 0
                reader_start = time.time()
                continue

            batch = _device_batch(batch_np, mesh, wire_dtype, labels_dtype)
            train_reader_cost += time.time() - reader_start
            lr = float(lr_schedule(global_step))

            if use_profiler and jax.process_index() == 0:
                if global_step == profile_start and not profiling:
                    jax.profiler.start_trace(
                        os.path.join(save_model_dir, "profile")
                    )
                    profiling = True
                elif global_step == profile_end and profiling:
                    jax.profiler.stop_trace()
                    profiling = False

            train_start = time.time()
            state, losses = train_step(state, batch)
            # keep the step fully async: buffer the (tiny) device loss dicts
            # and fetch them only at log steps — a per-step fetch would
            # force a device sync every iteration and stall the pipeline
            loss_window.append((losses, lr))
            if len(loss_window) > log_smooth_window:
                loss_window.pop(0)
            train_run_cost += time.time() - train_start
            total_samples += len(batch_np[0])

            if cal_metric_during_train and model_type != "det":
                preds_eval = eval_step(state.params, state.batch_stats, batch[0])
                if model_type == "table":
                    post_result = post_process_class(preds_eval, batch_np)
                else:
                    post_result = post_process_class(preds_eval, batch_np[1])
                eval_class(post_result, batch_np)
                metric = eval_class.get_metric()
                train_stats.update(metric)

            if jax.process_index() == 0 and (
                (global_step > 0 and global_step % print_batch_step == 0)
                or (idx == len(train_dataloader) - 1)
            ):
                _drain_loss_window()
                if tsb_writer is not None:
                    for k, v in train_stats.get().items():
                        tsb_writer.add_scalar("TRAIN/{}".format(k), v, global_step)
                logs = train_stats.log()
                strs = (
                    "epoch: [{}/{}], iter: {}, {}, reader_cost: {:.5f} s, "
                    "batch_cost: {:.5f} s, samples: {}, ips: {:.5f}, "
                    "host_rss: {:.2f} GB".format(
                        epoch + 1,
                        epoch_num,
                        global_step,
                        logs,
                        train_reader_cost / print_batch_step,
                        (train_reader_cost + train_run_cost) / print_batch_step,
                        total_samples,
                        total_samples / (train_reader_cost + train_run_cost + 1e-9),
                        _host_rss_gb(),
                    )
                )
                logger.info(strs)
                train_reader_cost = 0.0
                train_run_cost = 0.0
                total_samples = 0
            global_step += 1
            if stall_dog:
                stall_dog.beat()
            reader_start = time.time()

        # ------------------------------------------------------------------
        # eval + checkpoint (rank-0 policy mirrors reference :331-410)
        # ------------------------------------------------------------------
        if (
            jax.process_index() == 0
            and epoch + 1 > start_eval_step
            and (epoch - start_eval_step + 1) % eval_epoch_step == 0
        ):
            cur_metric = evaluate(
                state,
                eval_step,
                mesh,
                valid_dataloader,
                post_process_class,
                eval_class,
                model_type,
                heartbeat=stall_dog.beat if stall_dog else None,
            )
            cur_metric_str = "cur metric, {}".format(
                ", ".join(["{}: {}".format(k, v) for k, v in cur_metric.items()])
            )
            logger.info(cur_metric_str)
            if tsb_writer is not None:
                for k, v in cur_metric.items():
                    if isinstance(v, (float, int)):
                        tsb_writer.add_scalar("EVAL/{}".format(k), v, global_step)

            if cur_metric[main_indicator] >= best_model_dict[main_indicator]:
                best_model_dict.update(cur_metric)
                best_model_dict["best_model_epoch"] = epoch + 1
                global_state["start_epoch"] = epoch + 1  # resume AFTER this epoch
                global_state["best_model"] = best_model_dict
                global_state["global_step"] = global_step
                _save_with_timeout(
                    state, global_state, config, save_model_dir, logger,
                    is_best=True, prefix="best_accuracy",
                )
            best_str = "best metric, {}".format(
                ", ".join(["{}: {}".format(k, v) for k, v in best_model_dict.items()])
            )
            logger.info(best_str)
            if tsb_writer is not None:
                tsb_writer.add_scalar(
                    "EVAL/best_{}".format(main_indicator),
                    best_model_dict[main_indicator],
                    global_step,
                )

        if jax.process_index() == 0 and (
            # Global.save_latest_epoch_step: throttle the per-epoch
            # `latest` checkpoint (default 1 = reference behavior).  On a
            # tunneled chip the orbax save costs 2-4 s/epoch — for a
            # 15-s-epoch rec run that is a third of the wall clock; saving
            # every N epochs trades up to N-1 epochs of resume granularity
            # for it.  The final epoch always saves.
            (epoch + 1) % int(global_config.get("save_latest_epoch_step", 1))
            == 0
            or epoch + 1 == epoch_num
        ):
            global_state["start_epoch"] = epoch + 1  # resume AFTER this epoch
            global_state["best_model"] = best_model_dict
            global_state["global_step"] = global_step
            _save_with_timeout(
                state, global_state, config, save_model_dir, logger,
                is_best=False, prefix="latest",
            )
        # periodic epoch_{k} checkpoints are independent of the `latest`
        # throttle: a save_latest_epoch_step that does not divide
        # save_epoch_step must not silently skip them
        if (
            ckpt_save_type == "FixedEpochStep"
            and epoch + 1 > 0
            and (epoch + 1) % save_epoch_step == 0
        ):
            global_state["start_epoch"] = epoch + 1
            global_state["best_model"] = best_model_dict
            global_state["global_step"] = global_step
            _save_with_timeout(
                state, global_state, config, save_model_dir, logger,
                is_best=False, prefix="epoch_{}".format(epoch),
            )

        if (
            max_host_rss_gb > 0
            and jax.process_count() == 1
            and epoch + 1 < epoch_num
            and _host_rss_gb() > max_host_rss_gb
        ):
            latest = os.path.abspath(os.path.join(save_model_dir, "latest"))
            # force a current `latest` before re-exec: under the
            # save_latest_epoch_step throttle the on-disk latest can be up
            # to N-1 epochs stale (or absent entirely early in a run, which
            # would crash load_model in the re-exec'd process)
            global_state["start_epoch"] = epoch + 1
            global_state["best_model"] = best_model_dict
            global_state["global_step"] = global_step
            _save_with_timeout(
                state, global_state, config, save_model_dir, logger,
                is_best=False, prefix="latest",
            )
            logger.warning(
                "host RSS %.1f GB > Global.max_host_rss_gb=%.0f "
                "(per-transfer host-memory leak in the tunneled PJRT "
                "client); re-exec'ing with resume from %s",
                _host_rss_gb(), max_host_rss_gb, latest,
            )
            if tsb_writer is not None:
                tsb_writer.close()
            sys.stdout.flush()
            sys.stderr.flush()
            os.environ["OCR_TPU_RESUME"] = latest
            os.execv(sys.executable, [sys.executable] + sys.argv)

    if jax.process_index() == 0:
        best_str = "best metric, {}".format(
            ", ".join(["{}: {}".format(k, v) for k, v in best_model_dict.items()])
        )
        logger.info(best_str)
        if tsb_writer is not None:
            tsb_writer.close()
    return state


def _slice_post(post_result, j):
    """One sample of a batched postprocess output as a length-1 batch.
    Dict-valued results (DistillationDBPostProcess) slice per sub-model;
    tuple-valued results (CTCLabelDecode with labels -> (texts, labels))
    slice each element — plain ``post_result[j:j+1]`` on a tuple would
    slice the tuple itself and silently corrupt per-sample metrics for
    any rec/cls model evaluated through a batch-size-1 loader."""
    if isinstance(post_result, dict):
        return {k: v[j : j + 1] for k, v in post_result.items()}
    if isinstance(post_result, tuple):
        return tuple(v[j : j + 1] for v in post_result)
    return post_result[j : j + 1]


def evaluate(
    state,
    eval_step,
    mesh,
    valid_dataloader,
    post_process_class,
    eval_class,
    model_type=None,
    heartbeat=None,
):
    """Eval loop (reference tools/program.py:421-473).  ``heartbeat``:
    optional zero-arg callable beaten once per batch (StallWatchdog).

    Fast path for batch-size-1 loaders (det eval — the reference and our
    configs pin ``Eval.loader.batch_size_per_card: 1`` because post-resize
    shapes vary per image): samples are grouped by exact post-resize shape
    and forwarded in padded-pow2 batches of up to 16, with the host
    postprocess of chunk k overlapped against chunk k+1's dispatched
    forward.  Because only the batch axis is stacked (never the spatial
    dims — same grouping the deploy path uses, deploy/infer_det.py
    run_batch) every per-sample activation is computed at the same shape
    as the bs-1 path, so metrics are equivalent (bf16 conv tiling can
    differ across batch sizes, flipping borderline detections at the
    ~0.001 hmean level; measured: in-dist DB identical to 16 digits,
    shifted 0.7791 vs 0.7781); per-sample dispatch and
    tunnel-RTT cost is amortized ~16x.  The metric is fed per sample in
    input order with the loader's own batch tuples, so the accumulation
    protocol is untouched.  Table decode consumes the whole batch dict in
    its postprocess and stays on the per-batch path, as does any loader
    that already batches (rec/cls)."""
    import itertools

    batch_iter = iter(valid_dataloader)
    samples = None
    if model_type != "table":
        first = next(batch_iter, None)
        if first is None:
            return eval_class.get_metric()
        if np.asarray(first[0]).shape[0] == 1:
            samples = [first] + list(batch_iter)
        else:
            batch_iter = itertools.chain([first], batch_iter)

    if samples is None:
        # per-batch path (table; pre-batched rec/cls loaders)
        total_frame = 0.0
        total_time = 0.0
        for idx, batch_np in enumerate(batch_iter):
            if heartbeat is not None:
                heartbeat()
            # numpy goes straight to device_put with its sharding (an
            # intermediate jnp.asarray would stage a second full transfer)
            images = shard_or_replicate(np.asarray(batch_np[0]), mesh)
            start = time.time()
            preds = eval_step(state.params, state.batch_stats, images)
            jax.block_until_ready(preds)
            total_time += time.time() - start
            if model_type == "table":
                post_result = post_process_class(preds, batch_np)
                eval_class(post_result, batch_np)
            else:
                post_result = post_process_class(preds, batch_np[1])
                eval_class(post_result, batch_np)
            total_frame += len(batch_np[0])
        metric = eval_class.get_metric()
        metric["fps"] = total_frame / max(total_time, 1e-9)
        return metric

    # shape-bucketed batched path
    groups = {}
    for i, b in enumerate(samples):
        groups.setdefault(np.asarray(b[0]).shape[1:], []).append(i)
    MAX_BS = 16
    chunks = []
    for idxs in groups.values():
        for c in range(0, len(idxs), MAX_BS):
            chunks.append(idxs[c : c + MAX_BS])

    per_sample = [None] * len(samples)
    loop_start = time.time()
    pending = None  # (chunk, async preds, padded shape_list)

    def _finish(chunk, preds, shapes):
        post_result = post_process_class(preds, shapes)
        for j, i in enumerate(chunk):
            per_sample[i] = _slice_post(post_result, j)

    for chunk in chunks:
        if heartbeat is not None:
            heartbeat()
        n = len(chunk)
        bs = 1 << (n - 1).bit_length()  # pow2 pad: <=5 compiles per shape
        imgs = [np.asarray(samples[i][0]) for i in chunk]
        batch_imgs = np.concatenate(imgs + [imgs[0]] * (bs - n), axis=0)
        shp = [np.asarray(samples[i][1]) for i in chunk]
        shapes = np.concatenate(shp + [shp[0]] * (bs - n), axis=0)
        images = shard_or_replicate(batch_imgs, mesh)
        preds = eval_step(state.params, state.batch_stats, images)
        if pending is not None:
            _finish(*pending)  # host postprocess overlaps this forward
        pending = (chunk, preds, shapes)
    if pending is not None:
        _finish(*pending)

    for i, b in enumerate(samples):
        if per_sample[i] is not None:
            eval_class(per_sample[i], b)
    total_time = time.time() - loop_start
    metric = eval_class.get_metric()
    # wall fps over forward + postprocess (the bs-1 path timed forward
    # only; the batched number is the honest end-to-end eval rate)
    metric["fps"] = len(samples) / max(total_time, 1e-9)
    return metric
