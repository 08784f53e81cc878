"""Console entry points (`scflow-train` / `scflow-test`).

These hold the full CLI bodies; `tools/train.py` and `tools/test.py` are
thin shims over them so both invocation styles behave identically
(reference CLI semantics: `train.py:19-44`, `test.py:20-49`, with the
`--out` flag actually defined — SURVEY.md §2.4 item 1).

Platform setup (`apply_env_platform` + the persistent compilation cache)
runs inside each entry point BEFORE jax is imported, mirroring the
script-level ordering the shims relied on.
"""

import argparse
import json
import os
import time


def _setup_platform():
    from scflow_tpu.utils.platform import (apply_env_platform,
                                           check_remote_backend_reachable,
                                           enable_compilation_cache)

    check_remote_backend_reachable()
    apply_env_platform()
    enable_compilation_cache()


def _resolve_config_arg(p, args):
    """The reference passes the config as `--config PATH` (train.py:38,
    test.py:24-25); we prefer it positional.  Accept both."""
    cfg = args.config or args.config_opt
    if not cfg:
        p.error("a config file is required (positional or --config)")
    args.config = cfg
    return args


def _map_legacy_launcher(args):
    """mmcv launcher names (pytorch/slurm/mpi) all mean 'a multi-process
    job was launched around me'; jax.distributed.initialize() reads the
    same env conventions, so map them to the 'jax' launcher."""
    if args.launcher in ("pytorch", "slurm", "mpi"):
        from scflow_tpu.utils.logging import get_logger

        get_logger("scflow_tpu").info(
            f"launcher '{args.launcher}' mapped to 'jax' "
            "(jax.distributed.initialize)")
        args.launcher = "jax"
    return args


_LAUNCHERS = ["none", "jax", "pytorch", "slurm", "mpi"]


def parse_train_args(argv=None):
    p = argparse.ArgumentParser(description="Train a pose refiner")
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("--config", dest="config_opt", default=None,
                   help="config path (reference-style alternative to the "
                        "positional argument)")
    p.add_argument("--local_rank", "--local-rank", type=int, default=0,
                   help="accepted for reference-launcher compatibility "
                        "(process identity comes from jax.distributed)")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None, type=int,
                   help="checkpoint step to resume from (default: latest)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in work_dir")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--max-iters", default=None, type=int)
    p.add_argument("--num-workers", default=None, type=int)
    p.add_argument("--nan-check", action="store_true")
    p.add_argument("--launcher", default="none", choices=_LAUNCHERS,
                   help="'jax' (or env SCFLOW_DIST=1) initializes "
                        "jax.distributed for multi-host runs; the mmcv "
                        "names (pytorch/slurm/mpi) map to 'jax'")
    p.add_argument("--profile-steps", default=0, type=int,
                   help="capture a jax.profiler trace of N steps "
                        "(starting at step 10) into WORK_DIR/profile")
    p.add_argument("--cfg-options", nargs="*", default=[],
                   help="override config entries, key=value")
    return _resolve_config_arg(p, p.parse_args(argv))


def train_main(argv=None):
    args = parse_train_args(argv)
    _setup_platform()
    import jax

    from scflow_tpu.parallel import maybe_initialize_distributed

    _map_legacy_launcher(args)
    maybe_initialize_distributed(args.launcher)
    from scflow_tpu.apis import (
        build_eval_fn,
        build_loss_assets,
        build_render_assets,
        build_tb_image_fn,
        init_model_variables,
        load_init_weights,
        make_train_step_from_cfg,
    )
    from scflow_tpu.config import Config
    from scflow_tpu.datasets import DataLoader, build_dataset
    from scflow_tpu.parallel import make_mesh, replicate
    from scflow_tpu.refiners import build_refiner_from_config
    from scflow_tpu.runtime import (
        CheckpointHook,
        EvalHook,
        IterRunner,
        TensorboardHook,
        TextLoggerHook,
        TrainState,
        build_optimizer,
    )
    from scflow_tpu.utils.logging import get_logger, timestamped_log_file

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(Config.parse_options(args.cfg_options))
    work_dir = args.work_dir or cfg.get("work_dir", "work_dirs/default")
    os.makedirs(work_dir, exist_ok=True)
    cfg.dump(os.path.join(work_dir, "config_dump.py"))
    logger = get_logger("scflow_tpu", timestamped_log_file(work_dir))
    logger.info(f"jax devices: {jax.devices()}")

    image_size = tuple(cfg.model.get("renderer", {}).get("image_size", (256, 256)))
    model = build_refiner_from_config(cfg.model)
    render_assets, bank = build_render_assets(cfg.model)
    loss_assets = build_loss_assets(cfg.model, bank.num_class)

    variables = init_model_variables(cfg.model, model, image_size, seed=args.seed)
    variables = load_init_weights(cfg.model, variables, logger)

    max_iters = args.max_iters or cfg.runner["max_iters"]
    lr_cfg = dict(cfg.get("lr_config", {}))
    if args.max_iters and lr_cfg.get("policy") == "OneCycle":
        lr_cfg["total_steps"] = max_iters + 100
    opt_config = cfg.get("optimizer_config", {})
    grad_clip = opt_config.get("grad_clip", {}).get("max_norm")
    tx, schedule = build_optimizer(
        dict(cfg.optimizer), lr_cfg, grad_clip,
        frozen_prefixes=opt_config.get("frozen_prefixes"),
    )
    state = TrainState.create(variables["params"], tx, variables.get("batch_stats"))

    mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    per_dev = cfg.data.get("samples_per_gpu", 16)
    global_batch = per_dev * n_dev
    local_batch = global_batch // jax.process_count()
    logger.info(
        f"{n_dev} devices / {jax.process_count()} processes, "
        f"global batch {global_batch} (local {local_batch})"
    )

    train_set = build_dataset(cfg.data["train"])
    loader = DataLoader(
        train_set,
        samples_per_step=local_batch,
        num_workers=args.num_workers or cfg.data.get("workers_per_gpu", 8),
        seed=args.seed,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        worker_mode=cfg.data.get("worker_mode", "thread"),
    )

    train_step = make_train_step_from_cfg(cfg, model, render_assets, loss_assets,
                                          image_size)

    hooks = [TextLoggerHook(cfg.get("log_config", {}).get("interval", 50))]
    if args.profile_steps:
        from scflow_tpu.runtime import ProfileHook

        hooks.append(
            ProfileHook(os.path.join(work_dir, "profile"),
                        num_steps=args.profile_steps)
        )
    hooks.append(CheckpointHook(cfg.get("checkpoint_config", {}).get("interval", 10000)))
    for hcfg in cfg.get("log_config", {}).get("hooks", []):
        if hcfg.get("type", "").startswith("Tensorboard"):
            hooks.append(
                TensorboardHook(
                    os.path.join(work_dir, "tb"),
                    interval=cfg.get("log_config", {}).get("interval", 50),
                    image_interval=hcfg.get("interval", 0),
                    image_fn=build_tb_image_fn(cfg, model, render_assets,
                                               image_size),
                )
            )
    eval_cfg = cfg.get("evaluation")
    if eval_cfg and "val" in cfg.data:
        try:
            val_set = build_dataset(cfg.data["val"])
            hooks.append(
                EvalHook(
                    build_eval_fn(cfg, model, render_assets, val_set, image_size),
                    interval=eval_cfg.get("interval", 5000),
                    save_best=eval_cfg.get("save_best"),
                    rule=eval_cfg.get("rule", "greater"),
                )
            )
        except (FileNotFoundError, OSError) as e:
            logger.warning(f"val dataset unavailable ({e}); skipping EvalHook")

    from scflow_tpu.parallel import shard_batch

    def put_batch(batch):
        return shard_batch(batch, mesh)

    with mesh:
        state = replicate(state, mesh)
        runner = IterRunner(
            train_step, state, loader, max_iters, work_dir=work_dir,
            hooks=hooks, lr_schedule=schedule, put_batch=put_batch,
            logger=logger, nan_check=args.nan_check,
            # mmcv CheckpointConfig's retention knob, honored for config
            # compatibility (orbax CheckpointManager max_to_keep)
            ckpt_max_keep=cfg.get("checkpoint_config", {}).get(
                "max_keep_ckpts", 5),
        )
        if args.resume or args.resume_from is not None:
            runner.resume(args.resume_from)
        runner.run()


def parse_test_args(argv=None):
    p = argparse.ArgumentParser(description="Test a pose refiner")
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("--config", dest="config_opt", default=None,
                   help="config path (reference-style alternative to the "
                        "positional argument)")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--format-only", action="store_true")
    p.add_argument("--save-dir", default=None)
    p.add_argument("--out", default=None, help="dump raw results json")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--limit", default=None, type=int,
                   help="evaluate only the first N images (smoke runs)")
    p.add_argument("--gpu-collect", action="store_true",
                   help="accepted for reference compatibility; result "
                        "gathering always uses process_allgather here")
    p.add_argument("--local_rank", "--local-rank", type=int, default=0,
                   help="accepted for reference-launcher compatibility")
    p.add_argument("--cfg-options", nargs="*", default=[])
    p.add_argument("--eval-options", nargs="*", default=[])
    p.add_argument("--launcher", default="none", choices=_LAUNCHERS,
                   help="'jax' (or env SCFLOW_DIST=1) initializes "
                        "jax.distributed for multi-host runs; the mmcv "
                        "names (pytorch/slurm/mpi) map to 'jax'")
    return _resolve_config_arg(p, p.parse_args(argv))


def test_main(argv=None):
    args = parse_test_args(argv)
    _setup_platform()
    import numpy as np

    from scflow_tpu.parallel import maybe_initialize_distributed

    _map_legacy_launcher(args)
    maybe_initialize_distributed(args.launcher)
    from scflow_tpu.apis import (
        build_render_assets,
        init_model_variables,
        load_eval_checkpoint,
        make_infer_from_cfg,
    )
    from scflow_tpu.config import Config
    from scflow_tpu.datasets import build_dataset
    from scflow_tpu.refiners import build_refiner_from_config
    from scflow_tpu.runtime.eval_loop import multi_process_test
    from scflow_tpu.utils.logging import get_logger

    logger = get_logger("scflow_tpu")
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(Config.parse_options(args.cfg_options))
    np.random.seed(args.seed)

    image_size = tuple(cfg.model.get("renderer", {}).get("image_size", (256, 256)))
    model = build_refiner_from_config(cfg.model)
    render_assets, _ = build_render_assets(cfg.model)
    variables = init_model_variables(cfg.model, model, image_size)
    variables = load_eval_checkpoint(args.checkpoint, variables, cfg.model, logger)

    dataset = build_dataset(cfg.data["test"])
    if args.limit:
        dataset.img_files = dataset.img_files[: args.limit]

    infer, pose_from_output = make_infer_from_cfg(cfg, model, render_assets,
                                                  image_size, slim=True)
    t0 = time.perf_counter()
    test_cfg = cfg.model.get("test_cfg", {})
    results = multi_process_test(
        variables, infer, dataset, pose_from_output=pose_from_output,
        logger=logger,
        max_bucket=test_cfg.get("max_bucket", 64),
        fixed_bucket=test_cfg.get("fixed_bucket", False),
    )
    total = time.perf_counter() - t0
    logger.info(f"{len(results)} images in {total:.1f}s "
                f"({total / max(len(results), 1) * 1e3:.1f} ms/img)")

    if args.out:
        serializable = [
            dict(
                pred={k: np.asarray(v).tolist() for k, v in r["pred"].items()},
                img_metas=r["img_metas"],
            )
            for r in results
        ]
        with open(args.out, "w") as f:
            json.dump(serializable, f)
        logger.info(f"wrote raw results to {args.out}")

    if args.format_only:
        assert args.save_dir, "--format-only requires --save-dir"
        dataset.format_results(results, args.save_dir,
                               time=total / max(len(results), 1))
        logger.info(f"BOP-format results saved to {args.save_dir}")
    if args.eval:
        metric = cfg.get("evaluation", {}).get(
            "metric", {"add": [0.05, 0.10, 0.20, 0.50], "rep": [2, 5, 10, 20]}
        )
        if args.eval_options:
            metric = Config.parse_options(args.eval_options)
        metrics = dataset.evaluate(results, metric=metric)
        ts = time.strftime("%Y%m%d_%H%M%S")
        out_json = os.path.join(
            cfg.get("work_dir", "work_dirs/default"), f"eval_{ts}.json"
        )
        os.makedirs(os.path.dirname(out_json), exist_ok=True)
        with open(out_json, "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f, indent=1)
        logger.info(f"eval metrics dumped to {out_json}")


def parse_serve_args(argv=None):
    p = argparse.ArgumentParser(
        description="Online pose-refinement server (HTTP + micro-batching)")
    p.add_argument("config")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", default=8080, type=int)
    p.add_argument("--frame-hw", type=int, nargs=2, default=[480, 640],
                   help="camera frame size the server accepts")
    p.add_argument("--max-objects", default=64, type=int,
                   help="device batch budget (64 = the measured knee)")
    p.add_argument("--max-frames", default=8, type=int,
                   help="max requests coalesced into one batch")
    p.add_argument("--max-delay-ms", default=5.0, type=float,
                   help="batching window opened by the first queued request")
    p.add_argument("--pow2-buckets", action="store_true",
                   help="pad to shared pow2 buckets instead of one fixed "
                        "batch (cheap-compile backends only)")
    p.add_argument("--keepalive-s", default=0.0, type=float,
                   help="device keep-alive tick interval (runs the real "
                        "serving fn on 1 synthetic object); 0 = off, the "
                        "default — see docs/SERVING.md 'idle cold-start' "
                        "for when it helps and the measured case where "
                        "it did not")
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args(argv)


def serve_main(argv=None):
    args = parse_serve_args(argv)
    _setup_platform()

    from scflow_tpu.apis import (
        build_render_assets,
        init_model_variables,
        load_eval_checkpoint,
        make_serving_from_cfg,
    )
    from scflow_tpu.config import Config
    from scflow_tpu.refiners import build_refiner_from_config
    from scflow_tpu.runtime.server import (
        MicroBatcher,
        PoseService,
        make_http_server,
    )
    from scflow_tpu.utils.logging import get_logger

    logger = get_logger("scflow_tpu")
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(Config.parse_options(args.cfg_options))

    image_size = tuple(cfg.model.get("renderer", {}).get("image_size", (256, 256)))
    model = build_refiner_from_config(cfg.model)
    render_assets, bank = build_render_assets(cfg.model)
    variables = init_model_variables(cfg.model, model, image_size,
                                     num_class=bank.num_class)
    variables = load_eval_checkpoint(args.checkpoint, variables, cfg.model,
                                     logger)

    serve_fn, fetch_keys, post_fn = make_serving_from_cfg(cfg, model,
                                                          render_assets)

    import jax

    mesh = None
    if len(jax.devices()) > 1:  # data-parallel serving over all chips
        from scflow_tpu.parallel import make_mesh

        mesh = make_mesh()
        logger.info(f"serving data-parallel over {len(jax.devices())} devices")
    service = PoseService(
        serve_fn, variables, frame_hw=tuple(args.frame_hw),
        num_class=bank.num_class, max_frames=args.max_frames,
        max_objects=args.max_objects, fixed_bucket=not args.pow2_buckets,
        mesh=mesh, fetch_keys=fetch_keys, post_fn=post_fn,
    )
    logger.info("warming up (compiling the serving fn)...")
    t0 = time.perf_counter()
    service.warmup()
    logger.info(f"warmup done in {time.perf_counter() - t0:.1f}s")

    batcher = MicroBatcher(
        service.dispatch, fetch_batch=service.fetch,
        max_frames=args.max_frames,
        max_objects=args.max_objects, max_delay_ms=args.max_delay_ms,
    )
    keepalive = None
    if args.keepalive_s > 0:
        from scflow_tpu.runtime.server import (DeviceKeepAlive,
                                               make_service_keepalive_tick)

        keepalive = DeviceKeepAlive(make_service_keepalive_tick(service),
                                    interval_s=args.keepalive_s)
    httpd = make_http_server(service, batcher, args.host, args.port)
    logger.info(f"serving on http://{args.host}:{args.port} "
                f"(POST /v1/refine, GET /healthz, GET /v1/stats)")

    import signal

    def _term(signum, frame):
        # k8s/systemd send SIGTERM on rollout; drain like Ctrl-C
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        logger.info("shutting down (draining in-flight batches)")
    finally:
        httpd.shutdown()
        batcher.stop()
        if keepalive is not None:
            keepalive.stop()


def parse_export_args(argv=None):
    p = argparse.ArgumentParser(
        description="Export the jitted inference graph (weights baked in) "
                    "as a portable StableHLO artifact (jax.export)")
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint to bake in (omit = init weights, "
                        "useful only for plumbing tests)")
    p.add_argument("--out", required=True, help="artifact path (.scflowx)")
    p.add_argument("--batch-size", default=16, type=int,
                   help="static object-batch size baked into the graph")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="lowering platforms (default: current backend), "
                        "e.g. --platforms tpu cpu")
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args(argv)


def export_main(argv=None):
    args = parse_export_args(argv)
    _setup_platform()

    from scflow_tpu.apis import (
        build_render_assets,
        init_model_variables,
        load_eval_checkpoint,
        make_infer_from_cfg,
    )
    from scflow_tpu.config import Config
    from scflow_tpu.refiners import build_refiner_from_config
    from scflow_tpu.runtime.export import batch_spec, export_infer
    from scflow_tpu.utils.logging import get_logger

    logger = get_logger("scflow_tpu")
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(Config.parse_options(args.cfg_options))

    image_size = tuple(cfg.model.get("renderer", {}).get("image_size", (256, 256)))
    model = build_refiner_from_config(cfg.model)
    render_assets, bank = build_render_assets(cfg.model)
    variables = init_model_variables(cfg.model, model, image_size,
                                     num_class=bank.num_class)
    if args.checkpoint:
        variables = load_eval_checkpoint(args.checkpoint, variables,
                                         cfg.model, logger)
    else:
        logger.warning("no --checkpoint: exporting INIT weights")

    infer, pose_from_output = make_infer_from_cfg(cfg, model, render_assets,
                                                  image_size)
    if pose_from_output is not None:
        logger.warning(
            "this config solves poses with host-side PnP; the artifact "
            "outputs flow/occlusion — run PnP outside, or set "
            "test_cfg.pnp_backend=device for a pose-emitting artifact")

    spec = batch_spec(args.batch_size, image_size)
    data = export_infer(
        infer, variables, spec, platforms=args.platforms,
        meta={
            "config": os.path.basename(args.config),
            "checkpoint": args.checkpoint or "",
            "model_type": cfg.model["type"],
            "image_size": list(image_size),
            "batch_size": args.batch_size,
        },
    )
    with open(args.out, "wb") as f:
        f.write(data)
    from scflow_tpu.runtime.export import read_meta

    meta = read_meta(data)
    logger.info(
        f"wrote {args.out} ({len(data) / 1e6:.1f} MB, "
        f"platforms={meta['platforms']}, outputs={meta['outputs']})")
