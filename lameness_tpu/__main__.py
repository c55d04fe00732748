"""``python -m lameness_tpu`` — operational entry points.

One binary replaces the reference's 22-container compose file
(docker-compose.yml) and deploy.sh: ``serve`` boots the reactive app +
admin API, ``worker`` joins the shared NATS bus as a headless TPU
inference worker (the deploy/terraform tpu_worker shape), ``process``
runs one video through the full pipeline, ``resume`` replays stranded
jobs.

  python -m lameness_tpu serve [--port 8000] [--data DIR] [--async]
  python -m lameness_tpu worker [--nats-url nats://host:4222] [--warmup]
  python -m lameness_tpu process VIDEO [--data DIR] [--small]
  python -m lameness_tpu resume [--data DIR]
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path


def ingest_spec(cfg=None):
    """EngineSpec honoring LAMENESS_INGEST:

    - ``WxH`` (e.g. ``1024x576``): process at a reduced ingest
      resolution.  The driver decodes+resizes to engine geometry and
      maps results back to native coordinates (serve/driver.py:171), so
      this only changes wire bytes on tunnelled/link-bound backends
      (~36% fewer I420 bytes at 1024x576 — the SAM longest-side resize
      done host-side).
    - ``WxH+WlxHl`` (e.g. ``1024x576+640x360``): split-resolution
      ingest — det/SAM frames at the first geometry (the canonical
      coordinate space), dino/pose frames at the second (neither reads
      more than ~640 px of width).

    pose_pixels auto-selects: with no trained pose checkpoint
    (``<models>/pose``), the heuristic keypoint path never reads pose
    pixels, so pose-only frames are dropped from the wire (bit-identical
    outputs, ~40% fewer transferred bytes).  ``LAMENESS_POSE_PIXELS=1/0``
    overrides."""
    from .pipeline.engine import EngineSpec
    rect = os.environ.get("LAMENESS_SAM_RECT") == "1"
    env_pp = os.environ.get("LAMENESS_POSE_PIXELS")
    if env_pp is not None:
        pose_pixels = env_pp != "0"
    elif cfg is not None:
        pose_pixels = (Path(cfg.dirs.models) / "pose").exists()
    else:
        pose_pixels = True
    ingest = os.environ.get("LAMENESS_INGEST")
    if not ingest:
        return EngineSpec(sam_rect=rect, pose_pixels=pose_pixels)
    parts = ingest.lower().split("+")
    w, h = (int(v) for v in parts[0].split("x"))
    if len(parts) > 1:
        lw, lh = (int(v) for v in parts[1].split("x"))
        return EngineSpec(frame_height=h, frame_width=w,
                          lo_height=lh, lo_width=lw, sam_rect=rect,
                          pose_pixels=pose_pixels)
    return EngineSpec(frame_height=h, frame_width=w, sam_rect=rect,
                      pose_pixels=pose_pixels)


def _build(args, engine_needed=True):
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from .core.config import Config
    from .serve.app import LamenessApp

    cfg = Config.load(data_root=args.data) if args.data else Config()
    engine = None
    if engine_needed:
        if getattr(args, "small", False):
            from .pipeline.engine import make_test_engine
            engine = make_test_engine()
        else:
            from .pipeline.engine import LamenessEngine
            engine = LamenessEngine(spec=ingest_spec(cfg))
        # ComputeConfig.dtype declares the serving precision; bf16 doubles
        # MXU throughput on v5e (encoders cast, heads/norms stay f32 —
        # pipeline/precision.py).  Only on real TPU: CPU test runs keep
        # exact f32 numerics.
        if (cfg.compute.dtype == "bfloat16" and not args.f32
                and jax.default_backend() == "tpu"):
            from .pipeline.precision import apply_engine_policy
            print("precision:", apply_engine_policy(engine), flush=True)
        # data-parallel serving over a chip mesh (v5e-4 pod: --dp auto).
        # After the precision cast so replicate_params spreads the final
        # (bf16) params.
        dp = getattr(args, "dp", None) or os.environ.get("LAMENESS_DP")
        tp = int(getattr(args, "tp", None)
                 or os.environ.get("LAMENESS_TP") or 1)
        if dp or tp > 1:
            n = jax.device_count() if str(dp) == "auto" \
                else int(dp or 1) * tp
            if n > 1:
                if n > jax.device_count():
                    raise SystemExit(
                        f"--dp {dp} --tp {tp}: needs {n} devices, only "
                        f"{jax.device_count()} visible")
                if n % tp != 0:
                    raise SystemExit(
                        f"--dp {dp} --tp {tp}: {n} devices do not "
                        f"divide into a (data={n // tp}, model={tp}) "
                        f"grid — tp must divide the device count")
                from .parallel.mesh import make_mesh
                engine.shard_inference(make_mesh(n, model_parallel=tp))
                print(f"mesh: inference sharded over {n} devices "
                      f"(data={n // tp}, model={tp})", flush=True)
    return cfg, engine, LamenessApp


def main(argv=None):
    ap = argparse.ArgumentParser(prog="lameness_tpu")
    ap.add_argument("--data", help="data root directory")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--f32", action="store_true",
                    help="disable the bf16 engine policy (TPU default: "
                         "encoders bf16 per config.compute.dtype)")
    ap.add_argument("--dp", default=None,
                    help="data-parallel inference over N chips ('auto' = "
                         "all visible devices); clip batches shard over "
                         "the mesh, params replicate (LAMENESS_DP env "
                         "equivalent)")
    ap.add_argument("--tp", type=int, default=None,
                    help="tensor-parallel degree composing with --dp: a "
                         "{data: dp, model: tp} mesh shards the ViT "
                         "towers' heads/MLP over the model axis "
                         "(LAMENESS_TP env equivalent)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("serve", help="reactive app + admin API")
    s.add_argument("--port", type=int, default=8000)
    s.add_argument("--async", dest="async_dispatch", action="store_true",
                   help="worker-pool bus dispatch")
    s.add_argument("--small", action="store_true",
                   help="test-geometry engine")
    s.add_argument("--no-resume", action="store_true")
    s.add_argument("--batch", type=int, default=1,
                   help="group queued clips into engine batches of N")
    s.add_argument("--nats-url", default=None,
                   help="bridge bus subjects to a real NATS server "
                        "(ours via 'nats-server', or a stock Go one)")

    w = sub.add_parser("worker",
                       help="headless TPU inference worker: reactive "
                            "engine consuming the shared NATS bus, no "
                            "admin API (deploy/terraform tpu_worker)")
    w.add_argument("--nats-url", required=False,
                   default=os.environ.get("LAMENESS_NATS_URL"),
                   help="broker to join (default $LAMENESS_NATS_URL)")
    w.add_argument("--warmup", action="store_true",
                   help="compile the stage programs before joining")
    w.add_argument("--batch", type=int, default=1)
    w.add_argument("--small", action="store_true")

    p = sub.add_parser("process", help="one video through the pipeline")
    p.add_argument("video", type=Path)
    p.add_argument("--small", action="store_true")

    rs = sub.add_parser("resume", help="replay stranded processing jobs")
    rs.add_argument("--small", action="store_true",
                    help="test-geometry engine (tiny frames; for tests only "
                         "— production resumes use the full engine)")

    ns = sub.add_parser("nats-server",
                        help="run the first-party NATS core broker")
    ns.add_argument("--host", default="127.0.0.1")
    ns.add_argument("--port", type=int, default=4222)

    qs = sub.add_parser("qdrant-server",
                        help="run the first-party Qdrant-REST vector server")
    qs.add_argument("--host", default="127.0.0.1")
    qs.add_argument("--port", type=int, default=6333)
    qs.add_argument("--persist", default=None,
                    help="JSON persistence path for the backing store")

    ps = sub.add_parser("pg-server",
                        help="run the first-party Postgres-wire DB server "
                             "(SQLite-backed; pair with DATABASE_URL)")
    ps.add_argument("--host", default="127.0.0.1")
    ps.add_argument("--port", type=int, default=5432)
    ps.add_argument("--path", default=":memory:",
                    help="backing SQLite file (default in-memory)")
    ps.add_argument("--user", default="lameness_user")
    ps.add_argument("--password", default="lameness_pass")

    args = ap.parse_args(argv)

    if args.cmd == "qdrant-server":
        from .io.qdrant_wire import QdrantRestServer
        from .io.vecstore import VectorStore
        store = VectorStore(persist_path=Path(args.persist)
                            if args.persist else None)
        srv = QdrantRestServer(store=store, host=args.host, port=args.port)
        port = srv.start()
        print(f"Qdrant-REST vector server on http://{args.host}:{port}",
              flush=True)
        try:
            import time
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            srv.stop()
        return

    if args.cmd == "pg-server":
        from .io.pg_wire import PgWireServer
        srv = PgWireServer(path=args.path, host=args.host, port=args.port,
                           users={args.user: args.password})
        port = srv.start()
        print(f"Postgres-wire DB server on postgres://{args.user}:***@"
              f"{args.host}:{port}/lameness_db", flush=True)
        try:
            import time
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            srv.stop()
        return

    if args.cmd == "nats-server":
        from .io.nats_wire import NatsServer
        srv = NatsServer(host=args.host, port=args.port)
        port = srv.start()
        print(f"NATS broker listening on nats://{args.host}:{port}",
              flush=True)
        try:
            import time
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            srv.stop()
        return

    if args.cmd == "serve":
        cfg, engine, App = _build(args)
        app = App(config=cfg, engine=engine, reactive=True, serve_api=True,
                  api_port=args.port, async_dispatch=args.async_dispatch,
                  resume_inflight=not args.no_resume,
                  clip_batch=args.batch)
        if args.nats_url:
            from .io.bus import NatsBridge
            subjects = [v for v in vars(cfg.subjects).values()
                        if isinstance(v, str)]
            bridge = NatsBridge(app.bus, args.nats_url, subjects=subjects)
            print("NATS bridge:",
                  "connected" if bridge.start() else
                  f"UNREACHABLE at {args.nats_url} (running without)",
                  flush=True)
        print(f"admin UI at http://127.0.0.1:{app.server.port}", flush=True)
        if engine is not None:
            # compile the stage programs (incl. the batch signature) off
            # the request path so the first upload isn't the slow one
            import threading
            threading.Thread(
                target=lambda: engine.warmup(batch=max(1, args.batch)),
                daemon=True, name="engine-warmup").start()
        try:
            import time
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            app.close()
    elif args.cmd == "worker":
        cfg, engine, App = _build(args)
        app = App(config=cfg, engine=engine, reactive=True,
                  serve_api=False, clip_batch=args.batch)
        if args.nats_url:
            from .io.bus import NatsBridge
            subjects = [v for v in vars(cfg.subjects).values()
                        if isinstance(v, str)]
            bridge = NatsBridge(app.bus, args.nats_url, subjects=subjects)
            print("NATS bridge:",
                  "connected" if bridge.start() else
                  f"UNREACHABLE at {args.nats_url} (running without)",
                  flush=True)
        else:
            print("worker: no --nats-url / $LAMENESS_NATS_URL — local bus "
                  "only", flush=True)
        if engine is not None and args.warmup:
            print("warmup:", engine.warmup(batch=max(1, args.batch)),
                  flush=True)
        print("worker ready", flush=True)
        try:
            import time
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            app.close()
    elif args.cmd == "process":
        args.small = getattr(args, "small", False)
        cfg, engine, App = _build(args)
        app = App(config=cfg, engine=engine, reactive=True)
        vid = app.submit_video(args.video)
        result = app.wait_for_analysis(vid, timeout_s=600)
        print(result and result.get("fusion_result"))
        app.close()
        sys.exit(0 if result else 1)
    elif args.cmd == "resume":
        # stranded jobs replay through the SAME geometry that serve/process
        # use — forcing the tiny test engine here would overwrite real
        # result files with garbage (ADVICE r1, medium)
        cfg, engine, App = _build(args)
        app = App(config=cfg, engine=engine, reactive=True)
        n = app.resume_inflight_jobs()
        print(f"resumed {n} job(s)")
        app.close()


if __name__ == "__main__":
    main()
