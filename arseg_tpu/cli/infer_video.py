"""AR video inference CLI: run the GOP pipeline over a decoded sequence.

Consumes the label-free sequence layout (`CamVidWithFlowTest`,
reference `dataset/camvid.py:1153-1426`): decoded frames `NNNNN.png`,
keyframes under --ref_path, merged MV bins under --flow_path. Emits per-frame
argmax class maps (and optional CamVid-palette PNGs) using the whole-GOP
jitted AR pipeline (HR keyframe amortized over ref_gap-1 LR frames).
"""

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="AR video inference over a decoded sequence.")
    p.add_argument("--data_path", default=None,
                   help="decoded frame dir (NNNNN.png); required unless --streams")
    p.add_argument("--ref_path", default=None,
                   help="decoded keyframe dir (default: --data_path — "
                        "keyframes read from the decoded sequence itself)")
    p.add_argument("--flow_path", default=None,
                   help="merged MV bin dir; required unless --streams")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--hr_snapshot", required=True)
    p.add_argument("--ar_snapshot", required=True)
    p.add_argument("--backend", default="camvid-psp18")
    p.add_argument("--ref_gap", type=int, default=12)
    p.add_argument("--scale", type=float, default=0.5)
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--lr_chunk", type=int, default=1)
    p.add_argument("--colorize", action="store_true")
    p.add_argument("--flow_shape", type=int, nargs=2, default=None)
    p.add_argument("--prefetch", type=int, default=2,
                   help="GOPs staged ahead (host decode + H2D overlap device "
                        "compute; 0 = serial loading)")
    p.add_argument("--io_workers", type=int, default=2)
    p.add_argument("--gop_batch", type=int, default=1,
                   help="GOPs per program call (multi-GOP throughput mode: "
                        "HR keyframes + LR phase 1 batch across the stack; "
                        "~1.5x at 8 on v5e — PERF.md 'batching arms race'. "
                        "1 = latency-oriented GOP-at-a-time)")
    p.add_argument("--streams", default=None,
                   help="multi-stream sharded serving: comma list of "
                        "data_dir:flow_dir[:ref_dir] specs, one per stream. "
                        "Streams shard over a 'data' device mesh "
                        "(ARPipeline.sharded_step); outputs land in "
                        "out_dir/s<k>/. Stream count must be a multiple of "
                        "--num_devices.")
    p.add_argument("--num_devices", type=int, default=None,
                   help="mesh size for --streams (default: all devices that "
                        "divide the stream count)")
    p.add_argument("--stats_json", default=None,
                   help="write serving stats (per-dispatch p50/p95/max ms, "
                        "frames/sec) to this JSON file at exit")
    p.add_argument("--gop_devices", type=int, default=None,
                   help="latency scale-out for ONE stream: shard the GOP's "
                        "non-key frames over an N-device mesh "
                        "(ARPipeline.gop_parallel_step; keyframe branch "
                        "replicated). Mutually exclusive with --gop_batch/"
                        "--streams.")
    p.add_argument("--video", default=None,
                   help="serve DIRECTLY from a compressed HEVC bitstream "
                        "(frames decoded in-process, no PNG intermediary); "
                        "requires --mv_carrier. Mutually exclusive with "
                        "--data_path/--flow_path/--streams.")
    p.add_argument("--mv_carrier", default=None,
                   help="H.264 carrier bitstream for --video (same frames, "
                        "same --ref_gap; MVs decoded + chain-merged in "
                        "memory)")
    p.add_argument("--mv_analysis", default=None,
                   help="x265 analysis-save sidecar of the --video stream "
                        "(written by `arseg-preprocess`/arsegvid encodes as "
                        "<stream>.analysis): HEVC-native PU MVs, no carrier "
                        "needed. Mutually exclusive with --mv_carrier.")
    args = p.parse_args(argv)

    # flag validation BEFORE the expensive model/checkpoint loads
    if args.gop_batch > 1 and args.lr_chunk > 1:
        p.error("--gop_batch requires the default lr_chunk=1 (batched phase 1)")
    if args.streams:
        if args.gop_batch > 1:
            p.error("--streams and --gop_batch are mutually exclusive "
                    "(streams batch across the mesh instead)")
        if args.video or args.mv_carrier or args.mv_analysis:
            p.error("--video serves one stream; use --streams OR --video")
        if args.gop_devices:
            p.error("--streams and --gop_devices are mutually exclusive "
                    "(shard streams over the mesh OR one stream's frames)")
        for s_ in args.streams.split(","):
            spec = s_.split(":")
            if _is_video_spec(spec):
                missing = [f for f in spec if not os.path.isfile(f)]
                if missing:
                    raise SystemExit(
                        f"video stream file(s) not found: {missing}")
    elif args.video or args.mv_carrier or args.mv_analysis:
        if args.mv_carrier and args.mv_analysis:
            p.error("--mv_carrier and --mv_analysis are mutually exclusive")
        if not (args.video and (args.mv_carrier or args.mv_analysis)):
            p.error("--video goes with --mv_carrier or --mv_analysis")
        if args.data_path or args.flow_path:
            p.error("--video is mutually exclusive with --data_path/--flow_path")
    elif not (args.data_path and args.flow_path):
        p.error("--data_path and --flow_path are required unless --streams "
                "or --video is given")
    if args.gop_devices:
        if args.gop_batch > 1:
            p.error("--gop_devices and --gop_batch are mutually exclusive "
                    "(frame-parallel latency mode vs multi-GOP throughput)")
        import jax

        # honor the request exactly — data_mesh would silently clamp to
        # the available devices (same guard as --num_devices)
        if args.gop_devices > len(jax.devices()):
            raise SystemExit(
                f"--gop_devices {args.gop_devices} > {len(jax.devices())} "
                "available devices")

    import jax.numpy as jnp

    from arseg_tpu.data.camvid import CamVidWithFlowTest, FLOW_SHAPE
    from arseg_tpu.gop import ARPipeline
    from arseg_tpu.gop.feeder import AsyncWriter, GOPFeeder
    from arseg_tpu.models import build_model
    from arseg_tpu.utils.checkpoint import load_checkpoint
    from arseg_tpu.utils.profiling import StepTimer

    hr_model = build_model(args.backend, fuse=False)
    ar_model = build_model(args.backend, fuse=True)
    from arseg_tpu.utils.tree import cast_f32

    # params RESIDENT in the serving dtype: cast ONCE at load (leaving them
    # f32 would re-cast the whole tree on device every GOP step)
    hr_params = cast_f32(load_checkpoint(args.hr_snapshot)["params"], args.dtype)
    ar_params = cast_f32(load_checkpoint(args.ar_snapshot)["params"], args.dtype)

    flow_shape = tuple(args.flow_shape) + (2,) if args.flow_shape else FLOW_SHAPE
    # default (lr_chunk=1): GOP-batched phase 1 + per-frame fuse, the fast
    # serving structure; an explicit --lr_chunk>1 selects the legacy chunked
    # per-frame path instead
    pipe = ARPipeline(
        hr_model, ar_model, scale=args.scale, dtype=jnp.dtype(args.dtype),
        lr_chunk=args.lr_chunk,  # lr_chunk>1 selects the legacy chunked path
        # inert for the f32 file-based feeds; lets --video ship raw uint8
        # frames and normalize on device (gop/video_source.py)
        normalize=_backend_norm(args.backend),
    )

    os.makedirs(args.out_dir, exist_ok=True)
    g = args.ref_gap

    if args.streams:
        _run_streams(args, pipe, hr_params, ar_params, flow_shape)
        return
    if args.gop_devices:
        from arseg_tpu.parallel import data_mesh

        pipe = pipe.gop_parallel_step(data_mesh(args.gop_devices))
    if args.video:
        mean, std = _backend_norm(args.backend)
        from arseg_tpu.gop.video_source import VideoGOPSource

        src = VideoGOPSource(args.video, args.mv_carrier or args.mv_analysis,
                             g, mean, std, device_normalize=True,
                             mv_kind="analysis" if args.mv_analysis
                             else "carrier")
        _serve_gops(args, pipe, hr_params, ar_params, src, names=None)
        return

    ds = CamVidWithFlowTest(
        args.data_path, ref_gap=args.ref_gap,
        ref_path=args.ref_path or args.data_path,
        flow_path=args.flow_path, flow_shape=flow_shape,
    )
    if len(ds) < g:
        raise SystemExit(f"sequence has {len(ds)} frames < --ref_gap {g}")
    names = [os.path.basename(p_)[:-4] for p_ in ds.data]
    _serve_gops(args, pipe, hr_params, ar_params, ds, names)


def _serve_gops(args, pipe, hr_params, ar_params, source, names):
    """The single-stream serve loop shared by the file-based and --video
    paths: pipelined GOPFeeder in, AsyncWriter out. `names`: per-frame
    output names, or None to index-name (video sources have no input
    files)."""
    import jax.numpy as jnp

    from arseg_tpu.gop.feeder import AsyncWriter, GOPFeeder
    from arseg_tpu.utils.profiling import StepTimer

    g = args.ref_gap
    # pipelined serving: worker threads decode and stage GOPs on device
    # `--prefetch` ahead; a writer thread handles D2H + PNG encode — host
    # IO overlaps device compute both ways (gop/feeder.py). With
    # gop_batch>1 each staged item is a [B,...] stack (~gop_batch x the
    # HBM), so staging depth is held at 1.
    feeder = GOPFeeder(
        source, g, num_workers=args.io_workers,
        depth=max(1, args.prefetch if args.gop_batch == 1 else 1),
        stage=args.prefetch > 0,
        gop_batch=args.gop_batch,
    )
    writer = AsyncWriter(args.out_dir, colorize=args.colorize)
    timer = StepTimer(frames_per_step=g)
    total = 0
    for gi, keyframe, frames, flows in feeder:
        n_frames = (frames.shape[0] * g) if frames.ndim == 5 else g
        with timer.step(n_frames):
            preds = pipe(hr_params, ar_params, jnp.asarray(keyframe),
                         jnp.asarray(frames), flows)
            np.asarray(preds[(0,) * preds.ndim])  # one-elt sync (axon-safe, see bench.py)
        nm = (names[gi * g : gi * g + n_frames] if names is not None
              else [f"{i:05d}" for i in range(gi * g, gi * g + n_frames)])
        writer.put(preds.reshape(-1, *preds.shape[-2:]), nm)
        total += n_frames
    writer.close()
    if total == 0:
        raise SystemExit(
            f"no full GOP in the input (< --ref_gap {g} frames?)")
    s = timer.summary()
    if args.stats_json:
        import json

        with open(args.stats_json, "w") as f:
            json.dump(s, f, indent=2)
    rate = (
        f"{s['frames_per_sec']:.1f} frames/sec"
        if s["steps"] > 1
        else f"single GOP incl. compile: {s['mean_ms'] / 1e3:.1f}s"
    )
    print(f"{total} frames -> {args.out_dir}  ({rate})")


_VIDEO_EXTS = (".hevc", ".265", ".264", ".h264", ".mp4", ".bin")


def _is_video_spec(spec):
    """A 2-element --streams spec naming bitstream files (vs PNG/bin dirs)."""
    return len(spec) == 2 and (
        spec[0].lower().endswith(_VIDEO_EXTS) or os.path.isfile(spec[0])
    )


def _backend_norm(backend):
    """Normalization constants of the backend's training dataset."""
    backend = backend.lower()  # build_model lowercases its key too
    if backend.startswith("camvid"):
        from arseg_tpu.data.camvid import CAMVID_MEAN, CAMVID_STD

        return CAMVID_MEAN, CAMVID_STD
    from arseg_tpu.data.cityscapes import MEANS

    return MEANS["bisenet" if "bise" in backend else "pspnet"]


def _run_streams(args, pipe, hr_params, ar_params, flow_shape):
    """Multi-stream sharded serving: one sequence per stream, streams
    sharded over a 'data' device mesh (each device runs the whole GOP
    program on its local streams — the deployment scale-out axis,
    ARPipeline.sharded_step). Host assembly uses one GOPFeeder per stream;
    stream outputs go to out_dir/s<k>/."""
    import os

    import jax
    import numpy as np

    from arseg_tpu.data.camvid import CamVidWithFlowTest
    from arseg_tpu.gop.feeder import AsyncWriter, GOPFeeder
    from arseg_tpu.parallel import data_mesh, replicate, shard_batch
    from arseg_tpu.utils.profiling import StepTimer

    g = args.ref_gap
    specs = [s.split(":") for s in args.streams.split(",") if s]
    # all streams stack into ONE batch, so every stream must contribute the
    # same dtype: an all-video fleet ships raw uint8 (device-side
    # normalize, 4x less H2D + no host f32 broadcast); any file-based
    # stream forces host-normalized f32 everywhere
    all_video = all(_is_video_spec(s) for s in specs if len(s) == 2) and all(
        len(s) == 2 for s in specs
    )
    datasets = []
    for spec in specs:
        if len(spec) not in (2, 3):
            raise SystemExit(f"bad --streams entry {':'.join(spec)!r} "
                             "(want data_dir:flow_dir[:ref_dir], or "
                             "video.hevc:carrier.264)")
        if _is_video_spec(spec):
            missing = [f for f in spec if not os.path.isfile(f)]
            if missing:
                raise SystemExit(f"video stream file(s) not found: {missing}")
            from arseg_tpu.gop.video_source import VideoGOPSource

            mean, std = _backend_norm(args.backend)
            n_streams = len(specs)
            datasets.append(VideoGOPSource(
                spec[0], spec[1], g, mean, std,
                device_normalize=all_video,
                merge_threads=max(1, (os.cpu_count() or 1) // n_streams)))
            continue
        data_dir, flow_dir = spec[0], spec[1]
        ref_dir = spec[2] if len(spec) == 3 else data_dir
        datasets.append(CamVidWithFlowTest(
            data_dir, ref_gap=g, ref_path=ref_dir,
            flow_path=flow_dir, flow_shape=flow_shape,
        ))
    s_count = len(datasets)
    file_ds = [(sp, d) for sp, d in zip(specs, datasets)
               if not hasattr(d, "iter_gops")]
    if any(len(d) < g for _, d in file_ds):
        short = [sp[0] for sp, d in file_ds if len(d) < g]
        raise SystemExit(f"stream(s) shorter than --ref_gap {g}: {short}")

    if args.num_devices is not None:
        # honor the request exactly — data_mesh's divisibility clamp would
        # silently serve on fewer devices than asked
        if s_count % args.num_devices:
            raise SystemExit(
                f"{s_count} streams not divisible by --num_devices {args.num_devices}"
            )
        mesh = data_mesh(args.num_devices)
    else:
        mesh = data_mesh(batch_size=s_count)
    sstep = pipe.sharded_step(mesh)
    hr_params = replicate(hr_params, mesh)
    ar_params = replicate(ar_params, mesh)

    writers, names = [], []
    for k, ds in enumerate(datasets):
        sub = os.path.join(args.out_dir, f"s{k}")
        os.makedirs(sub, exist_ok=True)
        writers.append(AsyncWriter(sub, colorize=args.colorize))
        # video streams have no input filenames; index-named outputs
        names.append(None if hasattr(ds, "iter_gops")
                     else [os.path.basename(p_)[:-4] for p_ in ds.data])

    per_stream_workers = max(1, -(-args.io_workers // s_count))  # ceil, >= 1
    feeders = [
        iter(GOPFeeder(ds, g, num_workers=per_stream_workers,
                       depth=max(1, args.prefetch), stage=False))
        for ds in datasets
    ]
    timer = StepTimer(frames_per_step=s_count * g)
    n_gops = 0
    for gi, items in enumerate(zip(*feeders)):  # stops at the shortest stream
        n_gops = gi + 1
        batch = shard_batch(
            {
                "kf": np.stack([it[1][0] for it in items]),
                "fr": np.stack([it[2] for it in items]),
                "fx": np.stack([it[3][0] for it in items]),
                "fy": np.stack([it[3][1] for it in items]),
            },
            mesh,
        )
        with timer:
            preds = sstep(hr_params, ar_params, batch["kf"], batch["fr"],
                          batch["fx"], batch["fy"])
            np.asarray(preds[0, 0, 0, 0])  # one-elt sync (axon-safe)
        for k in range(s_count):
            nm = (names[k][gi * g : (gi + 1) * g] if names[k] is not None
                  else [f"{i:05d}" for i in range(gi * g, (gi + 1) * g)])
            writers[k].put(preds[k], nm)
    for w in writers:
        w.close()
    if n_gops == 0:
        raise SystemExit(
            f"no full GOP served — every stream needs >= --ref_gap {g} frames")
    s = timer.summary()
    if args.stats_json:
        import json

        with open(args.stats_json, "w") as f:
            json.dump(s, f, indent=2)
    rate = (
        f"{s['frames_per_sec']:.1f} frames/sec"
        if s["steps"] > 1
        else f"single GOP incl. compile: {s['mean_ms'] / 1e3:.1f}s"
    )
    print(
        f"{s_count} streams x {n_gops * g} frames -> {args.out_dir} "
        f"({mesh.devices.size}-device mesh, {rate})"
    )


if __name__ == "__main__":
    main()
