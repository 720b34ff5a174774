#!/usr/bin/env python
"""Serve the pipeline over HTTP (superset — the reference has no server).

Builds the model exactly like `infer.py` (same flags: checkpoints, --tp
tensor-parallel sharding, --sp ring attention, tiny/5b sizes), wraps it in
the double-buffered `InferenceServer`, and exposes the stdlib JSON/npy
endpoint from `bindyouravatar_tpu.serving`:

    python tools/serve.py --model_size tiny --port 8976 &
    curl -s localhost:8976/healthz
    curl -s -X POST localhost:8976/generate -d '{"prompt_embeds": "pe.npy",
        "image": "img.npy", "seed": 1, "output": "out.npy"}'

The denoise loop compiles on the first request for its shape (~minutes for
the 42-layer model; per-process caches only — see CLAUDE.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from infer import build_models, get_args, load_params

    argv = list(sys.argv[1:] if argv is None else argv)
    port = int(os.environ.get("BYA_SERVE_PORT", "8976"))
    host, data_root = "127.0.0.1", None
    if "--port" in argv:
        i = argv.index("--port")
        port = int(argv[i + 1])
        del argv[i:i + 2]
    if "--host" in argv:   # opt-in exposure; pair with --data_root
        i = argv.index("--host")
        host = argv[i + 1]
        del argv[i:i + 2]
    if "--data_root" in argv:
        i = argv.index("--data_root")
        data_root = argv[i + 1]
        del argv[i:i + 2]
    batch_max = 1
    if "--batch_max" in argv:   # cross-clip request batching (TP serving)
        i = argv.index("--batch_max")
        batch_max = int(argv[i + 1])
        del argv[i:i + 2]
    if host not in ("127.0.0.1", "localhost") and data_root is None:
        raise SystemExit("--host exposes np.load/np.save on request paths; "
                         "non-loopback binds require --data_root to confine "
                         "them")
    args = get_args(argv)

    import jax

    from bindyouravatar_tpu.serving import InferenceServer, serve_http

    pipe = build_models(args)
    params = load_params(pipe, args)
    if args.tp > 1:
        from bindyouravatar_tpu.parallel.mesh import create_mesh
        from bindyouravatar_tpu.parallel.tp import shard_params_tp

        mesh = create_mesh(dp=1, fsdp=1, tp=args.tp,
                           devices=jax.devices()[:args.tp])
        params["dit"] = shard_params_tp(params["dit"], mesh)
        print(f"[tp] DiT params sharded over {args.tp} chips")

    server = InferenceServer(pipe, params, batch_max=batch_max)
    print(f"[serve] listening on {host}:{port} "
          f"(steps={args.num_inference_steps}, size={args.model_size}; "
          f"first request compiles the denoise loop)")
    serve_http(server, host=host, port=port, block=True, data_root=data_root)


if __name__ == "__main__":
    main()
