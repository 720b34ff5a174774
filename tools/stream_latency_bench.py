"""Streaming-decode first-chunk latency on the real chip (VERDICT r3 #7).

The NDJSON streaming path (`serving/server.py` on_chunk -> HTTP chunks)
emits video as `vae.decode_stream` yields — the user-visible win is
TIME-TO-FIRST-FRAME: the first pixels leave the server after ONE chunk
decode instead of the full 13-latent-frame decode.  This tool measures, at
the flagship 49f x 480p geometry on one chip:

  - full chunked decode wall time (the non-streaming baseline),
  - time to FIRST yielded chunk of `decode_stream`,
  - per-chunk cadence for the remaining chunks.

    python tools/stream_latency_bench.py [temporal_chunk=2]

Supersedes: the reference has no streaming decode (its pipeline decodes the
whole clip then writes an mp4, `pipeline_bindyouravatar.py:962-1001`).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bindyouravatar_tpu.config import VAEConfig
    from bindyouravatar_tpu.models.vae import CausalVAE

    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    vae = CausalVAE(VAEConfig())
    shapes = jax.eval_shape(
        lambda k: vae.init(k), jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    # flagship latents: 13 latent frames, 480p/8 spatial
    lat = jax.random.normal(jax.random.key(1), (1, 13, 16, 60, 90),
                            jnp.float32) * 0.2

    # warm both chunk-shape compiles (first + tail) off the clock
    for _, frames in vae.decode_stream(params, lat, chunk):
        float(frames[0, 0, 0, 0, 0])

    t0 = time.time()
    n = 0
    first = None
    for _, frames in vae.decode_stream(params, lat, chunk):
        float(frames[0, 0, 0, 0, 0])       # relay-safe sync
        if first is None:
            first = time.time() - t0
        n += 1
    total = time.time() - t0

    print(json.dumps({
        "temporal_chunk": chunk,
        "chunks": n,
        "first_chunk_s": round(first, 2),
        "full_decode_s": round(total, 2),
        "first_frame_speedup": round(total / first, 2),
        "geometry": "49f x 480p (13 latent frames)",
    }))


if __name__ == "__main__":
    main()
