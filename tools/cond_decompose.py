"""Decompose the conditioned step overhead on the real chip.

Times one b=1 forward in four configurations (bare / face-only /
audio-only / both) at flagship geometry.  Guides the conditioning-path
optimisation (face = 21 perceiver+router layers, audio = 42 cross-attns).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def run(face: bool, audio: bool):
    sys.path.insert(0, ".")
    from bindyouravatar_tpu.config import DiTConfig
    from bindyouravatar_tpu.models.dit import DiT

    cfg = DiTConfig(num_layers=42, is_train_face=face, is_train_audio=audio,
                    param_dtype=jnp.bfloat16, dtype=jnp.bfloat16)
    dit = DiT.create(cfg)
    shapes = jax.eval_shape(lambda k: dit.init(k), jax.random.key(0))
    prep_keys = ("lfe", "audio_statics")
    params = {k: v for k, v in shapes.items() if k not in prep_keys}

    b = 1
    t = cfg.latent_frames
    lat = jnp.zeros((b, t, cfg.in_channels, cfg.sample_height, cfg.sample_width),
                    jnp.bfloat16)
    text = jnp.zeros((b, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.bfloat16)
    ts = jnp.full((b,), 500.0)
    rope = dit.rope(480, 720, t)
    fe = (jnp.zeros((b, cfg.num_ids, cfg.lfe_num_tokens, cfg.lfe_final_output_dim),
                    jnp.bfloat16) if face else None)
    ac = (jnp.zeros((b, cfg.num_ids, t, dit.audio_cfg.context_tokens,
                     dit.audio_cfg.audio_dim), jnp.bfloat16) if audio else None)
    af = (jnp.broadcast_to(jnp.eye(cfg.num_ids, dtype=jnp.bfloat16)[None],
                           (b, cfg.num_ids, cfg.num_ids)) if audio else None)

    from jax.experimental.layout import Format, Layout

    def fwd(p, l, fe, ac, af):
        out, _ = dit.apply(p, l, text, ts, rope, face_emb=fe, audio_ctx=ac,
                           af_matrix=af)
        return out

    sds = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                       (params, lat, fe, ac, af))
    compiled = (jax.jit(fwd, in_shardings=Format(Layout.AUTO))
                .lower(*sds).compile())
    fmts, _ = compiled.input_formats
    # materialise each param leaf DIRECTLY into its AUTO format (zeros ->
    # device_put leaf-by-leaf, same as bench.py): a whole-tree zeros +
    # whole-tree device_put holds 2x the re-laid-out leaves and OOMs the
    # 16 GB chip at flagship geometry
    args = jax.tree.map(
        lambda s, fmt: jax.device_put(jnp.zeros(s.shape, s.dtype), fmt)
        if isinstance(s, jax.ShapeDtypeStruct) else jax.device_put(s, fmt),
        (sds[0], lat, fe, ac, af), fmts)

    out = compiled(*args)
    float(out[0, 0, 0, 0, 0])
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        out = compiled(*args)
    float(out[0, 0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / n
    for leaf in jax.tree.leaves(args):
        leaf.delete()
    return dt


def main():
    res = {}
    for name, face, audio in (("bare", False, False), ("face", True, False),
                              ("audio", False, True), ("both", True, True)):
        import gc

        dt = run(face, audio)
        gc.collect()
        res[name] = round(dt * 1e3, 1)
        print(f"{name}: {res[name]} ms", flush=True)
    res["face_overhead_ms"] = round(res["face"] - res["bare"], 1)
    res["audio_overhead_ms"] = round(res["audio"] - res["bare"], 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
