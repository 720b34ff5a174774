"""CLI / preprocessing / media / cfg tests."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_cfg_merge(tmp_path):
    from bindyouravatar_tpu.utils.cfg_files import (load_merged_argv, parse_cfg)

    d = tmp_path / "default.cfg"
    d.write_text("--model_size tiny\n--num_inference_steps 4  # comment\n")
    s = tmp_path / "001.cfg"
    s.write_text('--prompt "two people talking"\n--num_inference_steps 2\n')
    argv = load_merged_argv(str(d), str(s))
    assert "--model_size" in argv and "tiny" in argv
    i = argv.index("--num_inference_steps")
    assert argv[i + 1] == "2"            # sample overrides default
    assert "two people talking" in argv


def test_face_processor_fullframe():
    from bindyouravatar_tpu.preprocess.face import build_default_processor
    from bindyouravatar_tpu.models.eva_clip import EVACLIPVision

    import jax

    eva = EVACLIPVision.tiny()
    proc = build_default_processor(eva=eva, eva_params=eva.init(jax.random.key(0)))
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (100, 80, 3), dtype=np.uint8) for _ in range(2)]
    out = proc.process_split(imgs, (48, 96))
    assert out["id_cond"].shape == (1, 2, 512 + eva.cfg.out_dim)
    assert out["id_vit_hidden"].shape[0:2] == (1, 2)
    assert out["canvas"].shape == (48, 96, 3)
    # deterministic
    out2 = proc.process_split(imgs, (48, 96))
    np.testing.assert_allclose(out["id_cond"], out2["id_cond"], atol=1e-5)


def test_alignment_umeyama_identity():
    from bindyouravatar_tpu.preprocess.face import ARCFACE_DST, estimate_norm

    m = estimate_norm(ARCFACE_DST.copy(), 112)
    np.testing.assert_allclose(m[:, :2], np.eye(2), atol=1e-5)
    np.testing.assert_allclose(m[:, 2], 0.0, atol=1e-4)


def test_media_export_roundtrip(tmp_path):
    from bindyouravatar_tpu.utils.media import export_to_video
    from bindyouravatar_tpu.training.data import read_video_frames

    frames = (np.random.default_rng(0).integers(
        0, 255, (5, 48, 64, 3)).astype(np.uint8))
    p = str(tmp_path / "v.mp4")
    export_to_video(frames, p, fps=5)
    assert os.path.getsize(p) > 0
    back = read_video_frames(p, [0, 4])
    assert back.shape == (2, 48, 64, 3)


def test_sam2_fallback_masks(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from sam2_tools import fallback_masks, write_masks

    rng = np.random.default_rng(0)
    frames = np.full((4, 32, 48, 3), 128, np.uint8)
    frames[:, 8:24, 4:16] = rng.integers(0, 255, (4, 16, 12, 3))   # left actor
    frames[:, 8:24, 30:44] = rng.integers(0, 255, (4, 16, 14, 3))  # right actor
    masks = fallback_masks(frames)
    assert masks.shape == (2, 4, 32, 48)
    assert masks[0, :, :, :24].sum() > 0 and masks[0, :, :, 24:].sum() == 0
    write_masks(masks, str(tmp_path / "m"))
    assert os.path.isfile(str(tmp_path / "m" / "1" / "annotated_frame_00000.png"))

    from bindyouravatar_tpu.utils.masks import masks_to_routing_logits

    routing = masks_to_routing_logits(str(tmp_path / "m"), 2, 4, 6)
    assert routing.shape == (1, 2 * 4 * 6, 2)


@pytest.mark.slow
def test_cli_tiny_end_to_end(tmp_path):
    """Full CLI flow on the tiny model: audio conditioning -> generate ->
    mp4.  (Face embedding dims are tied to the full-size encoders, so the
    tiny CLI run exercises the audio path; the face path is covered by
    test_pipeline / test_face_processor_fullframe.)"""
    import torch

    import infer

    a1 = str(tmp_path / "a1.pt")
    a2 = str(tmp_path / "a2.pt")
    # tiny audio cfg: blocks=2, dim=16; 9 frames + 4 slack
    for p in (a1, a2):
        torch.save(torch.randn(13, 2, 16), p)

    out = infer.main([
        "--model_size", "tiny",
        "--audio_path", a1, a2,
        "--num_inference_steps", "2", "--num_frames", "9",
        "--height", "128", "--width", "192",
        "--output_dir", str(tmp_path / "out")])
    assert os.path.isfile(out) and os.path.getsize(out) > 0


def test_draw_kps():
    from bindyouravatar_tpu.utils.media import draw_kps

    kps = np.array([[20, 30], [60, 30], [40, 45], [28, 60], [52, 60]], np.float32)
    img = draw_kps(96, 96, [kps])
    assert img.shape == (96, 96, 3)
    assert img.sum() > 0
    assert (img[0, 0] == 0).all()   # background black


def test_batch_driver_plumbing(tmp_path, monkeypatch):
    """batch_run_samples merges default+sample cfgs and invokes the CLI once
    per sample with per-sample output dirs (infer.main mocked)."""
    cfg_dir = tmp_path / "config"
    cfg_dir.mkdir()
    (cfg_dir / "default.cfg").write_text("--model_size tiny\n--seed 1\n")
    (cfg_dir / "001.cfg").write_text('--prompt "a"\n')
    (cfg_dir / "002.cfg").write_text('--prompt "b"\n--seed 7\n')

    calls = []
    import infer

    monkeypatch.setattr(infer, "main", lambda argv: calls.append(argv))
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import batch_run_samples

    monkeypatch.setattr("sys.argv", ["batch_run_samples.py",
                                     "--config_dir", str(cfg_dir),
                                     "--output_root", str(tmp_path / "out")])
    try:
        batch_run_samples.main()
    except SystemExit as e:
        assert int(e.code or 0) == 0
    assert len(calls) == 2
    assert "--seed" in calls[0] and calls[0][calls[0].index("--seed") + 1] == "1"
    assert calls[1][calls[1].index("--seed") + 1] == "7"
    assert str(tmp_path / "out" / "001") in calls[0]


def test_cli_lora_and_negative_embeds(tmp_path):
    """`--lora_path` fuses through load_params (fused != base forward, and
    == an unfused lora-slot run), and `--negative_prompt_embeds` loads into
    the CFG pair (reference infer.py:199,279 + pipeline:295-374)."""
    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    import infer
    from bindyouravatar_tpu.models.dit import DiT
    from bindyouravatar_tpu.training.checkpoint import import_lora_safetensors

    rank = 4
    dit_l = DiT.tiny(lora_rank=rank, in_channels=8, out_channels=4)
    c = dit_l.cfg
    inner = c.num_attention_heads * c.attention_head_dim
    rng = np.random.default_rng(11)
    sd = {}
    for i in range(c.num_layers):
        for proj in ("to_q", "to_k"):
            base = f"transformer.transformer_blocks.{i}.attn1.{proj}"
            sd[f"{base}.lora_A.weight"] = rng.normal(
                0, 0.2, (rank, c.inner_dim)).astype(np.float32)
            sd[f"{base}.lora_B.weight"] = rng.normal(
                0, 0.2, (inner, rank)).astype(np.float32)
    f = str(tmp_path / "lora.safetensors")
    save_file(sd, f)

    base_argv = ["--model_size", "tiny"]
    args_base = infer.get_args(base_argv)
    args_lora = infer.get_args(base_argv + [
        "--lora_path", f, "--lora_alpha", str(c.lora_alpha)])
    pipe = infer.build_models(args_base)
    p_base = infer.load_params(pipe, args_base)
    p_lora = infer.load_params(pipe, args_lora)

    t, _, _ = c.latent_grid
    lat = jax.random.normal(jax.random.key(1),
                            (1, t, c.in_channels, c.sample_height,
                             c.sample_width))
    text = jax.random.normal(jax.random.key(2),
                             (1, c.max_text_seq_length, c.text_embed_dim))
    ts = jnp.full((1,), 300.0)
    rope = pipe.dit.rope(c.sample_height * 8, c.sample_width * 8, t)
    out_base, _ = pipe.dit.apply(p_base["dit"], lat, text, ts, rope)
    out_cli, _ = pipe.dit.apply(p_lora["dit"], lat, text, ts, rope)
    assert not np.allclose(np.asarray(out_base), np.asarray(out_cli),
                           atol=1e-4)

    # unfused run with lora slots == the CLI-fused run
    import flax.traverse_util as tu

    p_slots = dit_l.init(jax.random.key(0))
    flat = tu.flatten_dict(p_slots)
    flat_base = tu.flatten_dict(p_base["dit"])
    for k in flat:
        if k in flat_base:
            flat[k] = flat_base[k]
    p_unfused = import_lora_safetensors(sd, dit_l, tu.unflatten_dict(flat))
    out_unfused, _ = dit_l.apply(p_unfused, lat, text, ts, rope)
    np.testing.assert_allclose(np.asarray(out_cli), np.asarray(out_unfused),
                               atol=2e-4, rtol=1e-4)

    # negative_prompt_embeds flag surface
    pe = np.random.default_rng(0).normal(
        0, 1, (1, c.max_text_seq_length, c.text_embed_dim)).astype(np.float32)
    npe = np.full_like(pe, 0.5)
    np.save(tmp_path / "pe.npy", pe)
    np.save(tmp_path / "ne.npy", npe)
    args = infer.get_args(["--prompt_embeds", str(tmp_path / "pe.npy"),
                           "--negative_prompt_embeds",
                           str(tmp_path / "ne.npy")])
    assert args.negative_prompt_embeds.endswith("ne.npy")


def test_cli_draw_routing_logits(tmp_path):
    """`--draw_routing_logits` surface: save_routing_debug renders per-layer
    + mean mask mp4s from [steps, num_ca, B, S, I] routing (reference
    draw_routing_logit, util/utils.py:771-784), and the CLI flag completes
    (warning) when the face/router path is off."""
    import infer

    rng = np.random.default_rng(0)
    r = rng.uniform(0, 1, (3, 2, 1, 2 * 4 * 6, 2)).astype(np.float32)
    infer.save_routing_debug(r, (2, 4, 6), str(tmp_path), fps=5)
    dbg = tmp_path / "routing_logits"
    files = sorted(os.listdir(dbg))
    assert files == ["final_step_layer00.mp4", "final_step_layer01.mp4",
                     "mean_over_steps_layers.mp4"]
    assert all(os.path.getsize(dbg / f) > 0 for f in files)

    # no face conditioning -> routing is None -> loud warning, no crash
    infer.save_routing_debug(None, (2, 4, 6), str(tmp_path), fps=5)

    import torch

    a1, a2 = str(tmp_path / "a1.pt"), str(tmp_path / "a2.pt")
    for p in (a1, a2):
        torch.save(torch.randn(13, 2, 16), p)
    out = infer.main([
        "--model_size", "tiny", "--draw_routing_logits",
        "--audio_path", a1, a2,
        "--num_inference_steps", "2", "--num_frames", "9",
        "--height", "128", "--width", "192",
        "--output_dir", str(tmp_path / "out_r")])
    assert os.path.isfile(out)


def test_cli_tiny_tp2(tmp_path):
    """infer.py --tp 2: TP-sharded serving path through the full CLI
    (the conditioned flagship needs >=2 chips for weights)."""
    import torch

    import infer

    a1 = str(tmp_path / "a1.pt")
    a2 = str(tmp_path / "a2.pt")
    for p in (a1, a2):
        torch.save(torch.randn(13, 2, 16), p)

    out = infer.main([
        "--model_size", "tiny", "--tp", "2",
        "--audio_path", a1, a2,
        "--num_inference_steps", "2", "--num_frames", "9",
        "--height", "128", "--width", "192",
        "--seed", "3",
        "--output_dir", str(tmp_path / "out_tp")])
    assert os.path.isfile(out) and os.path.getsize(out) > 0


def test_batch_golden_tier(tmp_path, monkeypatch):
    """The full shipped cfg tier (assets/config/000..006.cfg — 1/2 audio
    tracks, bg frame on/off, two-stage on/off, both speaker sides, ddim +
    dynamic CFG) runs green through the real batch driver (reference
    golden-sample harness `tools/batch_run_samples.py` over
    `assets/config/001..014.cfg`, SURVEY.md §4)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_dir = os.path.join(repo, "assets", "config")
    cfgs = sorted(f for f in os.listdir(cfg_dir)
                  if f.endswith(".cfg") and f != "default.cfg")
    assert len(cfgs) >= 7, f"golden tier thinned: {cfgs}"

    monkeypatch.chdir(repo)   # cfgs use repo-relative asset paths
    sys.path.insert(0, os.path.join(repo, "tools"))
    import batch_run_samples

    monkeypatch.setattr("sys.argv", ["batch_run_samples.py",
                                     "--output_root", str(tmp_path)])
    with pytest.raises(SystemExit) as e:
        batch_run_samples.main()
    assert int(e.value.code or 0) == 0
    for name in cfgs:
        out = tmp_path / os.path.splitext(name)[0] / "output.mp4"
        assert out.is_file() and out.stat().st_size > 0, name
