"""Cross-implementation parity: reference torch modules vs the JAX ports.

The single highest-value correctness check available in this environment
(VERDICT r1 #4): run the reference's diffusers-free code directly (torch-CPU,
via the stub loader in `ref_compat.py`), copy its randomly-initialised
weights into our flax trees through the real importers
(`training/import_submodules.py`), and assert fp32 agreement.

Covered: LocalFacialExtractor (+PerceiverAttention), PerceiverCrossAttention,
AudioProjModel (odd + even frame downsample), the full AudioAwareModel
cross-attn layer, the full MultiIPRouter (incl. 4 STABs + hard-coded
13x45x30 pos-emb), bce/spatial-dist/id-dist losses, and the trilinear mask
resize underlying the mask->routing converter.
"""

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted")

from ref_compat import load_reference_module  # noqa: E402

from bindyouravatar_tpu.config import AudioConfig, LFEConfig, RouterConfig  # noqa: E402
from bindyouravatar_tpu.training import import_submodules as imp  # noqa: E402

F32 = dict(dtype=jnp.float32, param_dtype=jnp.float32)


def _np(t):
    return t.detach().cpu().numpy()


def _sd(module):
    return {k: _np(v) for k, v in module.state_dict().items()}


# ------------------------------------------------------------------ LFE
def test_lfe_parity():
    """Reference `LocalFacialExtractor` (`/root/reference/models/router.py:78-193`)
    vs `models/lfe.py`, weights moved by `import_face_modules`."""
    ref_router = load_reference_module("models/router.py")
    torch.manual_seed(0)
    # dim=1024 because the reference hard-codes the 1024-wide mapping MLPs
    ref = ref_router.LocalFacialExtractor(
        dim=1024, depth=5, dim_head=16, heads=4, num_id_token=3,
        num_queries=4, output_dim=64).eval()

    n, tok = 2, 9
    x = torch.randn(n, 1280)
    y = [torch.randn(n, tok, 1024) for _ in range(5)]
    with torch.no_grad():
        want = _np(ref(x, y))

    from bindyouravatar_tpu.models.lfe import LocalFacialExtractor

    cfg = LFEConfig(dim=1024, depth=5, dim_head=16, heads=4, num_id_token=3,
                    num_queries=4, output_dim=64)
    params = imp.import_face_modules(
        {"local_facial_extractor": _sd(ref), "perceiver_cross_attention": []}
    )["lfe"]
    vit = jnp.stack([jnp.asarray(_np(t)) for t in y], axis=1)  # [N,5,tok,1024]
    got = LocalFacialExtractor(cfg, **F32).apply(
        {"params": params}, jnp.asarray(_np(x)), vit)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


# ------------------------------------------------- PerceiverCrossAttention
def test_perceiver_cross_attention_parity():
    """Reference `PerceiverCrossAttention` (`models/router.py:196-275`) per-id
    calls vs our batched-identity version (incl. the detached q/k outputs)."""
    ref_router = load_reference_module("models/router.py")
    torch.manual_seed(1)
    dim, dh, heads, kv = 48, 8, 4, 24
    ref = ref_router.PerceiverCrossAttention(
        dim=dim, dim_head=dh, heads=heads, kv_dim=kv).eval()

    s, n_tok, n_id = 30, 6, 2
    video = torch.randn(1, s, dim)
    face = torch.randn(n_id, n_tok, kv)
    outs, qs, ks = [], [], []
    with torch.no_grad():
        for i in range(n_id):   # the reference loops ids, repeating the video
            o, _w, q, k = ref(face[i:i + 1], video)
            outs.append(_np(o))
            qs.append(_np(q))
            ks.append(_np(k))

    from bindyouravatar_tpu.models.router import PerceiverCrossAttention

    sd = _sd(ref)
    kv_kernel = imp._lin(sd, "to_kv", bias=False)["kernel"]
    k_kernel, v_kernel = np.split(kv_kernel, 2, axis=-1)
    params = {
        "norm1": imp._ln(sd, "norm1"), "norm2": imp._ln(sd, "norm2"),
        "to_q": imp._lin(sd, "to_q", bias=False),
        "to_k": {"kernel": k_kernel}, "to_v": {"kernel": v_kernel},
        "to_out": imp._lin(sd, "to_out", bias=False),
    }
    mod = PerceiverCrossAttention(dim=dim, dim_head=dh, heads=heads,
                                  kv_dim=kv, **F32)
    o, q, k = mod.apply({"params": params},
                        jnp.asarray(_np(face))[None],      # [1, I, n_tok, kv]
                        jnp.asarray(_np(video)))           # [1, S, dim]
    for i in range(n_id):
        np.testing.assert_allclose(np.asarray(o[0, i]), outs[i][0],
                                   atol=1e-4, rtol=1e-4)
        # ours returns h-major flats (f = h*dh + d); the reference returns
        # [b, h, s, dh] — fold it the same way for comparison
        want_q = qs[i][0].transpose(1, 0, 2).reshape(s, heads * dh)
        np.testing.assert_allclose(np.asarray(q[0]), want_q,
                                   atol=1e-4, rtol=1e-4)   # q is id-independent
        want_k = ks[i][0].transpose(1, 0, 2).reshape(n_tok, heads * dh)
        np.testing.assert_allclose(np.asarray(k[0, i]), want_k,
                                   atol=1e-4, rtol=1e-4)


# ------------------------------------------------------------ audio path
def _small_audio():
    cfg = AudioConfig(dim=32, audio_dim=8, num_attention_heads=4,
                      attention_head_dim=8, window_size=3, window_stride=1,
                      num_layers=2, blocks=2, intermediate_dim=16,
                      context_tokens=4)
    return cfg


def _ref_audio_model(cfg):
    ref_audio = load_reference_module("models/audio_model.py")
    orig = ref_audio.AudioProjModel
    small = functools.partial(
        orig, seq_len=cfg.window_size, blocks=cfg.blocks,
        channels=cfg.audio_dim, intermediate_dim=cfg.intermediate_dim,
        output_dim=cfg.audio_dim, context_tokens=cfg.context_tokens)
    ref_audio.AudioProjModel = small   # the ref ctor hard-codes AudioProjModel()
    try:
        model = ref_audio.AudioAwareModel(
            dim=cfg.dim, audio_dim=cfg.audio_dim,
            num_attention_heads=cfg.num_attention_heads,
            attention_head_dim=cfg.attention_head_dim,
            window_size=cfg.window_size, window_stride=cfg.window_stride,
            num_layers=cfg.num_layers).eval()
    finally:
        ref_audio.AudioProjModel = orig
    return model


@pytest.mark.parametrize("f_px", [9, 8])   # odd: first-frame passthrough
def test_audio_proj_parity(f_px):
    """Reference `AudioProjModel` (`models/audio_model.py:43-114`) incl. the
    strided Conv1d downsample vs our paired-matmul repack."""
    torch.manual_seed(2)
    cfg = _small_audio()
    ref = _ref_audio_model(cfg)

    b = 2
    wins = torch.randn(b, f_px, cfg.window_size, cfg.blocks, cfg.audio_dim)
    with torch.no_grad():
        want = _np(ref.proj_in(wins))

    from bindyouravatar_tpu.models.audio import AudioProjModel

    params = imp.import_audio_modules(_sd(ref))["audio_statics"]["proj"]
    got = AudioProjModel(cfg, **F32).apply(
        {"params": params}, jnp.asarray(_np(wins)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_audio_aware_layer_parity():
    """Full audio path: sliding windows -> proj -> per-layer frame-local
    cross-attention (`models/audio_model.py:130-261`), per-id reference calls
    vs our batched-identity layer."""
    torch.manual_seed(3)
    cfg = _small_audio()
    ref = _ref_audio_model(cfg)

    b, f, hw, n_id = 1, 3, 4, 2
    f_px = (f - 1) * 4 + 1
    a_frames = f_px + cfg.window_size - cfg.window_stride
    audio = torch.randn(b, n_id, a_frames, cfg.blocks, cfg.audio_dim)
    hidden = torch.randn(b, f * hw, cfg.dim)

    with torch.no_grad():
        # the reference passes LATENT frame count to sliding_windows
        ctx = [ref.proj_in(ref.sliding_windows(audio[:, i], f))
               for i in range(n_id)]          # each [b, f_px, ctx, A]
        want = [[_np(ref(ctx[i], hidden, f, li)) for i in range(n_id)]
                for li in range(cfg.num_layers)]

    from bindyouravatar_tpu.models.audio import AudioCrossAttnLayer, AudioStatics

    sd = _sd(ref)
    # the reference hard-codes [1,32,768] mute tokens regardless of dims
    # (`audio_model.py:170`); resize to this config (mute path not exercised)
    sd["mute_learnable_tokens"] = np.zeros(
        (1, cfg.context_tokens, cfg.audio_dim), np.float32)
    tree = imp.import_audio_modules(sd)
    statics = AudioStatics(cfg, **F32)
    ctx_ours = statics.apply({"params": tree["audio_statics"]},
                             jnp.asarray(_np(audio)), f_px)
    for i in range(n_id):
        np.testing.assert_allclose(np.asarray(ctx_ours[:, i]), _np(ctx[i]),
                                   atol=1e-4, rtol=1e-4)

    layer = AudioCrossAttnLayer(cfg, **F32)
    for li in range(cfg.num_layers):
        lp = jax.tree.map(lambda x, li=li: x[li], tree["audio_layers"])
        got = layer.apply({"params": lp}, jnp.asarray(_np(hidden)), ctx_ours)
        for i in range(n_id):
            np.testing.assert_allclose(np.asarray(got[:, i]), want[li][i],
                                       atol=1e-4, rtol=1e-4)


# ------------------------------------------------------------------ router
def test_multi_ip_router_full_parity():
    """Full `MultiIPRouter` (`models/router.py:280-423`): shared norms,
    per-layer projections, re-attention, hard-coded 13x45x30 pos-emb, 4
    spatial-temporal attention blocks, sigmoid head — reference torch vs our
    trunk called with the reference's (transposed) grid."""
    ref_router = load_reference_module("models/router.py")
    torch.manual_seed(4)
    n_id, heads, n_tok, qk, n_layers = 2, 4, 6, 32, 2
    ref = ref_router.MultiIPRouter(
        num_id_token=n_tok, num_heads=heads, num_layers=n_layers,
        q_k_dim=qk).eval()   # feat_dim = 24 (divisible-by-3 pos-emb split)

    s, dh = 13 * 45 * 30, qk // heads
    q_row = torch.randn(1, heads, s, dh)
    q_out = q_row.repeat(n_id, 1, 1, 1)      # reference repeats video per id
    k_out = torch.randn(n_id, heads, n_tok, dh)
    with torch.no_grad():
        want = [_np(ref(None, q_out, k_out, li)) for li in range(n_layers)]

    from bindyouravatar_tpu.models.router import (
        MultiIPRouterLayerProj, MultiIPRouterTrunk, RouterNorms,
        fold_heads_to_flat)

    rcfg = RouterConfig(num_id_token=n_tok, num_heads=heads,
                        num_layers=n_layers, q_k_dim=qk)
    tree = imp.import_router_modules(_sd(ref), num_heads=heads)
    q_flat, k_flat = fold_heads_to_flat(
        jnp.asarray(_np(q_row)), jnp.asarray(_np(k_out))[None])
    qn, kn = RouterNorms(q_k_dim=qk).apply(
        {"params": tree["router_norms"]}, q_flat, k_flat)
    trunk = MultiIPRouterTrunk(rcfg, **F32)
    for li in range(n_layers):
        lp = jax.tree.map(lambda x, li=li: x[li], tree["router_layers"])
        qp, kp = MultiIPRouterLayerProj(q_k_dim=qk, **F32).apply(
            {"params": lp}, qn, kn)
        # reference grid labels (13, 45, 30) — transposed, SURVEY §2.8
        got = trunk.apply({"params": tree["router_trunk"]}, qp, kp, (13, 45, 30))
        np.testing.assert_allclose(np.asarray(got), want[li],
                                   atol=2e-4, rtol=2e-4)


# ------------------------------------------------------------------ losses
def test_loss_parity_bce():
    ref_utils = load_reference_module("models/utils.py")
    from bindyouravatar_tpu.training import losses as L

    torch.manual_seed(5)
    p = torch.rand(4, 7)
    t = (torch.rand(4, 7) > 0.5).float()
    want = _np(ref_utils.bce_loss(p, t))   # elementwise, like ours
    got = np.asarray(L.bce(jnp.asarray(_np(p)), jnp.asarray(_np(t))))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_loss_parity_distribution():
    """spatial/id distribution losses (`/root/reference/models/transformer.py:31-128`)
    vs ours with compat_transposed=True at the hard-coded 13x45x30 grid."""
    ref_tr = load_reference_module("models/transformer.py")
    from bindyouravatar_tpu.training import losses as L

    torch.manual_seed(6)
    n_layers, s = 3, 13 * 45 * 30
    layers = [torch.rand(1, s, 2) for _ in range(n_layers)]
    # reference structure: list over layers of per-batch list of [1, S, 2]
    ref_list = [[t] for t in layers]
    want_sp = float(ref_tr.spatial_distribution_loss(ref_list))
    want_id = float(ref_tr.id_distribution_loss(ref_list))

    routing = jnp.stack([jnp.asarray(_np(t)) for t in layers])  # [L, 1, S, 2]
    got_sp = float(L.spatial_distribution_loss(routing, (13, 30, 45),
                                               compat_transposed=True))
    got_id = float(L.id_distribution_loss(routing, (13, 30, 45),
                                          compat_transposed=True))
    np.testing.assert_allclose(got_sp, want_sp, atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(got_id, want_id, atol=1e-6, rtol=1e-5)


# ------------------------------------------------------------- mask resize
def test_mask_resize_parity():
    """Trilinear mask resize of the mask->routing converter
    (`/root/reference/util/utils.py:481-514`) vs our numpy/C++ port."""
    ref_uu = load_reference_module("util/utils.py")
    from bindyouravatar_tpu.utils import masks as M

    torch.manual_seed(7)
    mask = (torch.rand(1, 1, 9, 32, 48) > 0.6).float()
    latent = torch.zeros(1, 1, 5, 8, 12)
    want = _np(ref_uu.resize_mask(mask, latent, process_first_frame_only=False))

    got = M.resize_mask_trilinear(_np(mask)[0, 0], 5, 8, 12)
    np.testing.assert_allclose(got, want[0, 0], atol=1e-5, rtol=1e-5)


# --------------------------------------------------------- parse whiteout
def test_parse_whiteout_matches_reference_math():
    """Background whiteout + gray-face transform
    (`/root/reference/models/utils.py:466-484`, `to_gray` at `:251-254`)
    vs `preprocess.face.parse_whiteout` on a synthetic bisenet map."""
    ref_utils = load_reference_module("models/utils.py")
    from bindyouravatar_tpu.preprocess.face import (BISENET_BG_LABELS,
                                                    parse_whiteout)

    rng = np.random.default_rng(8)
    face = rng.integers(0, 256, (1, 3, 16, 16)).astype(np.float32)  # CHW
    parsing = rng.integers(0, 19, (16, 16))

    inp = torch.from_numpy(face) / 255.0
    p = torch.from_numpy(parsing)[None, None]
    bg = sum(p == i for i in BISENET_BG_LABELS).bool()
    white = torch.ones_like(inp)
    want_clip = torch.where(bg, white, ref_utils.to_gray(inp)).numpy()
    want_comp = torch.where(bg, white, inp).numpy()

    face_hwc = face[0].transpose(1, 2, 0)
    got_clip, got_comp = parse_whiteout(face_hwc, parsing)
    np.testing.assert_allclose(got_clip.transpose(2, 0, 1) / 255.0,
                               want_clip[0], atol=1e-5)
    np.testing.assert_allclose(got_comp.transpose(2, 0, 1) / 255.0,
                               want_comp[0], atol=1e-5)

    # skip_bg_removal: composite is the untouched input
    _, got_orig = parse_whiteout(face_hwc, parsing, skip_bg_removal=True)
    np.testing.assert_allclose(got_orig, face_hwc, atol=0)
