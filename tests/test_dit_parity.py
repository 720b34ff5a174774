"""Cross-implementation parity: JAX DiT vs an independent torch mirror of
the reference forward (tests/torch_mirror_dit.py, the `test_bisenet.py`
pattern) — the PSNR-critical path VERDICT r2 flagged as covered only by
self-generated goldens.

Weights move through the REAL importer (`import_reference_dit`, incl. the
RoPE interleave->rotate-half q/k channel permutation and the conv->matmul
patch-embed repack), so these tests pin the full checkpoint-to-output
contract for: timestep embedding, patch embed, CogVideoXBlock (adaLN-zero,
QK-LN, joint RoPE attention, gelu-tanh FF), final norms, proj, unpatchify.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from torch_mirror_dit import (MirrorCogVideoXBlock, MirrorDiT,
                              get_3d_rotary_pos_embed as torch_rope_3d,
                              get_resize_crop_region_for_grid as torch_crop)

from bindyouravatar_tpu.models.dit import DiT
from bindyouravatar_tpu.ops import rope as jrope
from bindyouravatar_tpu.training.checkpoint import (_rope_permutation,
                                                    import_reference_dit)

torch.manual_seed(0)


def _init_weights(m):
    """Non-degenerate random weights (default init leaves LN at identity)."""
    g = torch.Generator().manual_seed(hash(id(m)) % (2**31))
    for p in m.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)


@pytest.fixture(scope="module")
def tiny_pair():
    """JAX tiny DiT + torch mirror with identical (imported) weights."""
    dit = DiT.tiny(in_channels=8, out_channels=4)
    c = dit.cfg
    mirror = MirrorDiT(
        num_layers=c.num_layers, heads=c.num_attention_heads,
        head_dim=c.attention_head_dim, in_channels=c.in_channels,
        out_channels=c.out_channels, time_embed_dim=c.time_embed_dim,
        text_dim=c.text_embed_dim, patch_size=c.patch_size, eps=c.norm_eps,
        ff_mult=c.ff_mult).eval()
    _init_weights(mirror)
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = import_reference_dit(sd, dit)
    return dit, mirror, params


def test_rope_tables_match_interleaved_mirror():
    """jrope.get_3d_rotary_pos_embed (rotate-half) == diffusers-semantics
    interleaved tables under the importer's channel permutation."""
    crops_j = jrope.get_resize_crop_region_for_grid((8, 12), 12, 8)
    crops_t = torch_crop((8, 12), 12, 8)
    assert crops_j == crops_t
    cos_j, sin_j = jrope.get_3d_rotary_pos_embed(16, crops_j, (8, 12), 3)
    cos_t, sin_t = torch_rope_3d(16, crops_t, (8, 12), 3)
    perm = _rope_permutation(16)
    np.testing.assert_allclose(np.asarray(cos_j),
                               cos_t.numpy()[:, perm], atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin_j),
                               sin_t.numpy()[:, perm], atol=1e-6)
    # non-square crop (portrait grid into the landscape base): exercises the
    # aspect-fit branch
    crops_j2 = jrope.get_resize_crop_region_for_grid((12, 8), 12, 8)
    assert crops_j2 == torch_crop((12, 8), 12, 8)


def test_cogvideox_block_parity(tiny_pair):
    """One imported CogVideoXBlock: adaLN-zero + QK-LN + interleaved RoPE
    joint attention + gelu-tanh FF, fp32 <=2e-4 vs the torch mirror
    (reference transformer.py:143-262)."""
    dit, mirror, params = tiny_pair
    c = dit.cfg
    t, gh, gw = c.latent_grid
    s = c.video_seq_len
    rng = np.random.default_rng(0)
    hid = rng.normal(0, 1, (1, s, c.inner_dim)).astype(np.float32)
    enc = rng.normal(0, 1, (1, c.max_text_seq_length, c.inner_dim)).astype(np.float32)
    temb = rng.normal(0, 1, (1, c.time_embed_dim)).astype(np.float32)

    # dit.rope defaults to the 720x480 base grid (45x30 for patch 2)
    rope_j = dit.rope(c.sample_height * 8, c.sample_width * 8, t)
    crops = torch_crop((gh, gw), 720 // (8 * c.patch_size),
                       480 // (8 * c.patch_size))
    rope_t = torch_rope_3d(c.attention_head_dim, crops, (gh, gw), t)

    with torch.no_grad():
        th, te = mirror.transformer_blocks[0](
            torch.from_numpy(hid), torch.from_numpy(enc),
            torch.from_numpy(temb), rope_t)

    block = dit._modules()["block"]
    block_params = jax.tree.map(lambda p: p[0], params["blocks"])
    jh, je = block.apply({"params": block_params}, jnp.asarray(hid),
                         jnp.asarray(enc), jnp.asarray(temb), rope_j, None)

    np.testing.assert_allclose(np.asarray(jh), th.numpy(), atol=2e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(je), te.numpy(), atol=2e-4,
                               rtol=1e-4)


def test_full_dit_forward_parity(tiny_pair):
    """Full unconditioned DiT forward (patch embed -> 4 blocks -> norms ->
    proj -> unpatchify) fp32 <=2e-4 vs the torch mirror, weights through
    `import_reference_dit` (reference transformer.py:615-960)."""
    dit, mirror, params = tiny_pair
    c = dit.cfg
    t = c.latent_frames
    rng = np.random.default_rng(1)
    lat = rng.normal(0, 1, (1, t, c.in_channels, c.sample_height,
                            c.sample_width)).astype(np.float32)
    text = rng.normal(0, 1, (1, c.max_text_seq_length,
                             c.text_embed_dim)).astype(np.float32)
    ts = np.array([321.0], np.float32)

    crops = torch_crop(c.latent_grid[1:], 720 // (8 * c.patch_size),
                       480 // (8 * c.patch_size))
    rope_t = torch_rope_3d(c.attention_head_dim, crops, c.latent_grid[1:], t)
    with torch.no_grad():
        out_t = mirror(torch.from_numpy(lat), torch.from_numpy(text),
                       torch.from_numpy(ts), rope_t)

    rope_j = dit.rope(c.sample_height * 8, c.sample_width * 8, t)
    out_j, _ = dit.apply(params, jnp.asarray(lat), jnp.asarray(text),
                         jnp.asarray(ts), rope_j)

    assert out_j.shape == tuple(out_t.shape)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=2e-4,
                               rtol=1e-4)


def test_full_dit_parity_second_timestep(tiny_pair):
    """adaLN paths are timestep-dependent; pin a second point."""
    dit, mirror, params = tiny_pair
    c = dit.cfg
    t = c.latent_frames
    rng = np.random.default_rng(2)
    lat = rng.normal(0, 1, (1, t, c.in_channels, c.sample_height,
                            c.sample_width)).astype(np.float32)
    text = rng.normal(0, 1, (1, c.max_text_seq_length,
                             c.text_embed_dim)).astype(np.float32)
    ts = np.array([999.0], np.float32)
    crops = torch_crop(c.latent_grid[1:], 720 // (8 * c.patch_size),
                       480 // (8 * c.patch_size))
    rope_t = torch_rope_3d(c.attention_head_dim, crops, c.latent_grid[1:], t)
    with torch.no_grad():
        out_t = mirror(torch.from_numpy(lat), torch.from_numpy(text),
                       torch.from_numpy(ts), rope_t)
    out_j, _ = dit.apply(params, jnp.asarray(lat), jnp.asarray(text),
                         jnp.asarray(np.array([999.0], np.float32)),
                         dit.rope(c.sample_height * 8, c.sample_width * 8, t))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=2e-4,
                               rtol=1e-4)
