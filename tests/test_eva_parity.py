"""EVA02-CLIP visual tower: torch-mirror parity through the real importer.

The vendored EVA package isn't installed here, so the torch module below is
a line-accurate mirror of the reference's EVA ViT semantics
(`/root/reference/models/eva_clip/eva_vit_model.py:366-548` with the
EVA02-CLIP-L-14-336.json flags: subln + naiveswiglu + rope + intp_freq,
norm eps 1e-6 per `model.py:123`) — the executable spec the flax tower
(`models/eva_clip.py`) and `import_eva_vision` must reproduce, including
the interleaved->rotate-half RoPE channel permutation of W_q/W_k
(`ops/rope.py` convention note).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bindyouravatar_tpu.config import EVACLIPConfig  # noqa: E402
from bindyouravatar_tpu.models.eva_clip import EVACLIPVision  # noqa: E402
from bindyouravatar_tpu.training.import_encoders import import_eva_vision  # noqa: E402


# ------------------------------------------------------------------ #
# torch mirror

def _rope_tables(grid, head_dim, pt_seq_len):
    """VisionRotaryEmbeddingFast tables (`rope.py:80-118`): per-axis angles
    over positions scaled to the pretrain grid, each angle repeated over an
    interleaved channel PAIR, h-axis channels then w-axis channels."""
    dim = head_dim // 2            # per-axis channels (`eva_vit_model.py:405`)
    freqs = 1.0 / (10000.0 ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim))
    t = torch.arange(grid).float() / grid * pt_seq_len
    ang = torch.einsum("i,f->if", t, freqs)                  # [G, dim/2]
    ang = ang.repeat_interleave(2, dim=-1)                   # (n r) -> [G, dim]
    full = torch.cat([ang[:, None, :].expand(grid, grid, dim),
                      ang[None, :, :].expand(grid, grid, dim)], dim=-1)
    full = full.reshape(grid * grid, head_dim)
    return full.cos(), full.sin()


def _rotate_half_interleaved(x):
    """`rope.py:23-27`: (-x2, x1) over adjacent channel pairs."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return torch.stack((-x2, x1), dim=-1).reshape(*x.shape[:-2], -1)


class TEVAAttention(tnn.Module):
    """`eva_vit_model.py:106-252`, subln=True branch (separate q/k/v,
    q_bias/v_bias, k bias-free, inner_attn_ln, fp32-equivalent softmax)."""

    def __init__(self, width, heads):
        super().__init__()
        self.heads, self.dh = heads, width // heads
        self.q_proj = tnn.Linear(width, width, bias=False)
        self.k_proj = tnn.Linear(width, width, bias=False)
        self.v_proj = tnn.Linear(width, width, bias=False)
        self.q_bias = tnn.Parameter(torch.zeros(width))
        self.v_bias = tnn.Parameter(torch.zeros(width))
        self.inner_attn_ln = tnn.LayerNorm(width, eps=1e-6)
        self.proj = tnn.Linear(width, width)

    def forward(self, x, rope_cos, rope_sin):
        b, n, c = x.shape
        q = F.linear(x, self.q_proj.weight, self.q_bias)
        k = F.linear(x, self.k_proj.weight, None)
        v = F.linear(x, self.v_proj.weight, self.v_bias)
        q = q.reshape(b, n, self.heads, self.dh).permute(0, 2, 1, 3)
        k = k.reshape(b, n, self.heads, self.dh).permute(0, 2, 1, 3)
        v = v.reshape(b, n, self.heads, self.dh).permute(0, 2, 1, 3)
        # rope on all tokens but cls (`eva_vit_model.py:197-204`)
        rot = lambda t: torch.cat(
            [t[:, :, :1],
             t[:, :, 1:] * rope_cos + _rotate_half_interleaved(t[:, :, 1:]) * rope_sin],
            dim=2)
        q, k = rot(q), rot(k)
        attn = (q * self.dh ** -0.5) @ k.transpose(-2, -1)
        attn = attn.softmax(dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(self.inner_attn_ln(o))


class TEVABlock(tnn.Module):
    """Pre-norm block, no layer-scale (`init_values=None`), SwiGLU mlp
    (`eva_vit_model.py:81-104,287-303`)."""

    def __init__(self, width, heads, mlp_ratio):
        super().__init__()
        hidden = int(width * mlp_ratio)
        self.norm1 = tnn.LayerNorm(width, eps=1e-6)
        self.norm2 = tnn.LayerNorm(width, eps=1e-6)
        self.attn = TEVAAttention(width, heads)
        self.w1 = tnn.Linear(width, hidden)
        self.w2 = tnn.Linear(width, hidden)
        self.ffn_ln = tnn.LayerNorm(hidden, eps=1e-6)
        self.w3 = tnn.Linear(hidden, width)

    def forward(self, x, cos, sin):
        x = x + self.attn(self.norm1(x), cos, sin)
        h = self.norm2(x)
        h = self.w3(self.ffn_ln(F.silu(self.w1(h)) * self.w2(h)))
        return x + h


class TEVAVisionTower(tnn.Module):
    """`EVAVisionTransformer.forward(return_hidden=True)` semantics:
    patch conv + cls + abs pos, hidden states tapped BEFORE the tap blocks,
    final norm -> cls token -> head (`eva_vit_model.py:493-548`)."""

    def __init__(self, cfg: EVACLIPConfig):
        super().__init__()
        self.cfg = cfg
        self.patch = tnn.Conv2d(3, cfg.width, cfg.patch_size, cfg.patch_size)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, cfg.width))
        self.pos_embed = tnn.Parameter(torch.zeros(1, cfg.grid ** 2 + 1, cfg.width))
        self.blocks = tnn.ModuleList(
            [TEVABlock(cfg.width, cfg.heads, cfg.mlp_ratio)
             for _ in range(cfg.depth)])
        self.norm = tnn.LayerNorm(cfg.width, eps=1e-6)
        self.head = tnn.Linear(cfg.width, cfg.out_dim)
        cos, sin = _rope_tables(cfg.grid, cfg.width // cfg.heads,
                                cfg.pt_hw_seq_len)
        self.register_buffer("cos", cos)
        self.register_buffer("sin", sin)

    def forward(self, images):
        b = images.shape[0]
        x = self.patch(images).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        hidden = []
        for i, blk in enumerate(self.blocks):
            if i in self.cfg.hidden_taps:
                hidden.append(x)
            x = blk(x, self.cos, self.sin)
        x = self.norm(x)
        return self.head(x[:, 0]), torch.stack(hidden, dim=1)


# ------------------------------------------------------------------ #

def _reference_state_dict(tower: TEVAVisionTower):
    """The mirror's params under the reference EVA checkpoint names
    (`import_eva_vision` contract)."""
    sd = {"patch_embed.proj.weight": tower.patch.weight,
          "patch_embed.proj.bias": tower.patch.bias,
          "cls_token": tower.cls_token,
          "pos_embed": tower.pos_embed,
          "norm.weight": tower.norm.weight,
          "norm.bias": tower.norm.bias,
          "head.weight": tower.head.weight,
          "head.bias": tower.head.bias}
    for i, blk in enumerate(tower.blocks):
        b = f"blocks.{i}"
        sd.update({
            f"{b}.norm1.weight": blk.norm1.weight,
            f"{b}.norm1.bias": blk.norm1.bias,
            f"{b}.norm2.weight": blk.norm2.weight,
            f"{b}.norm2.bias": blk.norm2.bias,
            f"{b}.attn.q_proj.weight": blk.attn.q_proj.weight,
            f"{b}.attn.k_proj.weight": blk.attn.k_proj.weight,
            f"{b}.attn.v_proj.weight": blk.attn.v_proj.weight,
            f"{b}.attn.q_bias": blk.attn.q_bias,
            f"{b}.attn.v_bias": blk.attn.v_bias,
            f"{b}.attn.inner_attn_ln.weight": blk.attn.inner_attn_ln.weight,
            f"{b}.attn.inner_attn_ln.bias": blk.attn.inner_attn_ln.bias,
            f"{b}.attn.proj.weight": blk.attn.proj.weight,
            f"{b}.attn.proj.bias": blk.attn.proj.bias,
            f"{b}.mlp.w1.weight": blk.w1.weight,
            f"{b}.mlp.w1.bias": blk.w1.bias,
            f"{b}.mlp.w2.weight": blk.w2.weight,
            f"{b}.mlp.w2.bias": blk.w2.bias,
            f"{b}.mlp.ffn_ln.weight": blk.ffn_ln.weight,
            f"{b}.mlp.ffn_ln.bias": blk.ffn_ln.bias,
            f"{b}.mlp.w3.weight": blk.w3.weight,
            f"{b}.mlp.w3.bias": blk.w3.bias,
        })
    return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.fixture(scope="module")
def cfg():
    # tiny but structurally faithful: rope grid 4 != pt_seq_len 2 exercises
    # the intp_freq position scaling; heads*dh=32 keeps it fast
    return EVACLIPConfig(image_size=56, patch_size=14, width=32, depth=6,
                         heads=4, out_dim=16, hidden_taps=(1, 3, 5),
                         pt_hw_seq_len=2, dtype=jnp.float32)


def _randomize(tower, seed):
    """Realistic scales: LN gains ~1 (a 0.05-scale gain crushes any
    convention mismatch below fp32 noise over six blocks), weights ~0.1."""
    torch.manual_seed(seed)
    with torch.no_grad():
        for name, p in tower.named_parameters():
            if "ln" in name.split(".")[-2:][0] or "norm" in name:
                if name.endswith("weight"):
                    p.copy_(1.0 + 0.1 * torch.randn_like(p))
                else:
                    p.copy_(0.1 * torch.randn_like(p))
            else:
                p.copy_(0.1 * torch.randn_like(p))


def test_eva_tower_parity(cfg):
    tower = TEVAVisionTower(cfg)
    _randomize(tower, 0)

    params = import_eva_vision(_reference_state_dict(tower), cfg)
    eva = EVACLIPVision(cfg)

    img = np.random.default_rng(1).normal(size=(2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        t_pool, t_hidden = tower(torch.from_numpy(img))
    j_pool, j_hidden = eva.apply(params, jnp.asarray(img))

    np.testing.assert_allclose(np.asarray(j_hidden), t_hidden.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_pool), t_pool.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_eva_importer_qk_permutation_is_loadbearing(cfg):
    """Dropping the rope channel permutation must break parity — guards
    against the importer silently regressing to a plain transpose."""
    tower = TEVAVisionTower(cfg)
    _randomize(tower, 2)
    sd = _reference_state_dict(tower)
    params = import_eva_vision(sd, cfg)

    import dataclasses
    no_rope_cfg = dataclasses.replace(cfg, use_rope=False)
    unpermuted = import_eva_vision(sd, no_rope_cfg)  # identity perm
    k_ok = params["block_0"]["attn"]["k_proj"]["kernel"]
    k_raw = unpermuted["block_0"]["attn"]["k_proj"]["kernel"]
    assert np.abs(np.asarray(k_ok) - np.asarray(k_raw)).max() > 0

    img = np.random.default_rng(3).normal(size=(1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        t_pool, _ = tower(torch.from_numpy(img))
    eva = EVACLIPVision(cfg)
    good_pool, _ = eva.apply(params, jnp.asarray(img))
    bad_pool, _ = eva.apply(unpermuted, jnp.asarray(img))
    good_err = np.abs(np.asarray(good_pool) - t_pool.numpy()).max()
    bad_err = np.abs(np.asarray(bad_pool) - t_pool.numpy()).max()
    assert bad_err > 50 * max(good_err, 1e-8), (bad_err, good_err)
