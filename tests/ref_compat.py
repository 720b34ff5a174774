"""Load the reference's torch modules for cross-implementation parity tests.

The reference at /root/reference imports diffusers/torchvision/spandrel/...
which aren't installed here; only torch-CPU is.  The diffusers-free parts we
want to test (LFE, PerceiverAttention/CrossAttention, AudioProjModel, the
router, the loss functions, the mask converter) live in modules whose
IMPORTS pull those packages — so we pre-seed sys.modules with minimal stubs
(plus a faithful torch implementation of diffusers `Attention` with the
default SDPA processor, which the router/audio layers instantiate for real)
and load the reference files by path.

The stubs implement only what executes in the code paths under test; the
reference source itself is never modified or copied.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF = "/root/reference"

_loaded = {}


def _mod(name, **attrs):
    m = types.ModuleType(name)
    # a real ModuleSpec so importlib probes (transformers' is_package_available
    # runs find_spec on already-imported names) don't choke on __spec__=None
    m.__spec__ = importlib.util.spec_from_loader(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _install_stubs():
    if "diffusers" in sys.modules and getattr(
            sys.modules["diffusers"], "__bya_stub__", False):
        return
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class Attention(nn.Module):
        """diffusers.models.attention.Attention, default-processor subset.

        Faithful to the configs the reference instantiates
        (`models/router.py:425-470`, `models/audio_model.py:178-188`):
        self/cross attention, bias on qkv, bias on out, SDPA math.
        """

        def __init__(self, query_dim, heads=8, dim_head=64, bias=False,
                     cross_attention_dim=None, dropout=0.0, out_bias=True,
                     **_):
            super().__init__()
            inner = heads * dim_head
            self.heads = heads
            kv_dim = cross_attention_dim if cross_attention_dim is not None else query_dim
            self.to_q = nn.Linear(query_dim, inner, bias=bias)
            self.to_k = nn.Linear(kv_dim, inner, bias=bias)
            self.to_v = nn.Linear(kv_dim, inner, bias=bias)
            self.to_out = nn.ModuleList(
                [nn.Linear(inner, query_dim, bias=out_bias), nn.Dropout(dropout)])

        def forward(self, hidden_states, encoder_hidden_states=None,
                    attention_mask=None, **_):
            ctx = (encoder_hidden_states if encoder_hidden_states is not None
                   else hidden_states)
            b, s, _ = hidden_states.shape
            h = self.heads

            def split(t):
                return t.view(b, t.shape[1], h, -1).transpose(1, 2)

            o = F.scaled_dot_product_attention(
                split(self.to_q(hidden_states)), split(self.to_k(ctx)),
                split(self.to_v(ctx)), attn_mask=attention_mask)
            o = o.transpose(1, 2).reshape(b, s, -1)
            return self.to_out[1](self.to_out[0](o))

    class FeedForward(nn.Module):
        """diffusers FeedForward default (geglu); reference CogVideoXBlock
        uses gelu-approximate — only instantiated, never parity-tested here."""

        def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                     activation_fn="geglu", **_):
            super().__init__()
            inner = int(dim * mult)
            self.net = nn.ModuleList([
                nn.Linear(dim, inner), nn.GELU(), nn.Linear(inner, dim_out or dim)])

        def forward(self, x):
            for layer in self.net:
                x = layer(x)
            return x

    class _Passthrough:
        def __getattr__(self, name):
            return _Passthrough()

        def __call__(self, *a, **k):
            return a[0] if a else None

    class ModelMixin(nn.Module):
        pass

    class ConfigMixin:
        pass

    def register_to_config(fn=None, **_):
        if fn is None:
            return lambda f: f
        return fn

    class _Logging:
        @staticmethod
        def get_logger(*a, **k):
            import logging

            return logging.getLogger("ref-stub")

    ident = lambda x, *a, **k: x

    d = _mod("diffusers", ModelMixin=ModelMixin, __version__="0.0-stub")
    d.__bya_stub__ = True
    _mod("diffusers.configuration_utils", ConfigMixin=ConfigMixin,
         register_to_config=register_to_config)
    _mod("diffusers.loaders", PeftAdapterMixin=type("PeftAdapterMixin", (), {}),
         CogVideoXLoraLoaderMixin=type("CogVideoXLoraLoaderMixin", (), {}))
    _mod("diffusers.utils", USE_PEFT_BACKEND=False,
         is_torch_version=lambda *a: True, logging=_Logging(),
         scale_lora_layers=ident, unscale_lora_layers=ident,
         load_image=ident, export_to_video=ident)
    _mod("diffusers.utils.torch_utils", maybe_allow_in_graph=lambda cls: cls)
    _mod("diffusers.models", )
    _mod("diffusers.models.attention", Attention=Attention, FeedForward=FeedForward)
    _mod("diffusers.models.attention_processor",
         AttentionProcessor=type("AttentionProcessor", (), {}),
         CogVideoXAttnProcessor2_0=type("CogVideoXAttnProcessor2_0", (), {}),
         FusedCogVideoXAttnProcessor2_0=type("FusedCogVideoXAttnProcessor2_0", (), {}))
    _mod("diffusers.models.embeddings",
         CogVideoXPatchEmbed=type("CogVideoXPatchEmbed", (nn.Module,), {}),
         TimestepEmbedding=type("TimestepEmbedding", (nn.Module,), {}),
         Timesteps=type("Timesteps", (nn.Module,), {}),
         get_3d_rotary_pos_embed=ident)
    _mod("diffusers.models.modeling_outputs",
         Transformer2DModelOutput=type("Transformer2DModelOutput", (), {}))
    _mod("diffusers.models.modeling_utils", ModelMixin=ModelMixin)
    _mod("diffusers.models.normalization",
         AdaLayerNorm=type("AdaLayerNorm", (nn.Module,), {}),
         CogVideoXLayerNormZero=type("CogVideoXLayerNormZero", (nn.Module,), {}))
    _mod("diffusers.pipelines")
    _mod("diffusers.pipelines.cogvideo")
    _mod("diffusers.pipelines.cogvideo.pipeline_cogvideox",
         get_resize_crop_region_for_grid=ident)

    # non-diffusers missing deps referenced at import time
    class _InterpolationMode:
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"
        NEAREST = "nearest"

    tv = _mod("torchvision")
    tvt = _mod("torchvision.transforms", InterpolationMode=_InterpolationMode)
    _mod("torchvision.transforms.functional", normalize=ident, resize=ident)
    tv.transforms = tvt
    for name, attrs in (("spandrel", {"ModelLoader": type("ModelLoader", (), {})}),
                        ("imageio", {}), ("timm", {}),
                        ("tqdm", {"tqdm": ident})):
        try:
            __import__(name)
        except ImportError:
            _mod(name, **attrs)


def load_reference_module(relpath: str):
    """Load e.g. 'models/router.py' from /root/reference with stubs active."""
    if relpath in _loaded:
        return _loaded[relpath]
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    name = "ref_" + relpath.replace("/", "_").removesuffix(".py")
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    _loaded[relpath] = mod
    return mod
