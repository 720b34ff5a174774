"""SAM2 video predictor: prompt on frame 0, propagate masks through time.

Drives the flax SAM2 modules (`models/sam2.py`) with the same external
contract the reference's mask-derivation tool uses
(`/root/reference/tools/sam2_tools.py:93-149`): `init_state` on a frame
stack, `add_new_points` with face-detection prompts per object, then
`propagate_in_video` yielding per-frame mask logits per object.

Tracking loop (sam2.1 semantics): each frame's /16 features are conditioned
on the object's memory bank — the prompted (conditioning) frame's memory,
up to `num_maskmem - 1` most recent non-conditioning memories (each slot
tagged with a learned temporal position embedding), and the object-pointer
tokens split into mem_dim chunks — via RoPE memory attention; the mask
decoder runs promptless on non-conditioning frames; the predicted mask is
encoded into a new memory.  `import_sam2_weights` maps a sam2.1 torch
checkpoint ("model" state dict) into the flax tree.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterator, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.sam2 import (MLP, ImageEncoder, MaskDecoder, MemoryAttention,
                           MemoryEncoder, PromptEncoder, SAM2Config)


class SAM2Model(nn.Module):
    """All SAM2 sub-modules in one param tree, exposed as apply-methods."""
    cfg: SAM2Config = SAM2Config()

    def setup(self):
        c = self.cfg
        self.image_encoder = ImageEncoder(c)
        self.sam_prompt_encoder = PromptEncoder(c)
        self.sam_mask_decoder = MaskDecoder(c)
        self.memory_attention = MemoryAttention(c)
        self.memory_encoder = MemoryEncoder(c)
        self.conv_s0 = nn.Conv(c.d_model // 8, (1, 1), name="conv_s0")
        self.conv_s1 = nn.Conv(c.d_model // 4, (1, 1), name="conv_s1")
        self.no_mem_embed = self.param("no_mem_embed",
                                       nn.initializers.zeros, (1, 1, c.d_model))
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", nn.initializers.zeros,
            (c.num_maskmem, c.mem_dim))
        self.obj_ptr_proj = MLP(c.d_model, c.d_model, 3, name="obj_ptr_proj")

    # ------------------------------------------------------------ stages
    def encode_image(self, images):
        """[B,3,H,W] normalised -> backbone dict (+ projected hi-res skips)."""
        out = self.image_encoder(images)
        f4, f8, f16 = out["backbone_fpn"]
        return {"feat": f16, "pos": out["vision_pos_enc"][-1],
                "hi0": self.conv_s0(f4), "hi1": self.conv_s1(f8)}

    def condition_features(self, feat, memory, memory_pos, rope_k_rows):
        """Memory-condition the /16 features.  memory [B, M, mem_dim] with
        its pos encodings; rope_k_rows = spatial memory rows."""
        b, h, w, d = feat.shape
        x = feat.reshape(b, h * w, d)
        mem = memory + memory_pos
        x = self.memory_attention(x, mem, (h, w),
                                  (h, w), rope_k_rows)
        return x.reshape(b, h, w, d)

    def no_memory_features(self, feat):
        b, h, w, d = feat.shape
        x = feat.reshape(b, h * w, d) + self.no_mem_embed
        return x.reshape(b, h, w, d)

    def decode_masks(self, feat, hi0, hi1, points, labels):
        """-> (mask logits [B, n, 4h, 4w], iou [B, n], obj score [B, 1],
        obj ptr [B, D])."""
        c = self.cfg
        b, h, w, _ = feat.shape
        sparse = self.sam_prompt_encoder(points, labels)
        dense = self.sam_prompt_encoder.dense_no_mask(b, h, w)
        image_pe = self.sam_prompt_encoder.dense_pe(h, w)
        masks, iou, obj_score, mask_tokens = self.sam_mask_decoder(
            feat, image_pe, sparse, dense, (hi0, hi1))
        obj_ptr = self.obj_ptr_proj(mask_tokens[:, 0])
        return masks, iou, obj_score, obj_ptr

    def encode_memory(self, feat, mask_logits_lowres):
        """(pre-memory /16 features, mask logits at 4x feat res) ->
        (memory feature map, pos enc)."""
        return self.memory_encoder(feat, mask_logits_lowres)

    def temporal_pos(self, slot):
        return self.maskmem_tpos_enc[slot]


# ---------------------------------------------------------------- #
# host-side predictor

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass
class _ObjState:
    cond_frame: int
    memories: List[Tuple[int, np.ndarray, np.ndarray]]   # (t, mem, pos)
    obj_ptrs: List[Tuple[int, np.ndarray]]
    cond_memory: Optional[Tuple[np.ndarray, np.ndarray]] = None
    cond_mask: Optional[np.ndarray] = None   # prompted low-res mask logits


class SAM2VideoPredictor:
    """Contract of `sam2.build_sam2_video_predictor` for the mask tool."""

    def __init__(self, cfg: SAM2Config, params: Dict[str, Any]):
        self.cfg = cfg
        self.model = SAM2Model(cfg)
        p = {"params": params}
        self._encode = jax.jit(
            lambda img: self.model.apply(p, img, method=SAM2Model.encode_image))
        self._no_mem = jax.jit(
            lambda f: self.model.apply(p, f, method=SAM2Model.no_memory_features))
        self._decode = jax.jit(
            lambda f, h0, h1, pt, lb: self.model.apply(
                p, f, h0, h1, pt, lb, method=SAM2Model.decode_masks))
        self._enc_mem = jax.jit(
            lambda f, m: self.model.apply(p, f, m,
                                          method=SAM2Model.encode_memory))
        self._cond = jax.jit(
            lambda f, mem, pos, rows: self.model.apply(
                p, f, mem, pos, rows, method=SAM2Model.condition_features),
            static_argnums=(3,))
        self._params = p

    # ------------------------------------------------------------ state
    def init_state(self, frames: np.ndarray) -> Dict[str, Any]:
        """frames: [T, H, W, 3] uint8 RGB -> inference state."""
        c = self.cfg
        t, h0, w0 = frames.shape[:3]
        import cv2

        size = c.image_size
        imgs = np.stack([cv2.resize(f, (size, size)) for f in frames])
        imgs = (imgs.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        feats = []
        for ti in range(t):
            out = self._encode(jnp.asarray(imgs[ti].transpose(2, 0, 1))[None])
            feats.append({k: np.asarray(v) for k, v in out.items()})
        return {"frames_hw": (h0, w0), "num_frames": t, "feats": feats,
                "objs": {}}

    def reset_state(self, state):
        state["objs"].clear()

    # ------------------------------------------------------------ prompts
    def add_new_points(self, state, frame_idx: int, obj_id: int,
                       points: np.ndarray, labels: np.ndarray):
        """points [N, 2] in original-frame pixels; labels [N] (1 pos/0 neg).
        Returns (obj_ids, mask logits [n_obj, H, W] at model resolution)."""
        c = self.cfg
        h0, w0 = state["frames_hw"]
        scale = np.asarray([c.image_size / w0, c.image_size / h0], np.float32)
        pts = (points.astype(np.float32) * scale)[None]
        lbs = labels.astype(np.int32)[None]
        f = state["feats"][frame_idx]
        feat = self._no_mem(jnp.asarray(f["feat"]))
        masks, iou, obj_score, obj_ptr = self._decode(
            feat, jnp.asarray(f["hi0"]), jnp.asarray(f["hi1"]),
            jnp.asarray(pts), jnp.asarray(lbs))
        best = int(np.argmax(np.asarray(iou)[0, 1:]) + 1)  # multimask slots
        mask = np.asarray(masks)[0, best]
        mem, pos = self._enc_mem(jnp.asarray(f["feat"]),
                                 jnp.asarray(mask)[None])
        self_obj = _ObjState(cond_frame=frame_idx, memories=[],
                             obj_ptrs=[(frame_idx, np.asarray(obj_ptr)[0])])
        self_obj.cond_memory = (np.asarray(mem), np.asarray(pos))
        self_obj.cond_mask = mask
        state["objs"][obj_id] = self_obj
        ids = sorted(state["objs"])
        return ids, np.stack([self._obj_mask(state, frame_idx, i, mask)
                              for i in ids])

    def _obj_mask(self, state, frame_idx, obj_id, fresh=None):
        if fresh is not None and obj_id in state["objs"] and \
                state["objs"][obj_id].cond_frame == frame_idx:
            return fresh
        return np.full((self.cfg.image_size // 4,) * 2, -10.0, np.float32)

    # ------------------------------------------------------------ tracking
    def _memory_bank(self, obj: _ObjState):
        c = self.cfg
        mems, poss = [], []
        cm, cp = obj.cond_memory
        tpos = np.asarray(self._params["params"]["maskmem_tpos_enc"])
        # sam2.1 temporal-slot convention (sam2_base.py: index
        # num_maskmem - t_pos - 1): conditioning frame -> tpos[last];
        # most recent memory -> tpos[0], older -> increasing index
        mems.append(cm.reshape(1, -1, c.mem_dim) + tpos[c.num_maskmem - 1])
        poss.append(cp.reshape(1, -1, c.mem_dim))
        recent = obj.memories[-(c.num_maskmem - 1):]
        n_rec = len(recent)
        for p_idx, (tm, m, p) in enumerate(recent):   # oldest -> newest
            slot = n_rec - p_idx - 1                   # newest -> 0
            mems.append(m.reshape(1, -1, c.mem_dim) + tpos[slot])
            poss.append(p.reshape(1, -1, c.mem_dim))
        rope_rows = sum(m.shape[1] for m in mems)
        # object pointers, split into mem_dim chunks, zero pos enc
        ptrs = obj.obj_ptrs[-c.max_obj_ptrs:]
        if ptrs:
            pt = np.stack([p for _, p in ptrs])          # [P, d_model]
            pt = pt.reshape(1, -1, c.mem_dim)
            mems.append(pt)
            poss.append(np.zeros_like(pt))
        mem = np.concatenate(mems, axis=1)
        pos = np.concatenate(poss, axis=1)
        return jnp.asarray(mem), jnp.asarray(pos), rope_rows

    def propagate_in_video(self, state, start_frame_idx: int = 0
                           ) -> Iterator[Tuple[int, List[int], np.ndarray]]:
        """Yields (frame_idx, obj_ids, mask_logits [n_obj, h4, w4])."""
        c = self.cfg
        ids = sorted(state["objs"])
        empty_pt = jnp.zeros((1, 1, 2), jnp.float32)
        empty_lb = jnp.full((1, 1), -1, jnp.int32)
        for t in range(start_frame_idx, state["num_frames"]):
            frame_masks = []
            for oid in ids:
                obj = state["objs"][oid]
                if t == obj.cond_frame and obj.cond_mask is not None:
                    # sam2.1 returns the consolidated PROMPTED output for
                    # conditioning frames instead of re-decoding promptless
                    # under memory (ADVICE r2)
                    frame_masks.append(obj.cond_mask)
                    continue
                f = state["feats"][t]
                mem, pos, rows = self._memory_bank(obj)
                feat = self._cond(jnp.asarray(f["feat"]), mem, pos, rows)
                masks, iou, obj_score, obj_ptr = self._decode(
                    feat, jnp.asarray(f["hi0"]), jnp.asarray(f["hi1"]),
                    empty_pt, empty_lb)
                mask = np.asarray(masks)[0, 0]           # stable single mask
                frame_masks.append(mask)
                if t != obj.cond_frame:
                    mem_f, pos_f = self._enc_mem(jnp.asarray(f["feat"]),
                                                 jnp.asarray(mask)[None])
                    obj.memories.append((t, np.asarray(mem_f),
                                         np.asarray(pos_f)))
                    obj.memories = obj.memories[-(c.num_maskmem - 1):]
                    obj.obj_ptrs.append((t, np.asarray(obj_ptr)[0]))
                    obj.obj_ptrs = obj.obj_ptrs[-c.max_obj_ptrs:]
            yield t, ids, np.stack(frame_masks)


# ---------------------------------------------------------------- #
# checkpoint import (sam2.1 torch "model" state dict)

def _t(sd, k):
    return np.asarray(sd[k], np.float32)


def _lin(sd, p):
    return {"kernel": _t(sd, f"{p}.weight").T, "bias": _t(sd, f"{p}.bias")}


def _conv(sd, p, bias=True):
    out = {"kernel": _t(sd, f"{p}.weight").transpose(2, 3, 1, 0)}
    if bias and f"{p}.bias" in sd:
        out["bias"] = _t(sd, f"{p}.bias")
    return out


def _ln(sd, p):
    return {"scale": _t(sd, f"{p}.weight"), "bias": _t(sd, f"{p}.bias")}


def _ln2d(sd, p):
    return {"weight": _t(sd, f"{p}.weight"), "bias": _t(sd, f"{p}.bias")}


def _mlp(sd, p, n):
    return {f"layers_{i}": _lin(sd, f"{p}.layers.{i}") for i in range(n)}


def _attn(sd, p):
    return {n: _lin(sd, f"{p}.{n}")
            for n in ("q_proj", "k_proj", "v_proj", "out_proj")}


def import_sam2_weights(state_dict: Dict[str, Any],
                        cfg: SAM2Config) -> Dict[str, Any]:
    """sam2.1 checkpoint ("model" dict) -> SAM2Model flax params."""
    sd = state_dict
    hc = cfg.hiera
    n_blocks = sum(hc.stages)

    trunk: Dict[str, Any] = {
        "patch_embed": _conv(sd, "image_encoder.trunk.patch_embed.proj"),
        "pos_embed": _t(sd, "image_encoder.trunk.pos_embed")
        .transpose(0, 2, 3, 1),
        "pos_embed_window": _t(sd, "image_encoder.trunk.pos_embed_window")
        .transpose(0, 2, 3, 1),
    }
    for i in range(n_blocks):
        p = f"image_encoder.trunk.blocks.{i}"
        blk = {"norm1": _ln(sd, f"{p}.norm1"),
               "norm2": _ln(sd, f"{p}.norm2"),
               "attn": {"qkv": _lin(sd, f"{p}.attn.qkv"),
                        "proj": _lin(sd, f"{p}.attn.proj")},
               "mlp_layers_0": _lin(sd, f"{p}.mlp.layers.0"),
               "mlp_layers_1": _lin(sd, f"{p}.mlp.layers.1")}
        if f"{p}.proj.weight" in sd:
            blk["proj"] = _lin(sd, f"{p}.proj")
        trunk[f"blocks_{i}"] = blk
    neck = {f"convs_{i}": _conv(sd, f"image_encoder.neck.convs.{i}.conv")
            for i in range(4)}

    pe = {
        "pe_gaussian": _t(
            sd, "sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"),
        "point_embeddings": np.stack(
            [_t(sd, f"sam_prompt_encoder.point_embeddings.{i}.weight")[0]
             for i in range(4)]),
        "not_a_point_embed": _t(
            sd, "sam_prompt_encoder.not_a_point_embed.weight")[0],
        "no_mask_embed": _t(sd, "sam_prompt_encoder.no_mask_embed.weight")[0],
    }

    def twoway_block(p):
        return {
            "self_attn": _attn(sd, f"{p}.self_attn"),
            "cross_attn_token_to_image": _attn(
                sd, f"{p}.cross_attn_token_to_image"),
            "cross_attn_image_to_token": _attn(
                sd, f"{p}.cross_attn_image_to_token"),
            "norm1": _ln(sd, f"{p}.norm1"), "norm2": _ln(sd, f"{p}.norm2"),
            "norm3": _ln(sd, f"{p}.norm3"), "norm4": _ln(sd, f"{p}.norm4"),
            "mlp_layers_0": _lin(sd, f"{p}.mlp.layers.0"),
            "mlp_layers_1": _lin(sd, f"{p}.mlp.layers.1"),
        }

    n_masks = cfg.num_multimask + 1
    dec = {
        "iou_token": _t(sd, "sam_mask_decoder.iou_token.weight")[0],
        "mask_tokens": _t(sd, "sam_mask_decoder.mask_tokens.weight"),
        "obj_score_token": _t(sd, "sam_mask_decoder.obj_score_token.weight")[0],
        "transformer": {
            "layers_0": twoway_block("sam_mask_decoder.transformer.layers.0"),
            "layers_1": twoway_block("sam_mask_decoder.transformer.layers.1"),
            "final_attn_token_to_image": _attn(
                sd, "sam_mask_decoder.transformer.final_attn_token_to_image"),
            "norm_final_attn": _ln(
                sd, "sam_mask_decoder.transformer.norm_final_attn"),
        },
        "output_upscaling_0": _conv(sd, "sam_mask_decoder.output_upscaling.0"),
        "output_upscaling_ln": _ln2d(sd, "sam_mask_decoder.output_upscaling.1"),
        "output_upscaling_3": _conv(sd, "sam_mask_decoder.output_upscaling.3"),
        "iou_prediction_head": _mlp(
            sd, "sam_mask_decoder.iou_prediction_head", 3),
        "pred_obj_score_head": _mlp(
            sd, "sam_mask_decoder.pred_obj_score_head", 3),
    }
    for i in range(n_masks):
        dec[f"output_hypernetworks_mlps_{i}"] = _mlp(
            sd, f"sam_mask_decoder.output_hypernetworks_mlps.{i}", 3)

    mem_attn: Dict[str, Any] = {"norm": _ln(sd, "memory_attention.norm")}
    for i in range(cfg.memory_attn_layers):
        p = f"memory_attention.layers.{i}"
        mem_attn[f"layers_{i}"] = {
            "self_attn": _attn(sd, f"{p}.self_attn"),
            "cross_attn_image": _attn(sd, f"{p}.cross_attn_image"),
            "norm1": _ln(sd, f"{p}.norm1"), "norm2": _ln(sd, f"{p}.norm2"),
            "norm3": _ln(sd, f"{p}.norm3"),
            "linear1": _lin(sd, f"{p}.linear1"),
            "linear2": _lin(sd, f"{p}.linear2"),
        }

    # memory encoder: mask downsampler convs are interleaved conv/LN pairs
    mem_enc: Dict[str, Any] = {
        "pix_feat_proj": _conv(sd, "memory_encoder.pix_feat_proj"),
        "out_proj": _conv(sd, "memory_encoder.out_proj"),
    }
    i = 0
    # stride-2 convs are conv/LN/GELU triplets; the final 1x1 conv has no LN
    while f"memory_encoder.mask_downsampler.encoder.{3 * i + 1}.weight" in sd:
        mem_enc[f"mask_downsampler_{i}"] = _conv(
            sd, f"memory_encoder.mask_downsampler.encoder.{3 * i}")
        mem_enc[f"mask_downsampler_ln_{i}"] = _ln2d(
            sd, f"memory_encoder.mask_downsampler.encoder.{3 * i + 1}")
        i += 1
    mem_enc["mask_downsampler_final"] = _conv(
        sd, f"memory_encoder.mask_downsampler.encoder.{3 * i}")
    for j in range(2):
        p = f"memory_encoder.fuser.layers.{j}"
        mem_enc[f"fuser_layers_{j}"] = {
            "dwconv": _conv(sd, f"{p}.dwconv"),
            "norm": _ln2d(sd, f"{p}.norm"),
            "pwconv1": _lin(sd, f"{p}.pwconv1"),
            "pwconv2": _lin(sd, f"{p}.pwconv2"),
            "gamma": _t(sd, f"{p}.gamma"),
        }

    params = {
        "image_encoder": {"trunk": trunk, "neck": neck},
        "sam_prompt_encoder": pe,
        "sam_mask_decoder": dec,
        "memory_attention": mem_attn,
        "memory_encoder": mem_enc,
        "conv_s0": _conv(sd, "sam_mask_decoder.conv_s0"),
        "conv_s1": _conv(sd, "sam_mask_decoder.conv_s1"),
        "no_mem_embed": _t(sd, "no_mem_embed").reshape(1, 1, -1),
        "maskmem_tpos_enc": _t(sd, "maskmem_tpos_enc").reshape(
            cfg.num_maskmem, cfg.mem_dim),
        "obj_ptr_proj": _mlp(sd, "obj_ptr_proj", 3),
    }
    return jax.tree.map(jnp.asarray, params)


def load_sam2_predictor(checkpoint_path: str,
                        cfg: Optional[SAM2Config] = None) -> SAM2VideoPredictor:
    import torch

    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    cfg = cfg or SAM2Config()
    return SAM2VideoPredictor(cfg, import_sam2_weights(sd, cfg))
