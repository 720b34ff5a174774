"""SAM2 port: module shapes, video-predictor loop, importer key-map.

No sam2 package or weights exist in this image; correctness here is
(a) end-to-end structural (the tiny-config predictor runs the full
prompt -> memory -> propagate loop with finite outputs and temporally
consistent masks), and (b) bijective for the checkpoint importer (a
synthetic torch-style state dict with sam2.1 key names round-trips into the
exact flax tree the model initialises).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bindyouravatar_tpu.models.sam2 import (Hiera, HieraConfig, ImageEncoder,
                                            SAM2Config, sine_pos_enc_2d)
from bindyouravatar_tpu.preprocess.sam2_video import (SAM2Model,
                                                      SAM2VideoPredictor,
                                                      import_sam2_weights)

CFG = SAM2Config.tiny_test()


def test_hiera_stage_shapes():
    hc = HieraConfig.test()
    m = Hiera(hc)
    x = jnp.zeros((1, 3, 64, 64))
    params = m.init(jax.random.key(0), x)
    outs = m.apply(params, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 16), (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128)]


def test_image_encoder_outputs():
    m = ImageEncoder(CFG)
    x = jnp.zeros((1, 3, CFG.image_size, CFG.image_size))
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    s = CFG.image_size
    assert out["vision_features"].shape == (1, s // 16, s // 16, CFG.d_model)
    assert [f.shape[1] for f in out["backbone_fpn"]] == [s // 4, s // 8, s // 16]


@pytest.fixture(scope="module")
def predictor():
    model = SAM2Model(CFG)
    s = CFG.image_size
    k = jax.random.key(0)
    params = model.init(
        k, jnp.zeros((1, 3, s, s)), method=SAM2Model.encode_image)["params"]
    # init the remaining submodules by tracing each method once
    enc = model.apply({"params": params}, jnp.zeros((1, 3, s, s)),
                      method=SAM2Model.encode_image)
    variables = model.init(
        k, enc["feat"], enc["hi0"], enc["hi1"],
        jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), jnp.int32),
        method=SAM2Model.decode_masks)
    params = {**variables["params"], **params}
    masks = model.apply({"params": params}, enc["feat"], enc["hi0"],
                        enc["hi1"], jnp.zeros((1, 1, 2)),
                        jnp.zeros((1, 1), jnp.int32),
                        method=SAM2Model.decode_masks)[0]
    v2 = model.init(k, enc["feat"], masks[:, 0],
                    method=SAM2Model.encode_memory)
    params = {**v2["params"], **params}
    mem, pos = model.apply({"params": params}, enc["feat"], masks[:, 0],
                           method=SAM2Model.encode_memory)
    mem2 = mem.reshape(1, -1, CFG.mem_dim)
    v3 = model.init(k, enc["feat"], mem2, jnp.zeros_like(mem2),
                    mem2.shape[1], method=SAM2Model.condition_features)
    params = {**v3["params"], **params}
    v4 = model.init(k, enc["feat"], method=SAM2Model.no_memory_features)
    params = {**v4["params"], **params}
    return SAM2VideoPredictor(CFG, params)


def test_video_predictor_loop(predictor):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (3, 96, 96, 3), dtype=np.uint8)
    state = predictor.init_state(frames)
    assert state["num_frames"] == 3

    ids, masks = predictor.add_new_points(
        state, 0, obj_id=1, points=np.array([[48.0, 48.0]]),
        labels=np.array([1]))
    assert ids == [1]
    h4 = CFG.image_size // 4
    assert masks.shape == (1, h4, h4)

    predictor.add_new_points(state, 0, obj_id=2,
                             points=np.array([[20.0, 20.0]]),
                             labels=np.array([1]))
    outs = list(predictor.propagate_in_video(state))
    assert [t for t, _, _ in outs] == [0, 1, 2]
    for _, ids, m in outs:
        assert ids == [1, 2]
        assert m.shape == (2, h4, h4)
        assert np.isfinite(m).all()
    # memory bank grew for non-conditioning frames
    assert len(state["objs"][1].memories) == 2
    assert len(state["objs"][1].obj_ptrs) == 3


def _export_torch_style(params, cfg):
    """Inverse of `import_sam2_weights` (test-local): flax tree ->
    sam2.1-style state dict keys/shapes."""
    sd = {}

    def conv(p, tree):
        sd[f"{p}.weight"] = np.asarray(tree["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in tree:
            sd[f"{p}.bias"] = np.asarray(tree["bias"])

    def lin(p, tree):
        sd[f"{p}.weight"] = np.asarray(tree["kernel"]).T
        sd[f"{p}.bias"] = np.asarray(tree["bias"])

    def ln(p, tree):
        sd[f"{p}.weight"] = np.asarray(tree.get("scale", tree.get("weight")))
        sd[f"{p}.bias"] = np.asarray(tree["bias"])

    tr = params["image_encoder"]["trunk"]
    conv("image_encoder.trunk.patch_embed.proj", tr["patch_embed"])
    sd["image_encoder.trunk.pos_embed"] = np.asarray(
        tr["pos_embed"]).transpose(0, 3, 1, 2)
    sd["image_encoder.trunk.pos_embed_window"] = np.asarray(
        tr["pos_embed_window"]).transpose(0, 3, 1, 2)
    for i in range(sum(cfg.hiera.stages)):
        b = tr[f"blocks_{i}"]
        p = f"image_encoder.trunk.blocks.{i}"
        ln(f"{p}.norm1", b["norm1"])
        ln(f"{p}.norm2", b["norm2"])
        lin(f"{p}.attn.qkv", b["attn"]["qkv"])
        lin(f"{p}.attn.proj", b["attn"]["proj"])
        lin(f"{p}.mlp.layers.0", b["mlp_layers_0"])
        lin(f"{p}.mlp.layers.1", b["mlp_layers_1"])
        if "proj" in b:
            lin(f"{p}.proj", b["proj"])
    for i in range(4):
        conv(f"image_encoder.neck.convs.{i}.conv",
             params["image_encoder"]["neck"][f"convs_{i}"])

    pe = params["sam_prompt_encoder"]
    sd["sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = \
        np.asarray(pe["pe_gaussian"])
    for i in range(4):
        sd[f"sam_prompt_encoder.point_embeddings.{i}.weight"] = \
            np.asarray(pe["point_embeddings"])[i:i + 1]
    sd["sam_prompt_encoder.not_a_point_embed.weight"] = \
        np.asarray(pe["not_a_point_embed"])[None]
    sd["sam_prompt_encoder.no_mask_embed.weight"] = \
        np.asarray(pe["no_mask_embed"])[None]

    dec = params["sam_mask_decoder"]
    sd["sam_mask_decoder.iou_token.weight"] = np.asarray(dec["iou_token"])[None]
    sd["sam_mask_decoder.mask_tokens.weight"] = np.asarray(dec["mask_tokens"])
    sd["sam_mask_decoder.obj_score_token.weight"] = \
        np.asarray(dec["obj_score_token"])[None]

    def attn(p, tree):
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(f"{p}.{n}", tree[n])

    for i in range(2):
        b = dec["transformer"][f"layers_{i}"]
        p = f"sam_mask_decoder.transformer.layers.{i}"
        attn(f"{p}.self_attn", b["self_attn"])
        attn(f"{p}.cross_attn_token_to_image", b["cross_attn_token_to_image"])
        attn(f"{p}.cross_attn_image_to_token", b["cross_attn_image_to_token"])
        for j in range(1, 5):
            ln(f"{p}.norm{j}", b[f"norm{j}"])
        lin(f"{p}.mlp.layers.0", b["mlp_layers_0"])
        lin(f"{p}.mlp.layers.1", b["mlp_layers_1"])
    attn("sam_mask_decoder.transformer.final_attn_token_to_image",
         dec["transformer"]["final_attn_token_to_image"])
    ln("sam_mask_decoder.transformer.norm_final_attn",
       dec["transformer"]["norm_final_attn"])
    conv("sam_mask_decoder.output_upscaling.0", dec["output_upscaling_0"])
    ln("sam_mask_decoder.output_upscaling.1", dec["output_upscaling_ln"])
    conv("sam_mask_decoder.output_upscaling.3", dec["output_upscaling_3"])
    for i in range(cfg.num_multimask + 1):
        for j in range(3):
            lin(f"sam_mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}",
                dec[f"output_hypernetworks_mlps_{i}"][f"layers_{j}"])
    for j in range(3):
        lin(f"sam_mask_decoder.iou_prediction_head.layers.{j}",
            dec["iou_prediction_head"][f"layers_{j}"])
        lin(f"sam_mask_decoder.pred_obj_score_head.layers.{j}",
            dec["pred_obj_score_head"][f"layers_{j}"])
        lin(f"obj_ptr_proj.layers.{j}", params["obj_ptr_proj"][f"layers_{j}"])
    conv("sam_mask_decoder.conv_s0", params["conv_s0"])
    conv("sam_mask_decoder.conv_s1", params["conv_s1"])

    ma = params["memory_attention"]
    ln("memory_attention.norm", ma["norm"])
    for i in range(cfg.memory_attn_layers):
        b = ma[f"layers_{i}"]
        p = f"memory_attention.layers.{i}"
        attn(f"{p}.self_attn", b["self_attn"])
        attn(f"{p}.cross_attn_image", b["cross_attn_image"])
        for j in range(1, 4):
            ln(f"{p}.norm{j}", b[f"norm{j}"])
        lin(f"{p}.linear1", b["linear1"])
        lin(f"{p}.linear2", b["linear2"])

    me = params["memory_encoder"]
    conv("memory_encoder.pix_feat_proj", me["pix_feat_proj"])
    conv("memory_encoder.out_proj", me["out_proj"])
    i = 0
    while f"mask_downsampler_{i}" in me:
        conv(f"memory_encoder.mask_downsampler.encoder.{3 * i}",
             me[f"mask_downsampler_{i}"])
        ln(f"memory_encoder.mask_downsampler.encoder.{3 * i + 1}",
           me[f"mask_downsampler_ln_{i}"])
        i += 1
    conv(f"memory_encoder.mask_downsampler.encoder.{3 * i}",
         me["mask_downsampler_final"])
    for j in range(2):
        b = me[f"fuser_layers_{j}"]
        p = f"memory_encoder.fuser.layers.{j}"
        conv(f"{p}.dwconv", b["dwconv"])
        ln(f"{p}.norm", b["norm"])
        lin(f"{p}.pwconv1", b["pwconv1"])
        lin(f"{p}.pwconv2", b["pwconv2"])
        sd[f"{p}.gamma"] = np.asarray(b["gamma"])

    sd["no_mem_embed"] = np.asarray(params["no_mem_embed"])
    sd["maskmem_tpos_enc"] = np.asarray(params["maskmem_tpos_enc"])
    return sd


def test_importer_roundtrip(predictor):
    """flax tree -> sam2.1-style keys -> importer -> identical tree."""
    params = predictor._params["params"]
    sd = _export_torch_style(params, CFG)
    back = import_sam2_weights(sd, CFG)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    b_keys = set(flat_b)
    for path, val in flat_a:
        assert path in b_keys, f"importer missed {path}"
        np.testing.assert_allclose(np.asarray(val),
                                   np.asarray(flat_b[path]), atol=1e-6,
                                   err_msg=str(path))


def test_sine_pos_enc_properties():
    pe = sine_pos_enc_2d(8, 12, 32)
    assert pe.shape == (8, 12, 32)
    assert np.abs(pe).max() <= 1.0 + 1e-6
    assert not np.allclose(pe[0, 0], pe[7, 11])


def test_sam2_tool_native_path(predictor, tmp_path):
    """tools/sam2_tools.py native branch end-to-end with an injected
    predictor: detect-fallback prompts, propagate, contract-correct mask
    dirs."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from tools.sam2_tools import sam2_masks, write_masks

    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (3, 64, 96, 3), dtype=np.uint8)
    masks = sam2_masks(frames, predictor=predictor)
    assert masks.shape == (2, 3, 64, 96)
    assert masks.dtype == np.uint8
    write_masks(masks, str(tmp_path))
    assert (tmp_path / "1" / "annotated_frame_00000.png").exists()
    assert (tmp_path / "valid_frame.json").exists()
