"""ReferenceLayoutDataset: build the reference's exact on-disk annotation
tree synthetically, then load a sample through the full path."""

import json
import os

import numpy as np
import pytest

from bindyouravatar_tpu.training.data import (ReferenceLayoutDataset,
                                              generate_frame_indices_for_face,
                                              get_valid_segments)


def test_valid_segments_and_indices():
    vf = {"face": [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 30, 31],
          "head": [2, 3, 12]}
    segs = get_valid_segments(vf, tolerance=5)
    assert len(segs) == 2 and segs[0][-1] == 12
    idx = generate_frame_indices_for_face(5, vf, tolerance=5,
                                          skip_start=2, skip_end=2)
    assert len(idx) == 5
    assert all(i in segs[0] for i in idx)
    # repeat-pad when the segment is short
    idx2 = generate_frame_indices_for_face(30, vf, tolerance=5,
                                           skip_start=0, skip_end=0)
    assert len(idx2) == 30


@pytest.fixture
def reference_tree(tmp_path):
    import cv2
    import torch
    from PIL import Image

    rng = np.random.default_rng(0)
    n_frames_total = 20
    num_frames = 9
    h, w = 64, 96
    base = "clip0"
    videos = tmp_path / "videos"
    anno_base = tmp_path / "anno"
    videos.mkdir()

    # video
    vpath = str(videos / f"{base}.mp4")
    wr = cv2.VideoWriter(vpath, cv2.VideoWriter_fourcc(*"mp4v"), 25, (w, h))
    for _ in range(n_frames_total):
        wr.write(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    wr.release()

    # track_masks_data
    td = anno_base / "track_masks_data" / base
    mask_root = td / "tracking_mask_results"
    for track_id, xs in (("1", slice(0, w // 2)), ("4", slice(w // 2, w))):
        d = mask_root / track_id
        d.mkdir(parents=True)
        for fr in range(n_frames_total):
            m = np.zeros((h, w), np.uint8)
            m[:, xs] = 255
            Image.fromarray(m).save(str(d / f"annotated_frame_{fr:05d}.png"))
    (td / "valid_frame.json").write_text(json.dumps(
        {"1": {"face": list(range(n_frames_total))},
         "2": {"face": list(range(n_frames_total))}}))
    (td / "corresponding_data.json").write_text(json.dumps(
        {"1": {"face": 1}, "2": {"face": 4}}))
    (td / "control_sam2_frame.json").write_text(json.dumps({"1": 0, "2": 0}))

    # refine bboxes
    bb = {str(fr): {"face": [
        {"new_track_id": 1, "box": {"x1": 2, "y1": 2, "x2": 40, "y2": 60}},
        {"new_track_id": 2, "box": {"x1": 50, "y1": 2, "x2": 90, "y2": 60}},
    ]} for fr in range(n_frames_total)}
    bj = anno_base / "refine_bbox_jsons"
    bj.mkdir(parents=True)
    (bj / f"{base}.json").write_text(json.dumps(bb))

    # audio left/right
    for sub in ("left_audio", "right_audio"):
        d = anno_base / "audio_emb" / sub
        d.mkdir(parents=True)
        torch.save(torch.randn(n_frames_total + 4, 12, 768), str(d / f"{base}.pt"))

    # anno json list + index file
    anno_json = tmp_path / "list.json"
    anno_json.write_text(json.dumps(
        [{"path": base, "cap": "two people", "fps": 25, "duration": 10,
          "speaker": "left"}]))
    index = tmp_path / "index.txt"
    index.write_text(f"{videos},{anno_json},{anno_base}\n")
    return str(index), num_frames, (h, w)


def test_reference_layout_dataset(reference_tree, tmp_path):
    index, num_frames, (h, w) = reference_tree
    ds = ReferenceLayoutDataset(index, num_frames=num_frames, height=48,
                                width=72, skip_frames_start=2, skip_frames_end=2,
                                error_log=str(tmp_path / "err.txt"))
    assert len(ds) == 1
    sample = ds[0]
    assert sample["video"].shape == (num_frames, 3, 48, 72)
    assert sample["masks"].shape == (2, num_frames, 48, 72)
    assert sample["audio"].shape == (2, num_frames + 4, 12, 768)
    assert sample["face_crops"].shape == (2, 3, 480, 480)
    assert not sample["single_face"]
    np.testing.assert_array_equal(sample["af_matrix"], np.eye(2))
    # left/right mask structure survives resize
    assert sample["masks"][0][:, :, :30].mean() > 0.5
    assert sample["masks"][0][:, :, 40:].mean() < 0.2
    assert sample["prompt"] == "two people"
