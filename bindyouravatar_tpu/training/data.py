"""Training data pipeline (reference `models/dataloader.py`).

Host-side: video decode via OpenCV (decord replacement, SURVEY §2.9), mask
PNG loading, audio-embedding `.pt` loading (torch-cpu, keeping the
reference's input contract), resumable samplers with a checkpointable
cursor (`dataloader.py:397-482`), infinite retry-on-error with an error log
(`:1008-1041`), and a double-buffered host->device prefetcher.

`SyntheticAvatarDataset` produces schema-identical random samples for
tests/benches without fixture data.
"""

from __future__ import annotations

import dataclasses
import json
import os
import queue
import threading
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

AUDIO_WINDOW_SLACK = 4  # window_size - window_stride (audio frames beyond video)


# ------------------------------------------------------------------ #
# samplers
# ------------------------------------------------------------------ #

@dataclasses.dataclass
class ResumableSampler:
    """Random or sequential index sampler with a persistable cursor
    (reference `dataloader.py:397-482`; cursor saved into checkpoints
    `train.py:564-565`)."""
    length: int
    shuffle: bool = True
    seed: int = 0
    epoch: int = 0
    cursor: int = 0

    def _order(self) -> np.ndarray:
        if not self.shuffle:
            return np.arange(self.length)
        rng = np.random.default_rng(self.seed + self.epoch)
        return rng.permutation(self.length)

    def __iter__(self) -> Iterator[int]:
        while True:
            order = self._order()
            while self.cursor < self.length:
                idx = int(order[self.cursor])
                self.cursor += 1
                yield idx
            self.cursor = 0
            self.epoch += 1

    def state_dict(self) -> Dict[str, int]:
        return {"epoch": self.epoch, "cursor": self.cursor, "seed": self.seed}

    def load_state_dict(self, state: Dict[str, int]) -> None:
        self.epoch = int(state["epoch"])
        self.cursor = int(state["cursor"])
        self.seed = int(state.get("seed", self.seed))


# ------------------------------------------------------------------ #
# image helpers (reference `dataloader.py:268-395, 617-663`)
# ------------------------------------------------------------------ #

def short_resize_and_pad(frames: np.ndarray, out_h: int = 480,
                         out_w: int = 720) -> np.ndarray:
    """[T,H,W,C] uint8 -> [T,out_h,out_w,C] float32 in [-1,1]: resize the
    short side to fit, center-pad the rest (reference
    `_short_resize_and_crop`)."""
    import cv2

    t, h, w = frames.shape[:3]
    scale = min(out_h / h, out_w / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    out = np.zeros((t, out_h, out_w, frames.shape[3]), np.float32)
    top, left = (out_h - nh) // 2, (out_w - nw) // 2
    for i in range(t):
        r = cv2.resize(frames[i], (nw, nh), interpolation=cv2.INTER_AREA)
        if r.ndim == 2:
            r = r[..., None]
        out[i, top:top + nh, left:left + nw] = r
    return out / 127.5 - 1.0


def square_expand_crop(frame: np.ndarray, bbox: Sequence[float],
                       expand: float = 0.2, out_size: int = 480) -> np.ndarray:
    """Square face crop expanded by 20%, resized (reference `crop_images`,
    `dataloader.py:268-354`).  frame [H,W,C] uint8, bbox (x0,y0,x1,y1)."""
    import cv2

    h, w = frame.shape[:2]
    x0, y0, x1, y1 = bbox
    cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
    side = max(x1 - x0, y1 - y0) * (1 + expand)
    half = side / 2
    xa, ya = int(max(0, cx - half)), int(max(0, cy - half))
    xb, yb = int(min(w, cx + half)), int(min(h, cy + half))
    crop = frame[ya:yb, xa:xb]
    if crop.size == 0:
        crop = frame
    return cv2.resize(crop, (out_size, out_size), interpolation=cv2.INTER_AREA)


def read_video_frames(path: str, indices: Sequence[int]) -> np.ndarray:
    """Decode the given frame indices with OpenCV -> [T,H,W,3] uint8 RGB."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video {path}")
    want = sorted(set(int(i) for i in indices))
    got: Dict[int, np.ndarray] = {}
    pos, maxw = 0, want[-1]
    ok = True
    while ok and pos <= maxw:
        ok, frame = cap.read()
        if not ok:
            break
        if pos in want:
            got[pos] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        pos += 1
    cap.release()
    missing = [i for i in indices if i not in got]
    if missing:
        raise IOError(f"missing frames {missing[:4]}... in {path}")
    return np.stack([got[int(i)] for i in indices])


def load_audio_embedding(path: str, start: int, num_pixel_frames: int) -> np.ndarray:
    """Load a `.pt` audio embedding [N,12,768] and slice the training window
    with zero-padding (reference `dataloader.py:951-969`: indices
    start-2 .. start+frames+2)."""
    import torch

    t = torch.load(path, map_location="cpu", weights_only=True)
    arr = np.asarray(t.float().numpy() if hasattr(t, "numpy") else t, np.float32)
    need = num_pixel_frames + AUDIO_WINDOW_SLACK
    lo = start - AUDIO_WINDOW_SLACK // 2
    out = np.zeros((need,) + arr.shape[1:], np.float32)
    for i in range(need):
        j = lo + i
        if 0 <= j < arr.shape[0]:
            out[i] = arr[j]
    return out


def af_matrix_from_speaker(speaker_is_left: bool, num_ids: int = 2) -> np.ndarray:
    """reference `get_af_matrix_infer` (`models/utils.py:660-670`)."""
    eye = np.eye(num_ids, dtype=np.float32)
    return eye if speaker_is_left else 1.0 - eye


def maybe_drop_text(prompt: str, ratio: float, rng=None) -> str:
    """Text-prompt dropout (reference `models/dataloader.py:995-996`): with
    probability `ratio` the caption is replaced by '' so the model sees an
    unconditional text branch during training.  Default 0.0 (off), matching
    the reference's shipped default."""
    if ratio > 0 and float((rng or np.random).random()) < ratio:
        return ""
    return prompt


# ------------------------------------------------------------------ #
# datasets
# ------------------------------------------------------------------ #

class DatasetError(RuntimeError):
    pass


@dataclasses.dataclass
class AvatarVideoDataset:
    """Reads the reference's on-disk training layout: an index txt of
    `video_root<sep>anno_json<sep>anno_base` rows (`dataloader.py:529-556`),
    per-sample JSON annotations with face tracks/bboxes, per-id mask dirs,
    and per-speaker audio-embedding `.pt` files.

    Returns host numpy dicts with keys: video [T,3,H,W] (-1..1), face_crops
    [I,3,S,S], dense_mask [T,H,W], index_mask [S_lat], audio [n_tracks,A,12,768],
    af_matrix [I,I], prompt (str), single_face (bool).
    """
    index_file: str
    num_frames: int = 49
    height: int = 480
    width: int = 720
    num_ids: int = 2
    error_log: Optional[str] = "error_log.txt"
    max_retries: int = 8
    text_drop_ratio: float = 0.0

    def __post_init__(self):
        self.rows: List[Tuple[str, str, str]] = []
        with open(self.index_file) as f:
            for line in f:
                parts = line.strip().split(",")
                if len(parts) >= 3:
                    self.rows.append((parts[0], parts[1], parts[2]))
        if not self.rows:
            raise ValueError(f"empty index {self.index_file}")

    def __len__(self):
        return len(self.rows)

    def _log_error(self, idx: int, err: Exception):
        if self.error_log:
            with open(self.error_log, "a") as f:
                f.write(f"{idx}\t{type(err).__name__}: {err}\n")

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        """Retry-on-error with random resample (reference `:1008-1041`)."""
        rng = np.random.default_rng(idx)
        for _ in range(self.max_retries):
            try:
                return self._load(idx)
            except Exception as e:  # noqa: BLE001 — data fault tolerance
                self._log_error(idx, e)
                idx = int(rng.integers(0, len(self.rows)))
        raise DatasetError(f"exceeded retries at {idx}")

    def _load(self, idx: int) -> Dict[str, Any]:
        video_root, anno_json, anno_base = self.rows[idx]
        with open(anno_json) as f:
            anno = json.load(f)
        video_path = os.path.join(video_root, anno["video"])
        prompt = maybe_drop_text(anno.get("caption", ""), self.text_drop_ratio)
        valid = anno.get("valid_frames")
        start = int(valid[0]) if valid else 0
        indices = list(range(start, start + self.num_frames))

        frames = read_video_frames(video_path, indices)
        video = short_resize_and_pad(frames, self.height, self.width)
        video = video.transpose(0, 3, 1, 2)            # [T,3,H,W]

        # face crops from bboxes (first frame)
        bboxes = anno.get("bboxes", {})
        crops = []
        for i in range(self.num_ids):
            bb = bboxes.get(str(i + 1))
            if bb:
                crops.append(square_expand_crop(frames[0], bb).transpose(2, 0, 1))
            else:
                crops.append(np.zeros((3, 480, 480), np.float32))
        face_crops = np.stack(crops).astype(np.float32) / 127.5 - 1.0

        # per-id masks
        masks = []
        for i in range(self.num_ids):
            mdir = os.path.join(anno_base, str(i + 1))
            if os.path.isdir(mdir):
                from PIL import Image

                files = sorted(f for f in os.listdir(mdir) if f.endswith(".png"))
                files = files[start:start + self.num_frames]
                ms = [np.asarray(Image.open(os.path.join(mdir, f)).convert("L"),
                                 np.float32) / 255.0 for f in files]
                m = short_resize_and_pad(np.stack(ms)[..., None] * 255.0,
                                         self.height, self.width)[..., 0]
                masks.append((m + 1.0) / 2.0)
            else:
                masks.append(np.zeros((self.num_frames, self.height, self.width),
                                      np.float32))
        dense = np.maximum(masks[0], masks[1]) if self.num_ids == 2 else masks[0]

        # audio tracks
        audio_paths = anno.get("audio_emb", [])
        tracks = [load_audio_embedding(p, start, self.num_frames)
                  for p in audio_paths[: self.num_ids]]
        audio = np.stack(tracks) if tracks else np.zeros(
            (0, self.num_frames + AUDIO_WINDOW_SLACK, 12, 768), np.float32)

        speaker_left = bool(anno.get("speaker_left", True))
        return dict(video=video.astype(np.float32),
                    face_crops=face_crops,
                    masks=np.stack(masks),
                    dense_mask=dense,
                    audio=audio,
                    af_matrix=af_matrix_from_speaker(speaker_left, self.num_ids),
                    prompt=prompt,
                    single_face=len(tracks) <= 1)


def get_valid_segments(valid_frame: Dict[str, list], tolerance: int = 5):
    """Contiguous-ish runs of valid face/head frames (reference
    `dataloader.py:84-109`: union of 'face' and 'head', gap <= tolerance)."""
    pos = sorted(set(valid_frame.get("face", [])) | set(valid_frame.get("head", [])))
    if not pos:
        return []
    segs, cur = [], [pos[0]]
    for a, b in zip(pos, pos[1:]):
        if b - a <= tolerance:
            cur.append(b)
        else:
            segs.append(cur)
            cur = [b]
    segs.append(cur)
    return segs


def generate_frame_indices_for_face(n_frames: int, valid_frame: Dict[str, list],
                                    tolerance: int = 7, skip_start: int = 2,
                                    skip_end: int = 2,
                                    rng: Optional[np.random.Generator] = None):
    """Pick n contiguous frames inside the longest valid segment (reference
    `dataloader.py:130-172` semantics: skip leading/trailing frames for the
    audio window, repeat-pad short segments)."""
    segs = get_valid_segments(valid_frame, tolerance)
    if not segs:
        raise ValueError("no valid face frames")
    seg = max(segs, key=len)
    seg = seg[skip_start: len(seg) - skip_end] or seg
    if len(seg) >= n_frames:
        max_start = len(seg) - n_frames
        start = int(rng.integers(0, max_start + 1)) if rng is not None and max_start > 0 else 0
        return list(seg[start:start + n_frames])
    # repeat-pad (reference `get_frame_indices_adjusted_for_face`)
    out = list(seg)
    i = 0
    while len(out) < n_frames:
        out.append(seg[i % len(seg)])
        i += 1
    return sorted(out)


@dataclasses.dataclass
class ReferenceLayoutDataset:
    """Reads the reference's EXACT training layout (`dataloader.py:484-1041`):

    index txt rows `sub_root,anno_json,anno_base`; `anno_json` is a JSON list
    of {path, cap, fps, duration, speaker}; annotations under
    `{anno_base}/track_masks_data/{base}/` (valid_frame.json,
    corresponding_data.json, tracking_mask_results/{track_id}/
    annotated_frame_%05d.png) and `{anno_base}/refine_bbox_jsons/{base}.json`
    ({frame: {head|face: [{new_track_id, box:{x1,y1,x2,y2}}]}}); audio
    embeddings `{anno_base}/audio_emb[/left_audio|/right_audio]/{base}.pt`.

    Emits the same sample dict schema as `AvatarVideoDataset`.
    """
    index_file: str
    num_frames: int = 49
    height: int = 480
    width: int = 720
    num_ids: int = 2
    skip_frames_start: int = 2
    skip_frames_end: int = 2
    miss_tolerance: int = 0
    error_log: Optional[str] = "error_log.txt"
    max_retries: int = 8
    seed: int = 0
    text_drop_ratio: float = 0.0

    def __post_init__(self):
        self.samples: List[Dict[str, Any]] = []
        with open(self.index_file) as f:
            rows = [l.strip().split(",") for l in f if l.strip()]
        for sub_root, anno, anno_base in rows:
            with open(anno) as f:
                items = json.load(f)
            for it in items:
                if it.get("fps", 0) * it.get("duration", 0) < self.num_frames:
                    continue
                base = os.path.basename(it["path"])
                self.samples.append(dict(
                    video=os.path.join(sub_root, base + ".mp4"),
                    base=base, anno_base=anno_base,
                    cap=it.get("cap", ""), speaker=it.get("speaker", "left")))
        if not self.samples:
            raise ValueError(f"no usable samples in {self.index_file}")

    def __len__(self):
        return len(self.samples)

    def _log_error(self, idx, err):
        if self.error_log:
            with open(self.error_log, "a") as f:
                f.write(f"{idx}\t{type(err).__name__}: {err}\n")

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        rng = np.random.default_rng(self.seed + idx)
        for _ in range(self.max_retries):
            try:
                return self._load(idx, rng)
            except Exception as e:  # noqa: BLE001 — reference retry contract
                self._log_error(idx, e)
                idx = int(rng.integers(0, len(self.samples)))
        raise DatasetError(f"exceeded retries at {idx}")

    def _load(self, idx: int, rng) -> Dict[str, Any]:
        from PIL import Image

        s = self.samples[idx]
        track_dir = os.path.join(s["anno_base"], "track_masks_data", s["base"])
        with open(os.path.join(track_dir, "valid_frame.json")) as f:
            valid_frame = json.load(f)
        with open(os.path.join(track_dir, "corresponding_data.json")) as f:
            corresponding = json.load(f)
        bbox_path = os.path.join(s["anno_base"], "refine_bbox_jsons",
                                 f"{s['base']}.json")
        bbox_data = {}
        if os.path.isfile(bbox_path):
            with open(bbox_path) as f:
                bbox_data = json.load(f)
        mask_root = os.path.join(track_dir, "tracking_mask_results")

        valid_ids = [k for k, v in corresponding.items()
                     if "face" in v or "head" in v][: self.num_ids]
        if not valid_ids:
            raise ValueError("no valid ids")
        vf0 = valid_frame[valid_ids[0]] if valid_ids[0] in valid_frame else valid_frame
        indices = generate_frame_indices_for_face(
            self.num_frames, vf0, self.miss_tolerance or 7,
            self.skip_frames_start, self.skip_frames_end, rng)

        frames = read_video_frames(s["video"], indices)
        video = short_resize_and_pad(frames, self.height, self.width)
        video = video.transpose(0, 3, 1, 2)

        def bbox_for(frame: int, vid: str):
            entry = bbox_data.get(str(frame), {})
            for kind in ("head", "face"):
                for item in entry.get(kind, []):
                    if item.get("new_track_id") == int(vid):
                        b = item["box"]
                        return (b["x1"], b["y1"], b["x2"], b["y2"])
            return None

        masks, crops = [], []
        single_face = len(valid_ids) == 1
        for slot in range(self.num_ids):
            if slot < len(valid_ids):
                vid = valid_ids[slot]
                cd = corresponding[vid]
                track_id = cd.get("face", cd.get("head", cd.get("person")))
                ms = []
                for fr in indices:
                    p = os.path.join(mask_root, str(track_id),
                                     f"annotated_frame_{int(fr):05d}.png")
                    arr = np.asarray(Image.open(p).convert("L"), np.float32)
                    ms.append((arr > 0).astype(np.float32))
                m = short_resize_and_pad(np.stack(ms)[..., None] * 255.0,
                                         self.height, self.width)[..., 0]
                masks.append((m + 1.0) / 2.0)
                bb = bbox_for(indices[0], vid)
                if bb is not None:
                    crops.append(square_expand_crop(frames[0], bb).transpose(2, 0, 1))
                else:
                    crops.append(np.zeros((3, 480, 480), np.float32))
            else:
                # phantom second id (reference `dataloader.py:911-940`)
                masks.append(np.zeros((self.num_frames, self.height, self.width),
                                      np.float32))
                crops.append(np.zeros((3, 480, 480), np.float32))
        dense = np.max(np.stack(masks), axis=0)

        # audio: left/right tracks, else the single mixed track
        start = int(indices[0])
        tracks = []
        for sub in ("left_audio", "right_audio"):
            p = os.path.join(s["anno_base"], "audio_emb", sub, f"{s['base']}.pt")
            if os.path.isfile(p):
                tracks.append(load_audio_embedding(p, start, self.num_frames))
        if not tracks:
            p = os.path.join(s["anno_base"], "audio_emb", f"{s['base']}.pt")
            if os.path.isfile(p):
                tracks.append(load_audio_embedding(p, start, self.num_frames))
        audio = (np.stack(tracks) if tracks else
                 np.zeros((0, self.num_frames + AUDIO_WINDOW_SLACK, 12, 768),
                          np.float32))

        return dict(video=video.astype(np.float32),
                    face_crops=np.stack(crops).astype(np.float32) / 127.5 - 1.0,
                    masks=np.stack(masks), dense_mask=dense, audio=audio,
                    af_matrix=af_matrix_from_speaker(s["speaker"] == "left",
                                                     self.num_ids),
                    prompt=maybe_drop_text(s["cap"], self.text_drop_ratio),
                    single_face=single_face)


@dataclasses.dataclass
class SyntheticAvatarDataset:
    """Schema-identical random data (tests / benches / dry runs)."""
    length: int = 64
    num_frames: int = 9
    height: int = 64
    width: int = 96
    num_ids: int = 2
    audio_blocks: int = 12
    audio_dim: int = 768
    seed: int = 0

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        rng = np.random.default_rng(self.seed + idx)
        t, h, w = self.num_frames, self.height, self.width
        half = w // 2
        masks = np.zeros((self.num_ids, t, h, w), np.float32)
        masks[0, :, :, :half] = 1.0
        if self.num_ids > 1:
            masks[1, :, :, half:] = 1.0
        return dict(
            video=rng.normal(0, 0.5, (t, 3, h, w)).astype(np.float32).clip(-1, 1),
            face_crops=rng.normal(0, 0.5, (self.num_ids, 3, 64, 64)).astype(np.float32),
            masks=masks,
            dense_mask=masks.max(axis=0),
            audio=rng.normal(0, 1, (self.num_ids, t + AUDIO_WINDOW_SLACK,
                                    self.audio_blocks, self.audio_dim)).astype(np.float32),
            af_matrix=np.eye(self.num_ids, dtype=np.float32),
            prompt="two people talking",
            single_face=False,
        )


# ------------------------------------------------------------------ #
# loader: collation + background prefetch
# ------------------------------------------------------------------ #

def collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k in samples[0]:
        v = samples[0][k]
        if isinstance(v, np.ndarray):
            out[k] = np.stack([s[k] for s in samples])
        else:
            out[k] = [s[k] for s in samples]
    return out


class PrefetchLoader:
    """Threaded batch producer with a bounded queue (double buffering):
    overlaps host decode with device compute (SURVEY §7.9)."""

    def __init__(self, dataset, sampler: ResumableSampler, batch_size: int,
                 prefetch: int = 2):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        it = iter(self.sampler)
        try:
            while not self._stop.is_set():
                idxs = [next(it) for _ in range(self.batch_size)]
                batch = collate([self.dataset[i] for i in idxs])
                self.q.put(batch)
        except Exception as e:  # surface errors to the consumer
            self.q.put(e)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
