"""scripts/sft.py launcher: 2 synthetic steps on the 8-device mesh."""

import importlib.util
import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_sft_launcher_end_to_end(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "sft", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "sft.py"))
    sft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sft)

    out = str(tmp_path / "run")
    rc = sft.main(["--model_size", "tiny", "--max_train_steps", "2",
                   "--batch_size", "8", "--checkpointing_steps", "2",
                   "--output_dir", out, "--resume", "none",
                   "--num_validation_videos", "1", "--validation_steps", "2"])
    assert rc == 0
    with open(os.path.join(out, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    assert len(rows) == 2
    assert all(np.isfinite(r["loss"]) for r in rows)
    assert os.path.isdir(os.path.join(out, "checkpoints"))
    # every-checkpoint validation video generated from the live params
    val_dirs = [d for d in os.listdir(out) if d.startswith("validation-")]
    assert val_dirs, "no validation output produced"
    assert any(os.listdir(os.path.join(out, d)) for d in val_dirs)
