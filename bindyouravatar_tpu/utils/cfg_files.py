"""`.cfg` batch-config front-end (reference `tools/batch_run_samples.py:10-43`).

Each cfg file holds shell-token lines (`--flag value ...`); a sample cfg is
merged over `default.cfg` (sample wins per-flag), then lexed into an argv
compatible with the inference CLI — the same composable contract as the
reference's `assets/config/{default,NNN}.cfg`.
"""

from __future__ import annotations

import shlex
from typing import Dict, List, Sequence


def parse_cfg(path: str) -> Dict[str, List[str]]:
    """cfg file -> {flag: [values...]} preserving multi-value flags."""
    tokens: List[str] = []
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if line:
                tokens.extend(shlex.split(line))
    out: Dict[str, List[str]] = {}
    cur = None
    for t in tokens:
        if t.startswith("--"):
            cur = t
            out.setdefault(cur, [])
        elif cur is not None:
            out[cur].append(t)
    return out


def merge_cfgs(default: Dict[str, List[str]],
               override: Dict[str, List[str]]) -> Dict[str, List[str]]:
    merged = {k: list(v) for k, v in default.items()}
    for k, v in override.items():
        merged[k] = list(v)
    return merged


def cfg_to_argv(cfg: Dict[str, List[str]]) -> List[str]:
    argv: List[str] = []
    for k, v in cfg.items():
        argv.append(k)
        argv.extend(v)
    return argv


def load_merged_argv(default_path: str, sample_path: str) -> List[str]:
    return cfg_to_argv(merge_cfgs(parse_cfg(default_path), parse_cfg(sample_path)))
