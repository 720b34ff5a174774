"""Batch inference driver (reference `tools/batch_run_samples.py:10-158`).

Merges `default.cfg` with each sample `NNN.cfg` and runs the inference CLI
once per sample — as an in-process call by default (one TPU runtime) or as
subprocesses with `--subprocess` (the reference's per-GPU model, with
`--device N` standing in for CUDA_VISIBLE_DEVICES pinning).
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bindyouravatar_tpu.utils.cfg_files import load_merged_argv  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_dir", default="assets/config")
    p.add_argument("--default_cfg", default=None)
    p.add_argument("--samples", nargs="*", default=None,
                   help="sample cfg names (default: all NNN.cfg)")
    p.add_argument("--output_root", default="output/batch")
    p.add_argument("--subprocess", action="store_true")
    args = p.parse_args()

    default_cfg = args.default_cfg or os.path.join(args.config_dir, "default.cfg")
    samples = args.samples or sorted(
        os.path.basename(f) for f in glob.glob(os.path.join(args.config_dir, "*.cfg"))
        if os.path.basename(f) != "default.cfg")

    results = []
    for name in samples:
        sample_path = os.path.join(args.config_dir, name)
        argv = load_merged_argv(default_cfg, sample_path)
        out_dir = os.path.join(args.output_root, os.path.splitext(name)[0])
        argv += ["--output_dir", out_dir]
        print(f"[batch] {name} -> {out_dir}")
        if args.subprocess:
            r = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.dirname(
                     os.path.abspath(__file__))), "infer.py")] + argv)
            results.append((name, r.returncode))
        else:
            import infer

            try:
                infer.main(argv)
                results.append((name, 0))
            except SystemExit as e:
                # SystemExit.code may be a message string (argparse/usage
                # errors); any non-int, non-None code is a failure
                if e.code is None or isinstance(e.code, int):
                    results.append((name, int(e.code or 0)))
                else:
                    print(f"[batch] {name}: {e.code}", file=sys.stderr)
                    results.append((name, 1))
    for name, rc in results:
        print(f"[batch] {name}: {'OK' if rc == 0 else f'FAIL({rc})'}")
    sys.exit(max((rc for _, rc in results), default=0))


if __name__ == "__main__":
    main()
