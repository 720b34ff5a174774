"""Profile the conditioned flagship step with xprof and print the top ops.

Builds the step exactly like bench.py (sequential-CFG, AOT AUTO layouts),
traces a few steps, parses the .xplane.pb with xprof's framework_op_stats
(the tensorboard_plugin_profile package is broken by protobuf here — see
CLAUDE.md), and prints a per-op table: self-time, %, measured GB/s / TF/s
where available.

    python tools/profile_step.py [--steps 2] [--out /tmp/bya_prof]
"""

import argparse
import csv
import glob
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_opstats(log_dir: str, top: int = 40):
    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {log_dir}"
    data, _ = rtd.xspace_to_tool_data([max(paths, key=os.path.getmtime)],
                                      "framework_op_stats", {"tqx": "out:csv;"})
    if isinstance(data, bytes):
        data = data.decode()
    rows = list(csv.DictReader(io.StringIO(data)))
    for r in rows:
        for k in ("Total self-time (us)", "TFLOPs", "Bandwidth (GiB/s)",
                  "Avg. self-time (us)", "Occurrences"):
            if k in r and r[k] not in (None, ""):
                try:
                    r[k] = float(r[k].replace(",", ""))
                except (ValueError, AttributeError):
                    pass
    rows = [r for r in rows if isinstance(r.get("Total self-time (us)"), float)]
    rows.sort(key=lambda r: -r["Total self-time (us)"])
    return rows[:top]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--out", type=str, default="/tmp/bya_prof")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse_only", action="store_true",
                    help="skip the run; parse an existing trace dir")
    args = ap.parse_args()

    if not args.parse_only:
        import jax

        from bench import build

        call, params, lat = build(conditioned=True)
        out = call(params, lat)            # warm/compile
        float(out[0, 0, 0, 0, 0])
        jax.profiler.start_trace(args.out)
        for _ in range(args.steps):
            out = call(params, lat)
        float(out[0, 0, 0, 0, 0])
        jax.profiler.stop_trace()

    rows = parse_opstats(args.out, args.top)
    total = sum(r["Total self-time (us)"] for r in rows)
    print(f"{'self us':>12} {'%':>6} {'occ':>6} {'GiB/s':>8} {'TFLOPs':>8}  op")
    for r in rows:
        print(f"{r['Total self-time (us)']:>12.0f} "
              f"{100 * r['Total self-time (us)'] / total:>6.1f} "
              f"{r.get('Occurrences', ''):>6} "
              f"{r.get('Bandwidth (GiB/s)', ''):>8} "
              f"{r.get('TFLOPs', ''):>8}  "
              f"{r.get('Operation', r.get('Op name', '?'))[:90]}")


if __name__ == "__main__":
    main()
