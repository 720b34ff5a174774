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
    """framework_op_stats returns a gviz JSON datatable (list of tables) —
    flatten to dicts keyed by column id."""
    import json as _json

    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {log_dir}"
    data, _ = rtd.xspace_to_tool_data([max(paths, key=os.path.getmtime)],
                                      "framework_op_stats", {"tqx": "out:csv;"})
    if isinstance(data, bytes):
        data = data.decode()
    tables = _json.loads(data)
    rows = []
    for tbl in (tables if isinstance(tables, list) else [tables]):
        ids = [c["id"] for c in tbl["cols"]]
        for row in tbl.get("rows", []):
            rows.append({i: (c or {}).get("v") for i, c in
                         zip(ids, row["c"])})
    rows = [r for r in rows if r.get("host_or_device") == "Device"
            and isinstance(r.get("total_self_time"), (int, float))]
    # the gviz payload carries two identical tables (device + combined view)
    # -> every op appears twice; keep one row per op name
    seen, uniq = set(), []
    for r in rows:
        key = (r.get("operation"), r["total_self_time"])
        if key not in seen:
            seen.add(key)
            uniq.append(r)
    uniq.sort(key=lambda r: -r["total_self_time"])
    return uniq[:top]


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
    total = sum(r["total_self_time"] for r in rows)
    print(f"{'self us':>10} {'%':>6} {'occ':>5} {'GB/s':>7} {'GFLOP/s':>9} "
          f"{'bound':>7}  op")
    for r in rows:
        print(f"{r['total_self_time']:>10.0f} "
              f"{100 * r['total_self_time'] / total:>6.1f} "
              f"{r.get('occurrences') or '':>5} "
              f"{round(r.get('measured_memory_bw') or 0):>7} "
              f"{round(r.get('model_flop_rate') or 0):>9} "
              f"{(r.get('bound_by') or ''):>7}  "
              f"{str(r.get('operation', '?'))[:80]}")


if __name__ == "__main__":
    main()
