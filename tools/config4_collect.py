"""Collect CONFIG4_r04.json from the roundup's CLI logs.

BASELINE #4: kitchen + bathroom1, 720p (720x405 at aspect), 256 spp,
8 bounces, path. Parses /tmp/tpu_config4_<scene>.log for the per-batch
progress lines and the final wall-clock; reports BOTH the full-process
wall and the median healthy per-batch rate — the axon tunnel can stall
mid-run for tens of minutes (observed this round: one 16-sample batch
took 24 min between two 100 s batches), and a single stall should be
visible, not silently averaged in.

Usage: python tools/config4_collect.py [--json CONFIG4_r04.json]
"""

import json
import os
import re
import sys


def parse(scene: str) -> dict:
    path = f"/tmp/tpu_config4_{scene}.log"
    if not os.path.exists(path):
        return {"error": f"missing {path}"}
    txt = open(path).read()
    batches = []
    # "sample  48/256 in 0:01:40.416 ETC: ..."
    for m in re.finditer(
        r"sample\s+(\d+)/(\d+) in (\d+):(\d+):(\d+)\.(\d+)", txt
    ):
        hh, mm, ss, ms = int(m.group(3)), int(m.group(4)), int(m.group(5)), int(m.group(6))
        batches.append(
            (int(m.group(1)), hh * 3600 + mm * 60 + ss + ms / 1000.0)
        )
    out = {"scene": scene, "resolution": "720x405", "spp": 256,
           "bounces": 8, "sampler": "path"}
    m = re.search(r"rendered in .* \(([\d.]+)s\)", txt)
    out["completed"] = bool(m)
    if m:
        out["render_wall_s"] = float(m.group(1))
    else:
        out["incomplete_note"] = (
            "run stopped early (a 24-minute tunnel stall consumed the "
            "slot's wall budget); steady_ms_per_sample from the healthy "
            "batches is the reportable rate"
        )
    m = re.search(r"total time: (\d+):(\d+):(\d+)\.(\d+)", txt)
    if m:
        out["total_wall_s"] = (
            int(m.group(1)) * 3600 + int(m.group(2)) * 60
            + int(m.group(3)) + int(m.group(4)) / 1000.0
        )
    if len(batches) >= 2:
        # per-batch seconds; first batch includes compile
        spb = batches[0][0]
        times = [t for _, t in batches[1:]]
        times.sort()
        med = times[len(times) // 2]
        out["batch_spp"] = spb
        out["median_batch_s"] = round(med, 1)
        out["steady_ms_per_sample"] = round(med / spb * 1000.0, 1)
        out["n_batches"] = len(batches)
        out["stall_note"] = (
            "axon tunnel stalls can inflate single batches by minutes; "
            "median batch rate is the steady-state number, render_wall_s "
            "the end-to-end truth for this particular run"
        )
    return out


def main():
    out_path = (sys.argv[sys.argv.index("--json") + 1]
                if "--json" in sys.argv else "CONFIG4_r04.json")
    res = {s: parse(s) for s in ("kitchen", "bathroom1")}
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
