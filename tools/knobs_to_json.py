"""Parse a knob-matrix log (tools-generated '=== label ===' + bench_heavy
JSON lines) into a KNOBS_r{N}.json artifact.

Usage: python tools/knobs_to_json.py /tmp/knobs_r05.log KNOBS_r05.json
"""

import json
import re
import sys


def main():
    log, out = sys.argv[1], sys.argv[2]
    entries = {}
    label = None
    for line in open(log):
        m = re.match(r"^=== (.+) ===$", line.strip())
        if m:
            label = m.group(1)
            continue
        if label and line.strip().startswith("{"):
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            scene = next(iter(d))
            v = d[scene]
            entries[label] = {
                "scene": scene,
                "ms_per_sample": v.get("ms_per_sample"),
                "est_wall_256spp_s": v.get("est_wall_256spp_s"),
                "hbm_util": v.get("hbm_util"),
            }
            label = None
        elif label and ("bounce kernel" in line or "hybrid flat" in line):
            entries.setdefault(label, {})["selection"] = line.strip()
    with open(out, "w") as f:
        json.dump(entries, f, indent=1)
    print(json.dumps(entries, indent=1))


if __name__ == "__main__":
    main()
