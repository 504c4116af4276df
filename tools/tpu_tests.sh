#!/bin/bash
# On-TPU smoke tier runner (VERDICT r4 item 7): runs tests_tpu/ on the
# live chip and converts the junit XML into TPU_TESTS_r{N}.json.
# Usage: tools/tpu_tests.sh [round_tag]   (default r05)
set -x
cd /root/repo
TAG=${1:-r05}
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
timeout 2400 python -m pytest tests_tpu -q --junitxml=/tmp/tpu_tests.xml \
    > /tmp/tpu_tests.log 2>&1
rc=$?
python - "$TAG" "$rc" <<'EOF'
import json
import sys
import xml.etree.ElementTree as ET

tag, rc = sys.argv[1], int(sys.argv[2])
out = {"pytest_rc": rc, "tests": {}}
try:
    root = ET.parse("/tmp/tpu_tests.xml").getroot()
    for case in root.iter("testcase"):
        name = case.get("name")
        status = "pass"
        for child in case:
            if child.tag in ("failure", "error"):
                status = child.tag
            elif child.tag == "skipped":
                status = "skipped"
        out["tests"][name] = {
            "status": status, "time_s": round(float(case.get("time", 0)), 1)
        }
except Exception as e:  # junit missing => collection-level wreck
    out["parse_error"] = f"{type(e).__name__}: {e}"
with open(f"TPU_TESTS_{tag}.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
EOF
tail -3 /tmp/tpu_tests.log
exit $rc
