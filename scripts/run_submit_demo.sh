#!/usr/bin/env bash
# Cluster-style launch parity (north rule): package the engine as a zip and
# run the pipeline via `spark-submit --py-files` from a scratch cwd, so the
# driver resolves the package from the shipped artifact only.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

(cd "$REPO" && python - <<EOF
import zipfile, os
with zipfile.ZipFile("$WORK/engine.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("deduplicate_text_datasets_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("packaged", "$WORK/engine.zip")
EOF
)

cp "$REPO/scripts/submit_driver.py" "$WORK/"
cd "$WORK"
spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --py-files "$WORK/engine.zip" \
  "$WORK/submit_driver.py" "${1:-/root/testdata/sf0.001}" 2>&1 \
  | grep -E "SUBMIT_DEMO_RESULT|Error|Exception" || true
